package graft

import org.apache.spark.sql.functions._
import graft.ext.{MediaRow, Multimodal}

class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  private def media = Multimodal.mediaTable(spark, sf)

  test("media table carries binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = media.filter(col("doc_id") === 0).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") == "image/png") // 0 % 3
    assert(meta.getAs[Int]("width") == 16 && meta.getAs[Int]("height") == 16)
  }

  test("feature extraction computes real byte statistics in batches") {
    val ds = media.select(col("doc_id"), col("payload"),
        col("meta.mime").as("mime"), col("meta.width").as("width"),
        col("meta.height").as("height")).as[MediaRow]
    val feats = Multimodal.extractFeatures(ds, batchSize = 16)
      .collect().map(f => f.doc_id -> f).toMap
    val doc0 = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val bytes = doc0.getBytes("UTF-8")
    assert(feats(0L).n_bytes == bytes.length)
    assert(feats(0L).byte_sum == bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)))
    assert(feats(0L).decoder == "stub-v1")
    assert(feats.size == media.count())
  }

  test("real PNG payloads decode to ACTUAL pixel dimensions via the JDK codec") {
    // build genuine PNG bytes (BufferedImage → ImageIO.write — the codec
    // ships with the JDK, no external libraries): the decode path must
    // report the image's real dimensions, overriding lying metadata, and
    // leave undecodable payloads on the metadata-passthrough stub
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, png(5, 3), "image/png", 999, 999),   // metadata lies
      MediaRow(2L, png(16, 16), "image/png", 16, 16),
      MediaRow(3L, "not an image".getBytes("UTF-8"), "video/mp4", 64, 48))
    val feats = Multimodal.extractFeatures(rows.toDS(), batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).decoder == "imageio")
    assert(feats(1L).width == 5 && feats(1L).height == 3, feats(1L).toString)
    assert(feats(2L).decoder == "imageio" && feats(2L).width == 16)
    assert(feats(3L).decoder == "stub-v1")
    assert(feats(3L).width == 64 && feats(3L).height == 48) // passthrough
    // byte statistics stay real on BOTH paths
    assert(feats(1L).n_bytes == png(5, 3).length)
  }

  test("frame sampling slices payloads into fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    val f = frames.filter(col("doc_id") === 0).collect()
    assert(f.nonEmpty)
    f.foreach(r => assert(r.getAs[Array[Byte]]("frame").length == 16))
    val idx = f.map(_.getAs[Int]("frame_idx")).sorted
    assert(idx.head == 0 && idx.toSeq == (0 until f.length))
  }

  test("metadata filter prunes payload reads (pushdown-friendly projection)") {
    val rows = Multimodal.q34MultimodalMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 256)
      assert(r.getAs[String]("mime") != "video/mp4")
      assert(r.getAs[Long]("n_pixels") ==
        r.getAs[Int]("width").toLong * r.getAs[Int]("height"))
    }
  }

  test("aHash: identical payloads at distance 0, byte noise near, rewrite far") {
    // doc 2 = doc 1 exactly; doc 3 = doc 1 with sparse byte bumps (the
    // perceptual-noise case); doc 4 is a different byte distribution
    val base = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val noisy = base.getBytes("UTF-8").zipWithIndex
      .map { case (b, i) => if (i % 19 == 0) (b + 1).toByte else b }
    val media = Seq(
      (1L, base.getBytes("UTF-8")),
      (2L, base.getBytes("UTF-8")),
      (3L, noisy),
      (4L, ("ZZZZ aaaa 0000 !!!! " * 9).getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = Multimodal.aHashPairs(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(got((1L, 2L)) == 0, got.toString)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 3, got.toString)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L), got.toString)
  }

  test("aHash: short and empty payloads get zero blocks, pair together") {
    // payload < 64 bytes leaves some lanes byteless (bit 0); an empty
    // payload is all-zero blocks. These must hash, band, and pair — the
    // DuckDB oracle replays the same zeros via its COALESCE universe.
    assert(Multimodal.aHashOf(Array.emptyByteArray).forall(_ == 0L))
    val ab = Multimodal.aHashOf("ab".getBytes("UTF-8"))
    // "ab": byte 0 → lane 0 (97·2 < 195 ⇒ 0), byte 1 → lane 32
    // (98·2 ≥ 195 ⇒ bit 0 of block 4); all byteless lanes stay 0
    assert(ab.toSeq == Seq(0L, 0L, 0L, 0L, 1L, 0L, 0L, 0L), ab.toSeq)
    val media = Seq(
      (1L, Array.emptyByteArray), (2L, Array.emptyByteArray),
      (3L, "ab".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val pairs = Multimodal.aHashPairs(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    // the two empty docs are distance 0; "ab" is 1 bit from empty
    assert(pairs == Map((1L, 2L) -> 0, (1L, 3L) -> 1, (2L, 3L) -> 1), pairs)
  }

  test("withPerturbedCopies plants a recoverable pair per document") {
    val media = Seq((7L, "some reasonably long payload text here okay"
      .getBytes("UTF-8"))).toDF("doc_id", "payload")
    val pairs = Multimodal.aHashPairs(
        Multimodal.withPerturbedCopies(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((7L, 1000007L)), pairs.toString)
  }

  test("mediaConformance: real magic bytes pass, text bytes fail") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A) ++
      Array.fill[Byte](10)(7)
    val wav = "RIFF1234WAVEfmt ".getBytes("UTF-8")
    val mp4 = Array[Byte](0, 0, 0, 32) ++ "ftypisom".getBytes("UTF-8")
    val fake = "just some text".getBytes("UTF-8")
    val media = Seq(
      (1L, png, "image/png"), (2L, wav, "audio/wav"),
      (3L, mp4, "video/mp4"), (4L, fake, "image/png"))
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"), col("payload"),
        struct(col("mime"), lit(16).as("width"), lit(16).as("height"))
          .as("meta"))
    val got = Multimodal.mediaConformance(media)
      .collect()
      .map(r => r.getAs[String]("mime") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_sniff_ok")))).toMap
    assert(got == Map("image/png" -> ((2L, 1L)), "audio/wav" -> ((1L, 1L)),
      "video/mp4" -> ((1L, 1L))), got.toString)
  }

  test("q223 small analog: generated payload bytes, stub decode, and " +
      "byte sums match the closed form") {
    val docs = 512L
    val media = Multimodal.q223Media(spark, docs).collect()
    assert(media.length == docs)
    // payload byte j of doc id is (id + j) mod 256 — the contract the
    // at-scale oracle's residue-class run table replays
    media.take(8).foreach { m =>
      assert(m.payload.length == Multimodal.q223PayloadLen)
      m.payload.zipWithIndex.foreach { case (byte, j) =>
        assert((byte & 0xFF) == ((m.doc_id + j) % 256).toInt,
          s"doc ${m.doc_id} byte $j")
      }
    }
    val feats = Multimodal.extractFeatures(
      Multimodal.q223Media(spark, docs)).collect()
    assert(feats.length == docs)
    feats.foreach { f =>
      // no consecutive-byte run is a JDK image signature → stub always
      assert(f.decoder == "stub-v1", s"doc ${f.doc_id}: ${f.decoder}")
      assert(f.n_bytes == Multimodal.q223PayloadLen)
      val exp = (0 until Multimodal.q223PayloadLen)
        .map(j => (f.doc_id + j) % 256).sum
      assert(f.byte_sum == exp, s"doc ${f.doc_id}")
      // metadata passthrough on the stub path
      assert(f.width == 16 + (f.doc_id * 7 % 1008).toInt)
    }
  }
}
