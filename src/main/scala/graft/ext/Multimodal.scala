package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One media row: opaque payload + typed metadata. */
final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                          width: Int, height: Int)

/** Output of the (stubbed) decode + feature-extraction stage. */
final case class MediaFeatures(doc_id: Long, n_bytes: Int, byte_sum: Long,
                               mean_byte: Double, width: Int, height: Int,
                               decoder: String)

/** Multimodal columns: image/audio/video as opaque `BinaryType` payloads
  * with a typed metadata struct, plus the executor-side batch plumbing a
  * real decode/feature-extract stage needs.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub — but everything Spark-side is real
  * and tested: binary payload column, metadata struct with predicate
  * pushdown on the scan, batched `mapPartitions` with the same batch shape
  * `mapInPandas` would stream (iterator of fixed-size batches, one output
  * row per input row), and frame sampling via byte-range slicing.
  */
object Multimodal {

  /** `documents` lifted to a media table: payload = UTF-8 bytes of `text`
    * (stand-in for real image/audio bytes), metadata derived
    * deterministically so an oracle can recompute it. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
        (lit(16) + pmod(col("doc_id") * 7, lit(1008))).cast("int").as("width"),
        (lit(16) + pmod(col("doc_id") * 13, lit(752))).cast("int").as("height"))
        .as("meta"))

  /** Batched decode + feature extraction — the `mapInPandas` shape in
    * Scala: partitions stream through in `batchSize` groups so a decoder
    * amortizes setup per batch, and memory stays bounded by batch ×
    * payload size, not partition size.
    *
    * The decode path is REAL for the formats the JDK ships codecs for
    * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external libraries): a
    * payload ImageIO recognizes reports its ACTUAL pixel dimensions
    * (`decoder = "imageio"`), overriding whatever the metadata claimed —
    * exactly the ingest-validation use. Payloads no JDK codec recognizes
    * (video, audio, or this corpus's synthetic text bytes) fall back to
    * metadata passthrough with byte-level statistics only
    * (`decoder = "stub-v1"`) — the honest path for formats that would
    * need external codecs. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // in-memory byte streams: without this ImageIO spills a temp cache
      // file to disk PER DECODE — a silent IOPS tax at corpus scale
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val sum = m.payload.foldLeft(0L)((a, b) => a + (b & 0xFF))
          val mean =
            if (m.payload.length == 0) 0.0 else sum.toDouble / m.payload.length
          val decoded =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.payload)))
            catch { case _: Throwable => None } // truncated/corrupt payloads
          decoded match {
            case Some(img) =>
              MediaFeatures(m.doc_id, m.payload.length, sum, mean,
                img.getWidth, img.getHeight, "imageio")
            case None =>
              MediaFeatures(m.doc_id, m.payload.length, sum, mean,
                m.width, m.height, "stub-v1")
          }
        }
      }
    }
  }

  /** Frame sampling: every `stride`-th `frameBytes`-sized slice of the
    * payload — the byte-plumbing of video frame extraction. The slice is
    * computed AFTER the explode as a plain codegen'd substring + Filter:
    * a transform/filter HOF inside the Generate would evaluate its
    * lambdas interpreted per element (the Text.explodeTokens pitfall),
    * which is exactly wrong for a per-payload video hot path. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          floor((length(col("payload")) - 1) / lit(frameBytes * stride)).cast("int")))
          .as("frame_idx"))
      .withColumn("frame", substring(col("payload"),
        (col("frame_idx") * (frameBytes * stride) + 1).cast("int"),
        lit(frameBytes)))
      .filter(length(col("frame")) === frameBytes)
      .select("doc_id", "frame_idx", "frame")

  // --- q34_multimodal_meta: metadata-side query, pushdown-friendly --------
  // Filter + projection touch only metadata and payload length — at scale
  // the parquet reader never materializes payload bytes for pruned rows.
  def q34MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("meta.width") >= 256 && col("meta.mime") =!= "video/mp4")
      .select(
        col("doc_id"), col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        length(col("payload")).as("n_bytes"),
        (col("meta.width").cast("long") * col("meta.height")).as("n_pixels"))

  val q34MultimodalMetaSql: String = """
    WITH m AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image/png'
                             WHEN 1 THEN 'audio/wav'
                             ELSE 'video/mp4' END AS mime,
             CAST(16 + (doc_id * 7) % 1008 AS INT) AS width,
             CAST(16 + (doc_id * 13) % 752 AS INT) AS height,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes
      FROM documents)
    SELECT doc_id, mime, width, height, n_bytes,
           CAST(width AS BIGINT) * height AS n_pixels
    FROM m
    WHERE width >= 256 AND mime <> 'video/mp4'"""

  // --- q89_frame_sample: the binary payload path, byte-for-byte -----------
  /** [[sampleFrames]] oracled on the payload BYTES (q34 covers only the
    * metadata side): every 4th 32-byte frame of each payload, emitted as
    * uppercase hex so the DuckDB replay pins the slice arithmetic AND
    * every byte of every frame. Spark slices the actual BinaryType
    * payload; the oracle is byte-exact for ANY input (non-ASCII included):
    * DuckDB has no BLOB substring, so it hex-encodes the UTF-8 payload
    * once and slices 2-hex-char byte pairs — frame i is the 64-hex-char
    * window at byte offset i·stride·frameBytes, compared as hex directly
    * (both engines' `hex` is uppercase). */
  val q89FrameBytes = 32
  val q89Stride = 4

  def q89FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir).select(col("doc_id"), col("payload")),
        q89FrameBytes, q89Stride)
      .select(col("doc_id"), col("frame_idx"), hex(col("frame")).as("frame_hex"))

  val q89FrameSampleSql: String = {
    val step = q89FrameBytes * q89Stride
    s"""
    WITH d AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
    f AS (SELECT doc_id, CAST(r.i AS INT) AS frame_idx,
                 substring(h, CAST(r.i * $step * 2 + 1 AS BIGINT),
                           ${q89FrameBytes * 2}) AS fr
          FROM d, unnest(range(0, ((n - 1) // $step) + 1)) AS r(i))
    SELECT doc_id, frame_idx, fr AS frame_hex
    FROM f WHERE length(fr) = ${q89FrameBytes * 2}"""
  }

  // --- q160_ahash_neardup: perceptual average-hash near-dup ---------------
  /** 64-bit average-hash (aHash) over the payload bytes — the perceptual-
    * dedup primitive for image pipelines: resize to an 8×8 grid, threshold
    * each cell against the global mean, band the 64 bits, and pair-join on
    * matching bands. The "decode + resize" stage is the documented
    * deterministic stub (no codecs in this container): the payload
    * stretch-partitions into 64 contiguous byte slices — the box-resize
    * analogue — and a cell's bit is the EXACT integer comparison
    * `slice_sum · total_count ≥ total_sum · slice_count` (cell mean ≥
    * global byte mean with no division), so the DuckDB oracle replays it
    * integer-for-integer — byte-exact for ANY input: it walks
    * 2-hex-char pairs of `hex(encode(text))` (the q89 pattern), so
    * non-ASCII payloads replay their actual UTF-8 bytes. Slices that get
    * no bytes (payload < 64 bytes) stay 0.
    *
    * Banding: eight 8-bit blocks — hamming ≤ 7 pigeonholes at least one
    * exact block match, so every pair within the `maxHamming = 3` gate is
    * provably a candidate. Word-level text edits scatter byte alignment
    * far past the gate (measured: nearest non-planted candidate at
    * hamming 10 on this corpus), which is correct — aHash detects
    * PIXEL-level noise, not token edits; q31/q41/q156 own those. The
    * registered query therefore plants its own positives (the q128
    * derived-dirty-feed discipline): every document gets a byte-bumped
    * copy (+1 at positions ≡ 0 mod 17, id + 1 000 000), and the hash
    * compare certifies exactly the 500 planted pairs at distance ≤ 3 with
    * zero false positives.
    *
    * Scale shape: hashing is one `mapPartitions` pass (the batched-decode
    * plumbing), the candidate stage is the q41 block bucket join on
    * (blk, v) — 8 long rows per payload, never the bytes — and the
    * hamming gate unrolls to eight codegen'd xor/bit_count terms on the
    * candidate pairs only. */
  private[graft] def aHashOf(payload: Array[Byte]): Array[Long] = {
    val L = payload.length
    val blocks = new Array[Long](8)
    if (L == 0) return blocks
    val s = new Array[Long](64)
    val c = new Array[Long](64)
    var i = 0
    while (i < L) {
      val lane = ((i.toLong * 64) / L).toInt
      s(lane) += (payload(i) & 0xFF)
      c(lane) += 1
      i += 1
    }
    var ts = 0L
    var j = 0
    while (j < 64) { ts += s(j); j += 1 }
    j = 0
    while (j < 64) {
      if (c(j) > 0 && s(j) * L >= ts * c(j)) blocks(j / 8) |= (1L << (j % 8))
      j += 1
    }
    blocks
  }

  /** (doc_id, payload) → (doc_id, blocks: array of 8 byte-valued longs). */
  def aHashBlocks(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, aHashOf(p)) })
      .toDF("doc_id", "blocks")
  }

  /** Copy-id offset shared by [[withPerturbedCopies]]'s default and the
    * q160 oracle SQL — interpolated into both so they cannot drift. */
  val q160Shift = 1000000L

  /** Every document plus a byte-bumped copy (+1 at positions ≡ 0 mod 17,
    * id shifted) — the deterministic "noisy re-encode" feed. */
  def withPerturbedCopies(media: DataFrame, shift: Long = q160Shift): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val q = new Array[Byte](p.length)
        var i = 0
        while (i < p.length) {
          q(i) = (p(i) + (if (i % 17 == 0) 1 else 0)).toByte
          i += 1
        }
        Seq((id, p), (id + shift, q))
      }.toDF("doc_id", "payload")
  }

  def aHashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val wide = graft.CacheRegistry.persist(aHashBlocks(media))
    val banded = wide.select(col("doc_id"),
      posexplode(col("blocks")).as(Seq("blk", "v")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val ham = (0 until 8).map(b =>
        bit_count(element_at(col("ba"), b + 1)
          .bitwiseXOR(element_at(col("bb"), b + 1))))
      .reduce(_ + _)
    cand
      .join(wide.select(col("doc_id").as("id_a"), col("blocks").as("ba")),
        Seq("id_a"))
      .join(wide.select(col("doc_id").as("id_b"), col("blocks").as("bb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), ham.cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  def q160AHashNearDup(spark: SparkSession, dir: String): DataFrame =
    aHashPairs(withPerturbedCopies(
      mediaTable(spark, dir).select(col("doc_id"), col("payload"))))

  val q160AHashNearDupSql: String = s"""
    WITH t0 AS (SELECT doc_id, hex(encode(text)) AS h,
                       octet_length(encode(text)) AS len FROM documents),
    -- byte i decoded from its hex pair (no BLOB indexing in DuckDB);
    -- strpos over the hex alphabet is the pair → integer map
    ch0 AS (SELECT doc_id, (i * 64) // len AS lane,
                   (strpos('0123456789ABCDEF',
                      substring(h, CAST(i * 2 + 1 AS BIGINT), 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF',
                      substring(h, CAST(i * 2 + 2 AS BIGINT), 1)) - 1) AS code,
                   i
            FROM t0, unnest(range(0, len)) AS u(i)),
    -- % 256 replays the Scala side's byte wraparound ((0xFF + 1).toByte)
    ch AS (SELECT doc_id, lane, code FROM ch0
           UNION ALL
           SELECT doc_id + $q160Shift, lane,
                  (code + CASE WHEN i % 17 = 0 THEN 1 ELSE 0 END) % 256
           FROM ch0),
    px AS (SELECT doc_id, lane, SUM(code) AS s, COUNT(*) AS c
           FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(s) AS ts, SUM(c) AS tc FROM px GROUP BY 1),
    bits AS (SELECT p.doc_id, p.lane,
                    CASE WHEN p.s * t.tc >= t.ts * p.c THEN 1 ELSE 0 END AS bit
             FROM px p JOIN tot t USING (doc_id)),
    blk AS (SELECT doc_id, lane // 8 AS blk, SUM(bit * (1 << (lane % 8))) AS v
            FROM bits GROUP BY 1, 2),
    -- full doc universe + COALESCE to 0: lanes that receive no bytes
    -- (payload < 64 bytes) and docs with no bytes at all must replay the
    -- Scala side's zero blocks, not vanish as NULL/absent rows
    docs_u AS (SELECT doc_id FROM t0
               UNION ALL SELECT doc_id + $q160Shift FROM t0),
    wide AS (SELECT d.doc_id,
      COALESCE(MAX(CASE WHEN blk = 0 THEN v END), 0)::BIGINT AS v0,
      COALESCE(MAX(CASE WHEN blk = 1 THEN v END), 0)::BIGINT AS v1,
      COALESCE(MAX(CASE WHEN blk = 2 THEN v END), 0)::BIGINT AS v2,
      COALESCE(MAX(CASE WHEN blk = 3 THEN v END), 0)::BIGINT AS v3,
      COALESCE(MAX(CASE WHEN blk = 4 THEN v END), 0)::BIGINT AS v4,
      COALESCE(MAX(CASE WHEN blk = 5 THEN v END), 0)::BIGINT AS v5,
      COALESCE(MAX(CASE WHEN blk = 6 THEN v END), 0)::BIGINT AS v6,
      COALESCE(MAX(CASE WHEN blk = 7 THEN v END), 0)::BIGINT AS v7
      FROM docs_u d LEFT JOIN blk USING (doc_id) GROUP BY d.doc_id),
    -- band from the coalesced wide row (all 8 blocks, zeros included) so
    -- short/empty docs bucket on their zero blocks exactly like Scala
    bands AS (SELECT doc_id, u.b AS blk,
                     CASE u.b WHEN 0 THEN v0 WHEN 1 THEN v1 WHEN 2 THEN v2
                              WHEN 3 THEN v3 WHEN 4 THEN v4 WHEN 5 THEN v5
                              WHEN 6 THEN v6 ELSE v7 END AS v
              FROM wide, unnest(range(0, 8)) AS u(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.blk = b.blk AND a.v = b.v AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(a.v0, b.v0)) + bit_count(xor(a.v1, b.v1))
              + bit_count(xor(a.v2, b.v2)) + bit_count(xor(a.v3, b.v3))
              + bit_count(xor(a.v4, b.v4)) + bit_count(xor(a.v5, b.v5))
              + bit_count(xor(a.v6, b.v6)) + bit_count(xor(a.v7, b.v7))
             AS INT) AS hamming
    FROM cand c JOIN wide a ON a.doc_id = c.id_a
                JOIN wide b ON b.doc_id = c.id_b
    WHERE bit_count(xor(a.v0, b.v0)) + bit_count(xor(a.v1, b.v1))
        + bit_count(xor(a.v2, b.v2)) + bit_count(xor(a.v3, b.v3))
        + bit_count(xor(a.v4, b.v4)) + bit_count(xor(a.v5, b.v5))
        + bit_count(xor(a.v6, b.v6)) + bit_count(xor(a.v7, b.v7)) <= 3"""

  // --- q198_media_conformance: magic-byte sniff vs claimed mime -----------
  /** Ingest validation for binary payloads: does the payload's MAGIC
    * PREFIX match the mime the metadata claims? (PNG `89504E47`, WAV
    * `RIFF`, MP4 `ftyp` at offset 5.) A feed whose payloads don't sniff
    * as their claimed type is mislabeled, truncated, or adversarial —
    * the check runs BEFORE any decoder touches the bytes, on the raw
    * binary column, as pure codegen'd prefix work. Per claimed mime:
    * row count, sniff pass/fail, and byte-volume stats.
    *
    * On this synthetic corpus every payload is text bytes, so every
    * sniff honestly FAILS — the oracle pins that the comparisons are
    * byte-for-byte right, and the spec feeds real magic bytes to pin the
    * pass path. One scan, |mimes| output rows. */
  def mediaConformance(media: DataFrame): DataFrame = {
    val sniffOk = when(col("meta.mime") === "image/png",
        hex(substring(col("payload"), 1, 4)) === "89504E47")
      .when(col("meta.mime") === "audio/wav",
        hex(substring(col("payload"), 1, 4)) === "52494646")
      .when(col("meta.mime") === "video/mp4",
        hex(substring(col("payload"), 5, 4)) === "66747970")
      .otherwise(lit(false))
    media.select(col("meta.mime").as("mime"), sniffOk.as("ok"),
        length(col("payload")).as("b"))
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_sniff_ok"),
        min(col("b")).cast("long").as("min_bytes"),
        max(col("b")).cast("long").as("max_bytes"),
        sum(col("b")).cast("long").as("total_bytes"))
      .withColumn("n", col("n").cast("long"))
  }

  def q198MediaConformance(spark: SparkSession, dir: String): DataFrame =
    mediaConformance(mediaTable(spark, dir))

  val q198MediaConformanceSql: String = """
    WITH m AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image/png'
                             WHEN 1 THEN 'audio/wav'
                             ELSE 'video/mp4' END AS mime,
             text
      FROM documents),
    -- DuckDB has no BLOB substring; the corpus is ASCII, so byte i ==
    -- char i and slicing BEFORE encode() inspects the same prefix bytes
    s AS (SELECT mime, octet_length(encode(text)) AS b,
                 CASE mime
                   WHEN 'image/png' THEN
                     hex(encode(substring(text, 1, 4))) = '89504E47'
                   WHEN 'audio/wav' THEN
                     hex(encode(substring(text, 1, 4))) = '52494646'
                   ELSE hex(encode(substring(text, 5, 4))) = '66747970'
                 END AS ok
          FROM m)
    SELECT mime, COUNT(*) AS n,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_sniff_ok,
           CAST(MIN(b) AS BIGINT) AS min_bytes,
           CAST(MAX(b) AS BIGINT) AS max_bytes,
           CAST(SUM(b) AS BIGINT) AS total_bytes
    FROM s GROUP BY mime"""

  // --- q223_media_atscale: the batched typed decode path at 2^20 payloads -
  /** At-scale correctness coverage for [[extractFeatures]] — the typed
    * `mapPartitions` batch plumbing (encoder round-trip, `grouped(64)`
    * batching, per-payload ImageIO sniff, byte statistics) runs in the
    * registry only over the corpus-sized media table; this replays the
    * SAME entry point over 2²⁰ range-synthesized 80-byte payloads where
    * byte j of payload `id` is `(id + j) mod 256` — so every byte of
    * every payload is closed-form and the oracle replays the byte sums
    * per residue class (a 256-row precomputed run table) without ever
    * building a blob. No consecutive-value run matches a JDK codec
    * signature (PNG 89 50, JPEG FF D8, GIF 47 49, BMP 42 4D all need
    * non-consecutive byte pairs), so the ImageIO sniff deterministically
    * falls back to the stub on all 2²⁰ payloads — `n_stub` pins that the
    * decode ATTEMPT ran everywhere, `sum/min/max` of `byte_sum` pin the
    * per-byte arithmetic (ids in a bucket share `id mod 256`, so
    * min=max certifies per-residue uniformity), and `sum_width` pins the
    * metadata passthrough. [[sampleFrames]] needs no twin gate: it is
    * pure codegen'd explode+substring (scan-shaped) with a byte-exact
    * corpus oracle (q89).
    *
    * Generation note: the payload is built as a hex string via a
    * `transform` lambda (interpreted per element, 80×2²⁰ evals) — fine
    * for a gate generator, never on a corpus path. */
  private[graft] val q223Docs = 1L << 20
  private[graft] val q223PayloadLen = 80

  private[graft] def q223Media(spark: SparkSession,
                               docs: Long = q223Docs): Dataset[MediaRow] = {
    import spark.implicits._
    val hexStr = array_join(
      transform(sequence(lit(0), lit(q223PayloadLen - 1)),
        j => lpad(hex(pmod(col("id") + j, lit(256L))), 2, "0")), "")
    spark.range(docs).select(
      col("id").as("doc_id"),
      unhex(hexStr).as("payload"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("mime"),
      (lit(16) + pmod(col("id") * 7, lit(1008))).cast("int").as("width"),
      (lit(16) + pmod(col("id") * 13, lit(752))).cast("int").as("height"))
      .as[MediaRow]
  }

  def q223MediaAtScale(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(q223Media(spark)).toDF()
      .groupBy(pmod(col("doc_id"), lit(1024L)).as("gb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("decoder") === "stub-v1", 1L).otherwise(0L)).as("n_stub"),
        sum(col("byte_sum")).as("sum_bytes"),
        min(col("byte_sum")).as("min_bytes"),
        max(col("byte_sum")).as("max_bytes"),
        sum(col("n_bytes").cast("long")).as("sum_len"),
        sum(col("width").cast("long")).as("sum_width"))

  /** Closed form: byte_sum(id) = Σ_{j<80} (id+j) mod 256 depends only on
    * id mod 256; 1024 | 256·k so every bucket is one residue class. */
  val q223MediaAtScaleSql: String = s"""
    WITH s80 AS (
      SELECT r.r0 AS r0, SUM((r.r0 + k.i) % 256) AS s
      FROM unnest(range(0, 256)) r(r0),
           unnest(range(0, $q223PayloadLen)) k(i)
      GROUP BY 1),
    ids AS (SELECT CAST(u.i AS BIGINT) AS id
            FROM unnest(range(0, $q223Docs)) u(i)),
    f AS (SELECT id, id % 1024 AS gb, s80.s AS bs,
                 16 + (id * 7) % 1008 AS w
          FROM ids JOIN s80 ON s80.r0 = id % 256)
    SELECT CAST(gb AS BIGINT) AS gb, COUNT(*) AS n, COUNT(*) AS n_stub,
           CAST(SUM(bs) AS BIGINT) AS sum_bytes,
           CAST(MIN(bs) AS BIGINT) AS min_bytes,
           CAST(MAX(bs) AS BIGINT) AS max_bytes,
           CAST(COUNT(*) * $q223PayloadLen AS BIGINT) AS sum_len,
           CAST(SUM(w) AS BIGINT) AS sum_width
    FROM f GROUP BY 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_media_atscale"  -> q223MediaAtScale _,
    "q198_media_conformance" -> q198MediaConformance _,
    "q34_multimodal_meta" -> q34MultimodalMeta _,
    "q89_frame_sample"    -> q89FrameSample _,
    "q160_ahash_neardup"  -> q160AHashNearDup _,
  )

  def oracles: Map[String, String] = Map(
    "q223_media_atscale"  -> q223MediaAtScaleSql,
    "q198_media_conformance" -> q198MediaConformanceSql,
    "q34_multimodal_meta" -> q34MultimodalMetaSql,
    "q89_frame_sample"    -> q89FrameSampleSql,
    "q160_ahash_neardup"  -> q160AHashNearDupSql,
  )
}
