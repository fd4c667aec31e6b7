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
    * payload; the oracle slices the VARCHAR and then encodes — legal
    * because the corpus is pure ASCII (char == byte, the same documented
    * assumption the native text expressions make), and a divergence would
    * fail the hash loudly rather than silently. */
  val q89FrameBytes = 32
  val q89Stride = 4

  def q89FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir).select(col("doc_id"), col("payload")),
        q89FrameBytes, q89Stride)
      .select(col("doc_id"), col("frame_idx"), hex(col("frame")).as("frame_hex"))

  val q89FrameSampleSql: String = {
    val step = q89FrameBytes * q89Stride
    s"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    f AS (SELECT doc_id, CAST(r.i AS INT) AS frame_idx,
                 substring(text, CAST(r.i * $step + 1 AS BIGINT),
                           $q89FrameBytes) AS fr
          FROM d, unnest(range(0, ((n - 1) // $step) + 1)) AS r(i))
    SELECT doc_id, frame_idx, hex(encode(fr)) AS frame_hex
    FROM f WHERE length(fr) = $q89FrameBytes"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_multimodal_meta" -> q34MultimodalMeta _,
    "q89_frame_sample"    -> q89FrameSample _,
  )

  def oracles: Map[String, String] = Map(
    "q34_multimodal_meta" -> q34MultimodalMetaSql,
    "q89_frame_sample"    -> q89FrameSampleSql,
  )
}
