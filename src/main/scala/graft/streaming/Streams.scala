package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.11
  * — its pub/sub bus is control-plane, not a data stream), so this module
  * is headroom, not parity: event-time tumbling windows + watermarks over
  * the `events` table shape, written so the SAME transform serves batch
  * DataFrames and streaming sources (the transform inspects
  * `df.isStreaming` only to attach the watermark, which batch plans
  * reject).
  */
object Streams {

  /** Tumbling event-time window aggregation. On a streaming input a
    * 1-hour watermark bounds state: windows older than the watermark are
    * finalized and dropped from the store — without it, state grows
    * forever at 100 TB/day ingest. */
  def eventWindowAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    in.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Stream → transform → sink wiring: read a parquet directory as a
    * stream (one-file-per-trigger caps ingest), apply the windowed agg,
    * write to a sink. Returns the started query; caller owns lifecycle. */
  def streamEventCounts(spark: SparkSession, inputDir: String,
                        checkpointDir: String, outputTable: String) = {
    // the stream must read the RAW parquet schema (ts = nanos long, per the
    // nanosAsLong conf) and convert inside the stream, like Tables.events
    val raw = spark.read.parquet(s"$inputDir/events.parquet").schema
    val stream = spark.readStream
      .schema(raw)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inputDir/events*.parquet") // glob: file sources want a dir/glob
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    eventWindowAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(outputTable)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  // --- q40_event_window: the same aggregation, batch, oracled -------------
  def q40EventWindow(spark: SparkSession, dir: String): DataFrame =
    eventWindowAgg(Tables.events(spark, dir))

  val q40EventWindowSql: String = """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_event_window" -> q40EventWindow _,
  )

  def oracles: Map[String, String] = Map(
    "q40_event_window" -> q40EventWindowSql,
  )
}
