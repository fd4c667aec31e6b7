package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader contract: both `ts` physical vintages normalize to the same
  * instant, and schema drift fails with ONE clear message at load time
  * (round-6 lesson: a silent testdata regeneration surfaced as 16
  * query-shaped DATATYPE_MISMATCH stack traces instead). */
class TablesSpec extends GraftSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("events loads from driver testdata with ts as TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }

  test("both ts vintages (INT64-nanos, TIMESTAMP_MICROS ntz) yield identical instants") {
    import spark.implicits._
    val dir = tmp("graft_ts_vintage")
    // one known instant: 2026-01-02 03:04:05.123456 UTC
    val micros = 1767323045123456L
    // legacy vintage: plain INT64 column holding nanos (what nanosAsLong
    // handed the old TIMESTAMP(NANOS) files to us as)
    Seq((1L, micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/legacy/events.parquet")
    // current vintage: TIMESTAMP_NTZ micros (what Spark 4 reads the
    // regenerated isAdjustedToUTC=false TIMESTAMP_MICROS files as)
    Seq((1L, java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, ((micros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")

    def instant(vintage: String): Long = {
      val df = Tables.normalizeEventTs(
        spark.read.parquet(s"$dir/$vintage/events.parquet"))
      assert(df.schema("ts").dataType == TimestampType)
      df.select(unix_micros(col("ts"))).as[Long].head()
    }
    assert(instant("legacy") == micros)
    assert(instant("ntz") == micros)
  }

  test("ts already TimestampType passes through unchanged") {
    import spark.implicits._
    val df = Seq((1L, new java.sql.Timestamp(1700000000000L)))
      .toDF("event_id", "ts")
    assert(Tables.normalizeEventTs(df) eq df)
  }

  test("unknown ts vintage fails with a message naming the column") {
    import spark.implicits._
    val df = Seq((1L, "2026-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(df))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("StringType"))
  }

  test("schema sentinel fires on a drifted parquet, naming table and columns") {
    import spark.implicits._
    val dir = tmp("graft_drift")
    // 'documents' missing text/lang/source/n_chars
    Seq((1L, "x")).toDF("doc_id", "body")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](
      Tables(spark, dir, "documents"))
    assert(e.getMessage.contains("documents"))
    assert(e.getMessage.contains("text"))
    assert(e.getMessage.contains("schema drift"))
  }

  test("all ten driver tables pass the sentinel at sf0.001") {
    Tables.names.foreach { n =>
      assert(Tables(spark, sf, n).columns.nonEmpty, n)
    }
  }

  test("events instants are session-timezone independent (NTZ vintage)") {
    // a caller-built session in another zone must read the SAME instants
    // — java.sql.Timestamp compares by epoch, so equal sets ⇔ equal
    // instants regardless of each session's rendering
    val other = spark.newSession()
    other.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    val utc = Tables.events(spark, sf)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val la = Tables.events(other, sf)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(la == utc, "events.ts shifted under a non-UTC session")
  }
}
