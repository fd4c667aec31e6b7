package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr, lit}
import graft.ops.Joins
import graft.streaming.Streams

class AsofSessionSpec extends GraftSuite {

  test("q267 small analog: the cohort matrix matches the closed-form " +
      "cells and raw triplication collapses") {
    val users = 4096L
    val perCohort = users / 8
    val expected = (0 until 8).flatMap { d =>
      Seq(0 -> 4L, 1 -> 2L, 7 -> 1L, 30 -> 1L).map { case (o, k) =>
        (d, o) -> k * perCohort / 4
      }
    }.toMap
    val got = graft.ops.Windows.q267RetentionAtScale0(spark, users)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected, {
      val d = (got.keySet ++ expected.keySet)
        .find(k => got.get(k) != expected.get(k))
      s"first diff at $d: got ${d.flatMap(got.get)}, " +
        s"want ${d.flatMap(expected.get)}"
    })
    // the raw frame really is triplicated + class-duplicated
    assert(graft.ops.Windows.q267Events(spark, 64L).count() == 64L * 9)
  }

  test("q267 synthetic corpus is at the claimed scale") {
    assert(graft.ops.Windows.q267Events(spark).count() == 9437184L)
  }
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFfill: per-key daily grid, zero-count gaps carry the last value") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0),
      (1L, ts("2024-01-01 14:00:00"), 1.0), // same bucket: sums to 3
      (1L, ts("2024-01-03 09:00:00"), 4.0), // day 2 is a gap
      (2L, ts("2024-01-05 00:00:00"), 7.0)) // single-day key: 1-cell grid
      .toDF("user_id", "ts", "value")
    val got = graft.ops.Windows.resampleFfill(ev, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      (1L, "2024-01-01", 2L, 3.0),
      (1L, "2024-01-02", 0L, 3.0), // gap: count 0, value carried forward
      (1L, "2024-01-03", 1L, 4.0),
      (2L, "2024-01-05", 1L, 7.0)))
    // a null timestamp must fail loudly, never silently drop the row
    val withNull = ev.unionByName(
      Seq((3L, null.asInstanceOf[Timestamp], 1.0)).toDF("user_id", "ts", "value"))
    val e = intercept[Exception](
      graft.ops.Windows.resampleFfill(withNull, "user_id", "ts", "value")
        .collect())
    assert(e.getMessage.contains("null timestamp")
      || e.getCause != null && e.getCause.getMessage.contains("null timestamp"))
  }

  test("resampleInterp: interior gaps take the exact linear interpolation") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-04 09:00:00"), 40.0),  // days 2, 3 are gaps → 20, 30
      (1L, ts("2024-01-05 01:00:00"), 35.0))  // observed beats interpolation
      .toDF("user_id", "ts", "value")
    val got = graft.ops.Windows.resampleInterp(ev, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSet
    assert(got == Set(
      ("2024-01-01", 1L, 10.0, false),
      ("2024-01-02", 0L, 20.0, true),
      ("2024-01-03", 0L, 30.0, true),
      ("2024-01-04", 1L, 40.0, false),
      ("2024-01-05", 1L, 35.0, false)), got.toString)
  }

  test("activityStreaks: islands collapse, duplicates ignored, tail streak") {
    // active days 1,2,3 | 5 | 7,8 → 6 active, 3 streaks, longest 3, tail 2
    val days = Seq(1, 1, 2, 3, 5, 7, 8) // day 1 twice: distinct must dedupe
    val ev = days.map(d =>
      (9L, ts(f"2024-01-${d}%02d 0$d:30:00"))).toDF("user_id", "ts")
    val got = graft.ops.Windows.activityStreaks(ev, "user_id", "ts").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((6L, 3L, 3L, 2L)), got.toSeq.toString)
  }

  test("rollingActiveUsers: trailing-7 distinct actives, window clipping") {
    // u1 active days 0 and 8; u2 active day 2.
    // day 0: dau 1 (u1), wau 1; day 2: dau 1 (u2), wau 2 (u1 covers 0..6);
    // day 7: dau 0, wau 1 (u2 covers 2..8); day 8: dau 1 (u1), wau 2
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 10:00:00"))).toDF("user_id", "ts")
    val got = graft.ops.Windows.rollingActiveUsers(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == (0L to 8L).toSet, got.toString) // clipped to span
    assert(got(0L) == ((1L, 1L)) && got(2L) == ((1L, 2L)), got.toString)
    assert(got(7L) == ((0L, 1L)) && got(8L) == ((1L, 2L)), got.toString)
  }

  test("decayTrendScore: exact binary weights relative to the newest day") {
    // a: day0 ×1, day1 ×2 → 2^19 + 2·2^20; b: day1 ×1 → 2^20.
    // shares are exactly 5/7 and 2/7 at 6 dp (half-up)
    val ev = Seq(
      ("a", ts("2024-01-01 08:00:00")), ("a", ts("2024-01-02 08:00:00")),
      ("a", ts("2024-01-02 09:00:00")), ("b", ts("2024-01-02 10:00:00")))
      .toDF("g", "ts")
    val got = graft.ops.Windows.decayTrendScore(ev, "g", "ts")
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("iscore"), r.getAs[Double]("share6")))).toMap
    assert(got("a") == (((1L << 19) + 2L * (1L << 20), 0.714286)), got.toString)
    assert(got("b") == (((1L << 20), 0.285714)), got.toString)
  }

  test("asOfJoin picks the latest preceding right row, inclusive, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))) // right rows only after this one
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 09:30:00"), 5.0),
      (102L, 10L, ts("2024-01-01 10:00:00"), 7.0), // same instant → inclusive
      (103L, 10L, ts("2024-01-01 11:00:00"), 9.0),
      (104L, 20L, ts("2024-01-01 09:30:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Joins.asOfJoin(left, right, key = "user_id", ts = "ts",
        tieBreak = "event_id", rightPayload = Seq("value"))
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(1L -> Some(7.0), 2L -> Some(9.0), 3L -> None))
  }

  test("sessionizeBatch splits on gaps and aggregates per session") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00")),
      (3L, 10L, ts("2024-01-01 11:30:00")), // > 30 min gap → new session
      (4L, 20L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = Streams.sessionizeBatch(ev, gapMinutes = 30)
      .select("user_id", "session_id", "n_events", "duration_us")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(out == Set(
      (10L, 1, 2, 600000000L), // 10:00–10:10
      (10L, 2, 1, 0L),
      (20L, 1, 1, 0L)))
  }

  test("streaming sessionize closed sessions match the batch form, ids included") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Timestamp)]
    val batch1 = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00")),
      (3L, 20L, ts("2024-01-01 10:05:00")))
    val batch2 = Seq(
      (4L, 10L, ts("2024-01-01 11:30:00")), // gap > 30 min closes 10's session
      (5L, 20L, ts("2024-01-01 10:20:00"))) // within gap, extends 20's session
    // arrives AFTER user 10's session 2 closed via timeout: the closed
    // sentinel must carry the sid counter so this becomes session 3, not 1
    val batch3 = Seq(
      (8L, 10L, ts("2024-01-02 13:00:00")))
    val q = Streams.sessionizeStream(
        ms.toDF().toDF("event_id", "user_id", "ts"), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sessions").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      // two far-future events: the first advances the watermark past every
      // open session's timeout, the second triggers the timeout sweep
      ms.addData(Seq((6L, 30L, ts("2024-01-02 10:00:00")))); q.processAllAvailable()
      ms.addData(Seq((7L, 30L, ts("2024-01-02 12:00:00")))); q.processAllAvailable()
      ms.addData(batch3); q.processAllAvailable()
      // second sweep pair closes user 10's post-timeout session 3
      ms.addData(Seq((9L, 30L, ts("2024-01-03 10:00:00")))); q.processAllAvailable()
      ms.addData(Seq((10L, 30L, ts("2024-01-03 12:00:00")))); q.processAllAvailable()
      val streamed = spark.table("graft_sessions")
        .select("user_id", "session_id", "session_start_us", "n_events", "duration_us")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
        .toSet
      val batchAll = Streams.sessionizeBatch(
          (batch1 ++ batch2 ++ batch3).toDF("event_id", "user_id", "ts"), gapMinutes = 30)
        .select("user_id", "session_id", "session_start_us", "n_events", "duration_us")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
        .toSet
      // every batch session — INCLUDING its 1..k session_id — is eventually
      // closed and emitted by the stream
      assert(batchAll.subsetOf(streamed),
        s"missing sessions: ${batchAll -- streamed}")
    } finally q.stop()
  }

  test("q206's timeout path is load-bearing: without the sweep probes the " +
      "final session wave stays unclosed") {
    // Replay q206_stream_atscale's wave structure at 64 users but STOP
    // after the four session waves — no far-future sweep batches. Sessions
    // 1–3 close via the in-function gap path when the next wave arrives;
    // session 4 has no later event and no watermark sweep, so it must NOT
    // be emitted. Together with q206's green oracle row (which includes
    // all 4096 session-4 rows) this proves those rows are produced by the
    // event-time timeout sweep, not the gap path.
    implicit val sqlCtx = spark.sqlContext
    val users = 64L
    val base = 1767225600000000L
    val ms = MemoryStream[(Long, Timestamp)]
    val q = Streams.sessionizeStream(
        ms.toDF().toDF("user_id", "ts"), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_q206_pin").start()
    try {
      for (s <- 0 until 4) {
        ms.addData(for {
          u <- 0L until users
          k <- 0 until 16
        } yield (u, new Timestamp((base + s * 3600000000L + k * 60000000L) / 1000L)))
        q.processAllAvailable()
      }
      val got = spark.table("graft_q206_pin")
        .groupBy("session_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == Map(1 -> users, 2 -> users, 3 -> users),
        s"expected exactly sessions 1-3 closed per user, got $got")
    } finally q.stop()
  }

  test("streaming dedup keeps first row per key across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.dedupStream(
        ms.toDF().toDF("event_id", "ts", "payload"), Seq("event_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup_stream").start()
    try {
      ms.addData(Seq(
        (1L, ts("2024-01-01 10:00:00"), "first"),
        (1L, ts("2024-01-01 10:00:01"), "dup-same-batch"),
        (2L, ts("2024-01-01 10:00:02"), "two")))
      q.processAllAvailable()
      ms.addData(Seq(
        (1L, ts("2024-01-01 10:05:00"), "dup-next-batch"),
        (3L, ts("2024-01-01 10:05:01"), "three")))
      q.processAllAvailable()
      val out = spark.table("graft_dedup_stream")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(out == Map(1L -> "first", 2L -> "two", 3L -> "three"))
    } finally q.stop()
  }

  test("streaming distinct actives equals batch COUNT(DISTINCT) per window") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val q = Streams.uniqueActivesPerWindow(ms.toDF().toDF("user_id", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_stream_actives").start()
    try {
      // hour 10: users {1, 2} with a same-hour duplicate of 1
      ms.addData(Seq((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:10:00")), (2L, ts("2024-01-01 10:20:00"))))
      q.processAllAvailable()
      // hour 11: users {1, 3} — user 1 again (distinct per-window, not
      // globally); then a sentinel far enough ahead to finalize both hours
      ms.addData(Seq((1L, ts("2024-01-01 10:30:00")),
        (3L, ts("2024-01-01 11:05:00")), (1L, ts("2024-01-01 11:10:00"))))
      q.processAllAvailable()
      ms.addData(Seq((99L, ts("2024-01-01 14:00:00"))))
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_actives")
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(streamed == Map(
        ts("2024-01-01 10:00:00") -> 2L, ts("2024-01-01 11:00:00") -> 2L),
        streamed.toString)
    } finally q.stop()
  }

  test("positionAttribution: U-shaped weights, lookback excludes stale touches") {
    val conv = Seq((100L, 1L, ts("2024-01-02 12:00:00")),
      (101L, 2L, ts("2024-01-02 12:00:00")),
      (102L, 3L, ts("2024-01-02 12:00:00"))).toDF("event_id", "user_id", "ts")
    val touch = Seq(
      // user 1: four touches, one outside the 24h lookback
      (10L, 1L, ts("2024-01-01 11:00:00")), // stale — excluded
      (11L, 1L, ts("2024-01-02 08:00:00")),
      (12L, 1L, ts("2024-01-02 09:00:00")),
      (13L, 1L, ts("2024-01-02 10:00:00")),
      // user 2: exactly two touches → 50/50
      (20L, 2L, ts("2024-01-02 08:00:00")),
      (21L, 2L, ts("2024-01-02 09:00:00"))).toDF("event_id", "user_id", "ts")
    val got = graft.ops.Joins.positionAttribution(conv, touch,
        "user_id", "ts", "event_id", 86400000000L)
      .collect()
      .map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("first_touch_id"),
          r.getAs[Long]("last_touch_id"), r.getAs[Double]("w_first6"),
          r.getAs[Double]("w_last6"), r.getAs[Double]("w_mid6")))).toMap
    assert(got == Map(
      100L -> ((3L, 11L, 13L, 0.4, 0.4, 0.2)), // 0.2/(3−2) per middle
      101L -> ((2L, 20L, 21L, 0.5, 0.5, 0.0))), got.toString)
    assert(!got.contains(102L), "zero-touch conversion must be absent")
  }

  test("sessionOutcomes: converted beats bounced; gap splits sessions") {
    val ev = Seq(
      // user 1, day 0: one-event purchase session → converted (not bounced)
      (1L, 1L, "purchase", ts("2024-01-01 10:00:00")),
      // user 1, later same day after >30min gap: two views → engaged
      (2L, 1L, "view", ts("2024-01-01 12:00:00")),
      (3L, 1L, "view", ts("2024-01-01 12:10:00")),
      // user 2, day 1: single view → bounced
      (4L, 2L, "view", ts("2024-01-02 09:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.streaming.Streams.sessionOutcomes(ev, gapMinutes = 30)
      .collect()
      .map(r => (r.getAs[Int]("day"), r.getAs[String]("outcome")) ->
        r.getAs[Long]("n_sessions")).toMap
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt
    assert(got == Map(
      (d0, "converted") -> 1L, (d0, "engaged") -> 1L,
      (d0 + 1, "bounced") -> 1L), got.toString)
  }

  test("diurnalProfile: peak hour with tie to the smallest hour") {
    val ev = Seq(
      ("a", ts("2024-01-01 09:10:00")), ("a", ts("2024-01-01 09:20:00")),
      ("a", ts("2024-01-02 14:00:00")), ("a", ts("2024-01-03 14:30:00")),
      ("a", ts("2024-01-01 03:00:00")), // hours 9 and 14 tie at 2 → pick 9
      ("b", ts("2024-01-01 23:00:00"))).toDF("g", "ts")
    val got = graft.ops.Windows.diurnalProfile(ev, "g", "ts")
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_total"), r.getAs[Int]("peak_hour"),
          r.getAs[Long]("peak_n"), r.getAs[Double]("peak_share6")))).toMap
    assert(got("a") == ((5L, 9, 2L, 0.4)), got.toString)
    assert(got("b") == ((1L, 23, 1L, 1.0)), got.toString)
  }

  test("funnelLatencyQuartiles: positional ranks over converted entities") {
    // four converted users with latencies 10, 20, 30, 40 minutes (µs):
    // ranks ⌈n·p/100⌉ for n=4 → p25@1, p50@2, p75@3, p90@4
    val ev = (1 to 4).flatMap { u =>
      Seq((u.toLong, "view", ts("2024-01-01 10:00:00")),
        (u.toLong, "click", ts("2024-01-01 10:01:00")),
        (u.toLong, "purchase", ts(f"2024-01-01 10:${10 * u}%02d:00")))
    } ++ Seq((9L, "view", ts("2024-01-01 10:00:00"))) // non-entrant
    val r = graft.ops.Windows.funnelLatencyQuartiles(
      ev.toDF("user_id", "event_type", "ts"), "user_id", "event_type",
      "ts", Seq("view", "click", "purchase")).collect().head
    val m = 60L * 1000000L
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 10 * m, 20 * m, 30 * m, 40 * m)), r.toString)
  }

  test("interArrivalProfile: per-entity successor gaps, positional quantiles") {
    // type a, user 1: gaps 60s, 120s; user 2 contributes one 60s gap →
    // gaps [60, 60, 120]s: p50 rank ⌈1.5⌉=2 → 60s, p90 rank ⌈2.7⌉=3 → 120s
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "a", ts("2024-01-01 10:01:00")),
      (3L, 1L, "a", ts("2024-01-01 10:03:00")),
      (4L, 2L, "a", ts("2024-01-01 12:00:00")),
      (5L, 2L, "a", ts("2024-01-01 12:01:00")),
      (6L, 3L, "b", ts("2024-01-01 09:00:00"))) // single event → no gap
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.ops.Windows
      .interArrivalProfile(ev, "user_id", "event_type", "ts")
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("p50_us"),
          r.getAs[Long]("p90_us")))).toMap
    val m = 60L * 1000000L
    assert(got == Map("a" -> ((3L, m, 2 * m))), got.toString)
  }

  test("q46 exact percentiles are ordered and grouped correctly") {
    val rows = graft.ops.Relational.q46Percentiles(spark, sf).collect()
    assert(rows.length == 3) // A, N, R
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("funnel enforces strict step order and drops non-entrants") {
    import java.sql.Timestamp
    def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val events = Seq(
      // user 1: click@5 precedes the first view → ignored; purchase@15
      // precedes the qualifying click@20 → ignored; completes at 10/20/30
      (1L, "click", ts(5)), (1L, "view", ts(10)), (1L, "purchase", ts(15)),
      (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2 enters but never clicks
      (2L, "view", ts(10)),
      // user 3 never views → not in the funnel at all
      (3L, "click", ts(5)), (3L, "purchase", ts(6)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.ops.Windows.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4))).toMap
    val us = 1000000L
    assert(got == Map(
      1L -> ((10 * us, 20 * us, 30 * us, 3)),
      2L -> ((10 * us, -1L, -1L, 1))))
  }

  test("q248 small analog: every planted class funnels to its closed-form " +
      "depth; the reversed-order class scores 1, the viewless class is absent") {
    val base = 1700000000000000L
    val got = graft.ops.Windows.funnel(
        graft.ops.Windows.q248Events(spark, 64L), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))).toMap
    assert(got.size == 56, s"expected 7 of 8 classes present: ${got.size}")
    (0L until 64L).foreach { u =>
      val t0 = base + u * 1000L
      u % 8 match {
        case 7 => assert(!got.contains(u), s"viewless user $u entered")
        case 3 => assert(got(u) == ((t0 + 2, -1L, -1L, 1)),
          s"reversed-order user $u: ${got(u)}")
        case 2 | 6 => assert(got(u) == ((t0, -1L, -1L, 1)), s"user $u")
        case 1 | 5 => // the click AT t0 must not count; the t0+1 click does
          assert(got(u) == ((t0, t0 + 1, -1L, 2)), s"strictness user $u")
        case _ => assert(got(u) == ((t0, t0 + 1, t0 + 2, 3)), s"user $u")
      }
    }
  }

  test("q248 synthetic event stream is at the claimed scale") {
    // classes 0/4: 3 events, 1/5: 3, 2/6: 1, 3: 3, 7: 2 → 19 per 8 users
    assert(graft.ops.Windows.q248Events(spark).count() ==
      (1L << 20) / 8 * 19)
  }

  test("retention matrix: cohorts from first-seen day, cells count distinct active users") {
    val ev = Seq(
      // user 1: cohort day 0, active days 0 and 2 (two events on day 2
      // must count once)
      (1L, ts("1970-01-01 08:00:00")),
      (1L, ts("1970-01-03 09:00:00")),
      (1L, ts("1970-01-03 22:00:00")),
      // user 2: same cohort day 0, active day 0 only
      (2L, ts("1970-01-01 23:59:59")),
      // user 3: cohort day 2, active days 2 and 3
      (3L, ts("1970-01-03 01:00:00")),
      (3L, ts("1970-01-04 01:00:00")))
      .toDF("user_id", "ts")
    val got = graft.ops.Windows.retentionMatrix(ev, "user_id", "ts")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0, 0) -> 2L, // users 1 and 2 on their cohort day
      (0, 2) -> 1L, // user 1 returns on day 2
      (2, 0) -> 1L, // user 3's cohort day
      (2, 1) -> 1L)) // user 3 returns next day
  }

  test("attribution: within-window click attributes, stale or missing click does not") {
    val ev = Seq(
      // user 1: click 2h before purchase -> attributed
      (10L, 1L, ts("2024-01-05 08:00:00"), "click", 0.0),
      (11L, 1L, ts("2024-01-05 10:00:00"), "purchase", 50.0),
      // user 2: click 3 DAYS before purchase -> asof matches, window rejects
      (20L, 2L, ts("2024-01-02 10:00:00"), "click", 0.0),
      (21L, 2L, ts("2024-01-05 10:00:00"), "purchase", 70.0),
      // user 3: no click at all -> asof null, unattributed
      (30L, 3L, ts("2024-01-05 12:00:00"), "purchase", 90.0),
      // user 4: click AFTER the purchase must not attribute
      (40L, 4L, ts("2024-01-05 13:00:00"), "purchase", 11.0),
      (41L, 4L, ts("2024-01-05 14:00:00"), "click", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    // shim matching the Tables.events on-disk contract: ts is an
    // epoch-NANOS long column (the loader divides to µs)
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    ev.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.Joins.q108Attribution(spark, dir)
      .collect().map(r => (r.getInt(0), r.getBoolean(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val day = 19727 // 2024-01-05 as epoch days
    assert(got == Map(
      (day, true) -> ((1L, 50.0)),
      (day, false) -> ((3L, 171.0))))
  }

  test("streaming funnel's final state matches the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams
    val ms = MemoryStream[(Long, Timestamp, String)]
    // batch 1 arrives internally out of order (the sort-repair path) and
    // carries a pre-view click that must not bind step 2
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:20:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"))
    val batch2 = Seq(
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      (3L, ts("2024-01-01 12:00:00"), "purchase")) // never views: no row
    val q = Streams.funnelStream(
        ms.toDF().toDF("user_id", "ts", "event_type"),
        ("view", "click", "purchase"))
      .writeStream.outputMode("update").format("memory")
      .queryName("graft_funnel").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      // latest emitted row per user = the funnel position
      val streamed = spark.table("graft_funnel").collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
        // rows are monotone per user, so the max (steps, t3, t2, t1) row
        // IS the latest state — no reliance on memory-sink row order
        .groupBy(_._1).view
        .mapValues(_.map(_._2).maxBy(v => (v._4, v._3, v._2, v._1))).toMap
      val batchGot = graft.ops.Windows.funnel(
          (batch1 ++ batch2).toDF("user_id", "ts", "event_type")
            .select(col("user_id"), col("event_type"), col("ts")),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
        .toMap
      assert(streamed == batchGot)
      assert(!streamed.contains(3L))
    } finally q.stop()
  }

  test("anomalyStream equals the batch rollingAnomaly across microbatches") {
    import java.sql.Timestamp
    import graft.ops.Windows
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    // two users, values with a spike; split across batches in event order
    val all = (1 to 12).map(i =>
      (1L, ts(i * 10L), i.toLong, if (i == 11) 500.0 else 10.0 + (i % 3))) ++
      (1 to 7).map(i => (2L, ts(i * 10L), (100 + i).toLong, i * 2.0))
    val ms = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = Streams.anomalyStream(
        ms.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_anomaly_stream").start()
    try {
      val (b1, b2) = all.sortBy(_._2.getTime).splitAt(9)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val streamed = spark.table("graft_anomaly_stream")
        .collect().map(r => r.getLong(1) -> ((
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
      val batch = Windows.rollingAnomaly(
          all.toDF("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value")
        .collect().map(r => r.getLong(1) -> ((
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (eid, (sz, sf_)) =>
        val (bz, bf) = batch(eid)
        assert(sf_ == bf, s"flag mismatch at $eid")
        (sz, bz) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-12, s"$eid: $a vs $b")
          case (a, b) => assert(a == b, s"$eid: $a vs $b")
        }
      }
      // the planted spike actually fires somewhere
      assert(streamed.values.exists(_._2.contains(true)), "no anomaly fired")
    } finally q.stop()
  }

  test("rollingAnomaly: hand-computed z on a planted spike, NULL below minN") {
    import java.sql.Timestamp
    import graft.ops.Windows
    def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    // user 1: varied history then a spike; user 2: too short for a score;
    // user 3: constant history → zero variance → NULL, never ±∞
    val hist = Seq(10.0, 12.0, 14.0, 10.0, 12.0)
    val events = (hist.zipWithIndex.map { case (v, i) =>
      (1L, ts((i + 1) * 10L), (i + 1).toLong, v) } :+
      ((1L, ts(60L), 6L, 30.0)) :+ ((2L, ts(10L), 7L, 5.0)) :+
      ((3L, ts(10L), 8L, 4.0)) :+ ((3L, ts(20L), 9L, 4.0)) :+
      ((3L, ts(30L), 10L, 4.0)) :+ ((3L, ts(40L), 11L, 4.0)) :+
      ((3L, ts(50L), 12L, 4.0)) :+ ((3L, ts(60L), 13L, 4.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Windows.rollingAnomaly(events, "user_id", "ts", "event_id",
        "value")
      .collect().map(r => r.getLong(1) -> ((
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
    // events 1-5: preceding history shorter than minN → NULL
    (1L to 5L).foreach(e => assert(got(e) == ((None, None)), s"event $e"))
    assert(got(7L) == ((None, None)))
    // user 3's sixth event has a full 5-row history of variance zero
    (8L to 13L).foreach(e => assert(got(e) == ((None, None)), s"event $e"))
    // event 6 scores against its five predecessors only
    val (zOpt, flag) = got(6L)
    val mean = hist.sum / 5
    val varr = hist.map(v => v * v).sum / 5 - mean * mean
    val z = (30.0 - mean) / math.sqrt(varr)
    assert(zOpt.exists(v => math.abs(v - z) < 1e-9), s"$zOpt vs $z")
    assert(flag.contains(true), "a 12-sigma spike must flag")
  }

  test("transitionMatrix counts successors per entity with exact ratios") {
    // user 1: A→B→A (transitions A→B, B→A); user 2: B→A.
    // totals: from A = 1, from B = 2
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:01"), "A", 1L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:02"), "B", 2L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:03"), "A", 3L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:01"), "B", 4L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:02"), "A", 5L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.ops.Windows
      .transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p6"))))
      .toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 1.0)),
      ("B", "A") -> ((2L, 1.0))))
    // same-timestamp events fall back to the tiebreak column: 10(A) then
    // 11(B) must read A→B, not B→A
    val tie = Seq(
      (9L, Timestamp.valueOf("2024-01-01 00:00:01"), "B", 11L),
      (9L, Timestamp.valueOf("2024-01-01 00:00:01"), "A", 10L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got2 = graft.ops.Windows
      .transitionMatrix(tie, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got2 == Set(("A", "B")))
  }
}
