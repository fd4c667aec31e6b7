package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Sink
import graft.streaming.Streams

class SinkStreamSpec extends GraftSuite {
  import spark.implicits._

  test("parquet sink round-trips with partitioning") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = Tables.nation(spark, sf)
    Sink.writeParquet(df, s"$out/nation", partitionBy = Seq("n_regionkey"))
    val back = spark.read.parquet(s"$out/nation")
    assert(back.count() == df.count())
    assert(back.select(sum("n_nationkey")).head().getLong(0) ==
      df.select(sum("n_nationkey")).head().getLong(0))
    // partition pruning: one region reads a subdirectory only
    val one = spark.read.parquet(s"$out/nation").filter(col("n_regionkey") === 0)
    assert(one.count() == df.filter(col("n_regionkey") === 0).count())
  }

  test("csv sink round-trips") {
    val out = Files.createTempDirectory("graft_sink_csv").toString
    val df = Tables.region(spark, sf).select("r_regionkey", "r_name")
    Sink.writeCsv(df, s"$out/region")
    val back = spark.read.option("header", "true").csv(s"$out/region")
    assert(back.count() == df.count())
  }

  test("kv text sink writes the reference's k,v line format") {
    val out = Files.createTempDirectory("graft_sink_kv").toString
    val df = Seq(("alpha", 3L), ("beta", 5L)).toDF("k", "v")
    Sink.writeKvText(df, "k", "v", s"$out/kv")
    val lines = spark.read.textFile(s"$out/kv").collect().sorted
    assert(lines.toSeq == Seq("alpha,3", "beta,5"))
  }

  test("k,json round-trips through the reference's shuffle-run format") {
    val out = Files.createTempDirectory("graft_kv_rt").toString
    val df = Seq(("alpha", Seq("x", "y")), ("beta", Seq("z")))
      .toDF("k", "values")
      .select(col("k"), to_json(col("values")).as("v"))
    Sink.writeKvText(df, "k", "v", s"$out/kv")
    val back = Sink.readKvText(spark, s"$out/kv")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(back == Map("alpha" -> Seq("x", "y"), "beta" -> Seq("z")))
  }

  test("compaction shrinks file count, preserves rows, refuses in-place") {
    val base = Files.createTempDirectory("graft_compact").toString
    val docs = Tables.documents(spark, sf)
    docs.repartition(32).write.mode("overwrite").parquet(s"$base/in")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts(s"$base/in") == 32)
    Sink.compact(spark, s"$base/in", s"$base/out",
      targetFileBytes = 64L << 20) // everything fits one target file
    assert(parts(s"$base/out") == 1, "should compact to a single file")
    assert(spark.read.parquet(s"$base/out").count() == docs.count())
    intercept[IllegalArgumentException](
      Sink.compact(spark, s"$base/in", s"$base/in"))
  }

  test("versioned parquet reads across schema evolution (mergeSchema)") {
    // corpus v2 adds a column; a merged read sees the union schema with
    // nulls for v1 rows — the read-side half of the versioning story
    val base = Files.createTempDirectory("graft_schema").toString
    Seq((1L, "a")).toDF("id", "text").write.parquet(s"$base/t/v=1")
    Seq((2L, "b", 0.9)).toDF("id", "text", "quality")
      .write.parquet(s"$base/t/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
    assert(merged.columns.toSet == Set("id", "text", "quality", "v"))
    val byId = merged.collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("quality"))).toMap
    assert(byId(1L).isEmpty && byId(2L).contains(0.9))
  }

  test("jsonl sink round-trips hostile text exactly") {
    val out = Files.createTempDirectory("graft_jsonl").toString
    val df = Seq(
      (1L, "plain ascii"),
      (2L, "line\nbreak and\ttab"),
      (3L, "quote\" backslash\\ slash/"),
      (4L, "unicode 中文 café é and control \u0001\u001f"),
      (5L, "{\"looks\":\"like json\"}"))
      .toDF("id", "text")
    Sink.writeJsonl(df, s"$out/docs")
    val back = Sink.readJsonl(spark, s"$out/docs", df.schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == df.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("streaming upsert sink folds micro-batches into the batch merge result") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)] // (id, v, ver)
    val target = Files.createTempDirectory("graft_upsert").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    val q = Streams.upsertSink(ms.toDF().toDF("id", "v", "ver"),
      target, Seq("id"), "ver", ckpt)
    try {
      ms.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      // 2 updated; 3 arrives twice in ONE batch — highest ver must win
      ms.addData((2L, "b2", 2L), (3L, "c", 2L), (3L, "c2", 3L))
      q.processAllAvailable()
      val state = Streams.currentUpsertState(spark, target)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(state == Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c2", 3L)))
    } finally q.stop()
  }

  test("streaming tumbling-window agg matches the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val data = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 10:30:00"), "view", 8.0))
    ms.addData(data)
    val q = Streams.eventWindowAgg(ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_stream_agg").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_agg")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Streams.eventWindowAgg(data.toDF("ts", "event_type", "value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(batch.size == 3) // 10h click ×2, 11h click, 10h view
    } finally q.stop()
  }

  test("file-stream wiring: current state of the update log matches batch") {
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q = Streams.streamEventCounts(spark, sf, ckpt, "graft_file_stream")
    try {
      q.processAllAvailable()
      val streamed = Streams.currentEventCounts(spark, "graft_file_stream")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = Streams.eventWindowAgg(Tables.events(spark, sf))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val lData = Seq((1L, 10L, ts("2024-01-01 10:00:00")),
                    (2L, 10L, ts("2024-01-01 11:00:00")),
                    (3L, 20L, ts("2024-01-01 10:00:00")))
    val rData = Seq((101L, 10L, ts("2024-01-01 10:05:00")), // joins 1
                    (102L, 10L, ts("2024-01-01 10:30:00")), // > 10 min: joins none
                    (103L, 20L, ts("2024-01-01 10:01:00"))) // joins 3
    val lms = MemoryStream[(Long, Long, Timestamp)]
    val rms = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.intervalJoin(
        lms.toDF().toDF("event_id", "user_id", "ts"),
        rms.toDF().toDF("event_id", "user_id", "ts"),
        key = "user_id")
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("graft_ss_join").start()
    try {
      lms.addData(lData); rms.addData(rData)
      q.processAllAvailable()
      val streamed = spark.table("graft_ss_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Streams.intervalJoin(
          lData.toDF("event_id", "user_id", "ts"),
          rData.toDF("event_id", "user_id", "ts"),
          key = "user_id")
        .select(col("l.event_id"), col("r.event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(batch == Set((1L, 101L), (3L, 103L)))
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join") {
    // the streaming side of the broadcast-dim pattern: a static dim joined
    // into a stream is re-planned per micro-batch with the batch
    // optimizer's broadcast decision — no state store involved, so it is
    // the cheapest streaming enrich there is
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold"))
      .toDF("tier_id", "tier")
    val ms = MemoryStream[(Long, Double)]
    val data = Seq((10L, 5.0), (11L, 7.0), (12L, 9.0), (13L, 11.0))
    ms.addData(data)
    def enrich(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("tier_id", pmod(col("user_id"), lit(3L)))
        .join(broadcast(dim), "tier_id")
        .select(col("user_id"), col("tier"), col("value"))
    val q = enrich(ms.toDF().toDF("user_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_enrich").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_enrich").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val batch = enrich(data.toDF("user_id", "value")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(streamed == batch)
      assert(batch == Set((10L, "silver", 5.0), (11L, "gold", 7.0),
        (12L, "bronze", 9.0), (13L, "silver", 11.0)))
    } finally q.stop()
  }

  test("q154 outerIntervalJoin: unmatched left rows emit null-padded after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ml = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val mr = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def named(ms: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      ms.toDF().toDF("event_id", "user_id", "ts")
    val q = Streams.outerIntervalJoin(named(ml), named(mr), "user_id")
      .select(col("l.event_id").as("click"), col("r.event_id").as("buy"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_outer_join").start()
    try {
      // user 1 converts at +5min; user 2's click has no purchase
      ml.addData(Seq((100L, 1L, at(0)), (200L, 2L, at(0))))
      mr.addData(Seq((900L, 1L, at(5))))
      q.processAllAvailable()
      // the unmatched click CANNOT have been emitted yet — its window is
      // still open until the watermark passes +10min
      val early = spark.table("graft_outer_join").collect()
        .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("buy")))).toSet
      assert(!early.contains((200L, None)), s"premature unmatched emit: $early")
      // advance BOTH watermarks far past the window end → null-padded emit
      ml.addData(Seq((101L, 9L, at(180))))
      mr.addData(Seq((901L, 8L, at(180))))
      q.processAllAvailable()
      val rows = spark.table("graft_outer_join").collect()
        .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("buy")))).toSet
      assert(rows.contains((100L, Some(900L))), s"matched pair missing: $rows")
      assert(rows.contains((200L, None)), s"unmatched click not emitted: $rows")
    } finally q.stop()
  }

  test("q151 enrichedWindowAgg: streaming run matches the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dim = Seq((0L, "ZERO"), (1L, "ONE"), (3L, "THREE"))
      .toDF("n_nationkey", "n_name")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // users 25,26 → nations 0,1; user 2 → no dim row (inner join drops)
    val data = Seq((25L, at(0), 1.0), (26L, at(5), 2.0),
      (25L, at(70), 4.0), (2L, at(10), 8.0))
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    ms.addData(data)
    val q = Streams.enrichedWindowAgg(
        ms.toDF().toDF("user_id", "ts", "value"), dim)
      .writeStream.outputMode("update").format("memory")
      .queryName("graft_enrich_win").start()
    try {
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val streamed = canon(spark.table("graft_enrich_win"))
      val batch = canon(Streams.enrichedWindowAgg(
        data.toDF("user_id", "ts", "value"), dim))
      assert(streamed == batch)
      // both 10h events land in the 10:00 window; the 11:10 event in the
      // 11:00 window; user 2 dropped by the inner dim join
      assert(batch == Set((at(0), "ZERO", 1L, 1.0), (at(0), "ONE", 1L, 2.0),
        (at(60), "ZERO", 1L, 4.0)))
    } finally q.stop()
  }

  /** q214 pin, small analog (8 users × 3 waves): the streaming left-outer
    * interval join must produce the closed form — u≡0 matches at exactly
    * t0 (inclusive lower bound), u≡2 at exactly t0+10min (inclusive upper
    * bound), u≡1 (purchase in-state but outside the window) and u≡3 (no
    * purchase) emit null-padded. The no-sweep replay proves the WATERMARK
    * EVICTION produces the last wave's null rows: without the far-future
    * batch the final wave's unmatched clicks are still held in state
    * (their join windows end exactly AT the watermark, not before it),
    * so exactly those rows are absent — the q206-style proof chain that
    * the sweep path, not some earlier batch, emits them. */
  test("q214 small analog: stream-stream outer join closed form; no-sweep replay holds back the last wave") {
    val users = 8L
    val waves = 3
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("buy_us")).map(_.toLong))).toSet
    val base = 1767225600000000L
    val expected = (for {
      u <- 0L until users
      w <- 0 until waves
    } yield {
      val t0 = base + w * 3600000000L
      val buy = (u % 4) match {
        case 0 => Some(t0)
        case 2 => Some(t0 + 600000000L)
        case _ => None
      }
      (u, t0, buy)
    }).toSet
    val full = rows(Streams.q214Run(spark, users, waves, sweep = true))
    assert(full == expected,
      s"diff: ${(full -- expected).take(3)} / ${(expected -- full).take(3)}")
    val noSweep = rows(Streams.q214Run(spark, users, waves, sweep = false))
    val lastT0 = base + (waves - 1) * 3600000000L
    val heldBack = expected.filter { case (u, t0, buy) =>
      t0 == lastT0 && buy.isEmpty }
    assert(noSweep == expected -- heldBack,
      s"no-sweep replay: diff ${(noSweep -- (expected -- heldBack)).take(3)} / " +
        s"${((expected -- heldBack) -- noSweep).take(3)}")
  }

  /** q224's two output-invisible claims, pinned observably: (a) the
    * closed form — one surviving row per (user, wave) through in-batch
    * dedup, state-hit replays, and the late filter; (b) EVICTION — the
    * dedup state store must hold exactly one wave's keys after every
    * batch (an unbounded-state dedup returns the same ROWS, so only the
    * progress API can distinguish it — `numRowsTotal` would read w·users
    * instead of users). */
  test("q224 small analog: streaming dedup closed form + state store " +
      "holds exactly one wave's keys after every batch") {
    val users = 8L
    val waves = 4
    val base = 1767225600000000L
    val (df, stateRows) = Streams.q224Run(spark, users, waves)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      u <- 0L until users
      w <- 0 until waves
    } yield (u, base + w * 3600000000L)).toSet
    assert(got == expected,
      s"diff: ${(got -- expected).take(3)} / ${(expected -- got).take(3)}")
    assert(stateRows.length == waves)
    stateRows.zipWithIndex.foreach { case (n, w) =>
      assert(n == users,
        s"after batch $w the dedup state holds $n rows, expected $users " +
          "(eviction regressed — state is accumulating across waves)")
    }
  }

  test("q233 small analog: session-window streaming closed form; the " +
      "no-sweep replay leaves the last wave unemitted") {
    val users = 8L
    val waves = 4
    val base = 1767225600000000L
    val (df, stateRows) = Streams.q233Run(spark, users, waves)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val waveRows = (for {
      u <- 0L until users
      w <- 0 until waves
    } yield (u, base + w * 3600000000L, 16, 900000000L)).toSet
    val expected = waveRows + ((users, base + 172800000000L, 1, 0L))
    assert(got == expected,
      s"diff: ${(got -- expected).take(3)} / ${(expected -- got).take(3)}")
    // Eviction cadence, pinned via the progress API (output-invisible
    // otherwise): after every wave half-batch the store holds exactly one
    // OPEN session per user (the previous wave's evicted as it emitted);
    // after each probe batch exactly the sweep user's open session — the
    // "1" after the late batch also proves the below-watermark event
    // created no state row on its way to being dropped.
    assert(stateRows ==
      List.fill(2 * waves)(users) ++ List(1L, 1L, 1L),
      s"state cadence regressed: $stateRows")
    // without the sweep, waves 0..2 close on the next wave's watermark but
    // wave 3's sessions are still open state — eviction is the probes' doing
    val (df2, _) = Streams.q233Run(spark, users, waves, sweep = false)
    val got2 = df2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val expected2 = (for {
      u <- 0L until users
      w <- 0 until waves - 1
    } yield (u, base + w * 3600000000L, 16, 900000000L)).toSet
    assert(got2 == expected2,
      s"diff: ${(got2 -- expected2).take(3)} / ${(expected2 -- got2).take(3)}")
  }

  test("mergeSchema read unions drifted parquet schemas by NAME, not position") {
    val out = Files.createTempDirectory("graft_merge").toString
    // wave 1 and wave 2 share only `id`; column ORDER deliberately differs
    // so a positional union would scramble
    Seq((1L, "a")).toDF("id", "x").write.parquet(s"$out/w1")
    Seq(("b", 2L, 9)).toDF("y", "id", "z").write.parquet(s"$out/w2")
    val got = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/w1", s"$out/w2")
      .select("id", "x", "y", "z").collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))).toMap
    assert(got == Map(
      1L -> (("a", null, None)),
      2L -> ((null, "b", Some(9)))))
  }
}
