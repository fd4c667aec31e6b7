package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends GraftSuite {
  import spark.implicits._

  test("co-bucketed tables join with zero exchange and match the plain join") {
    // disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sf),
        "g_orders_b", "o_orderkey", buckets = 4, sortCols = Seq("o_orderkey"))
      Bucketing.writeBucketed(Tables.lineitem(spark, sf),
        "g_lineitem_b", "l_orderkey", buckets = 4, sortCols = Seq("l_orderkey"))
      val j = spark.table("g_lineitem_b").join(spark.table("g_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "co-bucketed join must not shuffle:\n" + p.take(600))
      val plain = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }

  test("z-order write clusters BOTH dimensions despite asymmetric ranges") {
    // events: user_id spans ~4 bits, event_id ~10 — raw interleave would
    // put every decisive bit on event_id; the quantile normalization is
    // what makes the narrow dimension cluster too. A hash layout is the
    // no-clustering baseline: every file spans ~the full range of both.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val base = java.nio.file.Files.createTempDirectory("graft_zspec").toString
    Bucketing.zOrderWrite(ev, s"$base/z", col("user_id"), col("event_id"),
      numFiles = 16)
    ev.repartition(16).write.mode("overwrite").parquet(s"$base/plain")
    def avgFileSpread(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("s"))
        .agg(avg(col("s"))).head().getDouble(0)
    assert(spark.read.parquet(s"$base/z").count() == ev.count(),
      "clustered write lost rows")
    val uz = avgFileSpread(s"$base/z", "user_id")
    val up = avgFileSpread(s"$base/plain", "user_id")
    val ez = avgFileSpread(s"$base/z", "event_id")
    val ep = avgFileSpread(s"$base/plain", "event_id")
    assert(uz < up * 0.7, s"user_id spread $uz not < 0.7 * $up")
    assert(ez < ep * 0.7, s"event_id spread $ez not < 0.7 * $ep")
  }

  test("zValue16 interleaves bits exactly (known vectors)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0L),
      (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL), (0xABCDL, 0x1234L))
    def spread(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).reduce(_ | _)
    val got = rows.toDF("x", "y")
      .select(Bucketing.zValue16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (x, y) => spread(x) | (spread(y) << 1) }
    assert(got == want)
  }

  test("zoneMapStats computes per-zone stats and the pruning decision") {
    // zones of 5 keys; predicate [50,60] overlaps only zone 1's [10,55]
    // span via max=55 ≥ 50 — zone 0 ([1,9]) and zone 2 ([70,80]) prune...
    // except zone 2's min=70 > 60 and zone 0's max=9 < 50
    val rows = Seq((0L, 1.0), (1L, 9.0), (5L, 10.0), (6L, 55.0),
      (10L, 70.0), (11L, 80.0)).toDF("k", "m")
    val got = Bucketing.zoneMapStats(rows, "k", "m", 5L, 50.0, 60.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got == Map(
      0L -> ((2L, 1.0, 9.0, false)),
      1L -> ((2L, 10.0, 55.0, true)),
      2L -> ((2L, 70.0, 80.0, false))))
  }

  test("q110: the pruned read skips files AND matches the full-scan filter") {
    import org.apache.spark.sql.functions._
    val got = graft.sources.Bucketing.q110PrunedRead(spark, sf).collect()
    assert(got.nonEmpty)
    // the skip actually happened — with 8 tight range files and a 10%-of-
    // keyspace predicate, an un-pruned plan would be a correctness bug in
    // the manifest overlap test, a never-pruning one a usefulness bug
    got.foreach(r => assert(r.getAs[Boolean]("pruned"), "no file was skipped"))
    // and it lost nothing: equal to the same aggregate over a full scan
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
    val b = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val (lo, hi) = (mn + 3L * (mx - mn) / 10L, mn + 4L * (mx - mn) / 10L)
    val want = li.filter(col("l_orderkey").between(lo, hi))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        graft.ops.Relational.dsum(col("l_extendedprice")).as("sum_price"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val gotMap = got.map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotMap == want)
  }

  test("hilbert index is a unit-step bijection; morton provably is not") {
    val bits = 4
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x, y)))
      .toDF("x", "y")
    val cells = Bucketing.withHilbert(grid, col("x"), col("y"), "hv", bits)
      .collect()
      .map(r => r.getAs[Long]("hv") -> ((r.getAs[Int]("x"), r.getAs[Int]("y"))))
      .toMap
    // bijection: every cell gets a distinct index covering 0 .. n²-1
    assert(cells.size == n * n)
    assert(cells.keys.min == 0L && cells.keys.max == (n * n - 1).toLong)
    // the Hilbert property: walking the curve in index order NEVER jumps —
    // every consecutive pair of indices is Manhattan-adjacent
    val hJumps = (0L until (n * n - 1).toLong).map { d =>
      val (x1, y1) = cells(d); val (x2, y2) = cells(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(hJumps.forall(_ == 1), s"non-unit hilbert step: max=${hJumps.max}")
    // the same walk on the Morton curve takes long diagonal jumps (e.g.
    // 3→4 crosses a quadrant boundary) — the locality gap that makes
    // Hilbert buckets cover tighter rectangles
    val mCells = grid.withColumn("zv", Bucketing.zValue16(col("x"), col("y")))
      .collect()
      .map(r => r.getAs[Long]("zv") -> ((r.getAs[Int]("x"), r.getAs[Int]("y"))))
      .toMap
    val mJumps = (0L until (n * n - 1).toLong).map { d =>
      val (x1, y1) = mCells(d); val (x2, y2) = mCells(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(mJumps.max > 1, "morton should jump — else this test proves nothing")
  }

  test("q238 corpus is at the claimed scale and sweeps every curve bucket") {
    import org.apache.spark.sql.functions._
    assert(Bucketing.q238Frame(spark).count() == 1048576L)
    // coprime strides spread 2^20 points across the full 65,536² grid, so
    // all 1024 hd≫22 buckets are populated — the rollup covers the whole
    // curve, not a corner of it (the q132 corpus only reaches 4 buckets)
    val buckets = Bucketing.withHilbert(
        Bucketing.q238Frame(spark, 1L << 17), col("x"), col("y"), "hv")
      .select(shiftright(col("hv"), 22).as("b")).distinct().count()
    assert(buckets == 1024L, s"only $buckets curve buckets touched")
  }
}
