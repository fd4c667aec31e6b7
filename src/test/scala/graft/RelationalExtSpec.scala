package graft

import graft.ops.{Joins, Relational, Windows}

class RelationalExtSpec extends GraftSuite {

  test("q13 approx_count_distinct within 5% of exact") {
    val rows = Relational.q13ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"sketch out of 5% bound for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("approx_percentile tracks the exact percentiles within sketch bounds") {
    import org.apache.spark.sql.functions._
    val r = Tables.lineitem(spark, sf).agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.05, s"approx $a drifted from exact $e")
  }

  test("q20 set-op chain equals hand-computed set algebra") {
    import org.apache.spark.sql.functions.col
    val c = Tables.customer(spark, sf).collect()
    def keys(p: org.apache.spark.sql.Row => Boolean) =
      c.filter(p).map(_.getAs[Long]("c_custkey")).toSet
    val expected =
      ((keys(_.getAs[String]("c_mktsegment") == "MACHINERY") ++
        keys(_.getAs[String]("c_mktsegment") == "BUILDING")) &
        keys(_.getAs[Double]("c_acctbal") > 1000)) --
        keys(r => Set(1, 2).contains(r.getAs[Int]("c_nationkey")))
    val got = Relational.q20SetOps(spark, sf).collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    assert(got == expected)
  }

  test("rangePrefixSum matches a one-task running sum, signed values included") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // signed values: per-slice totals must be SUM(value), not max of the
    // running sum (a negative tail makes the running max overshoot the total)
    val df = (1 to 500)
      .map(k => (k.toLong, if (k % 3 == 0) -2L * k else k.toLong))
      .toDF("k", "v")
    val got = Windows.rangePrefixSum(df, "k", "v", "cum", buckets = 7)
      .select("k", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var run = 0L
    (1 to 500).foreach { k =>
      run += (if (k % 3 == 0) -2L * k else k.toLong)
      assert(got(k.toLong) == run, s"prefix at k=$k: got ${got(k.toLong)}, want $run")
    }
  }

  test("q9 per-group top-k emits at most 3 per segment, ranked") {
    val rows = Windows.q9WindowTopK(spark, sf).collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      val bals = sorted.map(_.getAs[Double]("c_acctbal"))
      assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q8 left outer join preserves all customers") {
    val nCust = Tables.customer(spark, sf).count()
    assert(Joins.q8OuterJoin(spark, sf).count() == nCust)
  }

  test("events loader converts nanos ts to usable TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }

  test("q109: union of sub-sketches agrees with a direct whole-group sketch") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    // the mergeability contract: sketch-per-subgroup then union must
    // estimate like one sketch over the whole group — this is what makes
    // STORED per-partition sketches answer any future rollup
    val direct = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(14)))
        .as("d"))
    val unioned = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_orderkey"), lit(14)).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("u"))
    val joined = direct.join(unioned, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (d, u) = (r.getAs[Long]("d"), r.getAs[Long]("u"))
      assert(math.abs(d - u).toDouble / math.max(d, 1L) < 0.02,
        s"union estimate $u drifted from direct $d")
    }
    Relational.q109SketchUnion(spark, sf).collect()
      .foreach(r => assert(r.getAs[Boolean]("union_ok")))
  }

  test("AQE runtime bloom filter: injected on a selective shuffled join, results identical") {
    import org.apache.spark.sql.functions._
    // the 100 TB payoff: a selective dim-side filter becomes a bloom
    // probe on the FACT SCAN side, discarding rows before the shuffle.
    // Thresholds are tuned for test scale (any fact scan qualifies) and
    // broadcast is disabled so the join actually shuffles — at real scale
    // the defaults make the same decision for a 10GB+ scan.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
        .select("o_orderkey")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        "no runtime bloom filter injected:\n" + plan.take(800))
      val got = joined.head()
      // ground truth with the filter disabled
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val want = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q")).head()
      assert(got == want, s"bloom-filtered result $got != plain $want")
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _)) }
  }
}
