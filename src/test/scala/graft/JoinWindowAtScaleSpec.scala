package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Joins, Windows}

/** Pins for the q210–q213 at-scale gate rows (salted top-k, as-of join,
  * salted equi-join, signed range prefix sum): small analogs prove the
  * SEMANTICS against a naive plan or closed form where the gate's DuckDB
  * oracle would be overkill to rerun, and cheap full-scale pins prove the
  * gate corpora really are ≥1M elements (counts prune the synthesized
  * payload columns, so they cost milliseconds).
  */
class JoinWindowAtScaleSpec extends GraftSuite {

  test("q210 small analog: two-phase salted top-k equals the naive single window") {
    val frame = Windows.q210Frame(spark, rows = 1024L, groups = 4L)
    val got = Windows.perGroupTopK(frame,
        group = Seq(col("g")), order = Seq(col("v").desc, col("id")),
        saltSrc = col("id"), k = 5)
      .select(col("g"), col("id"), col("v"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val naive = frame
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("id"),
        r.getAs[Long]("v"), r.getAs[Int]("rn"))).toSet
    assert(got == naive,
      s"diff: ${(got -- naive).take(3)} / ${(naive -- got).take(3)}")
  }

  test("q210 full corpus is 2^21 rows") {
    assert(Windows.q210Frame(spark).count() == (1L << 21))
  }

  /** Small analog of the q211 construction (8 users × 128 events): the
    * rolled as-of output must match the closed form — per user u,
    * 128 events, the first 16 unmatched (left-outer NULLs through the
    * sort), and each j ∈ [1,7] claimed by exactly 16 events including the
    * equal-ts event at i = 16j, which matches ONLY under the inclusive
    * rights-before-lefts ordering. sum_quote = 112u + 8·16·28. */
  test("q211 small analog: as-of rollup matches the closed form") {
    val users = 8L
    val out = Joins.q211Rollup(Joins.asOfJoin(
        Joins.q211Left(spark, users = users, events = 1024L),
        Joins.q211Right(spark, users = users),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        rightPayload = Seq("ts", "quote")))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("sum_quote"),
        r.getAs[Long]("sum_asof_ts"))).toSet
    val expected = (0L until users).map { u =>
      (u, 128L, 112L, 112 * u + 8 * 16 * 28L, 112 * u + 128 * 16 * 28L)
    }.toSet
    assert(out == expected,
      s"diff: ${(out -- expected).take(3)} / ${(expected -- out).take(3)}")
  }

  test("q211 full left side is 2^20 events") {
    assert(Joins.q211Left(spark).count() == (1L << 20))
  }

  test("q212 small analog: salted join rollup equals the plain join rollup") {
    val probe = Joins.q212Probe(spark, rows = 4096L, keys = 16L)
    val build = Joins.q212Build(spark, keys = 16L)
    def roll(j: org.apache.spark.sql.DataFrame) = j.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
        sum(col("payload")).as("sum_payload"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_id"), r.getAs[Long]("sum_payload"))).toSet
    val salted = roll(Joins.saltedJoin(probe, build, key = "k",
      saltSrc = col("id"), salts = 16))
    val plain = roll(probe.join(build, Seq("k")))
    assert(salted == plain,
      s"diff: ${(salted -- plain).take(3)} / ${(plain -- salted).take(3)}")
  }

  test("q212 full probe: the celebrity key holds 2^19 of 2^20 rows") {
    val probe = Joins.q212Probe(spark)
    assert(probe.count() == (1L << 20))
    assert(probe.filter(col("k") === 0L).count() == (1L << 19))
  }

  /** Same signed-value shape as the q213 gate (v = id − keys/2, so slice
    * totals are negative below the midpoint) at 4 096 keys: the
    * range-partitioned prefix sum must equal the naive one-task window. */
  test("q213 small analog: signed range prefix sum equals the naive window") {
    val keys = 4096L
    val frame = spark.range(keys).select(col("id"), (col("id") - keys / 2).as("v"))
    val got = Windows.rangePrefixSum(frame, "id", "v", "cum")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum"))).toSet
    val naive = frame.withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum"))).toSet
    assert(got == naive,
      s"diff: ${(got -- naive).take(3)} / ${(naive -- got).take(3)}")
  }
}
