package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends GraftSuite {

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
}
