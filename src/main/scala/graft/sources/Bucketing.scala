package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout — the storage-side half of shuffle avoidance.
  *
  * Two tables bucketed (and sorted) on the same join key with the same
  * bucket count join with NO exchange: each scan is already co-partitioned
  * by bucket, so the sort-merge join runs bucket-to-bucket locally. At
  * 100 TB this converts every recurring fact⋈fact join on the bucket key
  * from a full-cluster shuffle into a per-bucket merge — the one-time
  * shuffle is paid at write time, amortized over every subsequent query.
  * (The reference's closest idea is its app-chosen partition label,
  * `examples/wordcount/wordcount.py:28-37`, which co-locates map output by
  * key range; bucketing is that idea made durable.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val w1 = path.fold(w0)(p => w0.option("path", p)) // external when given
    (if (sortCols.nonEmpty) w1.sortBy(sortCols.head, sortCols.tail: _*) else w1)
      .saveAsTable(table)
  }

  // --------------------------------------------------------------- queries

  // --- q71_bucketed_join: co-located fact⋈fact through the bucket layout --
  /** Round-trips the layout the object exists for: lineitem and orders
    * written bucketed+sorted on the order key (pruned to the columns the
    * query needs), joined bucket-to-bucket, aggregated. The oracle computes
    * the same aggregate from the ORIGINAL parquet — so a row lost or
    * duplicated anywhere in the bucketed write/read/join path fails the
    * hash. The no-Exchange property of the join is pinned separately by
    * `BucketingSpec` (a plan assertion has no SQL oracle). Scratch
    * placement follows q58's GRAFT_SCRATCH_DIR contract: must be a shared
    * filesystem on a real cluster; the local default serves the
    * single-JVM harness. */
  def q71BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val scratch = sys.env.getOrElse("GRAFT_SCRATCH_DIR",
      System.getProperty("java.io.tmpdir")) +
      "/graft_bucketed_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    writeBucketed(graft.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity"),
      "g_lineitem_bkt", "l_orderkey", buckets = 8,
      sortCols = Seq("l_orderkey"), path = Some(s"$scratch/lineitem"))
    writeBucketed(graft.Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderpriority"),
      "g_orders_bkt", "o_orderkey", buckets = 8,
      sortCols = Seq("o_orderkey"), path = Some(s"$scratch/orders"))
    spark.table("g_lineitem_bkt")
      .join(spark.table("g_orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.Relational.dsum(col("l_quantity")).as("sum_qty"))
  }

  val q71BucketedJoinSql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           ${graft.ops.Relational.dsumSql("l_quantity")} AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority"""

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q71_bucketed_join" -> q71BucketedJoin _)

  def oracles: Map[String, String] =
    Map("q71_bucketed_join" -> q71BucketedJoinSql)
}
