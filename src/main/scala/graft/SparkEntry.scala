package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's registry; each entry is paired with
  * ANSI SQL in `oracleSql` when the operator is SQL-expressible (the driver
  * hash-compares the Spark result against DuckDB on the same parquet).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Joins.queries ++ ops.Windows.queries ++
      ops.Scalars.queries ++ ops.Text.queries ++ ops.Collections.queries ++
      ops.MapReduce.queries ++ sources.Sink.queries ++
      sources.Bucketing.queries ++ graph.Algorithms.queries ++
      ext.Dedup.queries ++ ext.Similarity.queries ++ ext.TextAnalysis.queries ++
      ext.Multimodal.queries ++ ext.Pipeline.queries ++ ext.Sampling.queries ++
      ext.Versioning.queries ++ ext.Profiling.queries ++
      ext.Urls.queries ++ ext.Importance.queries ++ streaming.Streams.queries

  /** SPARK_GRAFT_ONLY=q1_agg,q2_filter_agg → run only those queries.
    * One parser shared by Verify and Bench so the convention cannot
    * diverge; blank/empty values mean "all", never "none". */
  def onlyFilter: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Joins.oracles ++ ops.Windows.oracles ++
      ops.Scalars.oracles ++ ops.Text.oracles ++ ops.Collections.oracles ++
      ops.MapReduce.oracles ++ sources.Sink.oracles ++
      sources.Bucketing.oracles ++ graph.Algorithms.oracles ++
      ext.Dedup.oracles ++ ext.Similarity.oracles ++ ext.TextAnalysis.oracles ++
      ext.Multimodal.oracles ++ ext.Pipeline.oracles ++ ext.Sampling.oracles ++
      ext.Versioning.oracles ++ ext.Profiling.oracles ++
      ext.Urls.oracles ++ ext.Importance.oracles ++ streaming.Streams.oracles
}
