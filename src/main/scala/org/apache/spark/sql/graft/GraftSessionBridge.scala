package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Rebind a DataFrame's logical plan to another session of the same
  * SparkContext — the supported way to run a plan under different SQL
  * confs without mutating the caller's session (`newSession()` shares the
  * SparkContext, cache manager, and catalog, but has an isolated
  * `SQLConf`). Lives under `org.apache.spark.sql` because
  * `classic.Dataset.ofRows` is `private[sql]`, like the expression
  * bridges in this package. */
object GraftSessionBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    ofRows(to, df.queryExecution.logical)

  /** A true clone: unlike `newSession()` (which resets SQLConf to
    * builder-time values and drops temp views), `cloneSession()` copies the
    * CURRENT runtime conf state and the temp-view catalog — so a plan
    * rebound into the clone is planned under exactly the caller's SQL
    * semantics plus whatever overrides the caller then sets on the clone.
    * `cloneSession` is `private[sql]`, hence this bridge. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
