package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Relational.dsumSql

/** Scalar function surface: string, date/time, JSON. In the reference all
  * scalar work happens in user Python (`str.translate`/`split`/`lower`
  * tokenization in wordcount, `float`/`int` casts in pagerank — SURVEY.md
  * §2.10); here every function is a codegen'd Catalyst expression that
  * stays inside whole-stage codegen.
  */
object Scalars {

  // --- q17_string_funcs ----------------------------------------------------
  def q17StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      length(col("p_name")).as("name_len"),
      substring(col("p_name"), 1, 5).as("name_pref"),
      regexp_replace(col("p_type"), " ", "_").as("type_us"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      trim(col("p_name")).as("name_trim"),
      lpad(col("p_brand"), 12, "#").as("brand_pad"),
      reverse(col("p_brand")).as("brand_rev"))

  val q17StringFuncsSql: String = """
    SELECT p_partkey,
      UPPER(p_name) AS name_upper,
      CAST(LENGTH(p_name) AS INT) AS name_len,
      SUBSTRING(p_name, 1, 5) AS name_pref,
      REGEXP_REPLACE(p_type, ' ', '_', 'g') AS type_us,
      CONCAT_WS('|', p_brand, p_type) AS brand_type,
      TRIM(p_name) AS name_trim,
      LPAD(p_brand, 12, '#') AS brand_pad,
      REVERSE(p_brand) AS brand_rev
    FROM part"""

  // --- q18_date_funcs ------------------------------------------------------
  def q18DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      quarter(col("o_orderdate")).as("o_quarter"),
      date_trunc("month", col("o_orderdate")).as("o_month_start"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .as("days_since_epoch95"))

  val q18DateFuncsSql: String = """
    SELECT o_orderkey,
      CAST(YEAR(o_orderdate) AS INT) AS o_year,
      CAST(MONTH(o_orderdate) AS INT) AS o_month,
      CAST(DAY(o_orderdate) AS INT) AS o_day,
      CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
      DATE_TRUNC('month', o_orderdate) AS o_month_start,
      CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        AS days_since_epoch95
    FROM orders"""

  // --- q19_json_funcs: extract from the events.props JSON column ----------
  def q19JsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           count(lit(1)).as("n_events"),
           max(col("k")).as("max_k"))

  // TRY_CAST mirrors Spark's null-on-failure `.cast("long")` — a strict CAST
  // would error (not null) on a non-numeric props value.
  val q19JsonFuncsSql: String = """
    SELECT event_type,
      CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      COUNT(*) AS n_events,
      MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type"""

  // --- q22_conditional: CASE WHEN / coalesce / nullif surface --------------
  def q22Conditional(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("qty_band",
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high"))
      .groupBy(col("qty_band"))
      .agg(count(lit(1)).as("n"),
           Relational.dsum(col("l_extendedprice")).as("sum_price"))

  val q22ConditionalSql: String = s"""
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
      COUNT(*) AS n,
      ${dsumSql("l_extendedprice")} AS sum_price
    FROM lineitem
    GROUP BY 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_string_funcs" -> q17StringFuncs _,
    "q18_date_funcs"   -> q18DateFuncs _,
    "q19_json_funcs"   -> q19JsonFuncs _,
    "q22_conditional"  -> q22Conditional _,
  )

  def oracles: Map[String, String] = Map(
    "q17_string_funcs" -> q17StringFuncsSql,
    "q18_date_funcs"   -> q18DateFuncsSql,
    "q19_json_funcs"   -> q19JsonFuncsSql,
    "q22_conditional"  -> q22ConditionalSql,
  )
}
