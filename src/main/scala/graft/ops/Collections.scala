package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Tables

/** Array / map / JSON-struct scalar surface. The reference serializes all
  * intermediate values as JSON strings (`json.dumps`/`json.loads`,
  * `/root/reference/daemons/core/remap.py:138,159`); SURVEY §1.2 maps
  * those value lists onto first-class `ArrayType`/`MapType` columns with
  * `from_json`/`to_json` only at the system boundary — parsing once at
  * ingest instead of per-operator, which is the difference between a
  * string-shuffling engine and a columnar one at 100 TB.
  */
object Collections {

  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  // --- q30_array_funcs: from_json → typed struct, array ops, to_json ------
  // Output stays scalar/string typed so the cross-engine hash compare is
  // stable (map-typed columns don't canonicalize portably in the oracle
  // harness; maps are exercised and then rendered via to_json).
  def q30ArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .withColumn("arr",
        array_sort(array_distinct(array(pmod(col("user_id"), lit(10)),
          pmod(col("user_id"), lit(7))))))
      .select(
        col("event_id"),
        col("k"),
        // ignoreNullFields=false: Spark's default DROPS null fields while
        // the oracle's struct_pack emits an explicit "k":null — a props
        // row without a numeric k would otherwise hash-mismatch
        to_json(struct(col("event_type"), col("k")),
          Map("ignoreNullFields" -> "false")).as("json_out"),
        to_json(col("arr")).as("arr_json"),
        size(col("arr")).as("arr_n"),
        array_contains(col("arr"), 3).as("has_three"),
        element_at(col("arr"), 1).as("arr_head"),
        to_json(map(col("event_type"), col("k"))).as("map_json"))

  val q30ArrayFuncsSql: String = """
    WITH e AS (
      SELECT event_id, event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             list_sort(list_distinct([user_id % 10, user_id % 7])) AS arr
      FROM events)
    SELECT event_id, k,
           to_json(struct_pack(event_type := event_type, k := k))::VARCHAR AS json_out,
           to_json(arr)::VARCHAR AS arr_json,
           CAST(len(arr) AS INT) AS arr_n,
           list_contains(arr, 3) AS has_three,
           arr[1] AS arr_head,
           to_json(MAP([event_type], [k]))::VARCHAR AS map_json
    FROM e"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_array_funcs" -> q30ArrayFuncs _,
  )

  def oracles: Map[String, String] = Map(
    "q30_array_funcs" -> q30ArrayFuncsSql,
  )
}
