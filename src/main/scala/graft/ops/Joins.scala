package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Relational.{dsum, dsumSql}

/** Full join surface. The reference engine has NO join operator of any kind
  * (SURVEY.md §2.7) — the closest it gets is co-grouping two datasets by
  * routing map outputs to the same partition label. Here every join family
  * is declarative so Catalyst picks broadcast-hash vs shuffled-hash vs
  * sort-merge from statistics, and AQE can re-plan skew at runtime.
  */
object Joins {

  /** Skew-safe equi-join by explicit key salting: the skewed (probe) side
    * tags each row with `pmod(xxhash64(saltSrc), salts)` and the other
    * (build) side is replicated once per salt value, so one hot key's rows
    * spread across `salts` tasks instead of piling onto one.
    *
    * When to reach for this instead of AQE's runtime skew-join split
    * (which handles most cases for free): the build side is too large to
    * broadcast but cheap to replicate `salts`×, the skew is known ahead of
    * time (e.g. a null-heavy or celebrity key), or the operator must
    * GUARANTEE the spread rather than depend on runtime stats. `saltSrc`
    * must be a column of the skewed side with per-row variety (a unique id
    * is ideal); results are provably identical to the unsalted join —
    * pinned by a property in GraftPropertiesSpec.
    */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
                 saltSrc: org.apache.spark.sql.Column,
                 salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!skewed.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename the input column")
    val l = skewed.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts)))
    val r = build.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  // --- q6_semi_join: EXISTS as left-semi (no row multiplication) ----------
  def q6SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  val q6SemiJoinSql: String = """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)"""

  // --- q7_anti_join: NOT EXISTS as left-anti -------------------------------
  // Customers with no big-ticket order — the price filter keeps the result
  // non-empty (every customer has at least one order in this data).
  def q7AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val q7AntiJoinSql: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)"""

  // --- q8_outer_join: left outer preserving order-less customers ----------
  def q8OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           coalesce(dsum(col("o_totalprice")), lit(0.0)).as("sum_spent"))
  }

  val q8OuterJoinSql: String = s"""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           COALESCE(${dsumSql("o_totalprice")}, 0.0) AS sum_spent
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey"""

  // --- q16_range_join: equi key + date-range band --------------------------
  // At scale: the equi key carries the shuffle; the range predicate is a
  // post-join filter, so this stays a hash/SMJ join, not a cartesian.
  def q16RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey") &&
              l("l_shipdate") >= o("o_orderdate") &&
              l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_shipped_90d"),
           dsum(col("l_extendedprice")).as("sum_price"))
  }

  val q16RangeJoinSql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n_shipped_90d,
           ${dsumSql("l_extendedprice")} AS sum_price
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority"""

  // --- q21_full_outer: customer vs supplier presence per nation -----------
  def q21FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
              coalesce(col("n_cust"), lit(0L)).as("n_cust"),
              coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  val q21FullOuterSql: String = """
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.nationkey = s.nationkey"""

  // --- q44_asof_join: time-series as-of join ------------------------------
  /** As-of join: attach to each left row the single most recent right row
    * with right `ts` <= left `ts` on the same key — the time-series join
    * Spark has no native operator for. Left rows with no preceding right
    * row keep nulls (left-outer semantics).
    *
    * Shape: union both sides, ONE shuffle on the key, ONE sort per key on
    * `(ts, side, tieBreak)` with rights ordered before lefts at equal ts
    * (inclusive <=), then `last(right_payload, ignoreNulls)` over the
    * running frame fills the latest right row forward. Never a per-key
    * loop, a range cross-join, or an unbounded right broadcast — at 100 TB
    * this is a single sort-merge pass; a hot key degrades to one in-partition
    * sort, the same skew profile as any window (salt upstream if a key
    * exceeds a task).
    *
    * @param tieBreak column present on BOTH sides ordering rows within an
    *                 equal (key, ts); makes the filled value deterministic
    * @param rightPayload right columns carried onto left rows (as `asof_*`)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               tieBreak: String, rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    val l2 = left.select(col(key).as("__k"), col(ts).as("__ts"),
      col(tieBreak).as("__tb"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // SQL ASOF null semantics: a right row with NULL ts or NULL key can
    // never satisfy `l.ts >= r.ts AND l.key = r.key`, but ascending sort
    // puts NULL ts FIRST — without this filter such a row's payload would
    // forward-fill into every left row that has no genuine predecessor.
    // Left-side NULLs need no handling: a NULL-ts left row sorts before
    // every (non-null) right row and a NULL-key left row shares its
    // partition only with other left rows, so both fill NULL, matching
    // the no-match SQL result.
    val r2 = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).as("__ts"),
        col(tieBreak).as("__tb"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.union(r2)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Each click event joined to the user's latest preceding purchase.
    * Tie note: two purchases of one user in the same microsecond would be
    * engine-ambiguous in the oracle's ASOF JOIN; the corpus timestamps are
    * ns-grained so that never occurs. */
  def q44AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    asOfJoin(clicks, purchases, key = "user_id", ts = "ts",
      tieBreak = "event_id", rightPayload = Seq("ts", "value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts"), col("asof_value"))
  }

  // DuckDB's native ASOF JOIN — an independent implementation of the same
  // semantics, which is exactly what makes it a strong oracle. CASTs map
  // ns-parquet to the µs timestamps Spark computes (truncating, like
  // `ts div 1000`).
  val q44AsofJoinSql: String = """
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      event_type, value FROM events),
    c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, value FROM e WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts, p.ts AS asof_ts, p.value AS asof_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts"""

  // --- q108_attribution: last-touch attribution with a lookback window ---
  /** Marketing/conversion attribution: each purchase is attributed to the
    * user's most recent PRECEDING click, but only if it happened within
    * the lookback window (24 h here) — an as-of join hardened with the gap
    * constraint every real attribution model carries, then rolled up to
    * (purchase day × attributed) with purchase counts and exact-decimal
    * revenue. Composes [[asOfJoin]] (one shuffle + one sort per key), so
    * the 100 TB shape is inherited: the gap test and day bucketing are
    * codegen'd scalar work on the joined rows, and the rollup is a
    * map-side-partial aggregate over a handful of groups.
    *
    * Same tie note as q44: timestamps are ns-grained, so an equal-µs
    * (user, ts) pair — where Spark's tieBreak and DuckDB's ASOF pick
    * engine-specific rows — never occurs. */
  def q108Attribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    asOfJoin(purchases, clicks, key = "user_id", ts = "ts",
        tieBreak = "event_id", rightPayload = Seq("ts"))
      .withColumn("attributed",
        col("asof_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("asof_ts")) <= lit(86400000000L))
      .groupBy(expr("CAST(unix_micros(ts) div 86400000000 AS INT)").as("day"),
        col("attributed"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("revenue"))
  }

  val q108AttributionSql: String = s"""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      event_type, value FROM events),
    p AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM e WHERE event_type = 'click')
    SELECT CAST(epoch_us(p.ts) // 86400000000 AS INT) AS day,
           (c.ts IS NOT NULL AND
            epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000) AS attributed,
           COUNT(*) AS n_purchases,
           ${dsumSql("value")} AS revenue
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    GROUP BY 1, 2"""

  // --- q183_position_attribution: U-shaped multi-touch credit -------------
  /** Position-based (U-shaped) multi-touch attribution — the model between
    * q108's last-touch and linear: 40% of a conversion's credit to the
    * FIRST touch in the lookback window, 40% to the LAST, the remaining
    * 20% split evenly among the middles (one touch takes 100%, two split
    * 50/50). Output is the per-conversion credit assignment (touch count,
    * first/last touch ids, each position's weight) — the audit table a
    * marketing rollup aggregates; conversions with zero in-window touches
    * carry no credit and are absent by definition.
    *
    * Weights are 6-dp-exact: the endpoint weights are literals and the
    * per-middle share `0.2/(n−2)` is ratio6(1, 5·(n−2)) — no float
    * division whose rounding could differ across engines. First/last are
    * min_by/max_by on the touch time (ns-grained timestamps: the q44/q108
    * no-equal-µs-tie argument applies).
    *
    * Scale shape: one equi-key (user) join with a time-band filter — the
    * q49 interval-join shape — then one hash aggregate per conversion.
    * Per-user touch history is entity-bounded; nothing is windowed over
    * values. */
  def positionAttribution(conversions: DataFrame, touches: DataFrame,
                          key: String, ts: String, id: String,
                          lookbackUs: Long): DataFrame = {
    val p = conversions.select(col(id).as("conv_id"), col(key).as("k"),
      unix_micros(col(ts)).as("p_us"))
    val c = touches.select(col(id).as("touch_id"), col(key).as("k"),
      unix_micros(col(ts)).as("c_us"))
    p.join(c, Seq("k"))
      .filter(col("c_us") < col("p_us") &&
        col("c_us") >= col("p_us") - lookbackUs)
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"),
        min_by(col("touch_id"), col("c_us")).as("first_touch_id"),
        max_by(col("touch_id"), col("c_us")).as("last_touch_id"))
      .select(col("conv_id"), col("n").cast("long").as("n_touches"),
        col("first_touch_id"), col("last_touch_id"),
        expr("CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE) " +
          "WHEN n = 2 THEN CAST(0.5 AS DOUBLE) " +
          "ELSE CAST(0.4 AS DOUBLE) END").as("w_first6"),
        expr("CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE) " +
          "WHEN n = 2 THEN CAST(0.5 AS DOUBLE) " +
          "ELSE CAST(0.4 AS DOUBLE) END").as("w_last6"),
        when(col("n") >= 3,
          graft.ops.Relational.ratio6("1", "5 * (n - 2)"))
          .otherwise(lit(0.0)).as("w_mid6"))
  }

  def q183PositionAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    positionAttribution(
      e.filter(col("event_type") === "purchase"),
      e.filter(col("event_type") === "click"),
      key = "user_id", ts = "ts", id = "event_id",
      lookbackUs = 86400000000L)
  }

  val q183PositionAttributionSql: String = s"""
    WITH e AS (SELECT event_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
               FROM events),
    p AS (SELECT event_id AS conv_id, user_id, us AS p_us
          FROM e WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS touch_id, user_id, us AS c_us
          FROM e WHERE event_type = 'click'),
    j AS (SELECT conv_id, touch_id, c_us
          FROM p JOIN c USING (user_id)
          WHERE c_us < p_us AND c_us >= p_us - 86400000000),
    g AS (SELECT conv_id, COUNT(*) AS n,
                 arg_min(touch_id, c_us) AS first_touch_id,
                 arg_max(touch_id, c_us) AS last_touch_id
          FROM j GROUP BY conv_id)
    SELECT conv_id, CAST(n AS BIGINT) AS n_touches,
           first_touch_id, last_touch_id,
           CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                ELSE CAST(0.4 AS DOUBLE) END AS w_first6,
           CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE)
                WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                ELSE CAST(0.4 AS DOUBLE) END AS w_last6,
           CASE WHEN n >= 3 THEN
             ${graft.ops.Relational.ratio6Sql("1", "5 * (n - 2)")}
           ELSE CAST(0.0 AS DOUBLE) END AS w_mid6
    FROM g"""

  // --- q211/q212: the join family's custom operators at ≥1M rows ----------
  /** At-scale correctness coverage for [[asOfJoin]] (q211) — q44/q108 run
    * it over the ~60k-row events table where ns-grained timestamps mean
    * the equal-ts inclusive ordering (rights before lefts at the same ts)
    * is never exercised. This replays the SAME entry point over a
    * range-synthesized 2²⁰-event left side (1024 users × 1024 events at
    * ts = id, so user u's events sit at u, u+1024, u+2048, …) against
    * 64 512 quotes (user u's quote j ∈ [1, 63] at ts = u + 16384·j, worth
    * its own range id u + 1024·j), deliberately placing every 16th event
    * EXACTLY on a quote timestamp — 64 512 equal-ts hits that are matches
    * only under the inclusive rule — and leaving each user's first 16
    * events before any quote, so the left-outer NULL path carries 16 384
    * rows through the same sort. One shuffle + one per-key sort over
    * ~1.1M union rows, the q44 plan shape at 17× its data. Output is
    * user-rolled (1024 rows; per-user sums differ because the quote id
    * embeds u) and integer-exact; the oracle is DuckDB's NATIVE ASOF LEFT
    * JOIN over the same generated frames — an independent engine's
    * implementation of the semantics, including its inclusive `>=`. */
  private[graft] val q211Users = 1024L
  private[graft] val q211Events = 1L << 20

  private[graft] def q211Left(spark: SparkSession, users: Long = q211Users,
                              events: Long = q211Events): DataFrame =
    spark.range(events).select(
      col("id").as("event_id"), (col("id") % users).as("user_id"),
      col("id").as("ts"))

  private[graft] def q211Right(spark: SparkSession,
                               users: Long = q211Users): DataFrame =
    spark.range(users, 64L * users).select(
      col("id").as("event_id"), (col("id") % users).as("user_id"),
      (col("id") % users + expr(s"id div $users") * lit(16L * users)).as("ts"),
      col("id").as("quote"))

  private[graft] def q211Rollup(joined: DataFrame): DataFrame =
    joined.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("asof_quote")).as("n_matched"),
        sum(col("asof_quote")).as("sum_quote"),
        sum(col("asof_ts")).as("sum_asof_ts"))

  def q211AsofAtScale(spark: SparkSession, dir: String): DataFrame =
    q211Rollup(asOfJoin(q211Left(spark), q211Right(spark),
      key = "user_id", ts = "ts", tieBreak = "event_id",
      rightPayload = Seq("ts", "quote")))

  private[graft] def q211OracleSql(users: Long = q211Users,
                                   events: Long = q211Events): String = s"""
    WITH l AS (SELECT CAST(u.i AS BIGINT) AS event_id,
                      CAST(u.i % $users AS BIGINT) AS user_id,
                      CAST(u.i AS BIGINT) AS ts
               FROM unnest(range(0, $events)) AS u(i)),
    r AS (SELECT CAST(u.i % $users AS BIGINT) AS user_id,
                 CAST(u.i % $users + (u.i // $users) * ${16 * users} AS BIGINT) AS ts,
                 CAST(u.i AS BIGINT) AS quote
          FROM unnest(range($users, ${64 * users})) AS u(i))
    SELECT l.user_id, COUNT(*) AS n_events,
           COUNT(r.quote) AS n_matched,
           CAST(SUM(r.quote) AS BIGINT) AS sum_quote,
           CAST(SUM(r.ts) AS BIGINT) AS sum_asof_ts
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    GROUP BY l.user_id"""

  /** At-scale correctness coverage for [[saltedJoin]] (q212) — the
    * guaranteed-spread skew join is property-tested against the plain join
    * on ~100-row frames but had no registry row, so nothing gated it at a
    * size where the 16-way spread actually matters. A range-synthesized
    * 2²⁰-row probe side gives key 0 to every even id — ONE key holding
    * 524 288 rows, the celebrity shape AQE's runtime split exists for and
    * this operator must handle by construction — and scatters odd ids over
    * keys 1‥1023 (~512 rows each); the build side is 1024 keys with the
    * payload 7k+1. The salted join must equal the plain equi-join exactly:
    * output is key-rolled (1024 rows of row count, id checksum, payload
    * sum — integer-exact), and the oracle is DuckDB's plain join + rollup
    * over the same generated frames. */
  private[graft] val q212Rows = 1L << 20
  private[graft] val q212Keys = 1024L

  private[graft] def q212Probe(spark: SparkSession, rows: Long = q212Rows,
                               keys: Long = q212Keys): DataFrame =
    spark.range(rows).select(col("id"),
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(expr(s"id div 2") % lit(keys - 1) + lit(1L)).as("k"))

  private[graft] def q212Build(spark: SparkSession,
                               keys: Long = q212Keys): DataFrame =
    spark.range(keys).select(col("id").as("k"),
      (col("id") * 7 + 1).as("payload"))

  def q212SaltedJoinAtScale(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(q212Probe(spark), q212Build(spark),
        key = "k", saltSrc = col("id"), salts = 16)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
        sum(col("payload")).as("sum_payload"))

  private[graft] def q212OracleSql(rows: Long = q212Rows,
                                   keys: Long = q212Keys): String = s"""
    WITH p AS (SELECT CAST(u.i AS BIGINT) AS id,
                      CAST(CASE WHEN u.i % 2 = 0 THEN 0
                           ELSE (u.i // 2) % ${keys - 1} + 1 END AS BIGINT) AS k
               FROM unnest(range(0, $rows)) AS u(i)),
    b AS (SELECT CAST(u.i AS BIGINT) AS k,
                 CAST(u.i * 7 + 1 AS BIGINT) AS payload
          FROM unnest(range(0, $keys)) AS u(i))
    SELECT k, COUNT(*) AS n, CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(payload) AS BIGINT) AS sum_payload
    FROM p JOIN b USING (k)
    GROUP BY k"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q211_asof_atscale" -> q211AsofAtScale _,
    "q212_saltedjoin_atscale" -> q212SaltedJoinAtScale _,
    "q183_position_attribution" -> q183PositionAttribution _,
    "q6_semi_join"  -> q6SemiJoin _,
    "q7_anti_join"  -> q7AntiJoin _,
    "q8_outer_join" -> q8OuterJoin _,
    "q16_range_join" -> q16RangeJoin _,
    "q21_full_outer" -> q21FullOuter _,
    "q44_asof_join" -> q44AsofJoin _,
    "q108_attribution" -> q108Attribution _,
  )

  def oracles: Map[String, String] = Map(
    "q211_asof_atscale" -> q211OracleSql(),
    "q212_saltedjoin_atscale" -> q212OracleSql(),
    "q6_semi_join"  -> q6SemiJoinSql,
    "q7_anti_join"  -> q7AntiJoinSql,
    "q8_outer_join" -> q8OuterJoinSql,
    "q16_range_join" -> q16RangeJoinSql,
    "q21_full_outer" -> q21FullOuterSql,
    "q44_asof_join" -> q44AsofJoinSql,
    "q108_attribution" -> q108AttributionSql,
    "q183_position_attribution" -> q183PositionAttributionSql,
  )
}
