package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data profiling and quality constraints — the ANALYZE / Deequ-shaped
  * surface of the engine: per-column statistics for planning and drift
  * detection, and declarative constraint checks (uniqueness, referential
  * integrity, ranges, non-null) whose violations are counted, never
  * silently assumed away.
  *
  * The reference has nothing comparable; in a 100 TB training pipeline
  * these run as the admission gate in front of every ingest (a crawl drop
  * whose `n_null(text)` jumps is quarantined before it poisons dedup).
  */
object Profiling {

  /** Per-column numeric profile in ONE scan: five aggregates per column
    * plus one shared row count ride the same pass (a per-column loop would
    * scan the table once per column), then one `explode` unpivots to a
    * row per column.
    *
    * Cross-engine determinism: sums are decimal-exact ([[graft.ops
    * .Relational.dsum]] discipline) and the 6-dp mean is integer half-up
    * arithmetic over the exact decimal sum ([[graft.ops.Relational
    * .decRatio6]]) — a `round(double, 6)` of the exact rational sum/count
    * would hit the same 6-dp-boundary divergence class ratio6 exists to
    * kill. Squares are summed as decimal-of-double-product: the double
    * multiply is itself exactly reproducible, and the DECIMAL(28,6)
    * quantization of it is the same in both engines. stddev is the one
    * residual `round(double, 6)`: a square root is irrational, so no
    * integer-exact form exists — both engines round the same IEEE sqrt of
    * the same exact-sum-derived variance, which can only diverge if a
    * variance lands within half an ulp of a 6-dp boundary (accepted,
    * documented risk — unlike the mean, it cannot be eliminated). */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    import graft.ops.Relational.{decRatio6, dsum}
    import org.apache.spark.sql.types.DecimalType
    require(cols.nonEmpty, "profileNumeric: no columns given")
    // ONE shared total-rows aggregate plus five per column; `__sum` stays
    // DECIMAL (dsum without its final double cast) because the mean's
    // half-up rounding needs the exact rational, not a double projection
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(col(c).cast(DecimalType(28, 6))).as(s"${c}__sum"),
        dsum(col(c) * col(c)).as(s"${c}__sumsq"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val packed = cols.map { c =>
      val n = col(s"${c}__n").cast("double")
      val mean = col(s"${c}__sum").cast("double") / n
      val variance = col(s"${c}__sumsq") / n - mean * mean
      struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n"),
        (col("__rows") - col(s"${c}__n")).as("n_null"),
        col(s"${c}__min").cast("double").as("min"),
        col(s"${c}__max").cast("double").as("max"),
        // backtick-quoted: decRatio6 goes through expr() string parsing,
        // and profile columns (hence the derived aliases) need not be bare
        // SQL identifiers
        decRatio6(s"`${c}__sum`", s"`${c}__n`").as("mean"),
        // population stddev; greatest(0) guards the tiny negative residue
        // float cancellation can leave when variance ~ 0. An ALL-NULL
        // column gets NULL, not a fabricated 0.0 dispersion (greatest
        // skips nulls, so the null variance must be gated explicitly).
        when(col(s"${c}__n") > 0,
          round(sqrt(greatest(variance, lit(0.0))), 6)).as("stddev"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(packed: _*)).as("p"))
      .select(col("p.*"))
  }

  /** SQL fragment computing one column's profile row — mirrors
    * [[profileNumeric]]'s arithmetic exactly (same [[graft.ops.Relational
    * .dsumSql]] sums); UNION ALL per column. */
  private def profileSql(table: String, c: String): String = {
    import graft.ops.Relational.{decRatio6Sql, dsumSql}
    val mean = s"${dsumSql(c)} / COUNT($c)"
    s"""
    SELECT '$c' AS "column", COUNT($c) AS n,
           COUNT(*) - COUNT($c) AS n_null,
           CAST(MIN($c) AS DOUBLE) AS min, CAST(MAX($c) AS DOUBLE) AS max,
           ${decRatio6Sql(s"SUM(CAST($c AS DECIMAL(28,6)))", s"COUNT($c)")}
             AS mean,
           CASE WHEN COUNT($c) = 0 THEN NULL
                ELSE ROUND(sqrt(GREATEST(
                  ${dsumSql(s"$c * $c")} / COUNT($c) - ($mean) * ($mean),
                  0.0)), 6) END AS stddev
    FROM $table"""
  }

  // --- q85_profile: one-scan numeric profile of lineitem ------------------
  val q85Cols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def q85Profile(spark: SparkSession, dir: String): DataFrame =
    profileNumeric(Tables.lineitem(spark, dir), q85Cols)

  val q85ProfileSql: String =
    q85Cols.map(profileSql("lineitem", _)).mkString("\nUNION ALL\n")

  // ------------------------------------------------------------ constraints

  /** Rows of `child` whose `keys` have no match in `parent` — referential-
    * integrity violations as data, not a boolean. Anti-join on the key:
    * one shuffle (or zero against a broadcast/bucketed parent). */
  def fkViolations(child: DataFrame, parent: DataFrame,
                   keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "fkViolations: no key columns given")
    val cond = keys.map { case (ck, pk) => child(ck) === parent(pk) }
      .reduce(_ && _)
    child.join(parent, cond, "left_anti")
  }

  /** Key groups appearing more than once — uniqueness violations with
    * their multiplicities. groupBy.count + filter: map-side partial agg,
    * never a window. */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** One row per named constraint with its violation count — the
    * admission-gate report. Each entry is (name, violating-rows frame);
    * counts aggregate independently and union into one tiny frame. */
  def constraintReport(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "constraintReport: no checks given")
    checks.map { case (name, viol) =>
      viol.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("constraint"), col("violations"))
    }.reduce(_ unionByName _)
  }

  // --- q86_constraints: the admission gate over the TPC-H-ish tables ------
  /** Four representative constraint families: PK uniqueness, FK integrity,
    * a domain range, and non-null — all expected clean on the generated
    * data except the deliberately-wide quantity range check, which pins
    * that violation COUNTS (not just booleans) survive the union. */
  def q86Constraints(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    constraintReport(Seq(
      "documents_pk_unique" ->
        uniqueViolations(docs, Seq("doc_id")),
      "orders_custkey_fk" ->
        fkViolations(orders, customer, Seq("o_custkey" -> "c_custkey")),
      "lineitem_qty_in_1_25" ->
        li.filter(col("l_quantity") < 1 || col("l_quantity") > 25),
      "documents_text_nonnull" ->
        docs.filter(col("text").isNull)))
  }

  val q86ConstraintsSql: String = """
    SELECT 'documents_pk_unique' AS "constraint",
           (SELECT COUNT(*) FROM (SELECT doc_id FROM documents
             GROUP BY doc_id HAVING COUNT(*) > 1)) AS violations
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_qty_in_1_25',
           (SELECT COUNT(*) FROM lineitem
             WHERE l_quantity < 1 OR l_quantity > 25)
    UNION ALL
    SELECT 'documents_text_nonnull',
           (SELECT COUNT(*) FROM documents WHERE text IS NULL)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_profile"     -> q85Profile _,
    "q86_constraints" -> q86Constraints _,
  )

  def oracles: Map[String, String] = Map(
    "q85_profile"     -> q85ProfileSql,
    "q86_constraints" -> q86ConstraintsSql,
  )
}
