package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-versioning operators: MERGE-style upsert and snapshot diff —
  * the dataset-maintenance half of incremental reprocessing (the intake
  * side is `Dedup.incrementalNearDups`). A training corpus is rebuilt in
  * increments: a crawl refresh replaces changed pages and adds new ones
  * (upsert), and every ablation needs to know exactly what moved between
  * two corpus versions (diff).
  *
  * The reference has no table maintenance at all — its jobs are
  * write-once runs (`/root/reference/daemons/core/remap.py:178-188`); these
  * operators are the durable-dataset discipline that replaces re-running
  * the whole intake.
  */
object Versioning {

  /** MERGE: rows of `updates` replace same-key rows of `current`; new keys
    * append. One anti-join plus a union — the join shuffles both sides on
    * the key ONCE, and on a bucketed layout ([[graft.sources.Bucketing]])
    * even that shuffle disappears. `updates` is typically a small refresh
    * batch: the planner broadcasts it into the anti-join, so the current
    * corpus is scanned once and never shuffled. Column sets must match —
    * checked loudly instead of silently dropping or nulling columns. */
  def upsert(current: DataFrame, updates: DataFrame,
             key: Seq[String]): DataFrame = {
    require(current.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert column mismatch: ${current.columns.sorted.mkString(",")} vs " +
        updates.columns.sorted.mkString(","))
    current.join(updates.select(key.map(col): _*), key, "left_anti")
      .unionByName(updates)
  }

  /** Snapshot diff: per-key status across two corpus versions — `added`
    * (key only in `next`), `removed` (only in `prev`), `changed` (present
    * in both, any compare column differs under null-safe equality),
    * `unchanged`. One full-outer join on the key; comparison is a
    * codegen'd conjunction of `<=>` — no engine-specific row hashing, so
    * an external auditor (or the DuckDB oracle) can replay the exact
    * decision. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val p = prev.select((key ++ compareCols).map(col): _*)
      .withColumn("_in_prev", lit(true))
    val n = next.select((key ++ compareCols).map(col): _*)
      .withColumn("_in_next", lit(true))
    val joined = p.as("p").join(n.as("n"), key, "full_outer")
    // foldLeft from true, not reduce: empty compareCols is a legitimate
    // key-presence-only diff (added/removed/unchanged), not a crash
    val same = compareCols
      .map(c => col(s"p.$c") <=> col(s"n.$c"))
      .foldLeft(lit(true))(_ && _)
    joined.select(
      key.map(col) :+
        when(col("_in_prev").isNull, "added")
          .when(col("_in_next").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  // --- q195_diff_explain: column-level change attribution -----------------
  /** [[snapshotDiff]]'s drill-down: for every key present in BOTH
    * versions with at least one differing compare column, WHICH columns
    * changed — the audit a schema-evolution or backfill review actually
    * reads ("the re-crawl touched text on 14% of rows and n_chars on 2%
    * — why did lang move on any?"). Null-safe per-column compares, the
    * changed set emitted as an array in the caller's declared column
    * order (deterministic — no engine-dependent set ordering).
    *
    * Same one-full-outer-join shape as q80, restricted to the
    * both-present-and-changed slice; the per-column comparisons are
    * codegen'd scalar work on the joined row. */
  def snapshotDiffExplain(prev: DataFrame, next: DataFrame, key: Seq[String],
                          compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiffExplain: no compare columns")
    val p = prev.select((key ++ compareCols).map(col): _*)
    val n = next.select((key ++ compareCols).map(col): _*)
    val joined = p.as("p").join(n.as("n"), key)
    val marks = compareCols.map(c =>
      when(!(col(s"p.$c") <=> col(s"n.$c")), lit(c)))
    joined
      .select(key.map(col) :+
        filter(array(marks: _*), x => x.isNotNull).as("changed_cols"): _*)
      .filter(size(col("changed_cols")) > 0)
  }

  /** The q195 refresh: text re-crawled for %7 keys, n_chars recounted for
    * %11 keys (both for %77) — so the explain output exercises one-column
    * and two-column changes. The registry entry flattens the
    * `changed_cols` array to a comma-joined string at the output
    * boundary (column names never contain commas): a top-level list
    * column breaks the driver comparator's pandas `sort_values`
    * (ndarray cells are unhashable) — same convention as q30/q114. */
  def q195DiffExplain(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val next = docs
      .withColumn("text", when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" [v2]"))).otherwise(col("text")))
      .withColumn("n_chars", when(pmod(col("doc_id"), lit(11)) === 0,
        col("n_chars") + 1).otherwise(col("n_chars")))
    snapshotDiffExplain(docs, next, Seq("doc_id"), Seq("text", "n_chars"))
      .select(col("doc_id"),
        concat_ws(",", col("changed_cols")).as("changed_cols"))
  }

  val q195DiffExplainSql: String = """
    WITH nxt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END
               AS text,
             CASE WHEN doc_id % 11 = 0 THEN n_chars + 1 ELSE n_chars END
               AS n_chars
      FROM documents),
    j AS (SELECT p.doc_id,
                 list_filter([
                   CASE WHEN p.text IS DISTINCT FROM n.text
                        THEN 'text' END,
                   CASE WHEN p.n_chars IS DISTINCT FROM n.n_chars
                        THEN 'n_chars' END], x -> x IS NOT NULL)
                   AS changed_cols
          FROM documents p JOIN nxt n USING (doc_id))
    SELECT doc_id, array_to_string(changed_cols, ',') AS changed_cols
    FROM j WHERE len(changed_cols) > 0"""

  // --------------------------------------------------------------- queries

  /** The deterministic refresh batch both queries derive: every doc_id
    * divisible by 7 comes back re-crawled (text suffixed, n_chars bumped),
    * every doc_id divisible by 13 also appears as a brand-new page under
    * doc_id + 1000000. Shared so q79 and q80 can never drift apart. */
  private def refreshBatch(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("text", concat(col("text"), lit(" [v2]")))
      .withColumn("n_chars", col("n_chars") + 5)
      .unionByName(
        docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000))

  private val refreshBatchSql: String = """
      SELECT doc_id, text || ' [v2]' AS text, lang, source,
             n_chars + 5 AS n_chars
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 1000000, text, lang, source, n_chars
      FROM documents WHERE doc_id % 13 = 0"""

  // --- q79_upsert: merge a refresh batch into the corpus ------------------
  def q79Upsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    upsert(docs, refreshBatch(docs), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        length(col("text")).cast("long").as("text_len"))
  }

  // columns listed explicitly in BOTH union arms (never `SELECT *`): upd
  // fixes its column order, so a positional star over documents would
  // silently misalign — not error — if the parquet column order changed
  val q79UpsertSql: String = s"""
    WITH upd AS ($refreshBatchSql),
    merged AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM upd)
      UNION ALL
      SELECT doc_id, text, lang, source, n_chars FROM upd)
    SELECT doc_id, lang, source, n_chars, length(text) AS text_len
    FROM merged"""

  // --- q80_snapshot_diff: what moved between corpus versions --------------
  def q80SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    snapshotDiff(docs, upsert(docs, refreshBatch(docs), Seq("doc_id")),
      Seq("doc_id"), Seq("text", "n_chars"))
  }

  val q80SnapshotDiffSql: String = s"""
    WITH upd AS ($refreshBatchSql),
    nxt AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM upd)
      UNION ALL
      SELECT doc_id, text, lang, source, n_chars FROM upd)
    SELECT COALESCE(p.doc_id, n.doc_id) AS doc_id,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN p.text IS NOT DISTINCT FROM n.text
                 AND p.n_chars IS NOT DISTINCT FROM n.n_chars
                  THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM documents p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id"""

  // --- q96_scd2: type-2 slowly-changing dimension from an event log -------
  /** SCD2 history build: collapse an append-only event log into per-key
    * validity intervals — one row per (key, attribute-run) with
    * `valid_from/valid_to` microsecond bounds, a version counter, and an
    * `is_current` flag on the open interval. Consecutive rows with an
    * unchanged attribute merge into one interval (the lag-filter), so the
    * output is the minimal history a warehouse dimension table would
    * store.
    *
    * Scale shape: both window passes partition by the dimension KEY —
    * entity-bounded (a user's event history), never a value-keyed window —
    * and share one partitioning+ordering, so Spark plans a single
    * exchange+sort. Timestamps cross the engine boundary as epoch
    * microseconds (`unix_micros` ↔ `epoch_us`), the q45 discipline; ties
    * at equal timestamps break on the unique event id. */
  def scd2(events: DataFrame, key: String, attr: String, ts: String,
           tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one sort key for both passes: epoch micros is monotone in the
    // timestamp, so converting FIRST lets the change-detection and the
    // interval windows share a single exchange+sort
    val w = Window.partitionBy(col(key))
      .orderBy(col("valid_from_us"), col(tieBreak))
    events
      .select(col(key), col(attr), col(tieBreak),
        unix_micros(col(ts)).as("valid_from_us"))
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop(tieBreak, "_prev")
  }

  def q96Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2(Tables.events(spark, dir), "user_id", "event_type", "ts", "event_id")

  val q96Scd2Sql: String = """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events),
    d AS (
      SELECT user_id, event_id, event_type, ts_us,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      FROM e),
    c AS (SELECT user_id, event_id, event_type, ts_us FROM d
          WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type,
           ts_us AS valid_from_us,
           lead(ts_us) OVER w AS valid_to_us,
           CAST(row_number() OVER w AS BIGINT) AS version,
           lead(ts_us) OVER w IS NULL AS is_current
    FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"""

  // --- q218_scd2_atscale: slowly-changing-dimension tracking at 2²⁰ rows --
  /** At-scale correctness coverage for [[scd2]] — q96 runs the change
    * detection over the ~60k-row events table; this replays the SAME
    * entry point over a range-synthesized history of 2²⁰ observations:
    * 2048 entities × 512 timestamped readings each, where entity u's
    * state cycles through 4 values changing every (u mod 7)+2
    * observations — per-entity run lengths from 2 to 8, so the
    * lag-based change filter, the lead-based interval close, and the
    * version numbering all work against runs of varying width inside
    * 512-row key partitions (the per-key sort volume a small corpus
    * never reaches). Output is entity-rolled (2048 rows: version count,
    * exactly-one-current check, integer-exact validity-window sums; a
    * dropped change row, a mis-closed interval, or a version gap breaks
    * the hash). The oracle replays the lag/lead/window chain
    * independently in DuckDB over its own generated history. */
  private[graft] val q218Rows = 1L << 20
  private[graft] val q218Users = 2048L

  private[graft] def q218Events(spark: SparkSession, rows: Long = q218Rows,
                                users: Long = q218Users): DataFrame =
    spark.range(rows).select(
      col("id").as("event_id"),
      (col("id") % users).as("user_id"),
      expr(s"timestamp_micros(1767225600000000 + (id div $users) * 60000000)")
        .as("ts"),
      concat(lit("s"),
        (expr(s"(id div $users) div ((id % $users) % 7 + 2)") % 4)
          .cast("string")).as("state"))

  def q218Scd2AtScale(spark: SparkSession, dir: String): DataFrame =
    scd2(q218Events(spark), "user_id", "state", "ts", "event_id")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        sum(col("is_current").cast("long")).as("n_current"),
        sum(col("valid_from_us")).as("sum_from"),
        sum(col("valid_to_us")).as("sum_to"))

  private[graft] def q218OracleSql(rows: Long = q218Rows,
                                   users: Long = q218Users): String = s"""
    WITH e AS (
      SELECT CAST(u.i AS BIGINT) AS event_id,
             CAST(u.i % $users AS BIGINT) AS user_id,
             CAST(1767225600000000 + (u.i // $users) * 60000000 AS BIGINT)
               AS ts_us,
             's' || CAST(((u.i // $users) // ((u.i % $users) % 7 + 2)) % 4
                         AS VARCHAR) AS state
      FROM unnest(range(0, $rows)) AS u(i)),
    d AS (SELECT *, lag(state) OVER
            (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
    c AS (SELECT user_id, state, ts_us FROM d
          WHERE prev IS NULL OR prev <> state),
    v AS (SELECT user_id, ts_us AS valid_from_us,
                 lead(ts_us) OVER w AS valid_to_us,
                 lead(ts_us) OVER w IS NULL AS is_current
          FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us))
    SELECT user_id, COUNT(*) AS n_versions,
           CAST(SUM(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
             AS n_current,
           CAST(SUM(valid_from_us) AS BIGINT) AS sum_from,
           CAST(SUM(valid_to_us) AS BIGINT) AS sum_to
    FROM v GROUP BY user_id"""

  // --- q118_delta_agg: incremental view maintenance with retractions ------
  /** The summable aggregate state over a keyed corpus: one row per key
    * group carrying (n_rows, sum_val) — the mergeable sufficient
    * statistics for count / sum / mean. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("sum_val"))

  /** Delta-maintained aggregate — incremental view maintenance over a
    * stored [[aggState]]: `inserts` add rows, `retracts` remove them (the
    * takedown/right-to-be-forgotten path a training-corpus ledger cannot
    * do without), and the refreshed state is algebraically identical to
    * recomputing the aggregate over the post-delta corpus — which is
    * exactly what the q118 oracle recomputes and hash-compares.
    *
    * The algebra: counts and sums are abelian-group aggregates, so a
    * retraction is a signed row (−1, −value) and maintenance is ONE
    * aggregate over (state ∪ signed deltas) — cost scales with |deltas| +
    * |keys|, never with the corpus. min/max are deliberately absent: they
    * are NOT retractable (removing the current max needs the runner-up,
    * which the state doesn't carry) — a caller who needs them must rescan,
    * and this operator's narrow schema makes that contract explicit.
    * Groups whose count drains to zero leave the state entirely. */
  def deltaMaintainAgg(state: DataFrame, inserts: DataFrame,
                       retracts: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame = {
    val sel = (sign: Long, df: DataFrame) =>
      df.select(keys.map(col) :+ col(valueCol).cast("long").as("v") :+
        lit(sign).as("sign"): _*)
    val deltas = sel(1L, inserts).unionByName(sel(-1L, retracts))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("sign")).as("n_rows"),
        sum(col("sign") * col("v")).as("sum_val"))
    state.unionByName(deltas)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_val")).as("sum_val"))
      .filter(col("n_rows") > 0)
  }

  /** Base corpus = doc_id % 5 ≠ 1 (q70's split), inserts = the % 5 = 1
    * batch, retractions = every doc_id % 7 = 3 (takedowns arrive against
    * the already-merged corpus). Oracle: the direct aggregate over the
    * post-delta corpus — certifying the maintenance algebra end-to-end. */
  def q118DeltaAgg(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(pmod(col("doc_id"), lit(5)) =!= 1)
    val inserts = docs.filter(pmod(col("doc_id"), lit(5)) === 1)
    val retracts = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
    deltaMaintainAgg(aggState(base, Seq("lang", "source"), "n_chars"),
        inserts, retracts, Seq("lang", "source"), "n_chars")
      .select(col("lang"), col("source"),
        col("n_rows").as("n_docs"), col("sum_val").as("sum_chars"),
        graft.ops.Relational.ratio6("sum_val", "n_rows").as("avg_chars6"))
  }

  val q118DeltaAggSql: String = s"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           ${graft.ops.Relational.ratio6Sql("SUM(n_chars)", "COUNT(*)")}
             AS avg_chars6
    FROM documents
    WHERE doc_id % 7 <> 3
    GROUP BY lang, source
    HAVING COUNT(*) > 0"""

  // --- q124_table_checksum: cross-engine anti-entropy fingerprint ---------
  /** Order-independent per-group table fingerprint -- the anti-entropy
    * primitive: two replicas (or two ENGINES -- the oracle literally IS
    * the second engine here) compare (n_rows, checksum) per group and
    * ship only divergent groups, never full tables. Row serialization is
    * a canonical `concat_ws` with a \u0001 separator and \u0002 null
    * sentinel (NOT \u0000 -- DuckDB varchars reject embedded NUL, and
    * the second engine must serialize the identical bytes); documented
    * contract: the columns contain neither byte AND include a unique key.
    * The row hash is the md5-uint32 nibble arithmetic shared with
    * [[graft.ext.Sampling.ticketSample]]; the group checksum is
    * `bit_xor`, chosen over a sum because XOR never overflows at any row
    * count -- exact at 10^12 rows per group where a BIGINT sum of
    * uint32s would not be. XOR's self-cancellation (two identical rows
    * vanish pairwise) is harmless exactly because the serialization
    * carries the unique key.
    *
    * Scale shape: one scan, one md5 per row, map-side-partial XOR -- the
    * checksum costs barely more than a COUNT(*), and comparing replicas
    * moves |groups| rows, not data. */
  def tableChecksum(df: DataFrame, groupCol: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum: no columns given")
    val rowStr = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    df.select(col(groupCol), rowStr.as("__row"))
      .select(col(groupCol),
        expr(graft.ext.Sampling.nibbleSumSql(
          "substring(md5(cast(__row as binary)), 1, 8)")).as("h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("checksum"))
  }

  def q124TableChecksum(spark: SparkSession, dir: String): DataFrame =
    tableChecksum(Tables.documents(spark, dir), "lang",
      Seq("doc_id", "text", "source", "n_chars"))

  val q124TableChecksumSql: String = s"""
    WITH h AS (
      SELECT lang,
             ${graft.ext.Sampling.nibbleSumSql(
               "substring(md5(" +
                 "COALESCE(CAST(doc_id AS VARCHAR), chr(2)) || chr(1) || " +
                 "COALESCE(text, chr(2)) || chr(1) || " +
                 "COALESCE(source, chr(2)) || chr(1) || " +
                 "COALESCE(CAST(n_chars AS VARCHAR), chr(2))), 1, 8)")} AS hv
      FROM documents)
    SELECT lang, COUNT(*) AS n_rows, bit_xor(hv) AS checksum
    FROM h GROUP BY lang"""

  // --- q177_vacuum: retention GC plan over a version log ------------------
  /** The logical half of Delta/Iceberg VACUUM: given an append-only
    * version log (one row per key×version), classify every row as
    * `live` (the key's latest version — never removable), `retained`
    * (superseded, but only AFTER the retention watermark — a time-travel
    * reader inside the horizon may still need it), or `reclaimable`
    * (superseded at or before the watermark — safe to delete). The
    * decision is per-row and replayable, so the GC that acts on it can be
    * audited against this plan.
    *
    * A row's removability hinges on when it was SUPERSEDED (its
    * successor's version), not on its own age: an ancient version that is
    * still current must survive every vacuum. That successor lookup is
    * `lead(version)` over a window partitioned by the KEY — entity-
    * bounded (a key's version count), never a value-keyed window. At
    * 100 TB the real input is the table's transaction manifest (cf. the
    * q98/q110 zone-map manifests), which is already orders of magnitude
    * smaller than the data it describes. */
  def vacuumPlan(log: DataFrame, key: Seq[String], versionCol: String,
                 watermark: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key.map(col): _*).orderBy(col(versionCol))
    log.withColumn("next_version", lead(col(versionCol), 1).over(w))
      .withColumn("status",
        when(col("next_version").isNull, "live")
          .when(col("next_version") > watermark, "retained")
          .otherwise("reclaimable"))
  }

  /** The deterministic three-write version log q177 vacuums: base load
    * (v0), the %7 re-crawl (v1), and a second %21 re-crawl (v2) — the
    * same refresh lineage as q79/q80, extended one write. */
  def q177Vacuum(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
    val log = docs.withColumn("version", lit(0))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("n_chars", col("n_chars") + 5)
        .withColumn("version", lit(1)))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(21)) === 0)
        .withColumn("n_chars", col("n_chars") + 9)
        .withColumn("version", lit(2)))
    vacuumPlan(log, Seq("doc_id"), "version", watermark = 1L)
      .select(col("doc_id"), col("version").cast("int").as("version"),
        col("next_version").cast("int").as("next_version"),
        col("status"), col("n_chars").cast("long").as("n_chars"))
  }

  val q177VacuumSql: String = """
    WITH vlog AS (
      SELECT doc_id, 0 AS version, n_chars FROM documents
      UNION ALL
      SELECT doc_id, 1, n_chars + 5 FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id, 2, n_chars + 9 FROM documents WHERE doc_id % 21 = 0),
    l AS (SELECT doc_id, version, n_chars,
                 LEAD(version) OVER (PARTITION BY doc_id
                                     ORDER BY version) AS nv
          FROM vlog)
    SELECT doc_id, CAST(version AS INT) AS version,
           CAST(nv AS INT) AS next_version,
           CASE WHEN nv IS NULL THEN 'live'
                WHEN nv > 1 THEN 'retained'
                ELSE 'reclaimable' END AS status,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM l"""

  // --- q242_upsert_atscale: the MERGE anti-join at 2^20 current rows ------
  /** At-scale correctness coverage for [[upsert]] — q79 merges a ~70-row
    * refresh into the ~500-doc sf corpus; this replays the SAME entry
    * point merging a 2¹⁶-row update wave into a 2²⁰-row base, with the
    * wave STRADDLING the base's key range so both MERGE outcomes carry
    * closed-form counts:
    *
    *  - base: k ∈ [0, 2²⁰), v = 3k, src = 'base';
    *  - updates: k = 17m for m ∈ [0, 2¹⁶), v = 5k+1, src = 'upd' —
    *    61,681 keys land inside the base (replaced: the anti-join must
    *    drop exactly those base rows) and 3,855 beyond it (appended).
    *
    * Every surviving row's provenance is visible in src and its value in
    * v, so the 64-bucket rollup (counts, replaced-count, exact Σv and Σk)
    * breaks if the anti-join drops too much (lost base rows), too little
    * (duplicate keys double Σv), or the union reorders columns. The
    * scale claim under test is the operator's own: ONE anti-join in
    * which the 2¹⁶-row wave broadcasts, so the 2²⁰-row corpus is scanned
    * in place and never shuffled — UpsertAtScalePlanSpec pins the
    * BroadcastHashJoin LeftAnti and that the only Exchange in the plan
    * is the rollup's own 64-bucket aggregate. The oracle replays the
    * anti-join + union + rollup over the same generators in DuckDB. */
  private[graft] val q242Base = 1L << 20
  private[graft] val q242Wave = 1L << 16

  private[graft] def q242Merged(spark: SparkSession,
                                base: Long = q242Base,
                                wave: Long = q242Wave): DataFrame = {
    val current = spark.range(base).select(col("id").as("k"),
      (col("id") * 3).as("v"), lit("base").as("src"))
    val updates = spark.range(wave).select((col("id") * 17).as("k"),
      (col("id") * 17 * 5 + 1).as("v"), lit("upd").as("src"))
    upsert(current, updates, Seq("k"))
  }

  def q242UpsertAtScale(spark: SparkSession, dir: String): DataFrame =
    q242Merged(spark)
      .groupBy(pmod(col("k"), lit(64L)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("src") === "upd", 1)).as("n_upd"),
        sum(col("v")).as("sum_v"),
        sum(col("k")).as("sum_k"))

  private[graft] def q242OracleSql(base: Long = q242Base,
                                   wave: Long = q242Wave): String = s"""
    WITH cur AS (
      SELECT u.i AS k, u.i * 3 AS v, 'base' AS src
      FROM range(0, $base) AS u(i)),
    upd AS (
      SELECT u.i * 17 AS k, u.i * 17 * 5 + 1 AS v, 'upd' AS src
      FROM range(0, $wave) AS u(i)),
    merged AS (
      SELECT * FROM cur WHERE k NOT IN (SELECT k FROM upd)
      UNION ALL
      SELECT * FROM upd)
    SELECT CAST(k % 64 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE src = 'upd') AS BIGINT) AS n_upd,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM merged GROUP BY 1"""

  // --- q252_diff_atscale: the snapshot full-outer diff at 2^20 keys -------
  /** At-scale correctness coverage for [[snapshotDiff]] — q80 diffs the
    * ~500-doc sf corpus against its refresh; this replays the SAME entry
    * point across two range-built versions of a 2²⁰-key table where every
    * status class has a closed-form membership:
    *
    *  - removed:   k ≡ 1 (mod 16) — absent from next (65,536 keys);
    *  - changed:   k ≡ 2 (mod 16) — `v` bumped, second compare column
    *    `cat` left alone, so the class certifies the compare is an OR
    *    over columns, not col-0 only (65,536 keys);
    *  - changed2:  k ≡ 3 (mod 16) — `cat` changed, `v` left alone (the
    *    mirror-image column);
    *  - added:     k ∈ [2²⁰, 2²⁰ + 2¹⁶) — next-only keys;
    *  - unchanged: everything else (13/16 of the base).
    *
    * The scale claim under test: ONE full-outer sort-merge join on the
    * key — both versions shuffle exactly once, statuses are codegen'd
    * null-safe compares on the joined row, no per-status passes. Rolled
    * up to (status × 64 buckets) with an id checksum so misclassified
    * single keys can't cancel. The oracle replays the same generators
    * and CASE logic in DuckDB. */
  private[graft] val q252Keys = 1L << 20
  private[graft] val q252Added = 1L << 16

  private[graft] def q252Diff(spark: SparkSession,
                              keys: Long = q252Keys,
                              added: Long = q252Added): DataFrame = {
    val prev = spark.range(keys).select(col("id").as("k"),
      (col("id") * 3).as("v"), pmod(col("id"), lit(7L)).as("cat"))
    val next = spark.range(keys + added)
      .filter(pmod(col("id"), lit(16L)) =!= 1 || col("id") >= keys)
      .select(col("id").as("k"),
        when(pmod(col("id"), lit(16L)) === 2 && col("id") < keys,
          col("id") * 3 + 1).otherwise(col("id") * 3).as("v"),
        when(pmod(col("id"), lit(16L)) === 3 && col("id") < keys,
          pmod(col("id"), lit(7L)) + 10).otherwise(pmod(col("id"), lit(7L)))
          .as("cat"))
    snapshotDiff(prev, next, Seq("k"), Seq("v", "cat"))
  }

  def q252DiffAtScale(spark: SparkSession, dir: String): DataFrame =
    q252Diff(spark)
      .groupBy(col("status"), pmod(col("k"), lit(64L)).as("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("k")).as("sum_k"))

  private[graft] def q252OracleSql(keys: Long = q252Keys,
                                   added: Long = q252Added): String = s"""
    WITH d AS (
      SELECT u.i AS k,
             CASE WHEN u.i >= $keys THEN 'added'
                  WHEN u.i % 16 = 1 THEN 'removed'
                  WHEN u.i % 16 IN (2, 3) THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM range(0, ${keys + added}) AS u(i))
    SELECT status, CAST(k % 64 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM d GROUP BY 1, 2"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_vacuum"       -> q177Vacuum _,
    "q242_upsert_atscale" -> q242UpsertAtScale _,
    "q252_diff_atscale" -> q252DiffAtScale _,
    "q195_diff_explain" -> q195DiffExplain _,
    "q79_upsert"        -> q79Upsert _,
    "q80_snapshot_diff" -> q80SnapshotDiff _,
    "q96_scd2"          -> q96Scd2 _,
    "q218_scd2_atscale" -> q218Scd2AtScale _,
    "q118_delta_agg"    -> q118DeltaAgg _,
    "q124_table_checksum" -> q124TableChecksum _,
  )

  def oracles: Map[String, String] = Map(
    "q177_vacuum"       -> q177VacuumSql,
    "q242_upsert_atscale" -> q242OracleSql(),
    "q252_diff_atscale" -> q252OracleSql(),
    "q195_diff_explain" -> q195DiffExplainSql,
    "q79_upsert"        -> q79UpsertSql,
    "q80_snapshot_diff" -> q80SnapshotDiffSql,
    "q96_scd2"          -> q96Scd2Sql,
    "q218_scd2_atscale" -> q218OracleSql(),
    "q118_delta_agg"    -> q118DeltaAggSql,
    "q124_table_checksum" -> q124TableChecksumSql,
  )
}
