package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything here keys on a HASH of a stable id, never on `rand()`:
  * a sample that changes between runs (or between engines) poisons
  * ablations and makes incremental reprocessing impossible. The hash is
  * md5 — deliberately, although xxhash64 is faster — because every engine
  * that might audit or re-derive the sample (the DuckDB oracle here, a
  * Python sanity notebook in production) computes the identical lowercase
  * hex for the identical string, which xxhash64 seeds do not guarantee
  * across libraries. One md5 per ROW (not per token) is noise at scale.
  *
  * The reference has no sampling operator; its closest idiom is the
  * app-chosen partition label (`/root/reference/examples/wordcount/
  * wordcount.py:28-37`) — a deterministic row→label function, which is
  * exactly what these are.
  */
object Sampling {

  /** Uniform 1/256-granular hash bucket of a key: the first two hex digits
    * of `md5(string(key))`, lexicographically comparable against a
    * threshold byte. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  /** Quantized threshold: rate → two lowercase hex digits such that
    * P[bucket < threshold] = round(rate·256)/256. Rates ≥ 1 map to a
    * sentinel above every hex bucket. */
  private[graft] def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"sample rate out of [0,1]: $rate")
    val q = math.round(rate * 256).toInt
    if (q >= 256) "g0" else f"$q%02x" // 'g' > 'f': admits every bucket
  }

  /** Deterministic stratified sampling: keep a row iff its key's hash
    * bucket falls under its stratum's threshold. Strata missing from
    * `rates` default to rate 0 (dropped) — a sampling plan should name
    * every stratum it intends to keep. The filter is one codegen'd
    * projection over whatever scan feeds it: no shuffle, no count pass,
    * no per-stratum job — at 100 TB this samples in the same pass that
    * reads the data, unlike `DataFrame.stat.sampleBy` which keys on
    * `rand()` and is neither reproducible across runs nor auditable by
    * another engine. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double]): DataFrame = {
    val thr = rates.foldLeft(lit(rateThreshold(0.0))) { case (acc, (s, r)) =>
      when(stratum === lit(s), lit(rateThreshold(r))).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(key)).filter(col("bucket") < thr)
  }

  /** Leakage-safe train/val/test assignment: the split keys on the
    * near-dup CLUSTER id, not the document id, so two near-duplicate
    * documents can never land in different splits (the classic eval-leak:
    * a test document's near-twin in train). Assignment is pure projection
    * over the cluster column — the expensive part (clustering) is the
    * dedup pipeline the split composes with, already paid. */
  def clusterSplit(clusters: DataFrame, clusterCol: String,
                   trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"invalid split fractions: train=$trainFrac val=$valFrac")
    val b = hashBucket(col(clusterCol))
    clusters.withColumn("split",
      when(b < lit(rateThreshold(trainFrac)), "train")
        .when(b < lit(rateThreshold(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** α-temperature mixture sampling (α = 1/2, the multilingual-corpus
    * rebalancing rule of mC4/XLM-R): stratum s gets weight
    * w_s = √n_s / Σ√n_s, flattening the natural distribution so dominant
    * strata stop drowning the tail, and a target fraction of the corpus is
    * drawn per-stratum at rate min(1, targetFrac·N·w_s/n_s). Unlike
    * [[stratifiedSample]] the rates are COMPUTED from observed counts, not
    * authored — the operator is the planning step and the sample in one.
    *
    * Scale shape: one map-side-partial count pass, a ≤|strata|-row rate
    * frame broadcast back, and the same codegen'd hash-threshold filter as
    * q67 over the main scan — no shuffle of the corpus, no rand().
    *
    * Cross-engine determinism (what lets the oracle hash-match): α is
    * HARDWIRED to 1/2 because IEEE-754 guarantees sqrt correctly rounded
    * (pow(x, α) for general α is not), the Σ√n_s fold runs over the strata
    * sorted by name (collect_list order would be partition-dependent), and
    * the final rate is FLOOR-quantized to 1/256 buckets — deliberately not
    * [[rateThreshold]]'s round(): floor never admits a bucket the real
    * rate hasn't fully earned, and an in-plan floor replays identically in
    * any engine without round-half-mode questions. (Consequence: a derived
    * rate in (255/256, 1) keeps 255/256 of the stratum, not all of it.)
    * Both engines thus derive the identical threshold byte from the
    * identical op sequence. */
  def temperatureMix(df: DataFrame, stratum: String, key: Column,
                     targetFrac: Double): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1,
      s"target fraction out of (0,1]: $targetFrac")
    val rates = df.groupBy(col(stratum)).agg(count(lit(1)).as("ns"))
      // groupagg-ok: one row per stratum — enum-bounded label (scaladoc contract)
      .agg(sort_array(collect_list(struct(col(stratum), col("ns")))).as("arr"),
        sum(col("ns")).as("n_tot")) // integer sum — order-free, exact
      .select(col("arr"), col("n_tot"),
        aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + sqrt(x.getField("ns"))).as("den"))
      .select(explode(col("arr")).as("s"), col("n_tot"), col("den"))
      .select(col(s"s.$stratum").as(stratum),
        least(lit(1.0), lit(targetFrac) * col("n_tot") *
          (sqrt(col("s.ns")) / col("den")) / col("s.ns")).as("rate"))
      .select(col(stratum),
        when(floor(col("rate") * 256) >= 256, lit("g0"))
          .otherwise(format_string("%02x",
            floor(col("rate") * 256).cast("int"))).as("thr"))
    // bcast-ok: one row per stratum; strata already collapsed through a 1-row collect_list upstream, so bounded by construction
    df.join(broadcast(rates), stratum)
      .withColumn("bucket", hashBucket(key))
      .filter(col("bucket") < col("thr"))
      .drop("thr")
  }

  // --- q269_clustersplit_atscale: leakage-safe split at 2^20 documents ----
  /** At-scale correctness coverage for [[clusterSplit]] — q68 splits the
    * ~500-doc sf clustering; this replays the SAME entry point
    * (train 0.8 / val 0.1) over 2²⁰ range-built documents in 2¹⁸
    * four-doc clusters (`cluster = doc_id div 4`). The operator keys the
    * hash on the CLUSTER, so the leakage-safety contract — every member
    * of a near-dup cluster lands in the SAME split, the property that
    * keeps a duplicated document from straddling train and test — holds
    * for 2¹⁸ clusters, and the rollup proves it structurally:
    * `n_docs = 4 · n_clusters` in every split row (a doc-keyed hash
    * would break the equality with probability ≈ 1). Membership is
    * pinned by per-split doc-id and cluster-id sums; the oracle replays
    * the md5-threshold arithmetic over the same generator. Scale shape:
    * the split is one codegen'd projection — the rollup owns the plan's
    * only exchange. */
  private[graft] val q269Docs = 1L << 20

  private[graft] def q269Frame(spark: SparkSession,
                               docs: Long = q269Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      expr("id div 4").as("cluster"))

  def q269ClustersplitAtScale(spark: SparkSession, dir: String): DataFrame =
    q269ClustersplitAtScale0(spark, q269Docs)

  private[graft] def q269ClustersplitAtScale0(spark: SparkSession,
                                              docs: Long): DataFrame =
    clusterSplit(q269Frame(spark, docs), "cluster")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("cluster")).as("sum_clusters"))

  private[graft] def q269OracleSql(docs: Long = q269Docs): String = s"""
    WITH d AS (
      SELECT u.i AS doc_id, u.i // 4 AS cluster,
             substr(md5(CAST(u.i // 4 AS VARCHAR)), 1, 2) AS b
      FROM range(0, $docs) AS u(i)),
    s AS (
      SELECT doc_id, cluster,
             CASE WHEN b < '${rateThreshold(0.8)}' THEN 'train'
                  WHEN b < '${rateThreshold(0.9)}' THEN 'val'
                  ELSE 'test' END AS split
      FROM d)
    SELECT split, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(cluster) AS BIGINT) AS sum_clusters
    FROM s GROUP BY 1"""

  // --------------------------------------------------------------- queries

  /** Per-language sampling plan for q67 — also the source of the oracle's
    * CASE arms, so Scala and SQL can never disagree on a threshold. */
  val q67Rates: Seq[(String, Double)] = Seq(
    "en" -> 0.8, "es" -> 0.4, "de" -> 0.2, "fr" -> 0.1, "zh" -> 0.05)

  // --- q67_stratified_sample: per-language downsampling -------------------
  /** The language-rebalancing step of a corpus mix: keep 80% of English,
    * 5% of the dominant crawl language, etc. Emitting `bucket` makes the
    * decision auditable row-by-row. */
  def q67StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir).select("doc_id", "lang"),
      col("lang"), col("doc_id"), q67Rates.toMap)
      .select("doc_id", "lang", "bucket")

  val q67StratifiedSampleSql: String = {
    val arms = q67Rates.map { case (l, r) =>
      s"WHEN '$l' THEN '${rateThreshold(r)}'"
    }.mkString("\n             ")
    s"""
    WITH b AS (
      SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents)
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < CASE lang
             $arms
             ELSE '${rateThreshold(0.0)}' END"""
  }

  // --- q68_cluster_split: near-dup-safe train/val/test --------------------
  /** Composes q47's verified clustering with the hash split; the oracle
    * replays the same recursive-CTE closure and md5 arithmetic. */
  def q68ClusterSplit(spark: SparkSession, dir: String): DataFrame =
    clusterSplit(Dedup.q47DedupClusters(spark, dir), "cluster")
      .select("doc_id", "cluster", "split")

  val q68ClusterSplitSql: String = s"""
    WITH RECURSIVE ${Dedup.clusterCtes}
    SELECT doc_id, cluster,
           CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2)
                     < '${rateThreshold(0.8)}' THEN 'train'
                WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2)
                     < '${rateThreshold(0.9)}' THEN 'val'
                ELSE 'test' END AS split
    FROM clusters"""

  // --- q77_temperature_mix: α=1/2 language rebalancing --------------------
  /** Draw half the corpus with the temperature rule over the (skewed)
    * language distribution: English (~43% of documents) is downsampled
    * hardest, tail languages keep proportionally more. The oracle replays
    * the whole derivation — counts, sorted-fold Σ√n, rate, threshold byte,
    * md5 bucket — so a drifted weight, fold order, or quantization both
    * engines must agree on fails the hash. */
  def q77TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.documents(spark, dir).select("doc_id", "lang"),
      "lang", col("doc_id"), targetFrac = 0.5)
      .select("doc_id", "lang", "bucket")

  val q77TemperatureMixSql: String = """
    WITH n AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY lang),
    t AS (SELECT SUM(ns) AS n_tot FROM n),
    d AS (SELECT list_reduce(
                   list_transform(list(ns ORDER BY lang), x -> sqrt(x)),
                   (x, y) -> x + y) AS den FROM n),
    r AS (SELECT lang,
                 LEAST(1.0, 0.5::DOUBLE * n_tot * (sqrt(ns) / den) / ns) AS rate
          FROM n, t, d),
    th AS (SELECT lang,
                  CASE WHEN FLOOR(rate * 256) >= 256 THEN 'g0'
                       ELSE printf('%02x', CAST(FLOOR(rate * 256) AS INT))
                  END AS thr
           FROM r),
    b AS (SELECT doc_id, dd.lang,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket, thr
          FROM documents dd JOIN th ON dd.lang = th.lang)
    SELECT doc_id, lang, bucket FROM b WHERE bucket < thr"""

  // --- q102_budget_alloc: largest-remainder token-budget apportionment ----
  /** Allocate an integer token budget across strata proportionally to
    * their token counts with the LARGEST-REMAINDER method (Hamilton
    * apportionment): `base = ⌊B·w/W⌋` per stratum, and the leftover
    * `B − Σbase` goes one unit each to the largest `(B·w) mod W`
    * remainders (ties: stratum name). The result sums to B EXACTLY —
    * what a per-stratum float multiply-and-round cannot promise — and
    * every step is integer arithmetic, so any engine replays it
    * bit-for-bit.
    *
    * Scale shape: the corpus collapses to one count row per stratum
    * (map-side partial) — everything after runs on the strata frame,
    * whose cardinality is sources/languages, i.e. tiny by construction;
    * the scalar totals broadcast, and the remainder rank is a window over
    * that post-aggregation frame (bounded by the stratum count, never a
    * corpus row count). BIGINT headroom: B·w stays exact below 9.2e18 —
    * B=10⁶ against corpora to ~10¹² tokens.
    *
    * @param weights one row per stratum: (stratum, w) — e.g. token counts
    */
  def largestRemainderAlloc(weights: DataFrame, stratum: String,
                            w: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // underscore-prefixed internals: Spark resolves case-insensitively, so
    // an alias like "W" would collide with a caller's weight column "w"
    val tot = weights.agg(sum(col(w)).as("_tot"))
    // bcast-ok: tot is a 1-row global sum aggregate
    val based = weights.crossJoin(broadcast(tot))
      .select(col(stratum), col(w),
        expr(s"($budget * $w) div _tot").as("_base"),
        expr(s"($budget * $w) % _tot").as("_rem"))
    val leftover = based.agg((lit(budget) - sum(col("_base"))).as("_left"))
    // bcast-ok: leftover is a 1-row global aggregate
    based.crossJoin(broadcast(leftover))
      .withColumn("_rk",
        // window-ok: one row per stratum — enum-bounded allocation frame
        row_number().over(Window.orderBy(col("_rem").desc, col(stratum))))
      .select(col(stratum), col(w),
        (col("_base") + when(col("_rk") <= col("_left"), 1L).otherwise(0L))
          .as("alloc"))
  }

  val allocBudget = 1000000L

  def q102BudgetAlloc(spark: SparkSession, dir: String): DataFrame =
    largestRemainderAlloc(
      graft.ops.Text.explodeTokens(
          Tables.documents(spark, dir).select(col("source"), col("text")),
          "text", "tok")
        .groupBy(col("source")).agg(count(lit(1)).as("n_tokens")),
      "source", "n_tokens", allocBudget)

  val q102BudgetAllocSql: String = s"""
    WITH c AS (
      SELECT source, COUNT(*) AS n_tokens
      FROM (SELECT source,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) t
      WHERE tok <> '' GROUP BY source),
    tw AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS W FROM c),
    b AS (SELECT source, n_tokens,
                 ($allocBudget * n_tokens) // W AS base,
                 ($allocBudget * n_tokens) % W AS rem
          FROM c, tw),
    lo AS (SELECT $allocBudget - CAST(SUM(base) AS BIGINT) AS L FROM b),
    r AS (SELECT source, n_tokens, base, L,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
          FROM b, lo)
    SELECT source, n_tokens,
           CAST(base + CASE WHEN rk <= L THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r"""

  // --- q120_ticket_sample: weighted sampling by integer ticket priority ---
  /** 32-bit unsigned integer from the first 8 hex nibbles of
    * `md5(string(key))` — the numeric companion of [[hashBucket]], built
    * with per-nibble `instr` arithmetic because neither engine shares a
    * portable hex→int cast. Exact BIGINT everywhere; the md5 is computed
    * once per row (the nibble extraction reuses one projected column). */
  private[graft] def nibbleSumSql(h: String): String =
    (1 to 8).map { i =>
      s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1) * " +
        s"CAST(${1L << (4 * (8 - i))} AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Weighted sampling without replacement by DISCRETE TICKETS: row i
    * holds `w_i` tickets, each ticket draws an iid uniform 32-bit hash,
    * the row's priority is its MINIMUM ticket, and the sample is the k
    * rows with smallest priority (ties broken by id). More tickets ⇒
    * stochastically smaller minimum ⇒ proportionally higher selection
    * odds — the integer-exact cousin of Efraimidis–Spirakis `u^(1/w)`
    * keys, chosen over the real-valued form because `pow`/`ln` are not
    * correctly-rounded and would diverge between engines, while this
    * priority is exact BIGINT arithmetic any auditor replays bit-for-bit.
    *
    * Scale shape: tickets explode ≤ maxW rows per input row (weights are
    * small integers by construction — quality tiers, not raw scores), the
    * min collapses in a map-side partial agg keyed by id, and the top-k
    * is a TakeOrdered — no global sort, no corpus shuffle beyond the
    * per-id agg. */
  def ticketSample(df: DataFrame, id: String, weight: Column,
                   k: Int): DataFrame = {
    val tickets = df
      .select(col(id), weight.cast("int").as("w"))
      .select(col(id), col("w"), explode(sequence(lit(1), col("w"))).as("r"))
      .select(col(id), col("w"),
        substring(md5(concat(col(id).cast("string"), lit(":"),
          col("r").cast("string")).cast("binary")), 1, 8).as("h"))
    tickets
      .select(col(id), col("w"), expr(nibbleSumSql("h")).as("t"))
      .groupBy(col(id))
      .agg(max(col("w")).as("n_tickets"), min(col("t")).as("priority"))
      .orderBy(col("priority"), col(id))
      .limit(k)
  }

  /** Weight = 1 + (length(text) mod 4) — a stand-in quality tier (1..4)
    * both engines derive identically from the row itself. k=100. */
  def q120TicketSample(spark: SparkSession, dir: String): DataFrame =
    ticketSample(Tables.documents(spark, dir), "doc_id",
      lit(1) + length(col("text")) % 4, k = 100)

  val q120TicketSampleSql: String = s"""
    WITH tk AS (
      SELECT doc_id, w,
             substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
                           CAST(r AS VARCHAR)), 1, 8) AS h
      FROM (SELECT doc_id, 1 + (length(text) % 4) AS w FROM documents) t,
           unnest(range(1, w + 1)) AS u(r)),
    pri AS (
      SELECT doc_id, CAST(MAX(w) AS INT) AS n_tickets,
             MIN(${nibbleSumSql("h")}) AS priority
      FROM tk GROUP BY doc_id)
    SELECT doc_id, n_tickets, CAST(priority AS BIGINT) AS priority
    FROM pri ORDER BY priority, doc_id LIMIT 100"""

  // --- q217_ticket_atscale: weighted sampling's ticket lottery at 2²⁰ ----
  /** At-scale correctness coverage for [[ticketSample]] — q120 runs the
    * lottery over the few-thousand-row documents table; this replays the
    * SAME entry point over a range-synthesized 2²⁰-row frame with weights
    * 1..4 (w = 1 + id mod 4), driving ~2.6M exploded tickets through the
    * md5 priority draw, the map-side per-id min-collapse, and the
    * TakeOrdered top-k. At this scale the winning priorities crowd the
    * extreme low tail of the hash distribution — a biased nibble sum, a
    * dropped ticket, or an off-by-one in the explode bound (`sequence(1,
    * w)` vs `range(1, w+1)`) shifts the boundary of the top-100 and
    * breaks the hash in a way a small corpus rarely exposes. The oracle
    * replays the draw bit-for-bit in DuckDB over its own generated
    * frame. */
  private[graft] val q217Rows = 1L << 20

  private[graft] def q217Frame(spark: SparkSession,
                               rows: Long = q217Rows): DataFrame =
    spark.range(rows).select(col("id").as("doc_id"),
      (lit(1) + (col("id") % 4)).cast("int").as("w"))

  def q217TicketAtScale(spark: SparkSession, dir: String): DataFrame =
    ticketSample(q217Frame(spark), "doc_id", col("w"), k = 100)

  private[graft] def q217OracleSql(rows: Long = q217Rows): String = s"""
    WITH t AS (SELECT CAST(u.i AS BIGINT) AS doc_id,
                      CAST(1 + (u.i % 4) AS INT) AS w
               FROM unnest(range(0, $rows)) AS u(i)),
    tk AS (
      SELECT doc_id, w,
             substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
                           CAST(r AS VARCHAR)), 1, 8) AS h
      FROM t, unnest(range(1, w + 1)) AS u(r)),
    pri AS (
      SELECT doc_id, CAST(MAX(w) AS INT) AS n_tickets,
             MIN(${nibbleSumSql("h")}) AS priority
      FROM tk GROUP BY doc_id)
    SELECT doc_id, n_tickets, CAST(priority AS BIGINT) AS priority
    FROM pri ORDER BY priority, doc_id LIMIT 100"""

  // --- q247_stratified_atscale: the one-pass rate filter at 2^20 rows -----
  /** At-scale correctness coverage for [[stratifiedSample]] — q67 samples
    * the ~500-doc sf corpus over 4 language strata; this replays the SAME
    * entry point over 2²⁰ range rows in 17 strata (`s0`..`s16` = id mod
    * 17) with a rate ladder covering every quantization regime:
    *
    *  - `s0` at rate 0 → threshold "00" admits NO bucket — the named-but-
    *    dropped stratum;
    *  - `s1`..`s14` at rate i/32 → thresholds 8·i/256 exactly (no
    *    quantization residue, so both engines compare identical hex
    *    strings);
    *  - `s15` at rate 1.0 → the "g0" sentinel that must admit EVERY
    *    bucket including "ff";
    *  - `s16` absent from the map entirely → the default-drop discipline
    *    ("a sampling plan should name every stratum it intends to keep")
    *    enforced at volume, not just documented.
    *
    * Selection stays one codegen'd md5 projection — the plan pin holds
    * the operator itself to ZERO shuffles (the gate's rollup owns the
    * only exchange). The oracle replays the identical md5-prefix
    * arithmetic over the same generator; the per-stratum id-sum makes
    * membership exact, not just counted. */
  private[graft] val q247Rows = 1L << 20
  private[graft] val q247Rates: Seq[(String, Double)] =
    (0 to 14).map(i => s"s$i" -> i / 32.0) :+ ("s15" -> 1.0)

  private[graft] def q247Frame(spark: SparkSession,
                               rows: Long = q247Rows): DataFrame =
    spark.range(rows).select(col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(17L))).as("stratum"))

  def q247StratifiedAtScale(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(q247Frame(spark), col("stratum"), col("doc_id"),
        q247Rates.toMap)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_id"),
        min(col("bucket")).as("min_bucket"), max(col("bucket")).as("max_bucket"))

  private[graft] def q247OracleSql(rows: Long = q247Rows): String = {
    val arms = q247Rates.map { case (s, r) =>
      s"WHEN '$s' THEN '${rateThreshold(r)}'"
    }.mkString("\n             ")
    s"""
    WITH b AS (
      SELECT u.i AS doc_id, 's' || (u.i % 17) AS stratum,
             substring(md5(CAST(u.i AS VARCHAR)), 1, 2) AS bucket
      FROM range(0, $rows) AS u(i)),
    kept AS (
      SELECT * FROM b
      WHERE bucket < CASE stratum
             $arms
             ELSE '${rateThreshold(0.0)}' END)
    SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket
    FROM kept GROUP BY stratum"""
  }

  // --- q255_temperature_atscale: α=1/2 rebalancing at 2^20 rows -----------
  /** At-scale correctness coverage for [[temperatureMix]] — q77 rebalances
    * the ~500-doc sf corpus over 5 languages; this replays the SAME entry
    * point (targetFrac=0.25) over a 2²⁰-row corpus with a planted
    * power-of-4 size ladder, the adversarial shape for the α=1/2 rule:
    *
    *  - strata `t1`..`t9` have exactly 4ⁱ rows, so their √n_s are exact
    *    powers of two and the sorted Σ√n fold's addends span 2¹..2⁹ —
    *    any fold-order or quantization drift moves a threshold byte;
    *  - stratum `t0` is the head: the remaining ~699k rows (67% of the
    *    corpus — the "English" that temperature sampling exists to
    *    suppress). Its derived keep-rate lands well under the tail's,
    *    and the whole head passes through ONE broadcast-joined filter —
    *    the corpus is never shuffled for the draw (plan-pinned);
    *  - tiny strata (t1 = 4 rows) get rate 1 → the "g0" sentinel lane
    *    rides the same derivation at volume.
    *
    * The oracle replays the entire derivation — counts, sorted fold,
    * min(1, ·), floor-quantization, md5 bucket compare — over the same
    * range generator, then both sides roll up per stratum with an id-sum
    * so membership is exact. */
  private[graft] val q255Rows = 1L << 20

  /** The planted ladder: (stratum, size) with t1..tL at 4^i rows and the
    * head t0 absorbing the remainder. Shared by the frame builder and the
    * oracle so the boundaries can never drift apart. */
  private[graft] def q255Ladder(rows: Long): Seq[(String, Long)] = {
    val l = Iterator.iterate(4L)(_ * 4).takeWhile(_ <= rows / 4).length
    val tail = (1 to l).map(i => s"t$i" -> (1L << (2 * i)))
    ("t0" -> (rows - tail.map(_._2).sum)) +: tail
  }

  private[graft] def q255Frame(spark: SparkSession,
                               rows: Long = q255Rows): DataFrame = {
    val bounds = q255Ladder(rows).scanLeft(("", 0L)) {
      case ((_, acc), (s, n)) => (s, acc + n)
    }.tail // (stratum, exclusive upper bound) in ladder order — first match wins
    val stratum = bounds.tail.foldLeft(
      when(col("id") < bounds.head._2, bounds.head._1)) {
      case (acc, (s, ub)) => acc.when(col("id") < ub, s)
    }
    spark.range(rows).select(col("id").as("doc_id"), stratum.as("stratum"))
  }

  def q255TemperatureAtScale(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(q255Frame(spark), "stratum", col("doc_id"),
        targetFrac = 0.25)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_id"),
        max(col("bucket")).as("max_bucket"))

  private[graft] def q255OracleSql(rows: Long = q255Rows): String = {
    val arms = q255Ladder(rows).scanLeft(("", 0L)) {
      case ((_, acc), (s, n)) => (s, acc + n)
    }.tail.map { case (s, ub) => s"WHEN u.i < $ub THEN '$s'" }
      .mkString("\n               ")
    s"""
    WITH corpus AS (
      SELECT u.i AS doc_id,
             CASE $arms END AS stratum
      FROM range(0, $rows) AS u(i)),
    n AS (SELECT stratum, COUNT(*) AS ns FROM corpus GROUP BY stratum),
    t AS (SELECT SUM(ns) AS n_tot FROM n),
    d AS (SELECT list_reduce(
                   list_transform(list(ns ORDER BY stratum), x -> sqrt(x)),
                   (x, y) -> x + y) AS den FROM n),
    r AS (SELECT stratum,
                 LEAST(1.0, 0.25::DOUBLE * n_tot * (sqrt(ns) / den) / ns)
                   AS rate
          FROM n, t, d),
    th AS (SELECT stratum,
                  CASE WHEN FLOOR(rate * 256) >= 256 THEN 'g0'
                       ELSE printf('%02x', CAST(FLOOR(rate * 256) AS INT))
                  END AS thr
           FROM r),
    kept AS (SELECT c.doc_id, c.stratum,
                    substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 2) AS bucket
             FROM corpus c JOIN th ON c.stratum = th.stratum
             WHERE substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 2) < th.thr)
    SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           MAX(bucket) AS max_bucket
    FROM kept GROUP BY stratum"""
  }

  // --- q127_group_sample: exactly-k-per-stratum deterministic sample ------
  /** Fixed-SIZE per-stratum sampling — min(k, |stratum|) rows per group,
    * where [[stratifiedSample]] fixes the RATE: the shape an eval set or
    * a per-source human-review queue needs ("20 documents from every
    * language, the same 20 every run"). Order within a stratum is the md5
    * of the row key (uniform, engine-portable, auditable), tie-broken by
    * the key itself, so the sample is a pure function of the data.
    *
    * Scale shape: the per-group top-k rides [[graft.ops.Windows
    * .perGroupTopK]]'s salted two-phase plan — a low-cardinality stratum
    * column (5 languages at any corpus size) never concentrates a
    * stratum on one task the way a naive `row_number over (partition by
    * lang)` would. */
  def groupSample(df: DataFrame, stratum: String, key: Column,
                  k: Int): DataFrame =
    graft.ops.Windows.perGroupTopK(df,
      group = Seq(col(stratum)),
      order = Seq(md5(key.cast("string").cast("binary")), key),
      saltSrc = key, k = k)

  def q127GroupSample(spark: SparkSession, dir: String): DataFrame =
    groupSample(Tables.documents(spark, dir).select("doc_id", "lang"),
      "lang", col("doc_id"), k = 20)
      .select(col("lang"), col("doc_id"), col("rn").cast("int").as("rn"))

  val q127GroupSampleSql: String = """
    SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) t
    WHERE rn <= 20"""

  // --- q146_rendezvous: highest-random-weight (HRW) shard assignment ------
  /** Rendezvous hashing (Thaler–Ravishankar): a key's shard is the
    * `argmax` over shards of `hash(key, shard)` — the consistent-
    * assignment scheme whose defining property is MINIMAL MOVEMENT: when
    * a shard dies, only ITS keys move (they re-argmax over the
    * survivors; every other key's winner is still alive and still
    * maximal). The query emits both the 8-shard and the 7-shard
    * (shard `removedShard` dropped) assignment plus the in-plan derived
    * boolean `stable_ok = moved ⟹ old shard was the removed one` — the
    * hash compare certifies the invariant row-by-row at every SF, not a
    * sampled claim. Hashes are the md5→uint32 nibble substrate; the
    * (hash, shard) argmax is ONE BIGINT `max(h·16 + s)` decoded by
    * `% 16` — no struct comparison semantics to keep aligned across
    * engines, ties (astronomically unlikely) resolve to the larger
    * shard in both.
    *
    * Scale shape: explode ×|shards| into a map-side-partial max agg
    * keyed by the document id — one wordcount-shaped shuffle, no joins,
    * no windows; both assignments ride the same pass (the s ≠ removed
    * max is a conditional aggregate, not a second scan). */
  def rendezvousAssign(df: DataFrame, key: Column, shards: Int,
                       removedShard: Int): DataFrame = {
    require(shards <= 16, "shard id packs into 4 bits of the BIGINT enc")
    df.select(key.as("k"),
        explode(sequence(lit(0), lit(shards - 1))).as("s"))
      .withColumn("h8", substring(md5(concat(col("k").cast("string"),
        lit("#"), col("s").cast("string")).cast("binary")), 1, 8))
      .withColumn("enc",
        expr(nibbleSumSql("h8")) * 16 + col("s"))
      .groupBy(col("k"))
      .agg(max(col("enc")).as("m8"),
        max(when(col("s") =!= removedShard, col("enc"))).as("m7"))
      .select(col("k"),
        (col("m8") % 16).cast("int").as("shard_full"),
        (col("m7") % 16).cast("int").as("shard_reduced"))
      .withColumn("moved", col("shard_full") =!= col("shard_reduced"))
      .withColumn("stable_ok",
        !col("moved") || col("shard_full") === removedShard)
  }

  // --- q171_hash_ring: consistent-hash ring with virtual nodes ------------
  /** The OTHER consistent-assignment scheme next to q146's HRW: shards
    * place `vnodes` points each on a 2³² ring (md5 of "shard:vnode"),
    * a key belongs to the first ring point at-or-after its own hash
    * (wrapping to the ring's minimum). Removing a shard deletes only its
    * points, so exactly its keys move to their successors — the same
    * minimal-movement contract as HRW, reached by a different mechanism
    * (HRW re-ranks per key; the ring has static geometry, which is why
    * real systems pick it when the shard set churns). Virtual nodes are
    * the load-evening device — one point per shard would make arc lengths
    * wildly uneven.
    *
    * Same engine-portable md5→nibble substrate and BIGINT
    * `pos·16 + shard` tie-encoding as [[rendezvousAssign]]; the in-plan
    * `stable_ok` invariant (`moved ⟹ old owner was the dead shard`) is
    * what the hash compare certifies row by row. Scale shape: the ring is
    * S·V rows per key exploded into a map-side-partial min — the q146
    * discipline; the ring itself never ships, it is rederived from
    * constants in the expression. */
  def ringAssign(df: DataFrame, key: Column, shards: Int, vnodes: Int,
                 removedShard: Int): DataFrame = {
    require(shards <= 16, "shard id packs into 4 bits of the BIGINT enc")
    val n = shards * vnodes
    df.select(key.as("k"))
      .withColumn("kh8",
        substring(md5(col("k").cast("string").cast("binary")), 1, 8))
      .withColumn("kh", expr(nibbleSumSql("kh8")))
      .withColumn("i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("s", expr(s"i div $vnodes").cast("int"))
      .withColumn("rh8", substring(md5(concat(col("s").cast("string"),
        lit(":"), expr(s"i % $vnodes").cast("string")).cast("binary")), 1, 8))
      .withColumn("enc", expr(nibbleSumSql("rh8")) * 16 + col("s"))
      .groupBy(col("k"))
      .agg(
        coalesce(min(when(expr("enc div 16") >= col("kh"), col("enc"))),
          min(col("enc"))).as("mf"),
        coalesce(
          min(when(expr("enc div 16") >= col("kh") &&
            col("s") =!= removedShard, col("enc"))),
          min(when(col("s") =!= removedShard, col("enc")))).as("mr"))
      .select(col("k"),
        (col("mf") % 16).cast("int").as("shard_full"),
        (col("mr") % 16).cast("int").as("shard_reduced"))
      .withColumn("moved", col("shard_full") =!= col("shard_reduced"))
      .withColumn("stable_ok",
        !col("moved") || col("shard_full") === removedShard)
  }

  def q171HashRing(spark: SparkSession, dir: String): DataFrame =
    ringAssign(graft.Tables.documents(spark, dir), col("doc_id"),
      shards = 8, vnodes = 4, removedShard = 3)
      .withColumnRenamed("k", "doc_id")

  val q171HashRingSql: String = s"""
    WITH ks AS (
      SELECT doc_id AS k,
             ${nibbleSumSql("substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)")}
               AS kh
      FROM documents),
    x AS (
      SELECT k, kh, CAST(i // 4 AS INT) AS s,
             ${nibbleSumSql(
               "substring(md5(CAST(i // 4 AS VARCHAR) || ':' || " +
               "CAST(i % 4 AS VARCHAR)), 1, 8)")} * 16 + i // 4 AS enc
      FROM ks, unnest(range(32)) AS u(i)),
    a AS (SELECT k,
                 COALESCE(MIN(CASE WHEN enc // 16 >= kh THEN enc END),
                          MIN(enc)) AS mf,
                 COALESCE(MIN(CASE WHEN enc // 16 >= kh AND s <> 3
                                   THEN enc END),
                          MIN(CASE WHEN s <> 3 THEN enc END)) AS mr
          FROM x GROUP BY k),
    r AS (SELECT k AS doc_id,
                 CAST(mf % 16 AS INT) AS shard_full,
                 CAST(mr % 16 AS INT) AS shard_reduced
          FROM a)
    SELECT doc_id, shard_full, shard_reduced,
           shard_full <> shard_reduced AS moved,
           (shard_full = shard_reduced) OR (shard_full = 3) AS stable_ok
    FROM r"""

  def q146Rendezvous(spark: SparkSession, dir: String): DataFrame =
    rendezvousAssign(Tables.documents(spark, dir), col("doc_id"),
      shards = 8, removedShard = 3)
      .withColumnRenamed("k", "doc_id")

  val q146RendezvousSql: String = s"""
    WITH x AS (
      SELECT doc_id AS k, s,
             substring(md5(CAST(doc_id AS VARCHAR) || '#' ||
                           CAST(s AS VARCHAR)), 1, 8) AS h8
      FROM documents, unnest(range(8)) AS u(s)),
    e AS (SELECT k, s, ${nibbleSumSql("h8")} * 16 + s AS enc FROM x),
    a AS (SELECT k, MAX(enc) AS m8,
                 MAX(CASE WHEN s <> 3 THEN enc END) AS m7
          FROM e GROUP BY k),
    r AS (SELECT k AS doc_id,
                 CAST(m8 % 16 AS INT) AS shard_full,
                 CAST(m7 % 16 AS INT) AS shard_reduced
          FROM a)
    SELECT doc_id, shard_full, shard_reduced,
           shard_full <> shard_reduced AS moved,
           (shard_full = shard_reduced) OR (shard_full = 3) AS stable_ok
    FROM r"""

  // --- q192_universe_sample: join-consistent cross-table sampling ---------
  /** Universe sampling: keep a row iff a uniform hash of its JOIN KEY
    * lands in the kept slice — the sampling that COMPOSES across tables.
    * Bernoulli-sampling two fact tables independently and joining them
    * keeps only p² of the matching pairs and biases every per-key
    * aggregate; hashing the shared key keeps a kept order together with
    * ALL of its lineitems, so joins, fan-outs, and per-entity
    * distributions inside the sampled universe are exact, just over 1/mod
    * of the keys. The hash is the md5-nibble BIGINT the sampling family
    * already uses — deterministic, engine-identical, auditable.
    *
    * Scale shape: the filter is a pure projection pushed to each scan —
    * sampling happens BEFORE the shuffle, so the join moves 1/mod of the
    * data; that pre-shuffle cut is the entire point at 100 TB. */
  def universeSample(df: DataFrame, keyCol: String, mod: Int,
                     slice: Int): DataFrame = {
    require(mod > 0 && slice >= 0 && slice < mod,
      s"universeSample: need 0 <= slice < mod, got $slice/$mod")
    // project the md5 prefix once, then filter on the projected column —
    // nibbleSumSql's documented contract (ringAssign/rendezvousAssign do
    // the same) rather than inlining the md5 into all 8 nibble terms
    df.withColumn("__us_h8",
        substring(md5(col(keyCol).cast("string")), 1, 8))
      .filter(expr(nibbleSumSql("__us_h8")) % mod === slice)
      .drop("__us_h8")
  }

  def q192UniverseSample(spark: SparkSession, dir: String): DataFrame = {
    val o = universeSample(graft.Tables.orders(spark, dir), "o_orderkey",
      mod = 10, slice = 0)
    val l = universeSample(graft.Tables.lineitem(spark, dir), "l_orderkey",
      mod = 10, slice = 0)
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        graft.ops.Relational.dsum(col("l_extendedprice")).as("revenue"))
  }

  val q192UniverseSampleSql: String = {
    val h = (k: String) => nibbleSumSql(s"md5(CAST($k AS VARCHAR))")
    s"""
    SELECT COUNT(DISTINCT o_orderkey) AS n_orders,
           COUNT(*) AS n_items,
           ${graft.ops.Relational.dsumSql("l_extendedprice")} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE ${h("o_orderkey")} % 10 = 0
      AND ${h("l_orderkey")} % 10 = 0"""
  }

  // --- q202_shuffle_order: deterministic seeded global training order -----
  /** The global-shuffle step of a training run: assign every document a
    * dense rank 1..N in a seeded pseudorandom order (`md5(seed:id)`), so
    * any engine — and any RERUN — derives the identical epoch order. The
    * usual `ORDER BY rand()` is neither reproducible nor resumable; a
    * hash order is both, and changing the seed string is a fresh epoch.
    * Like the rest of this module it keys on md5 of a stable id (see the
    * object scaladoc for why md5 and not xxhash64).
    *
    * Scale shape — the point of the operator: a naive
    * `row_number() OVER (ORDER BY hash)` funnels the CORPUS through one
    * task. Instead: (1) bucket each row by the first 4 hex digits of its
    * hash — ≤ 65 536 buckets, ~N/65 536 rows each; (2) aggregate
    * per-bucket counts (map-side partial) and turn them into starting
    * offsets with [[graft.ops.Windows.rangePrefixSum]] over the
    * ≤ 65 536-row counts frame; (3) broadcast the offsets back and rank
    * WITHIN each
    * bucket (per-bucket sort, the same salt-safe discipline as q9's
    * top-k). Because the bucket is a prefix of the hash, per-bucket order
    * concatenated in bucket order IS the global hash order. One shuffle
    * of the ids (the per-bucket sort); the corpus's payload columns never
    * move — join the order back by id.
    *
    * The reference has no shuffle operator; its nearest idiom is the
    * app-chosen partition label (`examples/wordcount/wordcount.py:28-37`),
    * which is step (1) here. */
  def shuffleOrder(df: DataFrame, key: Column, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(key.as("k"))
      .withColumn("h",
        md5(concat(lit(seed + ":"), col("k").cast("string")).cast("binary")))
      .withColumn("bkt", substring(col("h"), 1, 4))
    val offsets = graft.ops.Windows.rangePrefixSum(
        keyed.groupBy(col("bkt")).agg(count(lit(1)).as("n")),
        "bkt", "n", "cum")
      .withColumn("off", col("cum") - col("n"))
      .select(col("bkt"), col("off"))
    // bcast-ok: offsets is one row per hex-prefix bucket, ≤ 16^4 rows by construction
    keyed.join(broadcast(offsets), "bkt")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("h"), col("k"))))
      .select(col("k"), (col("off") + col("rn")).as("ord"))
  }

  def q202ShuffleOrder(spark: SparkSession, dir: String): DataFrame =
    shuffleOrder(Tables.documents(spark, dir), col("doc_id"), "epoch0")
      .select(col("k").as("doc_id"), col("ord"))

  val q202ShuffleOrderSql: String = """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS ord
    FROM documents"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_shuffle_order" -> q202ShuffleOrder _,
    "q192_universe_sample" -> q192UniverseSample _,
    "q67_stratified_sample" -> q67StratifiedSample _,
    "q68_cluster_split"     -> q68ClusterSplit _,
    "q77_temperature_mix"   -> q77TemperatureMix _,
    "q102_budget_alloc"     -> q102BudgetAlloc _,
    "q120_ticket_sample"    -> q120TicketSample _,
    "q217_ticket_atscale"   -> q217TicketAtScale _,
    "q247_stratified_atscale" -> q247StratifiedAtScale _,
    "q255_temperature_atscale" -> q255TemperatureAtScale _,
    "q269_clustersplit_atscale" -> q269ClustersplitAtScale _,
    "q127_group_sample"     -> q127GroupSample _,
    "q146_rendezvous"       -> q146Rendezvous _,
    "q171_hash_ring"        -> q171HashRing _,
  )

  def oracles: Map[String, String] = Map(
    "q202_shuffle_order" -> q202ShuffleOrderSql,
    "q192_universe_sample" -> q192UniverseSampleSql,
    "q67_stratified_sample" -> q67StratifiedSampleSql,
    "q68_cluster_split"     -> q68ClusterSplitSql,
    "q77_temperature_mix"   -> q77TemperatureMixSql,
    "q102_budget_alloc"     -> q102BudgetAllocSql,
    "q120_ticket_sample"    -> q120TicketSampleSql,
    "q217_ticket_atscale"   -> q217OracleSql(),
    "q247_stratified_atscale" -> q247OracleSql(),
    "q255_temperature_atscale" -> q255OracleSql(),
    "q269_clustersplit_atscale" -> q269OracleSql(),
    "q127_group_sample"     -> q127GroupSampleSql,
    "q146_rendezvous"       -> q146RendezvousSql,
    "q171_hash_ring"        -> q171HashRingSql,
  )
}
