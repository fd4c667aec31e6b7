package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-selection importance weighting for LLM pretraining corpora.
  *
  * DSIR (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023) scores every raw document by how much its
  * hashed-n-gram feature distribution looks like a small in-domain target
  * set versus the raw pool, then resamples by that weight. The reference
  * engine has no counterpart; this is a training-data-pipeline extension in
  * the q29/q140 family (see SURVEY.md §6).
  *
  * Statistical deviation, chosen deliberately: DSIR's weight is
  * `exp Σ n_b·log(p_t[b]/p_r[b])`. `ln`/`exp` are not IEEE
  * correctly-rounded and diverge between engines (the q140 finding), so the
  * score here is the MEAN LIKELIHOOD RATIO `Σ n_b·r_b / n` with
  * `r_b = p_t[b]/p_r[b]` — same per-bucket evidence, same "target-like ≫ 1,
  * target-unlike ≪ 1" ranking intent, but every arithmetic step is either
  * exact BIGINT or one correctly-rounded double op, summed in sorted bucket
  * order (the q115/q136 fold), so the oracle is bit-identical with no
  * rounding step. Add-one smoothing on both distributions keeps unseen
  * buckets finite, exactly as in the paper.
  *
  * Token conventions are the corpus-wide contract: lowercase,
  * whitespace-split, empty tokens dropped AFTER positioning so adjacency is
  * raw-split-position `pos+1` (the q95 contract); token hash value is
  * `31·len + first-char code` (the q39/q122 formula); bigram bucket is
  * `(v_a·1000003 + v_b) mod 1009` — 1009 a prime, so the multiplicative
  * stride does not alias the hash lattice.
  *
  * Scale shape: one token-stream scan persisted and self-probed with a
  * `(doc, pos+1)` equi-join (no per-doc sort); bucket statistics are a
  * 1009-row frame — broadcast onto the per-doc bucket counts, so the only
  * corpus-sized shuffles are the wordcount-shaped `groupBy(doc, bucket)`
  * and the bigram build. The target/raw split is a column, not a second
  * scan. BIGINT headroom: `(c+1)·(S+1009)` stays exact past 10⁹·10⁹ ≈ the
  * double-exact limit only at ~4·10⁹ total bigrams per side — beyond that
  * the ratio is still a single correctly-rounded division of exactly
  * computed BIGINTs (overflow at ~9.2·10¹⁸ product, i.e. ~3·10⁹ bigrams
  * per bucket × corpus total — far past any real corpus per-bucket count).
  */
object Importance {

  /** Prime bucket count for the hashed bigram feature space. */
  val DsirBuckets = 1009

  private def tokVal(t: Column): Column =
    (length(t) * 31 + ascii(substring(t, 1, 1))).cast("long")

  /** Mean-likelihood-ratio DSIR score for every document with ≥1 bigram.
    *
    * @param isTarget boolean column over `docs` marking the in-domain
    *                 target set; the complement is the raw pool
    */
  def dsirWeights(docs: DataFrame, id: String, text: String,
                  isTarget: Column): DataFrame = {
    val toks = graft.CacheRegistry.persist(graft.ops.Text.posTokens(
      docs.select(col(id), isTarget.as("tgt"), col(text)), text))
    val big = graft.CacheRegistry.persist(
      toks.select(col(id), col("tgt"), col("pos"), tokVal(col("w")).as("va"))
        .join(toks.select(col(id), (col("pos") - 1).as("pos"),
          tokVal(col("w")).as("vb")), Seq(id, "pos"))
        .select(col(id), col("tgt"),
          pmod(col("va") * 1000003L + col("vb"), lit(DsirBuckets.toLong))
            .as("bucket")))
    val cnt = big.groupBy(col("bucket")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val tot = big.agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("st"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("sr"))
    // bcast-ok: tot is a 1-row global aggregate
    val ratios = cnt.crossJoin(broadcast(tot)).select(col("bucket"),
      (((col("ct") + 1) * (col("sr") + DsirBuckets)).cast("double") /
        ((col("cr") + 1) * (col("st") + DsirBuckets)).cast("double")).as("r"))
    big.groupBy(col(id), col("bucket")).agg(count(lit(1)).as("n"))
      // bcast-ok: ratios is one row per bucket — DsirBuckets is a fixed constant
      .join(broadcast(ratios), "bucket")
      .withColumn("v", col("n").cast("double") * col("r"))
      .groupBy(col(id))
      .agg(sum(col("n")).cast("long").as("n_bigrams"),
        // groupagg-ok: ≤ DsirBuckets rows per doc — fixed constant
        sort_array(collect_list(struct(col("bucket"), col("v")))).as("arr"))
      .select(col(id), col("n_bigrams"),
        (aggregate(col("arr"), lit(0.0), (acc, x) => acc + x.getField("v")) /
          col("n_bigrams").cast("double")).as("dsir_score"))
  }

  /** English docs are the in-domain target; everything else is the pool. */
  def q149DsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(spark, dir), "doc_id", "text",
      col("lang") === "en")

  val q149DsirWeightsSql: String = raw"""
    WITH t AS (
      SELECT doc_id, (lang = 'en') AS tgt,
             string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents),
    tok AS MATERIALIZED (
      SELECT doc_id, tgt, u['pos'] AS pos,
             CAST(length(u['w']) * 31 + ascii(u['w'][1:1]) AS BIGINT) AS v
      FROM (
        SELECT doc_id, tgt, unnest(list_transform(range(1, len(ws) + 1),
            i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        FROM t) s
      WHERE u['w'] <> ''),
    big AS MATERIALIZED (
      SELECT x.doc_id, x.tgt, (x.v * 1000003 + y.v) % 1009 AS bucket
      FROM tok x JOIN tok y
        ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
    cnt AS (SELECT bucket,
                   SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                   SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
            FROM big GROUP BY bucket),
    tot AS (SELECT SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS st,
                   SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS sr FROM big),
    r AS (SELECT bucket,
                 CAST((ct + 1) * (sr + 1009) AS DOUBLE) /
                 CAST((cr + 1) * (st + 1009) AS DOUBLE) AS r
          FROM cnt, tot),
    pd AS (SELECT doc_id, bucket, COUNT(*) AS n FROM big
           GROUP BY doc_id, bucket),
    sc AS (SELECT doc_id, SUM(n) AS n_bigrams,
                  list_reduce(
                    list_prepend(0.0, list(CAST(n AS DOUBLE) * r
                                           ORDER BY bucket)),
                    (x, y) -> x + y) AS s
           FROM pd JOIN r USING (bucket) GROUP BY doc_id)
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           s / CAST(n_bigrams AS DOUBLE) AS dsir_score
    FROM sc"""

  // --- q261_dsir_atscale: importance weights at 2^20 documents ------------
  /** At-scale correctness coverage for [[dsirWeights]] — q149 scores the
    * ~500-doc sf corpus; this replays the SAME entry point over 2²⁰
    * range-built documents in 64 text classes (4 tokens each, token
    * spelling `chr(97 + x%26) || x` so the `31·len + first-char` hash
    * actually spreads, class stride constants 7/13/29 mixing the bigram
    * buckets), target = the 8 lowest classes. Every document in a class
    * carries identical bigrams, so its mean-likelihood-ratio score is
    * identical — the output rolls up by class (64 rows) with the count
    * and the min/max score and bigram envelope, pinning both uniformity
    * (min = max) and the exact double (the sorted-bucket fold is
    * replayed in the same order by the oracle, the q149 bit-identity
    * contract at ~2,000× the rows). What the gate holds closed at
    * volume: the bigram build stays a (doc, pos+1) equi-join, bucket
    * stats stay a 1009-row broadcast, and the only corpus-sized
    * shuffles are the two wordcount-shaped aggregates. */
  private[graft] val q261Docs = 1L << 20

  /** Token spelling shared verbatim by the Spark generator and the
    * DuckDB oracle; `e` is the token-index expression. */
  private def q261Tok(e: String): String =
    s"chr(CAST(97 + ($e) % 26 AS INTEGER)) || CAST(($e) AS STRING)"

  private def q261TextSql(idCol: String): String = {
    val c = s"($idCol % 64)"
    Seq(q261Tok(c), q261Tok(s"($c * 7 + 3) % 64"),
        q261Tok(s"($c * 13 + 5) % 64"), q261Tok(s"($c * 29 + 11) % 64"))
      .mkString(" || ' ' || ")
  }

  private[graft] def q261Frame(spark: SparkSession,
                               docs: Long = q261Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"))
      .select(col("doc_id"), expr(q261TextSql("doc_id")).as("text"))

  def q261DsirAtScale(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(q261Frame(spark), "doc_id", "text", col("doc_id") % 64 < 8)
      .groupBy((col("doc_id") % 64).as("cls"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_bigrams")).as("min_bigrams"),
        max(col("n_bigrams")).as("max_bigrams"),
        min(col("dsir_score")).as("min_score"),
        max(col("dsir_score")).as("max_score"))

  private[graft] def q261OracleSql(docs: Long = q261Docs): String = raw"""
    WITH t AS (
      SELECT u.i AS doc_id, (u.i % 64 < 8) AS tgt,
             string_split_regex(lower(trim(${q261TextSql("u.i")})), '\s+')
               AS ws
      FROM range(0, $docs) AS u(i)),
    tok AS MATERIALIZED (
      SELECT doc_id, tgt, u['pos'] AS pos,
             CAST(length(u['w']) * 31 + ascii(u['w'][1:1]) AS BIGINT) AS v
      FROM (
        SELECT doc_id, tgt, unnest(list_transform(range(1, len(ws) + 1),
            i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        FROM t) s
      WHERE u['w'] <> ''),
    big AS MATERIALIZED (
      SELECT x.doc_id, x.tgt, (x.v * 1000003 + y.v) % 1009 AS bucket
      FROM tok x JOIN tok y
        ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
    cnt AS (SELECT bucket,
                   SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                   SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
            FROM big GROUP BY bucket),
    tot AS (SELECT SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS st,
                   SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS sr FROM big),
    r AS (SELECT bucket,
                 CAST((ct + 1) * (sr + 1009) AS DOUBLE) /
                 CAST((cr + 1) * (st + 1009) AS DOUBLE) AS r
          FROM cnt, tot),
    pd AS (SELECT doc_id, bucket, COUNT(*) AS n FROM big
           GROUP BY doc_id, bucket),
    sc AS (SELECT doc_id, SUM(n) AS n_bigrams,
                  list_reduce(
                    list_prepend(0.0, list(CAST(n AS DOUBLE) * r
                                           ORDER BY bucket)),
                    (x, y) -> x + y) AS s
           FROM pd JOIN r USING (bucket) GROUP BY doc_id)
    SELECT doc_id % 64 AS cls, COUNT(*) AS n_docs,
           CAST(MIN(n_bigrams) AS BIGINT) AS min_bigrams,
           CAST(MAX(n_bigrams) AS BIGINT) AS max_bigrams,
           MIN(s / CAST(n_bigrams AS DOUBLE)) AS min_score,
           MAX(s / CAST(n_bigrams AS DOUBLE)) AS max_score
    FROM sc GROUP BY 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_dsir_weights" -> q149DsirWeights _,
    "q261_dsir_atscale" -> q261DsirAtScale _)

  def oracles: Map[String, String] = Map(
    "q149_dsir_weights" -> q149DsirWeightsSql,
    "q261_dsir_atscale" -> q261OracleSql())
}
