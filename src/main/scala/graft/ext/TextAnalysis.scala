package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Text

/** Text-analysis operators for training-data pipelines over `documents`:
  * tf-idf, heuristic language ID, quality scoring, token statistics, and
  * an arithmetic rolling-hash fingerprint. Every function is built from
  * codegen'd expressions whose arithmetic a SQL oracle can mirror exactly
  * — no hash functions that only one engine implements.
  *
  * The reference's only text processing is wordcount-style tokenization in
  * user Python (`/root/reference/examples/wordcount/wordcount.py:20-41`);
  * tf-idf is that pipeline's grown-up form (same tokenizer, one more join).
  */
object TextAnalysis {

  /** Marker-word sets for the n-gram/stopword language heuristic. On real
    * corpora these would be per-language character n-grams; the synthetic
    * corpus shares one vocabulary, so the heuristic discriminates by
    * marker-token frequency — the plumbing (score → argmax → tiebreak) is
    * the part that transfers. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data"),
    "es" -> Seq("query", "row", "table"),
    "de" -> Seq("hash", "merge", "sort"),
    "fr" -> Seq("stream", "batch", "window"),
    "zh" -> Seq("spark", "join", "scan"))

  // --- q29_tfidf: top-3 tf-idf terms per document -------------------------
  // tf is the in-doc term count, idf = ln(N/df); the per-doc rank window is
  // bounded by vocabulary size, so partitionBy(doc_id) never sees an
  // unbounded partition (unlike a low-cardinality key — cf. q9's salting).
  def tfIdf(docs: DataFrame, nDocs: Long): DataFrame = {
    val toks = Text.explodeTokens(docs.select("doc_id", "text"), "text", "word")
      .select("doc_id", "word")
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).as("dfq"))
    tf.join(dfreq, "word")
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("dfq")), 6))
  }

  def q29TfIdf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word"))
    tfIdf(docs, n)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select("doc_id", "word", "tfidf", "rank")
  }

  val q29TfIdfSql: String = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
      FROM documents),
    tok AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfr AS (SELECT word, COUNT(DISTINCT doc_id) AS dfq FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             ROUND(tf.tf * ln(CAST(n.nd AS DOUBLE) / dfr.dfq), 6) AS tfidf
      FROM tf JOIN dfr ON tf.word = dfr.word CROSS JOIN n)
    SELECT doc_id, word, tfidf, rank FROM (
      SELECT doc_id, word, tfidf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, word) AS INT) AS rank
      FROM scored) t
    WHERE rank <= 3"""

  // --- q36_lang_id: marker-frequency language heuristic -------------------
  def langScore(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(markers)))

  def q36LangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokenize(col("text"))
    val scored = Tables.documents(spark, dir).select(
      col("doc_id") +: col("lang").as("labeled_lang") +:
        langMarkers.map { case (l, ms) => langScore(toks, ms).as(s"s_$l") }: _*)
    // argmax with fixed preference order on ties (declaration order)
    val pred = langMarkers.map(_._1).foldRight(lit("und")) { case (l, rest) =>
      val isMax = langMarkers.map(_._1).filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(isMax && col(s"s_$l") > 0, l).otherwise(rest)
    }
    scored.select(Seq(col("doc_id"), col("labeled_lang"), pred.as("pred_lang")) ++
      langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
  }

  val q36LangIdSql: String = {
    val scoreExprs = langMarkers.map { case (l, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ($inList))) AS s_$l"
    }.mkString(",\n             ")
    val langs = langMarkers.map(_._1)
    val caseArms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll AND s_$l > 0 THEN '$l'"
    }.mkString("\n                  ")
    val sCols = langs.map(l => s"CAST(s_$l AS INT) AS s_$l").mkString(", ")
    s"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
             $scoreExprs
      FROM documents)
    SELECT doc_id, labeled_lang,
           CASE $caseArms
                ELSE 'und' END AS pred_lang,
           $sCols
    FROM scored"""
  }

  // --- q37_quality_score: composite document quality ----------------------
  // length band + stopword ratio + mean token length, the standard cheap
  // pre-filter in front of expensive pipeline stages.
  /** Quality columns appended in one pass over `text` — shared by q37 and
    * [[docStats]] so the formula lives in exactly one place. */
  private def withQualityCols(df: DataFrame): DataFrame = {
    val toks = Text.tokenize(col("text"))
    df.withColumn("n_tokens", size(toks))
      .withColumn("__ns", size(filter(toks, t => t.isin("the", "a"))))
      // integer-exact ratios (Relational.ratio6) — same landmine class as
      // quality below: a float round of an integer ratio can disagree
      // across engines at 6-dp boundary doubles
      .withColumn("stop_ratio",
        graft.ops.Relational.ratio6("__ns", "n_tokens"))
      .withColumn("mean_tok_len",
        graft.ops.Relational.ratio6("length(text) - n_tokens + 1", "n_tokens"))
      // quality = 0.3·min(nt/100,1) + 0.4·(1−ns/nt) + 0.3·min(mtl/8,1),
      // computed as ONE exact rational N/Q (Q = 8000·nt) and rounded to
      // 6 dp with integer half-up arithmetic: floor((2N·10⁶+Q)/(2Q)).
      // round(double, 6) here was a cross-engine landmine — Spark rounds
      // the shortest-decimal repr, DuckDB rounds x·10⁶ in floats, and two
      // sf0.1 rows sat exactly on the disagreement boundary. Integer
      // arithmetic has no boundary. (q_ppm ≤ 10⁶, so the final /10⁶ is
      // one correctly-rounded double op — identical everywhere.)
      .withColumn("quality", expr("""
        CASE WHEN n_tokens > 0 THEN
          CAST((2 * (24 * CAST(n_tokens AS BIGINT) *
                       LEAST(CAST(n_tokens AS BIGINT), 100L)
                     + 3200 * (CAST(n_tokens AS BIGINT) - CAST(__ns AS BIGINT))
                     + 300 * LEAST(CAST(length(text) AS BIGINT) - n_tokens + 1,
                                   8 * CAST(n_tokens AS BIGINT)))
                  * 1000000 + 8000 * CAST(n_tokens AS BIGINT))
               div (2 * 8000 * CAST(n_tokens AS BIGINT)) AS DOUBLE) / 1000000
        END"""))
      .drop("__ns")
  }

  def q37QualityScore(spark: SparkSession, dir: String): DataFrame =
    withQualityCols(Tables.documents(spark, dir))
      .select("doc_id", "n_tokens", "stop_ratio", "mean_tok_len", "quality")

  /** Per-document quality + token-budget stats from a SINGLE scan and
    * tokenization of `text` — what a pipeline composition should join
    * against: Catalyst does not merge the separate q37/q38 scans across
    * plan branches, so joining those two queries would tokenize the whole
    * corpus twice. `carry` lets a caller thread extra per-doc columns
    * (e.g. `source`) through the same scan instead of joining a second
    * scan of the corpus back on doc_id. */
  def docStats(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    withQualityCols(docs)
      .withColumn("est_bpe",
        ceil(length(col("text")).cast("double") / 4).cast("long"))
      .select((Seq("doc_id", "n_tokens", "quality", "est_bpe") ++ carry)
        .map(col): _*)

  val q37QualityScoreSql: String = raw"""
    WITH t AS (
      SELECT doc_id, text,
             len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
               AS n_tokens,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x IN ('the', 'a'))) AS n_stop
      FROM documents)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           ${graft.ops.Relational.ratio6Sql("n_stop", "n_tokens")} AS stop_ratio,
           ${graft.ops.Relational.ratio6Sql(
             "length(text) - n_tokens + 1", "n_tokens")} AS mean_tok_len,
           CASE WHEN n_tokens > 0 THEN
             CAST((2 * (24 * n_tokens * LEAST(n_tokens, 100)
                        + 3200 * (n_tokens - n_stop)
                        + 300 * LEAST(length(text) - n_tokens + 1, 8 * n_tokens))
                   * 1000000 + 8000 * n_tokens)
                  // (2 * 8000 * n_tokens) AS DOUBLE) / 1000000
           END AS quality
    FROM t"""

  // --- q188_filter_gate: rule-based keep/drop with a reason bitmask -------
  /** The C4/Gopher-style quality GATE that q37's score feeds: explicit
    * per-rule pass/fail with a REASONS bitmask — a curation run must be
    * able to say not just "dropped 12%" but "7% too short, 3% repetitive,
    * 2% stopword-flooded", and re-tune one rule without re-running the
    * others. Bits: 1 = too short (< minTokens), 2 = too long
    * (> maxTokens), 4 = low diversity (distinct tokens < half of tokens —
    * the repetition signal), 8 = stopword-heavy (> 25%), 16 = short-token
    * gibberish (mean token length < 3 chars). `kept` = reasons 0.
    *
    * Every rule is integer arithmetic on one tokenization pass (counts
    * and cross-multiplied ratio thresholds — no float ratio whose 6-dp
    * boundary could flip a bit), so the gate decision is replayable
    * bit-for-bit by an external auditor. One scan, no shuffle at all:
    * the gate is a projection. */
  def filterGate(docs: DataFrame, id: String, text: String,
                 minTokens: Int = 20, maxTokens: Int = 1000): DataFrame = {
    val toks = Text.tokenize(col(text))
    docs.select(col(id), toks.as("__t"), length(col(text)).as("__len"))
      .select(col(id), size(col("__t")).as("nt"),
        size(array_distinct(col("__t"))).as("nd"),
        size(filter(col("__t"), t => t.isin("the", "a"))).as("ns"),
        col("__len"))
      .select(col(id), col("nt").cast("long").as("n_tokens"),
        (when(col("nt") < minTokens, 1).otherwise(0) +
         when(col("nt") > maxTokens, 2).otherwise(0) +
         when(col("nd") * 2 < col("nt"), 4).otherwise(0) +
         when(col("ns") * 4 > col("nt"), 8).otherwise(0) +
         // mean token length < 3 ⇔ chars-minus-separators < 3·tokens
         when(col("__len") - col("nt") + 1 < col("nt") * 3, 16).otherwise(0))
          .cast("int").as("reasons"))
      .withColumn("kept", col("reasons") === 0)
  }

  def q188FilterGate(spark: SparkSession, dir: String): DataFrame =
    filterGate(Tables.documents(spark, dir), "doc_id", "text")

  val q188FilterGateSql: String = raw"""
    WITH t AS (
      SELECT doc_id, length(text) AS len,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
               AS tk
      FROM documents),
    m AS (SELECT doc_id, len, len(tk) AS nt,
                 len(list_distinct(tk)) AS nd,
                 len(list_filter(tk, x -> x IN ('the', 'a'))) AS ns
          FROM t)
    SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
           CAST((CASE WHEN nt < 20 THEN 1 ELSE 0 END) +
                (CASE WHEN nt > 1000 THEN 2 ELSE 0 END) +
                (CASE WHEN nd * 2 < nt THEN 4 ELSE 0 END) +
                (CASE WHEN ns * 4 > nt THEN 8 ELSE 0 END) +
                (CASE WHEN len - nt + 1 < nt * 3 THEN 16 ELSE 0 END)
             AS INT) AS reasons,
           ((CASE WHEN nt < 20 THEN 1 ELSE 0 END) +
            (CASE WHEN nt > 1000 THEN 2 ELSE 0 END) +
            (CASE WHEN nd * 2 < nt THEN 4 ELSE 0 END) +
            (CASE WHEN ns * 4 > nt THEN 8 ELSE 0 END) +
            (CASE WHEN len - nt + 1 < nt * 3 THEN 16 ELSE 0 END)) = 0
             AS kept
    FROM m"""

  // --- q194_blocklist: categorized term-screen (safety filter) ------------
  /** Category blocklist screen — the safety/compliance sibling of q188's
    * quality gate: per document, exact match counts against each term
    * CATEGORY (not one flat list: policy thresholds differ per category,
    * and the release report needs "flagged for X" breakdowns), plus the
    * screened verdict when any category reaches its threshold. Terms here
    * are drawn from the synthetic corpus vocabulary; a real deployment
    * swaps the dictionary, not the operator.
    *
    * One tokenization pass, per-category counts as codegen'd array
    * filters, no shuffle — the screen is a projection, which is what lets
    * it run inline in an ingest pipeline at any scale. Dictionary size is
    * the per-row cost knob; past a few thousand terms the path is an
    * explode + broadcast dictionary join instead (the q62 decontaminate
    * shape). */
  def blocklistScreen(docs: DataFrame, id: String, text: String,
                      categories: Seq[(String, Seq[String])],
                      threshold: Int = 3): DataFrame = {
    require(categories.nonEmpty, "blocklistScreen: no categories")
    val toks = Text.tokenize(col(text))
    val counted = docs.select(col(id) +: categories.map { case (c, terms) =>
      size(filter(toks, t => t.isin(terms: _*))).cast("long").as(s"n_$c")
    }: _*)
    counted.withColumn("screened",
      categories.map(c => col(s"n_${c._1}") >= threshold)
        .reduce(_ || _))
  }

  /** The q194 dictionary — shared with the oracle so the two cannot
    * drift. */
  val blocklistCategories: Seq[(String, Seq[String])] = Seq(
    "perf"  -> Seq("slow", "fast"),
    "infra" -> Seq("spark", "table"),
    "filler" -> Seq("the", "a"))

  def q194Blocklist(spark: SparkSession, dir: String): DataFrame =
    blocklistScreen(Tables.documents(spark, dir), "doc_id", "text",
      blocklistCategories)

  val q194BlocklistSql: String = {
    val cats = blocklistCategories.map { case (c, terms) =>
      val inList = terms.map(t => s"'$t'").mkString(", ")
      s"CAST(len(list_filter(tk, x -> x IN ($inList))) AS BIGINT) AS n_$c"
    }.mkString(",\n             ")
    val screen = blocklistCategories
      .map { case (c, _) => s"n_$c >= 3" }.mkString(" OR ")
    raw"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
               AS tk
      FROM documents),
    m AS (SELECT doc_id,
             $cats
          FROM t)
    SELECT doc_id, n_perf, n_infra, n_filler, ($screen) AS screened
    FROM m"""
  }

  // --- q197_dataset_card: one-row corpus summary --------------------------
  /** The dataset card's numbers block in one row: document and
    * language/source cardinalities, character volume, the ~4-chars/token
    * BPE estimate, the exact-duplicate ratio (distinct full texts vs
    * docs), and the dominant language with its share (ties to the
    * lexicographically smallest code — deterministic). The summary every
    * corpus release ships; kept to EXACT integers and half-up ratios so
    * two engines (or two releases) can be diffed bit-for-bit.
    *
    * One pass for the global aggregate + one |langs|-sized rollup for the
    * dominant language; `count_distinct(text)` is the only heavy
    * distinct, and it is the point of the number it feeds. */
  def datasetCard(docs: DataFrame, lang: String, source: String,
                  text: String): DataFrame = {
    val langCounts = docs.groupBy(col(lang)).agg(count(lit(1)).as("n"))
    val topN = langCounts.agg(max(col("n")).as("top_n"))
    // bcast-ok: topN is a 1-row global max aggregate
    val top = langCounts.crossJoin(broadcast(topN))
      .filter(col("n") === col("top_n"))
      .agg(min(col(lang)).as("top_lang"), max(col("top_n")).as("tn"))
    docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col(lang)).as("n_langs"),
        countDistinct(col(source)).as("n_sources"),
        sum(length(col(text))).as("total_chars"),
        sum(ceil(length(col(text)).cast("double") / 4).cast("long"))
          .as("est_tokens"),
        countDistinct(col(text)).as("nd"))
      // bcast-ok: top is the languages tied at max count — lang-id enum-bounded
      .crossJoin(broadcast(top))
      .select(col("n_docs").cast("long").as("n_docs"),
        col("n_langs").cast("long").as("n_langs"),
        col("n_sources").cast("long").as("n_sources"),
        col("total_chars").cast("long").as("total_chars"),
        col("est_tokens").cast("long").as("est_tokens"),
        graft.ops.Relational.ratio6("n_docs - nd", "n_docs")
          .as("exact_dup_ratio6"),
        col("top_lang"),
        graft.ops.Relational.ratio6("tn", "n_docs").as("top_lang_share6"))
  }

  def q197DatasetCard(spark: SparkSession, dir: String): DataFrame =
    datasetCard(Tables.documents(spark, dir), "lang", "source", "text")

  val q197DatasetCardSql: String = s"""
    WITH lc AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tn AS (SELECT MAX(n) AS top_n FROM lc),
    tp AS (SELECT MIN(lang) AS top_lang, MAX(top_n) AS tn
           FROM lc CROSS JOIN tn WHERE lc.n = tn.top_n),
    g AS (SELECT COUNT(*) AS n_docs,
                 COUNT(DISTINCT lang) AS n_langs,
                 COUNT(DISTINCT source) AS n_sources,
                 CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                 CAST(SUM(CAST(ceil(CAST(length(text) AS DOUBLE) / 4)
                               AS BIGINT)) AS BIGINT) AS est_tokens,
                 COUNT(DISTINCT text) AS nd
          FROM documents)
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(n_sources AS BIGINT) AS n_sources,
           total_chars, est_tokens,
           ${graft.ops.Relational.ratio6Sql("n_docs - nd", "n_docs")}
             AS exact_dup_ratio6,
           top_lang,
           ${graft.ops.Relational.ratio6Sql("tn", "n_docs")}
             AS top_lang_share6
    FROM g CROSS JOIN tp"""

  // --- q200_gate_report: per-source filter yield + dominant reason --------
  /** The release view over [[filterGate]]: per source, how many documents
    * pass, the pass rate, and the DOMINANT failure reason (the most
    * frequent nonzero reasons-bitmask; ties to the smallest mask —
    * deterministic). This is the number a curation weekly review reads:
    * "source s7 dropped to 61% pass, driven by the repetition rule."
    *
    * Composes the gate (a pure projection) with one (source, reasons)
    * count shuffle and the max-agg + min-mask-over-achievers pick —
    * wordcount-shaped regardless of corpus size. */
  def gateReport(docs: DataFrame, id: String, text: String,
                 dimCol: String): DataFrame = {
    val gated = filterGate(docs.select(col(id), col(text), col(dimCol)),
        id, text)
      .join(docs.select(col(id), col(dimCol)), id)
    val counts = graft.CacheRegistry.persist(
      gated.groupBy(col(dimCol), col("reasons"))
        .agg(count(lit(1)).as("n")))
    val totals = counts.groupBy(col(dimCol))
      .agg(sum(col("n")).as("n_docs"),
        sum(when(col("reasons") === 0, col("n")).otherwise(0L)).as("n_pass"))
    val worstN = counts.filter(col("reasons") =!= 0)
      .groupBy(col(dimCol)).agg(max(col("n")).as("wn"))
    val worst = counts.filter(col("reasons") =!= 0)
      .join(worstN, Seq(dimCol))
      .filter(col("n") === col("wn"))
      .groupBy(col(dimCol)).agg(min(col("reasons")).as("top_reason"))
    totals.join(worst, Seq(dimCol), "left_outer")
      .select(col(dimCol), col("n_docs").cast("long").as("n_docs"),
        col("n_pass").cast("long").as("n_pass"),
        graft.ops.Relational.ratio6("n_pass", "n_docs").as("pass_rate6"),
        col("top_reason").cast("int").as("top_reason"))
  }

  def q200GateReport(spark: SparkSession, dir: String): DataFrame =
    gateReport(Tables.documents(spark, dir), "doc_id", "text", "source")

  val q200GateReportSql: String = raw"""
    WITH t AS (
      SELECT doc_id, source, length(text) AS len,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
               AS tk
      FROM documents),
    m AS (SELECT doc_id, source, len, len(tk) AS nt,
                 len(list_distinct(tk)) AS nd,
                 len(list_filter(tk, x -> x IN ('the', 'a'))) AS ns
          FROM t),
    g AS (SELECT source,
                 (CASE WHEN nt < 20 THEN 1 ELSE 0 END) +
                 (CASE WHEN nt > 1000 THEN 2 ELSE 0 END) +
                 (CASE WHEN nd * 2 < nt THEN 4 ELSE 0 END) +
                 (CASE WHEN ns * 4 > nt THEN 8 ELSE 0 END) +
                 (CASE WHEN len - nt + 1 < nt * 3 THEN 16 ELSE 0 END)
                   AS reasons
          FROM m),
    c AS (SELECT source, reasons, COUNT(*) AS n FROM g GROUP BY 1, 2),
    tot AS (SELECT source, SUM(n) AS n_docs,
                   SUM(CASE WHEN reasons = 0 THEN n ELSE 0 END) AS n_pass
            FROM c GROUP BY source),
    wn AS (SELECT source, MAX(n) AS wn FROM c WHERE reasons <> 0
           GROUP BY source),
    w AS (SELECT c.source, MIN(c.reasons) AS top_reason
          FROM c JOIN wn ON c.source = wn.source AND c.n = wn.wn
          WHERE c.reasons <> 0 GROUP BY c.source)
    SELECT tot.source, CAST(tot.n_docs AS BIGINT) AS n_docs,
           CAST(tot.n_pass AS BIGINT) AS n_pass,
           ${graft.ops.Relational.ratio6Sql("tot.n_pass", "tot.n_docs")}
             AS pass_rate6,
           CAST(w.top_reason AS INT) AS top_reason
    FROM tot LEFT JOIN w ON tot.source = w.source"""

  // --- q38_token_stats: token counting incl. a BPE-ish estimate -----------
  def q38TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokenize(col("text"))
    Tables.documents(spark, dir)
      .withColumn("n_chars_seen", length(col("text")))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_types", size(array_distinct(toks)))
      .withColumn("ttr",
        graft.ops.Relational.ratio6("n_types", "n_tokens"))
      // ~4 chars/subword: the standard quick estimate for BPE vocabularies
      .withColumn("est_bpe", ceil(length(col("text")).cast("double") / 4).cast("long"))
      .select("doc_id", "n_chars_seen", "n_tokens", "n_types", "ttr", "est_bpe")
  }

  val q38TokenStatsSql: String = raw"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars_seen,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
      FROM documents)
    SELECT doc_id, CAST(n_chars_seen AS INT) AS n_chars_seen,
           CAST(len(ts) AS INT) AS n_tokens,
           CAST(len(list_distinct(ts)) AS INT) AS n_types,
           ${graft.ops.Relational.ratio6Sql("len(list_distinct(ts))", "len(ts)")} AS ttr,
           CAST(ceil(CAST(n_chars_seen AS DOUBLE) / 4) AS BIGINT) AS est_bpe
    FROM t"""

  // --- q39_fingerprint: arithmetic rolling hash over the token stream -----
  // Polynomial rolling hash with engine-neutral arithmetic: token value =
  // 31·len + first-char code, acc = (acc·1000003 + v) mod 1e9+7. A
  // sequential fold in both engines — deterministic, and cheap enough to
  // fingerprint every document in a corpus-wide dedup pre-pass. Native
  // codegen expression, not a transform+aggregate HOF — the interpreted
  // fold was the last per-corpus-row HOF on a registered hot path
  // (a property spec pins it bit-identical to the declarative form).
  def rollingFingerprint(text: Column): Column =
    graft.functions.TextExpressions.rollingFingerprint(text)

  /** The declarative HOF spelling of [[rollingFingerprint]] — interpreted,
    * kept ONLY as the equivalence reference the property spec checks the
    * native expression against. */
  private[graft] def rollingFingerprintHof(text: Column): Column = {
    val vals = transform(Text.tokenize(text),
      t => (length(t) * 31 + ascii(substring(t, 1, 1))).cast("long"))
    aggregate(vals, lit(0L),
      (acc, v) => pmod(acc * 1000003L + v, lit(1000000007L)))
  }

  def q39Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), rollingFingerprint(col("text")).as("fingerprint"))

  val q39FingerprintSql: String = """
    WITH t AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
               t -> CAST(length(t) * 31 + ascii(t[1:1]) AS BIGINT)) AS vals
      FROM documents)
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
                       (acc, v) -> (acc * 1000003 + v) % 1000000007) AS fingerprint
    FROM t"""

  // --- q65_repetition: Gopher-style repetition quality signals ------------
  /** Per-document repetition signals — the filters that catch low-quality
    * generated/boilerplate text that length and stopword ratios miss:
    * duplicate 5-gram fraction (what share of the document's 5-grams are
    * repeats) and top 2-gram fraction (how much of the document one bigram
    * dominates). The 5-gram stats are per-row array arithmetic computed
    * BEFORE the 2-gram explode, so the whole signal set costs one corpus
    * scan, one tokenize pass per n, and one doc-keyed aggregate (map-side
    * partial; the (doc, bigram) pre-aggregate bounds the shuffle by
    * per-doc vocabulary, exactly like tf-idf's).
    */
  def repetitionSignals(docs: DataFrame, id: String, text: String): DataFrame = {
    import graft.functions.TextExpressions.ngramShingles
    // The 5-gram stats live in their OWN branch, joined back on doc id —
    // NOT as carried columns on the 2-gram explode: a column riding
    // through Generate re-evaluates per OUTPUT row, so size(array_distinct
    // (5-grams)) would rebuild the whole 5-gram array once per bigram
    // (~500× per document; measured 8.1s → 1s at sf0.1 for this split).
    // The second scan it costs is a column-pruned parquet read — cheap
    // next to re-shingling the corpus hundreds of times.
    val g5 = ngramShingles(col(text), 5)
    val s5 = docs.select(col(id),
      size(g5).as("n5"), size(array_distinct(g5)).as("nd5"))
    val s2 = docs.select(col(id), explode(ngramShingles(col(text), 2)).as("g2"))
      .groupBy(col(id), col("g2"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(id))
      .agg(max(col("c")).as("top2"), sum(col("c")).as("n2"))
    s5.join(s2, Seq(id))
      .select(col(id),
        col("n5").cast("int").as("n_5grams"),
        graft.ops.Relational.ratio6("n5 - nd5", "n5").as("dup_5gram_frac"),
        col("n2").cast("int").as("n_2grams"),
        graft.ops.Relational.ratio6("top2", "n2").as("top_2gram_frac"))
  }

  def q65Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionSignals(Tables.documents(spark, dir), "doc_id", "text")

  val q65RepetitionSql: String = raw"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
      FROM documents),
    g5 AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
             ts[i+3] || ' ' || ts[i+4] AS g
      FROM toks, unnest(range(1, len(ts) - 3)) AS u(i) WHERE len(ts) >= 5
      UNION ALL
      -- COALESCE: array_to_string([], ' ') is NULL in DuckDB, and a NULL
      -- gram silently drops out of COUNT(DISTINCT g) — an EMPTY doc then
      -- reads dup_frac 1.0 while Spark's single-empty-shingle reads 0
      -- (caught by the round-8 edge-corpus sweep)
      SELECT doc_id, COALESCE(array_to_string(ts, ' '), '')
      FROM toks WHERE len(ts) < 5),
    s5 AS (SELECT doc_id, COUNT(*) AS n5, COUNT(DISTINCT g) AS nd5
           FROM g5 GROUP BY 1),
    g2 AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
      FROM toks, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2
      UNION ALL
      SELECT doc_id, COALESCE(array_to_string(ts, ' '), '')
      FROM toks WHERE len(ts) < 2),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
    s2 AS (SELECT doc_id, MAX(c) AS top2, SUM(c) AS n2 FROM c2 GROUP BY 1)
    SELECT s5.doc_id, CAST(s5.n5 AS INT) AS n_5grams,
           ${graft.ops.Relational.ratio6Sql("s5.n5 - s5.nd5", "s5.n5")} AS dup_5gram_frac,
           CAST(s2.n2 AS INT) AS n_2grams,
           ${graft.ops.Relational.ratio6Sql("s2.top2", "s2.n2")} AS top_2gram_frac
    FROM s5 JOIN s2 ON s2.doc_id = s5.doc_id"""

  // --- q66_pii_scrub: pattern redaction over the corpus -------------------
  /** The regexes stick to the Java-regex ∩ RE2 common subset (character
    * classes, bounded repetition, \b) so an external engine auditing the
    * scrub sees identical matches. */
  val emailPattern: String = "[a-z0-9._]+@[a-z0-9.]+"
  val phonePattern: String = "\\b\\d{3}-\\d{4}\\b"

  /** PII scrubbing: count and redact email/phone patterns in one
    * projection — all codegen'd `regexp_*` expressions, no UDF, so the
    * scrub rides whatever scan the pipeline already does and shuffles
    * nothing. Returns the input columns plus (n_emails, n_phones,
    * scrubbed). */
  def piiScrub(docs: DataFrame, text: String): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(text), lit(emailPattern)).cast("int"))
      .withColumn("n_phones", regexp_count(col(text), lit(phonePattern)).cast("int"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col(text), emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))

  /** The synthetic corpus carries no PII, so the query plants a
    * deterministic email/phone per doc_id residue class and scrubs it back
    * out — both engines derive the same injected text, making the scrub
    * itself the thing under test. */
  def q66PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val injected = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com for access")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" now")))
        .otherwise(lit(""))).as("text"))
    piiScrub(injected, "text")
      .select("doc_id", "n_emails", "n_phones", "scrubbed")
  }

  val q66PiiScrubSql: String = """
    WITH inj AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                        || '@example.com for access'
               WHEN doc_id % 3 = 1 THEN ' call 555-'
                                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                                        || ' now'
               ELSE '' END AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS INT)
             AS n_phones,
           regexp_replace(
             regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
             '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
    FROM inj"""

  // --- q72_heavy_hitters: count-min-sketch token frequencies --------------
  /** Count-min sketch over the token stream, built declaratively: each
    * token occurrence contributes `depth` (row, hash-cell) increments, and
    * the groupBy over cells partial-aggregates map-side — so the shuffle
    * carries at most depth×width rows TOTAL (the sketch size, here 4×1024),
    * regardless of corpus size. That is the point of the sketch at 100 TB:
    * token frequencies without a vocabulary-sized shuffle, mergeable across
    * any partitioning (cells are counters — union-then-sum ≡ sum-then-sum).
    *
    * The estimate for a token is the MIN over its depth cells; collisions
    * only ever inflate it, giving the classic one-sided guarantee
    *   true_n ≤ estimate ≤ true_n + (collision mass in the best row).
    * The returned frame pins both sides against an exact count computed
    * from the same scan: `over_ok` (estimate never undercounts — that one
    * is structural, collisions only add) and `bound_ok` (estimate within
    * depth·N/width slack — the CM error bound, which is probabilistic:
    * it holds with overwhelming probability for these depth/width choices
    * and is VERIFIED on the fixture corpora the way q31 pins LSH recall;
    * a refactor that degrades the hashing or shrinks the sketch fails the
    * oracle rather than silently losing accuracy). On a real corpus the
    * exact join side would be replaced by a candidate sample; here it
    * doubles as the verification oracle. */
  def tokenHeavyHitters(docs: DataFrame, text: String,
                        depth: Int = 4, width: Int = 1024,
                        minShare: Double = 0.001): DataFrame = {
    // persisted: the token stream feeds both the sketch build and the
    // exact counts — without it the corpus is scanned and tokenized twice
    val toks = graft.CacheRegistry.persist(
      Text.explodeTokens(docs.select(col(text)), text, "tok"))
    val cells = toks
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("r"),
          pmod(xxhash64(col("tok"), lit(i)), lit(width.toLong)).as("h"))): _*))
        .as("c"))
      .groupBy(col("c.r").as("r"), col("c.h").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val est = exact
      .select(col("tok"), col("n"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("r"),
            pmod(xxhash64(col("tok"), lit(i)), lit(width.toLong)).as("h"))): _*))
          .as("c"))
      // bcast-ok: count-min sketch cells — fixed depth x width
      .join(broadcast(cells),
        col("c.r") === col("r") && col("c.h") === col("h"))
      .groupBy(col("tok"), col("n"))
      .agg(min(col("cnt")).as("est"))
    // total token count derived from the exact counts — not a third pass
    val total = exact.agg(sum(col("n")).as("total"))
    // threshold in DECIMAL: `total * 0.001` must admit the same boundary
    // tokens in every engine — double arithmetic would make n == total/1000
    // an engine-dependent membership (3000 * 0.001 is 3.0000000000000004
    // as a double, exactly 3.000 as a decimal, which is what SQL computes)
    val share = lit(BigDecimal(minShare).underlying())
    // bcast-ok: total is a 1-row global aggregate
    est.crossJoin(broadcast(total))
      .filter(col("n") >= col("total") * share)
      .select(col("tok"), col("n"),
        (col("est") >= col("n")).as("over_ok"),
        (col("est") <= col("n") + lit(depth) * col("total") / width)
          .as("bound_ok"))
  }

  def q72HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    tokenHeavyHitters(Tables.documents(spark, dir), "text")

  /** Exact counts hash-checked; the sketch columns are derived booleans
    * (q13's pattern — DuckDB has no xxhash64, so the oracle pins the
    * guarantees, not the estimates). */
  val q72HeavyHittersSql: String = """
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS tok
      FROM documents),
    n AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
    t AS (SELECT COUNT(*) AS total FROM tok)
    SELECT tok, n, TRUE AS over_ok, TRUE AS bound_ok
    FROM n CROSS JOIN t
    WHERE n >= total * 0.001"""

  // --- boilerplate-line removal -------------------------------------------
  /** Strip lines that appear in ≥ `minDocs` distinct documents — the
    * header/footer/cookie-banner scrub of crawl curation (the CCNet /
    * RefinedWeb line-dedup rule). Returns every input document with its
    * cleaned text, total line count, and removed-line count, so the
    * decision is auditable per document.
    *
    * Scale shape: one explode pass is shared (persisted) by the hot-line
    * detection and the rebuild; line doc-frequency is `distinct` +
    * `groupBy.count` + join — map-side partial aggregation, NO value-keyed
    * window, so a line present in half the corpus spreads across tasks
    * instead of landing on one (the q31/q35 df-skew lesson). The rebuild
    * groups by document id — partitions bounded by document size. The hot
    * set joins by line hash-shuffle; it is NOT forced to broadcast because
    * "lines shared by many documents" can be corpus-scale wide. */
  def removeBoilerplate(docs: DataFrame, id: String, text: String,
                        minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // NULL-text docs: posexplode(split(NULL)) emits zero rows, which would
    // silently DROP the document (the q69 bloom null-doc lesson). Route
    // them around the line pipeline and re-attach with cleaned = NULL,
    // zero counts — nullness preserved, every input id present exactly once.
    val nullDocs = docs.filter(col(text).isNull)
      .select(col(id), lit(null).cast("string").as("cleaned"),
        lit(0L).as("n_lines"), lit(0L).as("n_removed"))
    val lines = graft.CacheRegistry.persist(docs.filter(col(text).isNotNull)
      .select(col(id), posexplode(split(col(text), "\n")).as(Seq("pos", "line"))))
    val hot = lines.select(col(id), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(true).as("hot"))
    lines.join(hot, Seq("line"), "left_outer")
      .groupBy(col(id))
      .agg(
        // collect_list skips nulls, so the when() keeps only cold lines;
        // sort_array restores document order after the shuffle
        // groupagg-ok: one document's lines — doc-sized, never corpus-scaled
        array_join(transform(
          sort_array(collect_list(
            when(col("hot").isNull, struct(col("pos"), col("line"))))),
          p => p.getField("line")), "\n").as("cleaned"),
        count(lit(1)).as("n_lines"),
        count(col("hot")).as("n_removed"))
      .unionByName(nullDocs)
  }

  // --- q78_boilerplate: fixture web corpus → scrubbed pages ---------------
  /** Runs the scrub over the checked-in `fixtures/web/` corpus (8 pages
    * sharing nav/footer/cookie lines, unique content lines; trailing ''
    * from the final newline is in all 8). minDocs=5 removes exactly the
    * shared chrome. The oracle replays line splitting, doc-frequency,
    * threshold, and ordered reassembly in DuckDB from the same files. */
  def q78Boilerplate(spark: SparkSession, dir: String): DataFrame =
    removeBoilerplate(
      // glob, not the bare dir, so a future non-.txt file (README, editor
      // backup) can't become a 9th document the *.txt-reading oracle
      // never sees — the q53 lesson
      spark.read.option("wholetext", "true").text(s"${Text.fixturesDir}/web/*.txt")
        .select(regexp_extract(input_file_name(), "[^/]+$", 0).as("doc"),
          col("value").as("text")),
      "doc", "text", minDocs = 5)

  val q78BoilerplateSql: String = s"""
    WITH docs AS (
      SELECT regexp_extract(filename, '[^/]+$$') AS doc, content AS text
      FROM read_text('${Text.fixturesDir}/web/*.txt')),
    t AS (SELECT doc, string_split(text, chr(10)) AS ls FROM docs),
    l AS (SELECT doc, i AS pos, ls[i] AS line
          FROM t, unnest(range(1, len(ls) + 1)) AS u(i)),
    hot AS (SELECT line FROM (
              SELECT line, COUNT(DISTINCT doc) AS nd FROM l GROUP BY line)
            WHERE nd >= 5)
    SELECT doc,
           COALESCE(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE line NOT IN (SELECT line FROM hot)), '')
             AS cleaned,
           COUNT(*) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE line IN (SELECT line FROM hot)) AS BIGINT)
             AS n_removed
    FROM l GROUP BY doc"""

  // --- q240_boilerplate_atscale: the line-frequency scrub at 2^20 docs ----
  /** At-scale correctness coverage for [[removeBoilerplate]] — q78 scrubs
    * an 8-page fixture; this replays the SAME entry point over 2²⁰
    * range-built documents of four lines each (~4.2M exploded line rows),
    * with every line class planted at a KNOWN document frequency so the
    * survivor set is closed-form and the oracle needs no line logic at
    * all:
    *
    *  - `sitewide cookie banner` — in ALL 2²⁰ docs: the crawl-scale hot
    *    line (df = 2²⁰ ≫ minDocs, removed). This is the skew key the
    *    operator's no-window design exists for: its doc-frequency comes
    *    from a (doc,line)-distinct + map-side-partial groupBy, so the
    *    2²⁰ copies spread across tasks instead of landing on one;
    *  - `u<d>` — unique per document (df = 1, survives);
    *  - `g15 <d div 15>` — shared by exactly 15 docs (df = 15 = minDocs−1,
    *    survives; the final partial group has df = 1, also below);
    *  - `g16 <d div 16>` — shared by exactly 16 docs (df = 16 = minDocs,
    *    removed). 2²⁰ is divisible by 16, so EVERY g16 group sits exactly
    *    ON the threshold: a `>` -for- `>=` regression flips all 2²⁰ g16
    *    lines into survivors and breaks every rollup column.
    *
    * Expected per-doc output is therefore `u<d>\ng15 <d div 15>` with
    * n_lines = 4, n_removed = 2 — the oracle EMITS that construction from
    * the same range generator (closed form, no frequency computation) and
    * rolls both sides up to 64 buckets of counts, exact sums, and
    * lexicographic cleaned-text extrema. */
  private[graft] val q240Docs = 1L << 20

  private[graft] def q240Frame(spark: SparkSession,
                               docs: Long = q240Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      concat_ws("\n",
        lit("sitewide cookie banner"),
        concat(lit("u"), col("id")),
        concat(lit("g15 "), expr("id div 15")),
        concat(lit("g16 "), expr("id div 16"))).as("text"))

  def q240BoilerplateAtScale(spark: SparkSession, dir: String): DataFrame =
    removeBoilerplate(q240Frame(spark), "doc_id", "text", minDocs = 16)
      .groupBy(pmod(col("doc_id"), lit(64L)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_lines")).as("sum_lines"),
        sum(col("n_removed")).as("sum_removed"),
        sum(length(col("cleaned")).cast("long")).as("sum_len"),
        min(col("cleaned")).as("min_cleaned"),
        max(col("cleaned")).as("max_cleaned"))

  private[graft] def q240OracleSql(docs: Long = q240Docs): String = s"""
    WITH c AS (
      SELECT u.i AS doc_id,
             'u' || u.i || chr(10) || 'g15 ' || (u.i // 15) AS cleaned
      FROM range(0, $docs) AS u(i))
    SELECT CAST(doc_id % 64 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 4 AS BIGINT) AS sum_lines,
           CAST(COUNT(*) * 2 AS BIGINT) AS sum_removed,
           CAST(SUM(length(cleaned)) AS BIGINT) AS sum_len,
           MIN(cleaned) AS min_cleaned, MAX(cleaned) AS max_cleaned
    FROM c GROUP BY 1"""

  // --- q90_bpe_pairs: one BPE-trainer iteration's pair statistics ---------
  /** Adjacent-symbol pair counts weighted by word frequency — the inner
    * loop of byte-pair-encoding vocabulary training, distributed. Scale
    * shape: the corpus collapses to (word, count) FIRST (map-side partial
    * agg — the shuffle carries the vocabulary, not the corpus), then
    * pairs explode from DISTINCT words only and aggregate with another
    * map-side partial. The per-word pair explode is a `transform` HOF
    * over the vocabulary-bounded frame, NOT a corpus hot path — the
    * per-corpus-row discipline stays HOF-free. Top-k is a global
    * TakeOrdered with a full (n, pair) tiebreak, so the cut is
    * deterministic in both engines. */
  def bpePairCounts(docs: DataFrame, text: String, k: Int): DataFrame = {
    val words = graft.ops.Text
      .explodeTokens(docs.select(col(text)), text, "word")
      .groupBy("word").agg(count(lit(1)).as("wc"))
    words.filter(length(col("word")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(word) - 1), " +
          "i -> concat(substring(word, i, 1), ' ', substring(word, i + 1, 1)))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  def q90BpePairs(spark: SparkSession, dir: String): DataFrame =
    bpePairCounts(Tables.documents(spark, dir), "text", 30)

  // --- q244_bpe_atscale: corpus→vocab collapse + pair stats at 2^22 tokens -
  /** At-scale correctness coverage for [[bpePairCounts]] — q90 trains on
    * the ~500-doc sf corpus; this replays the SAME entry point over 2²⁰
    * range-built documents of four tokens each (2²² corpus tokens), with
    * a harmonically-skewed planted vocabulary so the operator's central
    * scale claim — "the corpus collapses to (word, count) FIRST; the
    * shuffle carries the vocabulary, not the corpus" — is exercised at a
    * 1000:1 corpus-to-vocab ratio:
    *
    *  - token t ∈ [0, 2²²) has rank r(t) = 2²² div (t+1) — a harmonic
    *    frequency curve (≈ 2²²/r² occurrences of rank r) over ~4,095
    *    distinct ranks, topped by rank 1 at 2²¹ occurrences (HALF the
    *    corpus is one word — the skew extreme the map-side partial agg
    *    must absorb);
    *  - the word for rank r is its decimal spelling under a digit→letter
    *    map (`translate` to a–j), so every adjacent character pair is a
    *    pure function of r's digits and the DuckDB oracle can replay the
    *    identical collapse → pair-explode → weighted count → full
    *    (n desc, pair) argsort bit-for-bit from the same generator;
    *  - ranks 1–9 spell one-character words — including that heaviest
    *    hitter — which the `length ≥ 2` guard must exclude from pair
    *    statistics AFTER they flowed through the vocabulary collapse
    *    (a guard regression injects the 2²¹-weight word's phantom pairs
    *    and reorders the entire top-k).
    *
    * Output: the same top-30 (pair, n) frame as q90, cut by the
    * deterministic (n desc, pair) total order. */
  private[graft] val q244Docs = 1L << 20
  private[graft] val q244Tokens = 4L << 20

  private[graft] def q244Frame(spark: SparkSession,
                               docs: Long = q244Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      expr(s"""array_join(transform(sequence(0, 3),
                 j -> translate(cast(${4 * docs} div (id * 4 + j + 1)
                                     as string),
                                '0123456789', 'abcdefghij')), ' ')""")
        .as("text"))

  def q244BpeAtScale(spark: SparkSession, dir: String): DataFrame =
    bpePairCounts(q244Frame(spark), "text", 30)

  private[graft] def q244OracleSql(tokens: Long = q244Tokens): String = s"""
    WITH t AS (
      SELECT $tokens // (u.i + 1) AS r FROM range(0, $tokens) AS u(i)),
    w AS (
      SELECT translate(CAST(r AS VARCHAR), '0123456789', 'abcdefghij')
               AS word,
             COUNT(*) AS wc
      FROM t GROUP BY 1),
    p AS (
      SELECT wc, substring(word, CAST(u.i AS INT), 1) || ' ' ||
                 substring(word, CAST(u.i AS INT) + 1, 1) AS pair
      FROM w, unnest(range(1, length(word))) AS u(i)
      WHERE length(word) >= 2)
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
    FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 30"""

  // --- q153_phrase_search: positional adjacency phrase query --------------
  /** Phrase retrieval over a positional index: find every document
    * containing an exact two-word phrase, with occurrence count and first
    * position — what a unigram index (q97) cannot answer and bag-of-words
    * relevance (q136 BM25) cannot distinguish from scattered terms. The
    * phrase itself is data-derived IN-PLAN: the corpus's most frequent
    * bigram (count desc, then lexicographic — the deterministic argmax
    * discipline), so the operator is a pure function of the corpus.
    *
    * Scale shape: ONE token-stream scan persisted and self-probed with the
    * `(doc, pos+1)` equi-join (q95's positional-adjacency contract — a
    * phrase of length n chains n−1 such joins, each a hash join on
    * (doc, pos), never a per-doc sort); the argmax is a 1-row frame joined
    * back as a BROADCAST, so the corpus is never reshuffled to learn the
    * phrase. Occurrence counting is a map-side-partial `groupBy(doc)`. */
  def phraseSearch(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = graft.CacheRegistry.persist(
      graft.ops.Text.posTokens(docs.select(col(id), col(text)), text))
    val big = graft.CacheRegistry.persist(
      toks.select(col(id), col("pos"), col("w").as("a"))
        .join(toks.select(col(id), (col("pos") - 1).as("pos"),
          col("w").as("b")), Seq(id, "pos")))
    val top = big.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b")).limit(1)
      .select(col("a").as("qa"), col("b").as("qb"))
    // bcast-ok: top is limit(1)
    big.join(broadcast(top),
        col("a") === col("qa") && col("b") === col("qb"))
      .groupBy(col(id))
      .agg(count(lit(1)).cast("long").as("n_hits"),
        min(col("pos")).cast("long").as("first_pos"),
        first(concat(col("qa"), lit(" "), col("qb"))).as("phrase"))
  }

  def q153PhraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.documents(spark, dir), "doc_id", "text")

  val q153PhraseSearchSql: String = raw"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents),
    tok AS MATERIALIZED (
      SELECT doc_id, u['pos'] AS pos, u['w'] AS w FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
            i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        FROM t) s
      WHERE u['w'] <> ''),
    big AS MATERIALIZED (
      SELECT x.doc_id, x.pos, x.w AS a, y.w AS b
      FROM tok x JOIN tok y
        ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
    q AS (SELECT a AS qa, b AS qb FROM (
            SELECT a, b, COUNT(*) AS n FROM big GROUP BY a, b)
          ORDER BY n DESC, a, b LIMIT 1)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
           MIN(pos) AS first_pos, ANY_VALUE(qa || ' ' || qb) AS phrase
    FROM big JOIN q ON a = qa AND b = qb
    GROUP BY doc_id"""

  // --- q234_phrase_atscale: the positional index + argmax at 2^20 docs ----
  /** At-scale correctness coverage for [[phraseSearch]] — q153 probes ~500
    * documents; this replays the SAME entry point (positional self-join,
    * global bigram argmax, 1-row broadcast probe) over 2²⁰ range-built
    * documents of 10 tokens each: ~10.5M positional tokens and ~9.4M
    * bigram rows through the (doc, pos+1) equi-join. The two doc classes
    * alternate the same four tokens in opposite phase —
    *
    *   class 0: `aa bb aa bb cc dd cc dd aa bb` → (aa,bb)×3 at pos 0,
    *            (cc,dd)×2
    *   class 1: `cc dd cc dd aa bb aa bb cc dd` → (cc,dd)×3, (aa,bb)×2
    *            at pos 4
    *
    * so the two top bigrams TIE globally at exactly 5·2¹⁹ occurrences and
    * only the argmax's full ordering (count desc, THEN lexicographic a, b)
    * picks `aa bb` — the tie-break discipline is load-bearing at 2²⁰-doc
    * volume, not just on the 500-doc corpus. Per-class hit counts and
    * first positions are closed-form; the rollup's min=max pins them
    * uniformly across every document. */
  private[graft] val q234Docs = 1L << 20

  private[graft] def q234Frame(spark: SparkSession,
                               docs: Long = q234Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2L)) === 0,
        lit("aa bb aa bb cc dd cc dd aa bb"))
        .otherwise(lit("cc dd cc dd aa bb aa bb cc dd")).as("text"))

  def q234PhraseAtScale(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(q234Frame(spark), "doc_id", "text")
      .groupBy(pmod(col("doc_id"), lit(2L)).as("cls"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_hits")).as("min_hits"), max(col("n_hits")).as("max_hits"),
        min(col("first_pos")).as("min_fp"), max(col("first_pos")).as("max_fp"),
        min(col("phrase")).as("min_phrase"), max(col("phrase")).as("max_phrase"))

  private[graft] def q234OracleSql(docs: Long = q234Docs): String = s"""
    SELECT CAST(0 AS BIGINT) AS cls, CAST(${docs / 2} AS BIGINT) AS n_docs,
           CAST(3 AS BIGINT) AS min_hits, CAST(3 AS BIGINT) AS max_hits,
           CAST(0 AS BIGINT) AS min_fp, CAST(0 AS BIGINT) AS max_fp,
           'aa bb' AS min_phrase, 'aa bb' AS max_phrase
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(${docs / 2} AS BIGINT),
           CAST(2 AS BIGINT), CAST(2 AS BIGINT),
           CAST(4 AS BIGINT), CAST(4 AS BIGINT), 'aa bb', 'aa bb'"""

  // --- q152_bpe_encode: BPE training + greedy merge application ----------
  /** The other half of byte-pair encoding: [[bpePairCounts]] is one
    * trainer ITERATION's statistics; this runs the full trainer for
    * `merges` rounds and APPLIES the learned merge table, returning every
    * vocabulary word's BPE segmentation (Sennrich et al. 2016 — the
    * subword algorithm under GPT-2-family tokenizers).
    *
    * Scale shape: the corpus collapses to the (word, wc) vocabulary ONCE
    * (the shuffle carries the vocabulary, q90's discipline); every trainer
    * round then touches only the vocab-sized frame — adjacent-pair explode
    * + one map-side-partial agg + a 1-row argmax. That argmax `collect` is
    * the MODEL UPDATE of an inherently sequential trainer (merge i+1
    * depends on merge i): one driver round-trip per round, exactly the
    * control-plane cadence of [[graft.graph.Pregel]]'s halt vote — data
    * never leaves the cluster, the model (the merge table) is
    * driver/broadcast-sized BY DESIGN, like any trained tokenizer.
    * Encoding a 100 TB corpus afterwards is a broadcast join of this
    * frame on `word`.
    *
    * Merge application is a sequential left-to-right greedy fold over the
    * symbol array (`aggregate`): merging the previous pair changes the
    * array tail, so it cannot be a positional `transform` — and because
    * the fold runs on the VOCABULARY frame, the per-corpus-row hot path
    * stays HOF-free. Tie-breaks (count desc, then pair lexicographic) make
    * the learned table deterministic, so the DuckDB oracle can re-run the
    * identical trainer via generated per-round CTEs — the q92 unrolling
    * pattern with a data-dependent step: DuckDB 1.0's `list_reduce` fixes
    * the accumulator to the element type, so the oracle folds over
    * single-symbol LISTS (`x -> [x]`) to get a list-typed accumulator. */
  def bpeEncode(docs: DataFrame, text: String, merges: Int): DataFrame = {
    var vocab = graft.CacheRegistry.persist(
      graft.ops.Text.explodeTokens(docs.select(col(text)), text, "word")
        .groupBy("word").agg(count(lit(1)).as("wc"))
        .withColumn("syms", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
    for (_ <- 1 to merges) {
      val best = vocab.filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        // collect-ok: limit(1) — the BPE training argmax, one row per merge
        .limit(1).collect()
      if (best.nonEmpty) {
        val a = best(0).getAs[String]("a")
        val b = best(0).getAs[String]("b")
        // Column-API fold (no SQL-string interpolation: symbols can be any
        // corpus text, including quotes); CASE evaluates one branch only,
        // so the slice never sees an empty accumulator
        val folded = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) =>
            when(size(acc) > 0 &&
                 element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        vocab = graft.CacheRegistry.persist(vocab.withColumn("syms", folded))
      }
    }
    vocab.select(col("word"), col("wc").cast("long").as("wc"),
      size(col("syms")).as("n_tokens"),
      concat_ws(" ", col("syms")).as("segmented"))
  }

  val bpeMerges = 8

  def q152BpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(Tables.documents(spark, dir), "text", bpeMerges)

  /** The identical trainer unrolled: per round, pair counts → 1-row argmax
    * (same tie-break) → correlated-lambda fold applying the merge. */
  val q152BpeEncodeSql: String = {
    val prelude = raw"""
      WITH w AS (
        SELECT word, COUNT(*) AS wc
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
              FROM documents) t
        WHERE word <> '' GROUP BY word),
      v0 AS MATERIALIZED (
        SELECT word, wc, string_split(word, '') AS syms FROM w)"""
    val rounds = (1 to bpeMerges).map { k =>
      s""", p$k AS (
        SELECT u['a'] AS a, u['b'] AS b, SUM(wc) AS n
        FROM (SELECT wc, unnest(list_transform(range(1, len(syms)),
                i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS u
              FROM v${k - 1} WHERE len(syms) >= 2) s
        GROUP BY u['a'], u['b']),
      -- exactly ONE row even when no pairs remain: the ('','') sentinel
      -- can never match a symbol (tokens are non-empty), making the round
      -- a no-op — the Scala trainer's `if (best.nonEmpty)` branch. An
      -- empty b$k would cross-join v${k - 1} down to zero rows instead.
      b$k AS (SELECT a, b FROM (
                (SELECT a, b, 0 AS pri FROM p$k ORDER BY n DESC, a, b LIMIT 1)
                UNION ALL
                (SELECT '', '', 1)
                ORDER BY pri LIMIT 1)),
      v$k AS MATERIALIZED (
        SELECT word, wc,
               list_reduce(list_transform(syms, x -> [x]),
                 (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$k.a
                                       AND x[1] = b$k.b
                             THEN list_append(acc[1:len(acc) - 1],
                                              b$k.a || b$k.b)
                             ELSE list_concat(acc, x) END) AS syms
        FROM v${k - 1}, b$k)"""
    }.mkString
    s"""$prelude$rounds
    SELECT word, CAST(wc AS BIGINT) AS wc,
           CAST(len(syms) AS INT) AS n_tokens,
           array_to_string(syms, ' ') AS segmented
    FROM v$bpeMerges"""
  }

  val q90BpePairsSql: String = raw"""
    WITH w AS (
      SELECT word, COUNT(*) AS wc
      FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
            FROM documents) t
      WHERE word <> '' GROUP BY word),
    p AS (
      SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
      FROM (SELECT wc,
                   unnest(list_transform(range(1, length(word)),
                     i -> substring(word, i, 1) || ' ' || substring(word, i + 1, 1)))
                     AS pair
            FROM w WHERE length(word) >= 2) t
      GROUP BY pair)
    SELECT pair, n FROM p ORDER BY n DESC, pair LIMIT 30"""

  // --- q95_cooccur: windowed co-occurrence with exact lift ----------------
  /** Skip-gram-style co-occurrence counts within a ±`win` token window —
    * the statistics under word2vec/GloVe/PMI features — with an EXACT
    * association score: `lift = n_ab·T / (n_a·n_b)` computed with the
    * integer half-up arithmetic of [[graft.ops.Relational.ratio6]], never
    * a float log. Ordered pairs (a before b), so the pair key needs no
    * canonicalization.
    *
    * Scale shape: tokenize ONCE into (doc_id, pos, word) and persist; the
    * forward window is a doc-keyed LEAD window — each token reads its
    * `win` successors (word and position) in one pass and keeps those
    * within positional distance ≤ win, which matches the positional
    * EQUI-join formulation row-for-row (positions strictly increase per
    * doc, so the tokens at pos+1..pos+win are among the next `win` rows;
    * a filtered-out empty token leaves a gap that the `p ≤ pos+win`
    * guard preserves exactly). One |tokens|-row exchange + per-doc sort
    * replaces the old explode side (win·|tokens| rows) AND the token
    * side of the join — measured 2.7×/1.9× less shuffled data on the
    * 2²⁰-doc gate's two heavy exchanges. The window partition is a
    * document — bounded by doc length, never value-keyed. Unigram counts
    * reuse the same persisted tokens; the top-k cut is a global
    * TakeOrdered with a full (n, a, b) tiebreak.
    * BIGINT headroom: the lift numerator is `2·n_ab·T·10⁶` — exact while
    * n_ab·T < 4.6e12, i.e. corpora to ~10⁸ tokens with millions-scale hot
    * pairs; beyond that, scale lift to a DECIMAL numerator (decRatio6). */
  def cooccurrence(docs: DataFrame, text: String, win: Int,
                   k: Int): DataFrame = {
    val toks = graft.CacheRegistry.persist(
      graft.ops.Text.posTokens(docs.select(col("doc_id"), col(text)), text))
    // one count() action on the persisted tokens — the same cheap driver
    // scalar pageRank takes for N; it also warms the token cache the three
    // downstream subtrees reuse
    val total = toks.count()
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("n1"))
    // each token's `win` successors via LEAD over the per-doc position
    // order; the p <= pos + win guard reproduces the positional-join
    // semantics exactly across gaps left by filtered empty tokens
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = toks
      .select(col("w").as("a"), col("pos"),
        array((1 to win).map(j =>
          struct(lead(col("pos"), j).over(wdoc).as("p"),
            lead(col("w"), j).over(wdoc).as("b"))): _*).as("bs"))
      .select(col("a"), col("pos"), explode(col("bs")).as("s"))
      .filter(col("s.p").isNotNull && col("s.p") <= col("pos") + win)
      .groupBy(col("a"), col("s.b").as("b")).agg(count(lit(1)).as("n"))
    pairs
      .join(uni.select(col("w").as("a"), col("n1").as("na")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("n1").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("n"),
        graft.ops.Relational.ratio6(s"n * ${total}L", "na * nb").as("lift6"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(k)
  }

  // --- q97_inverted_index: delta-encoded posting lists --------------------
  /** Search-index construction: every term maps to its document frequency
    * and a delta-encoded sorted posting list (first entry is the first
    * doc_id, each later entry the gap to its predecessor) — gap encoding
    * is what makes postings compressible, and the integer arithmetic is
    * engine-exact. Emitted as a comma-joined string so the hash compare
    * never depends on either engine's array representation.
    *
    * Scale shape: `(word, doc_id)` distinct is one shuffle with map-side
    * partial; the posting build is one more groupBy(word). The per-term
    * `collect_list` is bounded by document frequency — the inherent
    * posting-list shape (a real index shards its hottest terms; `minDf`
    * here trims the hapax tail instead, the cheap 80% of vocabulary). The
    * delta `transform` is a vocabulary-row HOF, not a corpus hot path —
    * the q90 discipline. */
  def invertedIndex(docs: DataFrame, text: String, minDf: Long): DataFrame =
    graft.ops.Text.explodeTokens(docs.select(col("doc_id"), col(text)),
        text, "word")
      .select(col("word"), col("doc_id")).distinct()
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"),
        // groupagg-ok: posting list bounded by document frequency — the
        // inherent index shape (scaladoc: hot-term sharding is the real-
        // index answer; minDf trims the hapax tail)
        sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(col("df") >= minDf)
      .select(col("word"), col("df"),
        expr("""array_join(transform(sequence(1, size(ds)),
                  i -> cast(element_at(ds, i) -
                            if(i = 1, 0L, element_at(ds, i - 1)) as string)),
                ',')""").as("postings"))

  def q97InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndex(Tables.documents(spark, dir), "text", minDf = 2L)

  val q97InvertedIndexSql: String = raw"""
    WITH p AS (
      SELECT DISTINCT word, doc_id
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\s+')) AS word
            FROM documents) t
      WHERE word <> ''),
    g AS (
      SELECT word, COUNT(*) AS df, list_sort(list(doc_id)) AS ds
      FROM p GROUP BY word HAVING COUNT(*) >= 2)
    SELECT word, df,
           array_to_string(list_transform(range(1, len(ds) + 1),
             i -> CAST(ds[i] - COALESCE(ds[i - 1], 0) AS VARCHAR)), ',')
             AS postings
    FROM g"""

  def q95Cooccur(spark: SparkSession, dir: String): DataFrame =
    cooccurrence(Tables.documents(spark, dir), "text", win = 2, k = 40)

  val q95CooccurSql: String = raw"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents),
    -- DuckDB's range() table function rejects lateral column arguments, so
    -- positions come from unnesting a struct list built by the SCALAR range
    tok AS MATERIALIZED (
      SELECT doc_id, u['pos'] AS pos, u['w'] AS w FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
            i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        FROM t) s
      WHERE u['w'] <> ''),
    tot AS (SELECT COUNT(*) AS tn FROM tok),
    uni AS (SELECT w, COUNT(*) AS n1 FROM tok GROUP BY w),
    pr AS (
      SELECT a.w AS a, b.w AS b, COUNT(*) AS n
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
      GROUP BY a.w, b.w)
    SELECT pr.a, pr.b, pr.n,
           ${graft.ops.Relational.ratio6Sql(
      "pr.n * (SELECT tn FROM tot)", "ua.n1 * ub.n1")} AS lift6
    FROM pr
    JOIN uni ua ON ua.w = pr.a
    JOIN uni ub ON ub.w = pr.b
    ORDER BY pr.n DESC, pr.a, pr.b LIMIT 40"""

  // --- q241_invindex_atscale: Zipf postings + hapax trim at 2^20 docs -----
  /** At-scale correctness coverage for [[invertedIndex]] — q97 indexes the
    * ~500-doc sf corpus; this replays the SAME entry point over 2²⁰
    * range-built documents carrying a Zipf-shaped planted vocabulary with
    * closed-form postings, so the two claims the operator's scaladoc
    * makes are both load-bearing at volume:
    *
    *  - **df-bounded posting lists**: document d contains word `w<r>` for
    *    every r ∈ [16, 272) dividing d, so df(w_r) = ⌊(2²⁰−1)/r⌋ + 1 — a
    *    1/r (Zipf) frequency curve from 65,536 postings (r = 16) down to
    *    ~3,869 (r = 271). The hottest term's per-group collect_list is
    *    65,536 doc ids — the "bounded by document frequency" shape at its
    *    gate-sized extreme, through ~4.1M exploded token rows;
    *  - **minDf hapax trim**: every document also carries a unique
    *    `h<d>` token — 2²⁰ hapax vocabulary entries (one FULL corpus of
    *    them) that the df ≥ 2 filter must drop AFTER the distinct+groupBy
    *    counted them. A broken trim emits 2²⁰ extra rows; a trim applied
    *    before counting cannot happen by construction (the filter reads
    *    the aggregated df).
    *
    * Because each word's postings are the arithmetic progression
    * {0, r, 2r, …}, the delta encoding is `'0'` followed by df−1 copies
    * of `,r` — the oracle EMITS that closed form per rank (range SQL +
    * `repeat`, no index logic), making the gap arithmetic itself the
    * thing under test. Output: 256 (word, df, postings) rows. */
  private[graft] val q241Docs = 1L << 20

  private[graft] def q241Frame(spark: SparkSession,
                               docs: Long = q241Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      expr("""concat('h', id,
                array_join(transform(filter(sequence(16, 271),
                                            r -> id % r = 0),
                                     r -> concat(' w', r)), ''))""")
        .as("text"))

  def q241InvindexAtScale(spark: SparkSession, dir: String): DataFrame =
    invertedIndex(q241Frame(spark), "text", minDf = 2L)

  private[graft] def q241OracleSql(docs: Long = q241Docs): String = s"""
    SELECT 'w' || u.i AS word,
           CAST((${docs - 1} // u.i) + 1 AS BIGINT) AS df,
           '0' || repeat(',' || u.i, ${docs - 1} // u.i) AS postings
    FROM range(16, 272) AS u(i)"""

  // --- q258_cooccur_atscale: windowed co-occurrence at 2^20 documents -----
  /** At-scale correctness coverage for [[cooccurrence]] — q95 counts the
    * ~500-doc sf corpus; this replays the SAME entry point (win = 2,
    * k = 40) over 2²⁰ range-built documents with a planted bigram
    * frequency curve whose top-40 is closed-form:
    *
    *  - document d opens with a per-doc unique filler pair `g<d>a g<d>b`
    *    and then, for every r ∈ [16, 80) dividing d, a four-token block
    *    `u<r> v<r> f<d>x<r> f<d>y<r>` — the two trailing fillers put
    *    every cross-block planted distance at ≥3, OUTSIDE the ±2 window,
    *    so the only repeated pair is the in-block `(u<r>, v<r>)` with
    *    count ⌊(2²⁰−1)/r⌋+1, a strictly-decreasing 1/r curve from 65,536
    *    (r = 16) down; the top-40 cut is exactly r ∈ [16, 56) and every
    *    filler pair it must outrank occurs once;
    *  - `u<r>`/`v<r>` each appear once per qualifying document, so
    *    na = nb = n and lift6 collapses to ratio6(T, n) — but the engine
    *    computes the FULL `n·T / (na·nb)` integer path, so a wrong
    *    unigram join or total shows up as a lift mismatch, and T (the
    *    corpus token total, 2·2²⁰ + 4·Σᵣ n_r ≈ 9.1M) stays inside the
    *    scaladoc's BIGINT-headroom bound with two decades to spare.
    *
    * The oracle EMITS the closed form per rank (range SQL, no token
    * logic), making the window join + unigram join + exact-lift
    * arithmetic the things under test. What the gate holds closed at
    * volume: the window match is one (doc_id, pos) EQUI-join over ~9.1M
    * positions (never a per-doc range join), the pair shuffle carries
    * win·|tokens| rows, and the cut is a global TakeOrdered. */
  private[graft] val q258Docs = 1L << 20

  private[graft] def q258Frame(spark: SparkSession,
                               docs: Long = q258Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      expr("""concat('g', id, 'a g', id, 'b',
                array_join(transform(filter(sequence(16, 79),
                                            r -> id % r = 0),
                  r -> concat(' u', r, ' v', r,
                              ' f', id, 'x', r, ' f', id, 'y', r)), ''))""")
        .as("text"))

  def q258CooccurAtScale(spark: SparkSession, dir: String): DataFrame =
    cooccurrence(q258Frame(spark), "text", win = 2, k = 40)

  private[graft] def q258OracleSql(docs: Long = q258Docs): String = s"""
    WITH tot AS (
      SELECT 2 * $docs + 4 * SUM((${docs - 1} // r.i) + 1) AS t
      FROM range(16, 80) AS r(i)),
    ranked AS (
      SELECT 'u' || u.i AS a, 'v' || u.i AS b,
             CAST((${docs - 1} // u.i) + 1 AS BIGINT) AS n
      FROM range(16, 56) AS u(i))
    SELECT a, b, n,
           ${graft.ops.Relational.ratio6Sql("n * t", "n * n")} AS lift6
    FROM ranked, tot ORDER BY n DESC, a, b"""

  // --- q259_tfidf_atscale: tf-idf + per-doc top-3 at 2^20 documents -------
  /** At-scale correctness coverage for [[tfIdf]] and q29's per-doc top-3
    * rank — the sf corpus has ~500 docs; this replays the SAME pipeline
    * (explode → tf agg → df agg → word-keyed join → per-doc rank window →
    * rank ≤ 3) over 2²⁰ range-built documents with a planted df spectrum:
    *
    *  - `h<d>`: one per-doc unique token — df = 1, idf = ln(2²⁰), always
    *    rank 1;
    *  - `w<r>` for every r ∈ [16, 48) dividing d — df_r = ⌊(2²⁰−1)/r⌋+1,
    *    a 1/r curve whose idf ≈ ln r is strictly increasing in r, so a
    *    doc's rank-2/3 terms are its two LARGEST divisors;
    *  - `z z`: in every doc — tf = 2 but idf = ln(1) = 0, the term a
    *    broken df join would promote and a correct one must rank last
    *    (docs with <2 divisors backfill their rank 2/3 with it).
    *
    * The output rolls the 2²⁰-doc rank table up by (first letter, rank) —
    * member counts plus the min/max rounded tf-idf — so a wrong df, a
    * dropped hapax, or a rank-window tie break all move some group's
    * count or envelope. The oracle replays q29's SQL shape over the same
    * generator. What the gate holds closed at volume: the rank window
    * stays doc-partitioned (2²⁰ tiny partitions, never a global window)
    * and the df side partial-aggregates before its one word-keyed
    * exchange. */
  private[graft] val q259Docs = 1L << 20

  private[graft] def q259Frame(spark: SparkSession,
                               docs: Long = q259Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      expr("""concat('h', id, ' z z',
                array_join(transform(filter(sequence(16, 47),
                                            r -> id % r = 0),
                                     r -> concat(' w', r)), ''))""")
        .as("text"))

  def q259TfidfAtScale(spark: SparkSession, dir: String): DataFrame =
    q259TfidfAtScale0(spark, q259Docs)

  private[graft] def q259TfidfAtScale0(spark: SparkSession,
                                       docs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word"))
    tfIdf(q259Frame(spark, docs), docs)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .groupBy(substring(col("word"), 1, 1).as("prefix"), col("rank"))
      .agg(count(lit(1)).as("n"),
        min(col("tfidf")).as("min_tfidf"), max(col("tfidf")).as("max_tfidf"))
  }

  private[graft] def q259OracleSql(docs: Long = q259Docs): String = raw"""
    WITH d AS (
      SELECT u.i AS doc_id,
             -- COALESCE: DuckDB's array_to_string returns NULL (not '')
             -- for an empty list, which would NULL the whole concat for
             -- divisor-free docs
             'h' || u.i || ' z z' ||
             COALESCE(array_to_string(list_transform(
               list_filter(range(16, 48), r -> u.i % r = 0),
               r -> ' w' || r), ''), '') AS text
      FROM range(0, $docs) AS u(i)),
    tok AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS word
        FROM d) t
      WHERE word <> ''),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfr AS (SELECT word, COUNT(DISTINCT doc_id) AS dfq FROM tok GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.word,
             ROUND(tf.tf * ln(CAST($docs AS DOUBLE) / dfr.dfq), 6) AS tfidf
      FROM tf JOIN dfr ON tf.word = dfr.word),
    ranked AS (
      SELECT doc_id, word, tfidf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, word) AS INT)
               AS rank
      FROM scored)
    SELECT substr(word, 1, 1) AS prefix, rank, COUNT(*) AS n,
           MIN(tfidf) AS min_tfidf, MAX(tfidf) AS max_tfidf
    FROM ranked WHERE rank <= 3 GROUP BY 1, 2"""

  // --- q263_filtergate_atscale: the quality gate at 2^20 documents --------
  /** At-scale correctness coverage for [[filterGate]] — q188 gates the
    * ~500-doc sf corpus; this replays the SAME projection (thresholds
    * 8/24 so the planted classes stay compact) over 2²⁰ range-built
    * documents in eight classes, one per reason combination the rule set
    * can produce on this corpus: clean (0), too-short (1), too-long (2),
    * low-diversity (4), long+low-diversity (6), stopword-heavy (8),
    * gibberish (16), short+gibberish (17). Every class is engineered to
    * trip EXACTLY its bits (diversity/stopword/token-length side
    * conditions verified class by class in the scaladoc of the spec's
    * replay), so the reasons rollup — count and token sum per bitmask —
    * is closed-form: 131,072 docs per class, eight rows out. A rule
    * whose integer threshold arithmetic drifts at volume, or a bitmask
    * that merges, moves a count between rows. The oracle emits the
    * closed form directly. Scale shape: the gate stays a pure
    * projection — the verification rollup's exchange is the plan's only
    * shuffle. */
  private[graft] val q263Docs = 1L << 20

  /** (text, expected reasons with thresholds 8/24, token count) per
    * class — shared by the generator, the oracle, and the spec. */
  private[graft] val q263Classes: Seq[(String, Int, Int)] = Seq(
    ((0 to 11).map(j => s"word$j").mkString(" "), 0, 12),
    ((0 to 3).map(j => s"word$j").mkString(" "), 1, 4),
    ((0 to 31).map(j => s"word$j").mkString(" "), 2, 32),
    (Seq.fill(12)("xyzw").mkString(" "), 4, 12),
    (Seq.fill(32)("zzzz").mkString(" "), 6, 32),
    ((Seq.fill(4)("the") ++ (0 to 7).map(j => s"word$j")).mkString(" "),
      8, 12),
    (((0 to 9).map(j => s"a$j") ++ Seq("b0", "b1")).mkString(" "), 16, 12),
    ((1 to 4).map(j => s"x$j").mkString(" "), 17, 4))

  private[graft] def q263TextSql: String =
    q263Classes.zipWithIndex.map { case ((t, _, _), i) =>
      s"WHEN $i THEN '$t'"
    }.mkString("CASE doc_id % 8 ", " ", " END")

  private[graft] def q263Frame(spark: SparkSession,
                               docs: Long = q263Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"))
      .select(col("doc_id"), expr(q263TextSql).as("text"))

  def q263FiltergateAtScale(spark: SparkSession, dir: String): DataFrame =
    q263FiltergateAtScale0(spark, q263Docs)

  private[graft] def q263FiltergateAtScale0(spark: SparkSession,
                                            docs: Long): DataFrame =
    filterGate(q263Frame(spark, docs), "doc_id", "text",
      minTokens = 8, maxTokens = 24)
      .groupBy(col("reasons"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))

  private[graft] def q263OracleSql(docs: Long = q263Docs): String =
    q263Classes.zipWithIndex.map { case ((_, reasons, nt), i) =>
      s"""SELECT $reasons AS reasons,
            CAST(($docs - 1 - $i) // 8 + 1 AS BIGINT) AS n_docs,
            CAST((($docs - 1 - $i) // 8 + 1) * $nt AS BIGINT) AS sum_tokens"""
    }.mkString("\n    UNION ALL\n    ")

  // --- q122_vocab_coverage: OOV rate against a fitted top-V vocabulary ----
  /** Tokenizer-fit check: fit a vocabulary (the top-V unigrams by corpus
    * frequency, ties broken by word so the cut is total-ordered and
    * engine-reproducible) and report each document's out-of-vocabulary
    * token count and rate. A source whose OOV rate jumps between crawls
    * is the canonical signal the tokenizer no longer fits the data
    * (new language, new markup, encoding rot).
    *
    * Scale shape: one tokenize pass feeds both the vocabulary fit
    * (groupBy(word).count with map-side partial — the wordcount shuffle)
    * and the per-doc probe; the fitted vocab is a V-row TakeOrdered that
    * BROADCASTS into the probe join, so the token stream is shuffled once
    * (per-doc agg), never on the word key. Empty documents keep their row
    * with a NULL rate rather than vanishing. */
  def vocabCoverage(docs: DataFrame, id: String, text: String,
                    vocabSize: Int = 50): DataFrame = {
    val toks = graft.CacheRegistry.persist(
      docs.select(col(id),
          explode(split(lower(col(text)), "\\s+")).as("w"))
        .filter(col("w") =!= ""))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(true).as("in_vocab"))
    // bcast-ok: vocab is limit(vocabSize)
    val per = toks.join(broadcast(vocab), Seq("w"), "left_outer")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(id)).join(per, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        graft.ops.Relational.ratio6(
          "coalesce(n_oov, 0)", "coalesce(n_tokens, 0)").as("oov6"))
  }

  def q122VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir), "doc_id", "text")

  val q122VocabCoverageSql: String = s"""
    WITH t AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents) x
      WHERE w <> ''),
    cnt AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
    voc AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT 50),
    per AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens,
             SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM t LEFT JOIN voc v USING (w) GROUP BY t.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
           ${graft.ops.Relational.ratio6Sql(
             "COALESCE(p.n_oov, 0)", "COALESCE(p.n_tokens, 0)")} AS oov6
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"""

  // --- q133_rarity_bucket: CCNet-style corpus partition by rarity ---------
  /** CCNet's head/middle/tail corpus split, with an integer-exact rarity
    * score standing in for LM perplexity (the shape is identical: score
    * every document against a corpus-level language model — here the
    * unigram frequency table — and cut the corpus into k quality tiers).
    * A token's rarity is `T div cnt(w)` (corpus tokens over the token's
    * count — large for rare words), a document's score is the
    * token-weighted floor-mean of its tokens' rarities, and the tiers are
    * exact k-tiles of `(score, doc_id)`. Every step is positive-BIGINT
    * floor arithmetic, so any engine replays it bit-for-bit — the real-
    * perplexity variant would swap the rarity column for an LM logprob
    * and inherit the same plan.
    *
    * Scale shape: one tokenize pass → per-(doc, token) partial counts →
    * frequency join (token-keyed; Zipf-skewed, but the per-doc
    * pre-aggregation caps any one (doc, token) row and AQE handles the
    * residual hot vocabulary) → per-doc agg. The k-tile RANK is the
    * scale-aware part: no global `ntile` window (one partition at 100 TB);
    * instead the rank is assembled from a distinct-SCORE cumulative frame
    * (scores are floor-divided integers — heavily collapsed, and since
    * round 9 the cumulative itself runs on
    * [[graft.ops.Windows.rangePrefixSum]], so even an uncollapsed score
    * set never funnels through one task) plus a per-score row_number, and
    * the tile comes from the closed-form NTILE formula
    * `q = N div k, m = N mod k`. The oracle runs DuckDB's actual
    * `NTILE(3)` — an independent derivation of the same assignment. */
  def rarityBuckets(docs: DataFrame, id: String, text: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(id), explode(split(lower(col(text)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val tf = toks.groupBy(col(id), col("w")).agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy(col("w")).agg(sum(col("tf")).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("T"))
    // bcast-ok: tot is a 1-row global aggregate
    val scored = tf.join(freq, "w").crossJoin(broadcast(tot))
      .groupBy(col(id))
      .agg(sum(col("tf") * expr("T div cnt")).as("rsum"),
        sum(col("tf")).as("ntok"))
      .select(col(id), expr("rsum div ntok").as("rarity"))
    val nTot = scored.agg(count(lit(1)).as("N"))
    val cum = graft.ops.Windows.rangePrefixSum(
        scored.groupBy(col("rarity")).agg(count(lit(1)).as("nd")),
        "rarity", "nd", "cumr")
      .withColumn("before", col("cumr") - col("nd"))
    val ranked = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("rarity")).orderBy(col(id))))
      .join(cum.select(col("rarity"), col("before")), "rarity")
      .withColumn("r", col("before") + col("rn"))
      // bcast-ok: nTot is a 1-row global aggregate
      .crossJoin(broadcast(nTot))
    ranked.withColumn("bucket",
      expr(s"""CASE WHEN r <= (N % $k) * ((N div $k) + 1)
                    THEN (r + (N div $k)) div ((N div $k) + 1)
                    ELSE (N % $k) + (r - (N % $k) * ((N div $k) + 1)
                                     + (N div $k) - 1) div (N div $k)
               END""").cast("int"))
      .select(col(id), col("rarity"), col("bucket"))
  }

  def q133RarityBucket(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    rarityBuckets(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("bucket"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("rarity")).as("min_rarity"), max(col("rarity")).as("max_rarity"))
  }

  // --- q268_rarity_atscale: CCNet tiers at 2^20 documents -----------------
  /** At-scale correctness coverage for [[rarityBuckets]] — q133 tiers the
    * ~500-doc sf corpus; this replays the SAME entry point (k = 3) over
    * 2²⁰ range-built documents in four frequency classes (`id mod 4`,
    * text = token `w<c>` repeated c+1 times → corpus frequencies
    * 2¹⁸·(c+1), rarities T div cnt = 10/5/3/2), chosen so the tier
    * boundaries land INSIDE classes: N = 2²⁰ over k = 3 gives tile
    * sizes 349 526/349 525/349 525, splitting both the rarity-2 and
    * rarity-5 classes across adjacent tiers — the exact-k-tile rank
    * arithmetic (distinct-score cumulative via rangePrefixSum + the
    * closed-form NTILE formula) is what decides 2¹⁷ borderline docs,
    * not one fixture row. Rollup by (bucket, class) with count, rarity
    * envelope, and an id sum so a single misassigned doc moves a
    * checksum. The oracle replays the pipeline with DuckDB's native
    * NTILE — the q133 independent-derivation contract at ~2,000× the
    * rows.
    *
    * Honest residual, priced by this corpus on purpose: the per-score
    * `row_number` inside [[rarityBuckets]] partitions by the rarity
    * VALUE, so when scores collapse to k_distinct ≪ parallelism (here 4
    * × 2¹⁸-row partitions — the adversarial extreme; real perplexity
    * scores collapse far less), each score is a single-task sort. The
    * cumulative ACROSS scores already rides rangePrefixSum; if a
    * production score domain ever collapses this hard, the same
    * range-slice treatment applies WITHIN a score (order by the doc key
    * per slice, offset by slice counts) — a mechanical extension that
    * changes no semantics. */
  private[graft] val q268Docs = 1L << 20

  private[graft] def q268TextSql: String =
    (0 until 4).map { c =>
      s"WHEN $c THEN '${Seq.fill(c + 1)(s"w$c").mkString(" ")}'"
    }.mkString("CASE doc_id % 4 ", " ", " END")

  private[graft] def q268Frame(spark: SparkSession,
                               docs: Long = q268Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"))
      .select(col("doc_id"), expr(q268TextSql).as("text"))

  def q268RarityAtScale(spark: SparkSession, dir: String): DataFrame =
    q268RarityAtScale0(spark, q268Docs)

  private[graft] def q268RarityAtScale0(spark: SparkSession,
                                        docs: Long): DataFrame =
    rarityBuckets(q268Frame(spark, docs), "doc_id", "text")
      .groupBy(col("bucket"), (col("doc_id") % 4).as("cls"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("rarity")).as("min_rarity"),
        max(col("rarity")).as("max_rarity"),
        sum(col("doc_id")).as("sum_ids"))

  private[graft] def q268OracleSql(docs: Long = q268Docs): String = s"""
    WITH d AS (
      SELECT u.i AS doc_id,
             ${q268TextSql.replace("doc_id % 4", "u.i % 4")} AS text
      FROM range(0, $docs) AS u(i)),
    t AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM d) x
      WHERE w <> ''),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY doc_id, w),
    freq AS (SELECT w, SUM(tf) AS cnt FROM tf GROUP BY w),
    tot AS (SELECT SUM(cnt) AS T FROM freq),
    sc AS (SELECT doc_id,
                  SUM(tf * (T // cnt)) // SUM(tf) AS rarity
           FROM tf JOIN freq USING (w), tot GROUP BY doc_id),
    nt AS (SELECT doc_id, rarity,
                  CAST(NTILE(3) OVER (ORDER BY rarity, doc_id) AS INT)
                    AS bucket
           FROM sc)
    SELECT bucket, doc_id % 4 AS cls, COUNT(*) AS n_docs,
           CAST(MIN(rarity) AS BIGINT) AS min_rarity,
           CAST(MAX(rarity) AS BIGINT) AS max_rarity,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM nt GROUP BY 1, 2"""

  val q133RarityBucketSql: String = """
    WITH t AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS w
        FROM documents) x
      WHERE w <> ''),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY doc_id, w),
    freq AS (SELECT w, SUM(tf) AS cnt FROM tf GROUP BY w),
    tot AS (SELECT SUM(cnt) AS T FROM freq),
    sc AS (SELECT doc_id,
                  SUM(tf * (T // cnt)) // SUM(tf) AS rarity
           FROM tf JOIN freq USING (w), tot GROUP BY doc_id),
    nt AS (SELECT doc_id, rarity,
                  CAST(NTILE(3) OVER (ORDER BY rarity, doc_id) AS INT)
                    AS bucket
           FROM sc)
    SELECT bucket, d.lang, COUNT(*) AS n_docs,
           CAST(MIN(rarity) AS BIGINT) AS min_rarity,
           CAST(MAX(rarity) AS BIGINT) AS max_rarity
    FROM nt JOIN documents d USING (doc_id)
    GROUP BY 1, 2"""

  // --- q136_bm25: full-text relevance ranking, integer-exact BM25 ---------
  /** BM25 top-k retrieval (k₁ = 1.2, b = 0.75) with the arithmetic
    * restructured for cross-engine bit-identity: the usual formulation is
    * irrational twice (`ln` in the idf, a real-valued length
    * normalization), so instead (a) the idf is the RATIONAL odds form
    * `(N − df + ½)/(df + ½) = (2N−2df+1)/(2df+1)` — the exact quantity
    * whose log classic BM25 takes, rank-equivalent per term — and (b) the
    * tf normalization is cleared of fractions by ×10L: `tf·(k₁+1)/(tf +
    * k₁(1−b+b·dl/avgdl)) = 22·L·tf / (10·L·tf + 3·L + 9·dl·N)` with
    * avgdl = L/N. Each term's contribution is thus an exact-BIGINT
    * numerator/denominator pair and ONE correctly-rounded double
    * division; the per-document sum folds those doubles in sorted term
    * order (the q115/q77 trick), so both engines add the same doubles in
    * the same order and the top-k boundary cannot flake.
    *
    * Scale shape: the query-term filter pushes into the token stream
    * (tokens not in the query never reach a shuffle), df/N/L are
    * broadcast-size frames, and the per-doc fold touches ≤|query| rows
    * per document. BIGINT headroom: `22·L·tf·2N` — exact below ~9.2e18,
    * i.e. corpora to ~10¹⁵ token-products; past that, swap the two casts
    * for DECIMAL(38,0). */
  val bm25QueryTerms: Seq[String] = Seq("join", "slow", "spark", "stream", "vector")

  def bm25TopK(docs: DataFrame, id: String, text: String,
               query: Seq[String], k: Int = 20): DataFrame = {
    val toks = docs
      .select(col(id), explode(split(lower(col(text)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val nDocs = docs.agg(count(lit(1)).as("N"))
    val dl = toks.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    val totL = toks.agg(count(lit(1)).as("L"))
    val qtf = toks.filter(col("w").isin(query: _*))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("tf"))
    val dfs = qtf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // bcast-ok: dfs is one row per query term — bounded by the caller's query length
    qtf.join(broadcast(dfs), "w").join(dl, id)
      // bcast-ok: nDocs and totL are 1-row global aggregates
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(totL))
      .withColumn("v",
        expr("22 * L * tf * (2*N - 2*df + 1)").cast("double") /
          expr("(10*L*tf + 3*L + 9*dl*N) * (2*df + 1)").cast("double"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"),
        // groupagg-ok: one document's matched query terms — doc-sized
        sort_array(collect_list(struct(col("w"), col("v")))).as("arr"))
      .select(col(id), col("n_terms"),
        aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("v"))
          .as("score"))
      .orderBy(col("score").desc, col(id)).limit(k)
  }

  def q136Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir), "doc_id", "text", bm25QueryTerms)

  val q136Bm25Sql: String = {
    val inList = bm25QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""
    WITH t AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents) x
      WHERE w <> ''),
    nn AS (SELECT COUNT(*) AS N FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
    tl AS (SELECT COUNT(*) AS L FROM t),
    qtf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t
            WHERE w IN ($inList) GROUP BY doc_id, w),
    dfq AS (SELECT w, COUNT(*) AS df FROM qtf GROUP BY w),
    v AS (SELECT q.doc_id, q.w,
                 CAST(22 * L * tf * (2*N - 2*df + 1) AS DOUBLE) /
                 CAST((10*L*tf + 3*L + 9*dl.dl*N) * (2*df + 1) AS DOUBLE)
                   AS v
          FROM qtf q JOIN dfq USING (w) JOIN dl ON dl.doc_id = q.doc_id,
               nn, tl),
    sc AS (SELECT doc_id, COUNT(*) AS n_terms,
                  list_reduce(list_prepend(0.0, list(v ORDER BY w)),
                              (a, b) -> a + b) AS score
           FROM v GROUP BY doc_id)
    SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, score
    FROM sc ORDER BY score DESC, doc_id LIMIT 20"""
  }

  // --- q215_bm25_atscale: the text family's retrieval stack at 2²⁰ docs ---
  /** At-scale correctness coverage for [[bm25TopK]] — q136 runs it over
    * the few-thousand-row documents table; this replays the SAME entry
    * point (identical integer-exact arithmetic, identical top-k plan)
    * over a range-synthesized corpus of 2²⁰ documents (~4.8M tokens
    * through tokenize/explode, a 2²⁰-group per-doc-length aggregate, and
    * a global TakeOrdered top-k):
    *
    *  - doc d's text is the query-class token `q⟨d mod 16⟩` repeated
    *    (d mod 3)+1 times plus the filler `u⟨d⟩` repeated (d mod 5)+1
    *    times, so tf ∈ {1,2,3} and dl ∈ {2..8} vary INDEPENDENTLY (tf and
    *    length normalization are exercised as separate axes, not
    *    confounded), document frequency is exactly 65 536 for each query
    *    term, and every per-row quantity is known by construction;
    *  - the score stays bit-identical cross-engine for the q136 reasons
    *    (exact-BIGINT numerator/denominator, one correctly-rounded double
    *    division, sorted-order fold) — headroom check at this scale:
    *    22·L·tf·2N ≈ 22·4.8M·3·2²¹ ≈ 6.7e14 < 2⁵³, still exact;
    *  - massive score ties (each (tf, dl) class holds ~10⁴ docs) make the
    *    doc_id tiebreak load-bearing at the top-k boundary — the
    *    flake-mode the corpus table is too small and too irregular to
    *    produce.
    *
    * The oracle replays the same pipeline in DuckDB over its own
    * generated corpus (same CTE chain as q136's, FROM a range CTE).
    * Runs once in Bench's stress lane. */
  private[graft] val q215Docs = 1L << 20

  private[graft] def q215Corpus(spark: SparkSession,
                                docs: Long = q215Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      concat(
        expr("repeat(concat('q', CAST(id % 16 AS STRING), ' '), CAST(id % 3 AS INT) + 1)"),
        expr("repeat(concat('u', CAST(id AS STRING), ' '), CAST(id % 5 AS INT) + 1)"))
        .as("text"))

  private[graft] val q215QueryTerms: Seq[String] = Seq("q3", "q7")

  def q215Bm25AtScale(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(q215Corpus(spark), "doc_id", "text", q215QueryTerms)

  private[graft] def q215OracleSql(docs: Long = q215Docs): String = {
    val inList = q215QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""
    WITH docs AS (
      SELECT CAST(u.i AS BIGINT) AS doc_id,
             repeat('q' || CAST(u.i % 16 AS VARCHAR) || ' ',
                    CAST(u.i % 3 AS INT) + 1) ||
             repeat('u' || CAST(u.i AS VARCHAR) || ' ',
                    CAST(u.i % 5 AS INT) + 1) AS text
      FROM unnest(range(0, $docs)) AS u(i)),
    t AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM docs) x
      WHERE w <> ''),
    nn AS (SELECT COUNT(*) AS N FROM docs),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
    tl AS (SELECT COUNT(*) AS L FROM t),
    qtf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t
            WHERE w IN ($inList) GROUP BY doc_id, w),
    dfq AS (SELECT w, COUNT(*) AS df FROM qtf GROUP BY w),
    v AS (SELECT q.doc_id, q.w,
                 CAST(22 * L * tf * (2*N - 2*df + 1) AS DOUBLE) /
                 CAST((10*L*tf + 3*L + 9*dl.dl*N) * (2*df + 1) AS DOUBLE)
                   AS v
          FROM qtf q JOIN dfq USING (w) JOIN dl ON dl.doc_id = q.doc_id,
               nn, tl),
    sc AS (SELECT doc_id, COUNT(*) AS n_terms,
                  list_reduce(list_prepend(0.0, list(v ORDER BY w)),
                              (a, b) -> a + b) AS score
           FROM v GROUP BY doc_id)
    SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, score
    FROM sc ORDER BY score DESC, doc_id LIMIT 20"""
  }

  // --- q140_lm_score: add-one bigram language-model quality score ---------
  /** CCNet-style statistical-LM quality filter: fit an add-one-smoothed
    * bigram model on the corpus itself, then score every document by its
    * MEAN token transition probability `Σ p(b|a) / n_bigrams` with
    * `p(b|a) = (c(a,b)+1) / (c(a,·)+V)`. Documents whose transitions the
    * corpus has never seen score near `1/V` — the head of a
    * perplexity-style junk ranking (CCNet uses a Wikipedia-trained
    * KenLM; the in-domain fit here keeps the operator self-contained).
    * The mean-probability form is chosen over log-perplexity
    * deliberately: `ln` is not IEEE-correctly-rounded and diverges
    * between engines, while this score is exact-BIGINT counts, ONE
    * correctly-rounded double division per distinct (doc, bigram), and a
    * sorted-order fold (the q115/q136 trick) — bit-identical with no
    * rounding step. Adjacency is raw-split-position `pos+1`, the q95
    * contract.
    *
    * Scale shape: the token stream is persisted and read twice (bigram
    * build probes itself with a `(doc, pos+1)` equi-join — no per-doc
    * sort); bigram counts and their context totals are ONE wordcount-style
    * shuffle plus a derived re-agg (no corpus rescan); the per-doc tf
    * frame joins the model on the bigram key — Zipf-headed like every
    * token-frequency join here, AQE skew-split handles the stopword-pair
    * head (audited at 10× alongside q133/q136). The model frame is
    * distinct-bigram-sized: linear in vocabulary, never broadcast.
    * BIGINT headroom: `tf·(c(a,b)+1)` — exact to ~10⁹-occurrence hot
    * bigrams in a single doc-pair cell, far past any real corpus. */
  def bigramLmScore(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = graft.CacheRegistry.persist(
      graft.ops.Text.posTokens(docs.select(col(id), col(text)), text))
    val vocab = toks.agg(countDistinct(col("w")).as("vocab_sz"))
    val big = graft.CacheRegistry.persist(
      toks.select(col(id), col("pos"), col("w").as("a"))
        .join(toks.select(col(id), (col("pos") - 1).as("pos"),
          col("w").as("b")), Seq(id, "pos"))
        .select(col(id), col("a"), col("b")))
    val c2 = big.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt2"))
    val model = c2.join(
      c2.groupBy(col("a")).agg(sum(col("cnt2")).as("cnt1")), "a")
    big.groupBy(col(id), col("a"), col("b")).agg(count(lit(1)).as("tf"))
      .join(model, Seq("a", "b"))
      // bcast-ok: vocab is a 1-row countDistinct aggregate
      .crossJoin(broadcast(vocab))
      .withColumn("v",
        expr("tf * (cnt2 + 1)").cast("double") /
          expr("cnt1 + vocab_sz").cast("double"))
      .groupBy(col(id))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        // groupagg-ok: one document's distinct bigrams — doc-sized
        sort_array(collect_list(struct(col("a"), col("b"), col("v"))))
          .as("arr"))
      .select(col(id), col("n_bigrams"),
        (aggregate(col("arr"), lit(0.0), (acc, x) => acc + x.getField("v")) /
          col("n_bigrams").cast("double")).as("lm_score"))
  }

  def q140LmScore(spark: SparkSession, dir: String): DataFrame =
    bigramLmScore(Tables.documents(spark, dir), "doc_id", "text")

  val q140LmScoreSql: String = raw"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents),
    tok AS MATERIALIZED (
      SELECT doc_id, u['pos'] AS pos, u['w'] AS w FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
            i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        FROM t) s
      WHERE u['w'] <> ''),
    vv AS (SELECT COUNT(DISTINCT w) AS vocab_sz FROM tok),
    big AS MATERIALIZED (
      SELECT x.doc_id, x.w AS a, y.w AS b
      FROM tok x JOIN tok y
        ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
    c2 AS (SELECT a, b, COUNT(*) AS cnt2 FROM big GROUP BY a, b),
    ctx AS (SELECT a, SUM(cnt2) AS cnt1 FROM c2 GROUP BY a),
    v AS (SELECT g.doc_id, g.a, g.b, g.tf,
                 CAST(g.tf * (cnt2 + 1) AS DOUBLE) /
                 CAST(cnt1 + vocab_sz AS DOUBLE) AS v
          FROM (SELECT doc_id, a, b, COUNT(*) AS tf
                FROM big GROUP BY doc_id, a, b) g
          JOIN c2 USING (a, b) JOIN ctx USING (a), vv),
    sc AS (SELECT doc_id, SUM(tf) AS n_bigrams,
                  list_reduce(list_prepend(0.0, list(v ORDER BY a, b)),
                              (x, y) -> x + y) AS s
           FROM v GROUP BY doc_id)
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           s / CAST(n_bigrams AS DOUBLE) AS lm_score
    FROM sc"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_tfidf"         -> q29TfIdf _,
    "q36_lang_id"       -> q36LangId _,
    "q37_quality_score" -> q37QualityScore _,
    "q188_filter_gate"  -> q188FilterGate _,
    "q194_blocklist"    -> q194Blocklist _,
    "q197_dataset_card" -> q197DatasetCard _,
    "q200_gate_report"  -> q200GateReport _,
    "q38_token_stats"   -> q38TokenStats _,
    "q39_fingerprint"   -> q39Fingerprint _,
    "q65_repetition"    -> q65Repetition _,
    "q66_pii_scrub"     -> q66PiiScrub _,
    "q72_heavy_hitters" -> q72HeavyHitters _,
    "q78_boilerplate"   -> q78Boilerplate _,
    "q90_bpe_pairs"     -> q90BpePairs _,
    "q152_bpe_encode"   -> q152BpeEncode _,
    "q153_phrase_search" -> q153PhraseSearch _,
    "q95_cooccur"       -> q95Cooccur _,
    "q97_inverted_index" -> q97InvertedIndex _,
    "q122_vocab_coverage" -> q122VocabCoverage _,
    "q133_rarity_bucket" -> q133RarityBucket _,
    "q136_bm25"         -> q136Bm25 _,
    "q215_bm25_atscale" -> q215Bm25AtScale _,
    "q234_phrase_atscale" -> q234PhraseAtScale _,
    "q240_boilerplate_atscale" -> q240BoilerplateAtScale _,
    "q241_invindex_atscale" -> q241InvindexAtScale _,
    "q258_cooccur_atscale" -> q258CooccurAtScale _,
    "q259_tfidf_atscale" -> q259TfidfAtScale _,
    "q263_filtergate_atscale" -> q263FiltergateAtScale _,
    "q268_rarity_atscale" -> q268RarityAtScale _,
    "q244_bpe_atscale"  -> q244BpeAtScale _,
    "q140_lm_score"     -> q140LmScore _,
  )

  def oracles: Map[String, String] = Map(
    "q29_tfidf"         -> q29TfIdfSql,
    "q36_lang_id"       -> q36LangIdSql,
    "q37_quality_score" -> q37QualityScoreSql,
    "q188_filter_gate"  -> q188FilterGateSql,
    "q194_blocklist"    -> q194BlocklistSql,
    "q197_dataset_card" -> q197DatasetCardSql,
    "q200_gate_report"  -> q200GateReportSql,
    "q38_token_stats"   -> q38TokenStatsSql,
    "q39_fingerprint"   -> q39FingerprintSql,
    "q65_repetition"    -> q65RepetitionSql,
    "q66_pii_scrub"     -> q66PiiScrubSql,
    "q72_heavy_hitters" -> q72HeavyHittersSql,
    "q78_boilerplate"   -> q78BoilerplateSql,
    "q90_bpe_pairs"     -> q90BpePairsSql,
    "q152_bpe_encode"   -> q152BpeEncodeSql,
    "q153_phrase_search" -> q153PhraseSearchSql,
    "q95_cooccur"       -> q95CooccurSql,
    "q97_inverted_index" -> q97InvertedIndexSql,
    "q122_vocab_coverage" -> q122VocabCoverageSql,
    "q133_rarity_bucket" -> q133RarityBucketSql,
    "q136_bm25"         -> q136Bm25Sql,
    "q215_bm25_atscale" -> q215OracleSql(),
    "q234_phrase_atscale" -> q234OracleSql(),
    "q240_boilerplate_atscale" -> q240OracleSql(),
    "q241_invindex_atscale" -> q241OracleSql(),
    "q258_cooccur_atscale" -> q258OracleSql(),
    "q259_tfidf_atscale" -> q259OracleSql(),
    "q263_filtergate_atscale" -> q263OracleSql(),
    "q268_rarity_atscale" -> q268OracleSql(),
    "q244_bpe_atscale"  -> q244OracleSql(),
    "q140_lm_score"     -> q140LmScoreSql,
  )
}
