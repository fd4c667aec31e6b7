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
      .withColumn("stop_ratio",
        round(size(filter(toks, t => t.isin("the", "a"))).cast("double") /
          col("n_tokens"), 6))
      .withColumn("mean_tok_len",
        round((length(col("text")) - col("n_tokens") + 1).cast("double") /
          col("n_tokens"), 6))
      .withColumn("quality",
        round(lit(0.3) * least(col("n_tokens").cast("double") / 100, lit(1.0)) +
          lit(0.4) * (lit(1.0) - col("stop_ratio")) +
          lit(0.3) * least(col("mean_tok_len") / 8, lit(1.0)), 6))
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

  val q37QualityScoreSql: String = """
    WITH t AS (
      SELECT doc_id, text,
             len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
               AS n_tokens,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x IN ('the', 'a'))) AS n_stop
      FROM documents)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           ROUND(CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens, 6)
             AS mean_tok_len,
           ROUND(0.3 * least(CAST(n_tokens AS DOUBLE) / 100, CAST(1.0 AS DOUBLE)) +
                 0.4 * (CAST(1.0 AS DOUBLE) -
                        ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6)) +
                 0.3 * least(ROUND(CAST(length(text) - n_tokens + 1 AS DOUBLE)
                                   / n_tokens, 6) / 8, CAST(1.0 AS DOUBLE)), 6)
             AS quality
    FROM t"""

  // --- q38_token_stats: token counting incl. a BPE-ish estimate -----------
  def q38TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokenize(col("text"))
    Tables.documents(spark, dir)
      .withColumn("n_chars_seen", length(col("text")))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_types", size(array_distinct(toks)))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
      // ~4 chars/subword: the standard quick estimate for BPE vocabularies
      .withColumn("est_bpe", ceil(length(col("text")).cast("double") / 4).cast("long"))
      .select("doc_id", "n_chars_seen", "n_tokens", "n_types", "ttr", "est_bpe")
  }

  val q38TokenStatsSql: String = """
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars_seen,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
      FROM documents)
    SELECT doc_id, CAST(n_chars_seen AS INT) AS n_chars_seen,
           CAST(len(ts) AS INT) AS n_tokens,
           CAST(len(list_distinct(ts)) AS INT) AS n_types,
           ROUND(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS ttr,
           CAST(ceil(CAST(n_chars_seen AS DOUBLE) / 4) AS BIGINT) AS est_bpe
    FROM t"""

  // --- q39_fingerprint: arithmetic rolling hash over the token stream -----
  // Polynomial rolling hash with engine-neutral arithmetic: token value =
  // 31·len + first-char code, acc = (acc·1000003 + v) mod 1e9+7. A
  // sequential fold in both engines — deterministic, and cheap enough to
  // fingerprint every document in a corpus-wide dedup pre-pass.
  def rollingFingerprint(text: Column): Column = {
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_tfidf"         -> q29TfIdf _,
    "q36_lang_id"       -> q36LangId _,
    "q37_quality_score" -> q37QualityScore _,
    "q38_token_stats"   -> q38TokenStats _,
    "q39_fingerprint"   -> q39Fingerprint _,
  )

  def oracles: Map[String, String] = Map(
    "q29_tfidf"         -> q29TfIdfSql,
    "q36_lang_id"       -> q36LangIdSql,
    "q37_quality_score" -> q37QualityScoreSql,
    "q38_token_stats"   -> q38TokenStatsSql,
    "q39_fingerprint"   -> q39FingerprintSql,
  )
}
