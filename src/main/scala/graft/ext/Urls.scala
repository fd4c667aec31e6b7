package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL canonicalization — the crawl-curation primitive that collapses the
  * many spellings of one resource before any text-level dedup runs: scheme
  * and host case, `www.` prefixes, default ports, tracking parameters,
  * parameter order, trailing slashes, and fragments are all presentation
  * noise that multiplies a page into dozens of "distinct" keys. Remap-era
  * pipelines did this in per-record mapper scripts; here it is one pure
  * column expression, so it stays inside whole-stage codegen and the
  * subsequent dedup is an ordinary hash aggregate on the canonical key.
  *
  * Rule set (deterministic, order matters):
  *   1. drop the fragment (`#...`);
  *   2. lowercase scheme and host:port; strip a leading `www.`;
  *   3. strip the scheme's default port (`:80` http, `:443` https);
  *   4. strip trailing slashes from the path (path CASE is preserved —
  *      paths are case-sensitive per RFC 3986, unlike scheme/host);
  *   5. drop tracking params (`utm_*`, `ref`, `gclid`, `fbclid`), drop
  *      empties, sort the survivors, rejoin.
  *
  * Scale: pure string expressions — no shuffle, no UDF, codegen-friendly;
  * the canonical key then feeds an `exactDedup`-shaped aggregate (map-side
  * partial, one shuffle on the key). At 100 TB the aggregate is the only
  * wire cost and the key is ~100 bytes.
  */
object Urls {

  /** Canonical form of `u` per the rule set above. Non-URL strings (no
    * `scheme://`) canonicalize to `"://"`-prefixed junk rather than
    * throwing — curation inputs are dirty by definition, and a filter on
    * `scheme != ''` is the caller's policy decision. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val host0 = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path = regexp_replace(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val query0 = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_join(sort_array(filter(split(query0, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|ref|gclid|fbclid)(=|$)"))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** The synthetic URL spelling each document gets for q147: one resource
    * per `doc_id % 40`, spelled differently by scheme case, www-prefix,
    * host case, default ports, param order, tracking params, trailing
    * slash, and fragments — every rule in [[canonicalizeUrl]] is exercised
    * by some residue class. Kept as a SQL fragment so the DuckDB oracle
    * constructs the IDENTICAL dirty URL and must agree on the canonical
    * form, making the rule set itself the thing the hash-compare
    * certifies. */
  private[ext] val dirtyUrlSql: String = """
    (CASE doc_id % 4 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS'
                     WHEN 2 THEN 'http' ELSE 'HTTP' END
     || '://'
     || CASE doc_id % 3 WHEN 0 THEN 'WWW.' WHEN 1 THEN 'www.' ELSE '' END
     || source || '.Example.COM'
     || CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 2 THEN ':80' ELSE '' END
     || '/docs/' || CAST(doc_id % 40 AS STRING)
     || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
     || CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=feed&id=' || CAST(doc_id % 20 AS STRING)
                  || '&b=2&a=1'
             ELSE '?a=1&id=' || CAST(doc_id % 20 AS STRING)
                  || '&b=2&fbclid=xyz' END
     || CASE WHEN doc_id % 2 = 1
             THEN '#sec' || CAST(doc_id % 5 AS STRING) ELSE '' END)"""

  // --- q147_url_dedup: canonicalize → group → keep one --------------------
  /** Collapse the dirty URL spellings to canonical resources: per
    * canonical URL, how many spellings arrived, which doc is kept
    * (smallest id — the usual first-crawled policy), and the total
    * characters the dedup discards. */
  def q147UrlDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("url", expr(dirtyUrlSql))
      .withColumn("curl", canonicalizeUrl(col("url")))
      .groupBy(col("curl"))
      .agg(count(lit(1)).as("n_spellings"),
        min(col("doc_id")).as("kept_doc"),
        sum(col("n_chars")).as("chars_total"))

  val q147UrlDedupSql: String = s"""
    WITH u AS (
      SELECT doc_id, n_chars, $dirtyUrlSql AS url FROM documents),
    c AS (
      SELECT doc_id, n_chars,
        nf AS full_nf,
        lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
          AS scheme,
        lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1))
          AS hostport,
        regexp_replace(regexp_extract(nf,
          '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1), '/+$$', '')
          AS path,
        regexp_extract(nf, '\\?([^#]*)', 1) AS query0
      FROM (SELECT doc_id, n_chars, regexp_replace(url, '#.*', '') AS nf
            FROM u)),
    k AS (
      SELECT doc_id, n_chars, scheme, path,
        CASE WHEN scheme = 'http'
               THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''),
                                   ':80$$', '')
             WHEN scheme = 'https'
               THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''),
                                   ':443$$', '')
             ELSE regexp_replace(hostport, '^www\\.', '') END AS host,
        array_to_string(list_sort(list_filter(string_split(query0, '&'),
          p -> p <> '' AND NOT regexp_matches(p,
            '^(utm_[^=]*|ref|gclid|fbclid)(=|$$)'))), '&') AS kept
      FROM c)
    SELECT scheme || '://' || host || path ||
             (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS curl,
           COUNT(*) AS n_spellings,
           MIN(doc_id) AS kept_doc,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM k GROUP BY 1"""

  // --- q260_urldedup_atscale: canonicalize → collapse at 2^20 URLs --------
  /** At-scale correctness coverage for [[canonicalizeUrl]] + the collapse
    * aggregate — q147 canonicalizes the ~500-doc sf corpus; this replays
    * the SAME rule set over 2²⁰ range-synthesized dirty spellings (the
    * q147 residue scheme driven by the range id, plus a 7-way host mix),
    * collapsing to canonical groups keyed by (scheme, host, path,
    * surviving params). The dirty-URL SQL fragment is shared verbatim
    * between the Spark generator and the DuckDB oracle, and the oracle
    * canonicalizes with its own independently-written regex chain — so
    * the hash compare certifies the RULE SET at volume, exactly q147's
    * contract at ~2,000× the rows. What the gate holds closed at scale:
    * canonicalization is pure codegen'd string work (no UDF, no join,
    * no explode), and the collapse is ONE map-side-combined exchange on
    * the canonical key. */
  private[graft] val q260Urls = 1L << 20

  private[ext] val dirtyUrlAtScaleSql: String = """
    (CASE doc_id % 4 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS'
                     WHEN 2 THEN 'http' ELSE 'HTTP' END
     || '://'
     || CASE doc_id % 3 WHEN 0 THEN 'WWW.' WHEN 1 THEN 'www.' ELSE '' END
     || 's' || CAST(doc_id % 7 AS STRING) || '.Example.COM'
     || CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 2 THEN ':80' ELSE '' END
     || '/docs/' || CAST(doc_id % 1024 AS STRING)
     || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
     || CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=feed&id=' || CAST(doc_id % 20 AS STRING)
                  || '&b=2&a=1'
             ELSE '?a=1&id=' || CAST(doc_id % 20 AS STRING)
                  || '&b=2&fbclid=xyz' END
     || CASE WHEN doc_id % 2 = 1
             THEN '#sec' || CAST(doc_id % 5 AS STRING) ELSE '' END)"""

  private[graft] def q260Frame(spark: SparkSession,
                               urls: Long = q260Urls): DataFrame =
    spark.range(urls).select(col("id").as("doc_id"))
      .select(col("doc_id"), expr(dirtyUrlAtScaleSql).as("url"))

  def q260UrldedupAtScale(spark: SparkSession, dir: String): DataFrame =
    q260Frame(spark)
      .withColumn("curl", canonicalizeUrl(col("url")))
      .groupBy(col("curl"))
      .agg(count(lit(1)).as("n_spellings"),
        min(col("doc_id")).as("kept_doc"),
        sum(length(col("url"))).as("chars_total"))

  private[graft] def q260OracleSql(urls: Long = q260Urls): String = s"""
    WITH u AS (
      SELECT doc_id, length(url) AS n_chars, url FROM (
        SELECT u.i AS doc_id, $dirtyUrlAtScaleSql AS url
        FROM range(0, $urls) AS u(i)
        ) g),
    c AS (
      SELECT doc_id, n_chars,
        lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
          AS scheme,
        lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1))
          AS hostport,
        regexp_replace(regexp_extract(nf,
          '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1), '/+$$', '')
          AS path,
        regexp_extract(nf, '\\?([^#]*)', 1) AS query0
      FROM (SELECT doc_id, n_chars, regexp_replace(url, '#.*', '') AS nf
            FROM u)),
    k AS (
      SELECT doc_id, n_chars, scheme, path,
        CASE WHEN scheme = 'http'
               THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''),
                                   ':80$$', '')
             WHEN scheme = 'https'
               THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''),
                                   ':443$$', '')
             ELSE regexp_replace(hostport, '^www\\.', '') END AS host,
        array_to_string(list_sort(list_filter(string_split(query0, '&'),
          p -> p <> '' AND NOT regexp_matches(p,
            '^(utm_[^=]*|ref|gclid|fbclid)(=|$$)'))), '&') AS kept
      FROM c)
    SELECT scheme || '://' || host || path ||
             (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS curl,
           COUNT(*) AS n_spellings,
           MIN(doc_id) AS kept_doc,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM k GROUP BY 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_url_dedup" -> q147UrlDedup _,
    "q260_urldedup_atscale" -> q260UrldedupAtScale _,
  )

  def oracles: Map[String, String] = Map(
    "q147_url_dedup" -> q147UrlDedupSql,
    "q260_urldedup_atscale" -> q260OracleSql(),
  )
}
