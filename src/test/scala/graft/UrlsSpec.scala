package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Urls}

class UrlsSpec extends GraftSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("canonicalizeUrl: scheme/host case, www, default ports, fragments") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/Docs/1#frag",
      "https://example.com/Docs/1",
      "HTTP://www.example.com:80/Docs/1",
      "http://example.com:8080/Docs/1") == Seq(
      "https://example.com/Docs/1",
      "https://example.com/Docs/1",
      "http://example.com/Docs/1",
      "http://example.com:8080/Docs/1")) // non-default port survives
  }

  test("canonicalizeUrl: path case preserved, trailing slashes stripped") {
    assert(canon(
      "https://example.com/A/B/",
      "https://example.com/A/B///",
      "https://example.com/a/b") == Seq(
      "https://example.com/A/B",
      "https://example.com/A/B",
      "https://example.com/a/b"))
  }

  test("canonicalizeUrl: tracking params dropped, survivors sorted, empties gone") {
    assert(canon(
      "https://example.com/p?utm_source=x&b=2&a=1&gclid=g",
      "https://example.com/p?a=1&fbclid=f&b=2&ref=tw",
      "https://example.com/p?b=2&&a=1",
      "https://example.com/p?utm_campaign=c",
      "https://example.com/p?refresh=1&a=1") == Seq(
      "https://example.com/p?a=1&b=2",
      "https://example.com/p?a=1&b=2",
      "https://example.com/p?a=1&b=2",
      "https://example.com/p",
      // 'refresh' is NOT 'ref' — the param filter must match whole names
      "https://example.com/p?a=1&refresh=1"))
  }

  test("q147 collapses every spelling class to one resource per residue") {
    val out = Urls.q147UrlDedup(spark, sf)
    val rows = out.collect()
    // sf0.001: source = src{doc_id%20}, so groups collapse to residues doc_id%40 → 40 canonical urls,
    // and the canonical form has no tracking junk, upper case, or ports
    assert(rows.length == 40, rows.length)
    val urls = out.select("curl").as[String].collect()
    assert(urls.forall(u => u == u.toLowerCase), "case survived")
    assert(urls.forall(u => !u.contains("utm") && !u.contains("fbclid")))
    assert(urls.forall(u => !u.contains(":443") && !u.contains(":80")))
    assert(urls.forall(u => !u.contains("www.") && !u.contains("#")))
    // params arrive sorted: a=1 before b=2 before id=K
    assert(urls.forall(_.matches(".*\\?a=1&b=2&id=\\d+$")), urls.head)
  }

  test("q260 small analog: the collapse matches a full driver-side " +
      "replay of the dirty spelling and the rule set") {
    val n = 8192L
    def dirty(d: Long): String = {
      val scheme = (d % 4) match {
        case 0 => "https"; case 1 => "HTTPS"; case 2 => "http"; case _ => "HTTP"
      }
      val www = (d % 3) match { case 0 => "WWW."; case 1 => "www."; case _ => "" }
      val port = (d % 4) match { case 0 => ":443"; case 2 => ":80"; case _ => "" }
      val slash = if (d % 3 == 0) "/" else ""
      val q = if (d % 2 == 0) s"?utm_source=feed&id=${d % 20}&b=2&a=1"
              else s"?a=1&id=${d % 20}&b=2&fbclid=xyz"
      val frag = if (d % 2 == 1) s"#sec${d % 5}" else ""
      s"$scheme://${www}s${d % 7}.Example.COM$port/docs/${d % 1024}$slash$q$frag"
    }
    def canonical(d: Long): String = {
      val scheme = if (d % 4 < 2) "https" else "http"
      s"$scheme://s${d % 7}.example.com/docs/${d % 1024}?a=1&b=2&id=${d % 20}"
    }
    val expected = (0L until n).map(d => (canonical(d), d))
      .groupBy(_._1).map { case (curl, xs) =>
        curl -> ((xs.size.toLong, xs.map(_._2).min,
          xs.map(x => dirty(x._2).length.toLong).sum)) }
    val got = Urls.q260Frame(spark, n)
      .withColumn("curl", Urls.canonicalizeUrl(col("url")))
      .groupBy(col("curl"))
      .agg(count(lit(1)).as("n_spellings"), min(col("doc_id")).as("kept_doc"),
        sum(length(col("url"))).as("chars_total"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, {
      val d = (got.keySet ++ expected.keySet)
        .find(k => got.get(k) != expected.get(k))
      s"first diff at $d: got ${d.flatMap(got.get)}, " +
        s"want ${d.flatMap(expected.get)}"
    })
  }

  test("q260 synthetic corpus is at the claimed scale") {
    assert(Urls.q260Frame(spark).count() == 1048576L)
  }

  test("containmentPairs finds the directed excerpt→source relation") {
    // doc 2 is an excerpt of doc 1 (its shingles are a subset); jaccard
    // stays low (1's extra shingles dilute the union) — only the directed
    // containment detects it. doc 3 is unrelated.
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, big),
      (2L, "delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L)), out.toString)
    // symmetric jaccard at the same bar finds nothing
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9).count() == 0)
  }

  test("containmentPairs maxPostings cap drops boilerplate-only overlap") {
    // docs 1-4 share a long boilerplate block plus a unique suffix each;
    // doc 5 is a genuine excerpt of doc 6 (all-unique vocabulary).
    val boiler = "click here to subscribe now for daily updates and news"
    val docs = Seq(
      (1L, s"$boiler apple banana"),
      (2L, s"$boiler cherry date"),
      (3L, s"$boiler elder fig"),
      (4L, s"$boiler grape honeydew"),
      (5L, "quark lepton boson gluon photon"),
      (6L, "quark lepton boson gluon photon hadron meson baryon neutrino"))
      .toDF("doc_id", "text")
    // uncapped: boilerplate drives 12 ordered pairs among docs 1-4
    // (8 shared internal shingles / 10 per doc = 0.8 ≥ 0.5), plus (5,6)
    val loose = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose.contains((5L, 6L)) && loose.count(_._1 <= 4L) == 12, loose)
    // maxPostings=2: every boilerplate shingle has df=4 > 2 and leaves
    // the universe — docs 1-4 pair with nobody, the true excerpt remains
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.5, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((5L, 6L)), capped.toString)
  }
}
