package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class TextAnalysisSpec extends GraftSuite {
  import spark.implicits._

  test("tfidf: a term in every doc scores 0, rare terms score higher") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2"),
      (3L, "common rare2 rare2")).toDF("doc_id", "text")
    val scored = TextAnalysis.tfIdf(docs, 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("word")) ->
        r.getAs[Double]("tfidf")).toMap
    assert(scored((1L, "common")) == 0.0) // df == N ⇒ idf == 0
    assert(scored((1L, "rare1")) > 0)
    // tf=2 beats tf=1 at the same df
    assert(scored((3L, "rare2")) > scored((2L, "rare2")))
  }

  test("q29 emits at most 3 ranked terms per doc") {
    val rows = TextAnalysis.q29TfIdf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 3)
      val ranked = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lang id prediction is deterministic and well-formed") {
    val rows = TextAnalysis.q36LangId(spark, sf).collect()
    assert(rows.length == 500)
    val langs = TextAnalysis.langMarkers.map(_._1).toSet + "und"
    rows.foreach(r => assert(langs(r.getAs[String]("pred_lang"))))
  }

  test("quality score is bounded and rewards longer, stopword-light docs") {
    val rows = TextAnalysis.q37QualityScore(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality out of range: $q")
    }
  }

  test("token stats agree with a driver-side recount on a sample") {
    val row = TextAnalysis.q38TokenStats(spark, sf)
      .filter(col("doc_id") === 0).head()
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    assert(row.getAs[Int]("n_tokens") == toks.length)
    assert(row.getAs[Int]("n_types") == toks.distinct.length)
  }

  test("fingerprint is order-sensitive (rolling, not a bag hash)") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
      TextAnalysis.rollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
  }

  test("repetition signals: hand-computed fractions on known docs") {
    val docs = Seq(
      // 8 tokens, 4 distinct 5-grams of which "a b c d e" repeats? no —
      // "a b c d e a b c": 5-grams = [abcde, bcdea, cdeab, deabc], all
      // distinct → dup frac 0. 2-grams: ab,bc,cd,de,ea,ab,bc → "a b"×2,
      // "b c"×2 of 7 → top 2/7
      (1L, "a b c d e a b c"),
      // "x x x x x x": 5-grams = [xxxxx, xxxxx] → dup frac 1/2;
      // 2-grams: "x x"×5 of 5 → top 1.0
      (2L, "x x x x x x"),
      // short doc: 2 tokens → one whole-string 5-gram, one 2-gram
      (3L, "hi there")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4, 0.0, 7, math.BigDecimal(2.0 / 7).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(2L) == ((2, 0.5, 5, 1.0)))
    assert(out(3L) == ((1, 0.0, 1, 1.0)))
  }

  test("count-min heavy hitters: exact counts, one-sided even under collisions") {
    val docs = Seq(
      (1L, "spark spark spark join scan merge"),
      (2L, "spark join join scan scan scan")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenHeavyHitters(docs, "text", minShare = 0.0)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set("spark", "join", "scan", "merge"))
    assert(out("spark")._1 == 4 && out("scan")._1 == 4 &&
      out("join")._1 == 3 && out("merge")._1 == 1)
    assert(out.values.forall { case (_, over, bound) => over && bound })
    // width=2 forces collisions: the estimate may inflate but never
    // undercounts — the one-sided guarantee is structural, not statistical
    val crowded = TextAnalysis.tokenHeavyHitters(docs, "text",
      depth = 2, width = 2, minShare = 0.0)
    assert(crowded.filter(!col("over_ok")).count() == 0)
  }

  test("pii scrub redacts and counts emails and phone numbers") {
    val docs = Seq(
      (1L, "mail bob.smith@corp.example then call 555-0142 or 555-9999"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "text")
      .select("doc_id", "n_emails", "n_phones", "scrubbed")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((1, 2, "mail <EMAIL> then call <PHONE> or <PHONE>")))
    assert(out(2L) == ((0, 0, "no pii here at all")))
  }

  test("boilerplate scrub: threshold splits hot from cold, order survives, all-chrome docs empty") {
    // x in 4 docs, y in 3, z in 1 → minDocs=3 removes x and y only
    val df = Seq(
      ("a", "x\ny"), ("b", "x\ny"), ("c", "y\nx"), ("d", "z\nx\nkeep me"),
      ("e", null))
      .toDF("doc", "text")
    val out = TextAnalysis.removeBoilerplate(df, "doc", "text", minDocs = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == (("", 2L, 2L)), out("a"))
    assert(out("b") == (("", 2L, 2L)))
    assert(out("c") == (("", 2L, 2L)))
    assert(out("d") == (("z\nkeep me", 3L, 1L)))
    // NULL text survives as a row (nullness preserved), never silently drops
    assert(out.contains("e") && out("e") == ((null, 0L, 0L)))
  }

  test("q78 fixture scrub strips exactly the shared chrome lines") {
    val chrome = Set(
      "ACME Portal | Home | Products | Support | Contact",
      "Sign in or create an account to continue",
      "Copyright 2024 ACME Corp. All rights reserved.",
      "This site uses cookies to improve your experience.")
    val rows = TextAnalysis.q78Boilerplate(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val cleaned = r.getString(1).split("\n", -1).filter(_.nonEmpty).toSet
      assert(cleaned.intersect(chrome).isEmpty, s"${r.getString(0)} kept chrome")
      assert(r.getLong(3) > 0, s"${r.getString(0)} removed nothing")
    }
    val p1 = rows.find(_.getString(0) == "page1.txt").get.getString(1)
    assert(p1 == "Widgets ship in four sizes from small to jumbo.\n" +
      "Our jumbo widget survived a drop from orbit.")
  }

  test("cooccurrence counts window pairs with exact lift") {
    // "a b a b": forward pairs within ±2 → (a,b)×2, (a,a), (b,a), (b,b);
    // lift(a,b) = 2·4 / (2·2) = 2.0 exactly
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(docs, "text", win = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b")) == (2L, 2.0))
    assert(got(("a", "a")) == (1L, 1.0))
    assert(got(("b", "a")) == (1L, 1.0))
    assert(got(("b", "b")) == (1L, 1.0))
    assert(got.size == 4)
  }

  test("invertedIndex delta-encodes sorted postings and trims below minDf") {
    // doc 31 repeats y: the (word, doc) dedup must keep one posting —
    // load-bearing because the planner serves that dedup and the posting
    // build from ONE word-partitioned exchange (PlanShapeSpec q241)
    val docs = Seq((10L, "x y"), (25L, "y z"), (31L, "y y y"), (32L, "z w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "text", minDf = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // y in 10,25,31 → gaps 10,15,6; z in 25,32 → gaps 25,7; x,w trimmed
    assert(got == Map("y" -> (3L, "10,15,6"), "z" -> (2L, "25,7")))
  }

  test("vocabCoverage: top-V cut is total-ordered; empty docs keep a row") {
    // counts: x=4, y=3, z=2, q=1 → vocab(2) = {x, y}; doc 4 is empty
    val docs = Seq(
      (1L, "x x y z"), (2L, "x y q"), (3L, "x y z"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got == Map(
      1L -> ((4L, 1L, Some(0.25))),
      2L -> ((3L, 1L, Some(0.333333))),
      3L -> ((3L, 1L, Some(0.333333))),
      4L -> ((0L, 0L, None))))
  }

  test("rarityBuckets: balanced score-ordered tiers over every scored doc") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.rarityBuckets(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rarity"),
        r.getAs[Int]("bucket")))
    val nScored = docs
      .filter(size(filter(split(lower(col("text")), "\\s+"),
        w => w =!= "")) > 0).count()
    assert(got.length == nScored, "every tokenizable doc gets a tier")
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
    // tiers respect score order (ties may straddle a boundary, so ≤)
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket(1).max <= byBucket(2).min ||
      byBucket(1).max == byBucket(2).min)
    assert(byBucket(2).max <= byBucket(3).min ||
      byBucket(2).max == byBucket(3).min)
  }

  test("bm25TopK matches the hand-derived exact rational arithmetic") {
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "spark"),
      (3L, "other words here")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "join"), k = 10)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Double]("score"))))
      .toMap
    // N=3, L=7; doc1 dl=3 (tf: spark 2, join 1), doc2 dl=1 (spark 1).
    // spark: df=2, idf=(2·3−4+1)/(2·2+1)=3/5; join: df=1, idf=5/3 — all
    // carried as exact integer num/den, one double division per term,
    // summed in token order ("join" < "spark").
    val d1 = 0.0 + 770.0 / 516.0 + 924.0 / 1210.0
    val d2 = 0.0 + 462.0 / 590.0
    assert(got.keySet == Set(1L, 2L), "doc 3 has no query term")
    assert(got(1L) == ((2L, d1)), s"doc1: ${got(1L)} want $d1")
    assert(got(2L) == ((1L, d2)), s"doc2: ${got(2L)} want $d2")
    assert(d1 > d2, "more matching terms must outrank")
  }

  test("bigramLmScore matches hand-derived add-one bigram probabilities") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("lm_score"))))
      .toMap
    // Corpus bigrams: (a,b)×3, (b,a)×1, (b,c)×1; contexts a→3, b→2; V=3.
    // p(b|a) = (3+1)/(3+3) = 4/6, p(a|b) = p(c|b) = (1+1)/(2+3) = 2/5.
    // Contributions fold in sorted (a,b) order from 0.0 — the exact
    // double tree the operator builds.
    val d1 = (0.0 + (2.0 * 4.0) / 6.0 + 2.0 / 5.0) / 3.0
    val d2 = (0.0 + 4.0 / 6.0 + 2.0 / 5.0) / 2.0
    assert(got.keySet == Set(1L, 2L), "single-token doc has no bigrams")
    assert(got(1L) == ((3L, d1)), s"doc1: ${got(1L)} want $d1")
    assert(got(2L) == ((2L, d2)), s"doc2: ${got(2L)} want $d2")
    // d1 repeats the corpus-dominant transition ⇒ higher mean probability
    assert(d1 > d2)
  }

  test("phraseSearch finds the top bigram with counts and first positions") {
    import spark.implicits._
    // corpus bigram counts: (x,y)=3, (y,x)=2, (z,x)=1 → phrase "x y"
    val docs = Seq((1L, "x y x y"), (2L, "y x"), (3L, "z x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == Map(
      1L -> ((2L, 0L, "x y")),
      3L -> ((1L, 1L, "x y"))))
  }

  test("q234 small analog: opposite-phase classes, exact global tie, " +
      "lexicographic tie-break picks 'aa bb'") {
    // 64 docs → (aa,bb) and (cc,dd) both count 5·32 = 160 exactly; only
    // the (count desc, a, b) ordering separates them
    val got = TextAnalysis.phraseSearch(
        TextAnalysis.q234Frame(spark, 64L), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.size == 64)
    got.foreach { case (id, row) =>
      val exp = if (id % 2 == 0) ((3L, 0L, "aa bb")) else ((2L, 4L, "aa bb"))
      assert(row == exp, s"doc $id: got $row, expected $exp")
    }
  }

  test("q234 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q234Frame(spark).count() == 1048576L)
  }

  test("gateReport: pass rate and dominant failure reason per source") {
    val clean = (1 to 30).map(i => s"word$i").mkString(" ")
    val short = "too short"
    val docs = Seq(
      (1L, clean, "sA"), (2L, clean + " more", "sA"), (3L, short, "sA"),
      (4L, short, "sB"), (5L, short + " x", "sB"))
      .toDF("doc_id", "text", "source")
    val got = graft.ext.TextAnalysis.gateReport(docs, "doc_id", "text",
        "source")
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"),
          r.getAs[Double]("pass_rate6"), r.getAs[Int]("top_reason"))))
      .toMap
    assert(got("sA") == ((3L, 2L, 0.666667, 1)), got.toString)
    assert(got("sB") == ((2L, 0L, 0.0, 1)), got.toString)
  }

  test("datasetCard: one-row summary with exact dup ratio and top lang") {
    val docs = Seq(
      (1L, "en", "s1", "hello world"), (2L, "en", "s1", "hello world"),
      (3L, "en", "s2", "unique one"), (4L, "de", "s2", "vier worte hier ja"))
      .toDF("doc_id", "lang", "source", "text")
    val r = graft.ext.TextAnalysis.datasetCard(docs, "lang", "source", "text")
      .collect().head
    assert(r.getAs[Long]("n_docs") == 4L && r.getAs[Long]("n_langs") == 2L &&
      r.getAs[Long]("n_sources") == 2L, r.toString)
    // one exact duplicate pair → dup ratio 1/4
    assert(r.getAs[Double]("exact_dup_ratio6") == 0.25, r.toString)
    assert(r.getAs[String]("top_lang") == "en" &&
      r.getAs[Double]("top_lang_share6") == 0.75, r.toString)
    // 11+11+10+18 chars; est tokens ceil/4 = 3+3+3+5
    assert(r.getAs[Long]("total_chars") == 50L &&
      r.getAs[Long]("est_tokens") == 14L, r.toString)
  }

  test("blocklistScreen: per-category counts, threshold fires the verdict") {
    val docs = Seq(
      (1L, "slow slow fast words here"),      // perf 3 → screened
      (2L, "spark table nothing else"),       // infra 2 → clean
      (3L, "clean text entirely")).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.blocklistScreen(docs, "doc_id", "text",
        Seq("perf" -> Seq("slow", "fast"), "infra" -> Seq("spark", "table")))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_perf"), r.getAs[Long]("n_infra"),
          r.getAs[Boolean]("screened")))).toMap
    assert(got == Map(1L -> ((3L, 0L, true)), 2L -> ((0L, 2L, false)),
      3L -> ((0L, 0L, false))), got.toString)
  }

  test("filterGate: each rule sets its own bit, clean doc passes") {
    val clean = (1 to 30).map(i => s"word$i").mkString(" ") // 30 distinct
    val repet = (1 to 30).map(_ => "word word2").mkString(" ") // 60 toks, 2 distinct
    val stopy = (1 to 30).map(_ => "the a xx").mkString(" ") // 2/3 stopwords
    val gibber = (1 to 30).map(i => s"a$i").mkString(" ") // short tokens
    val docs = Seq((1L, clean), (2L, "too short"), (3L, repet),
      (4L, stopy), (5L, gibber)).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.filterGate(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("reasons"), r.getAs[Boolean]("kept")))).toMap
    assert(got(1L) == ((0, true)), got.toString)
    assert((got(2L)._1 & 1) == 1 && !got(2L)._2, got.toString) // too short
    assert((got(3L)._1 & 4) == 4, got.toString) // low diversity
    assert((got(4L)._1 & 8) == 8, got.toString) // stopword-heavy
    assert((got(5L)._1 & 16) == 16, got.toString) // short tokens
  }

  /** q215 pin, small analog (256 docs): bm25TopK over the synthesized
    * corpus must equal a driver-side replay of the integer-exact formula —
    * same Long products, same single double division, so the comparison is
    * exact equality, not a tolerance. The generator's heavy score ties
    * make the doc_id tiebreak at the top-k boundary load-bearing. */
  test("q215 small analog: bm25 over the synthetic corpus equals the driver replay") {
    val docs = 256L
    val got = graft.ext.TextAnalysis.bm25TopK(
        graft.ext.TextAnalysis.q215Corpus(spark, docs),
        "doc_id", "text", graft.ext.TextAnalysis.q215QueryTerms)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"),
        r.getAs[Double]("score"))).toSeq
    // driver replay from the generator's closed form
    def tf(d: Long) = d % 3 + 1
    def dl(d: Long) = (d % 3 + 1) + (d % 5 + 1)
    val n = docs
    val bigL = (0L until docs).map(dl).sum
    val matching = (0L until docs).filter(d => d % 16 == 3 || d % 16 == 7)
    val df = matching.size / 2 // 16 docs per query term at 256
    val replay = matching.map { d =>
      val num = 22L * bigL * tf(d) * (2 * n - 2 * df + 1)
      val den = (10L * bigL * tf(d) + 3 * bigL + 9 * dl(d) * n) * (2 * df + 1)
      (d, 1L, num.toDouble / den.toDouble)
    }.sortBy { case (d, _, s) => (-s, d) }.take(20)
    assert(got == replay,
      s"first diff: ${got.zip(replay).find { case (a, b) => a != b }}")
  }

  test("q215 full corpus is 2^20 documents") {
    assert(graft.ext.TextAnalysis.q215Corpus(spark).count() == (1L << 20))
  }

  test("q240 small analog: df-15 lines survive, df-16 and sitewide lines " +
      "are scrubbed, per-doc in original order") {
    // 160 docs: 'g16' groups are exactly 10 × 16 docs (all removed at
    // minDocs=16); 'g15' groups are 10 × 15 + one 10-doc remainder (all
    // below threshold, all survive); the sitewide banner is in all 160
    val got = TextAnalysis.removeBoilerplate(
        TextAnalysis.q240Frame(spark, 160L), "doc_id", "text", minDocs = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 160)
    got.foreach { case (d, row) =>
      assert(row == ((s"u$d\ng15 ${d / 15}", 4L, 2L)),
        s"doc $d: got $row")
    }
  }

  test("q240 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q240Frame(spark).count() == 1048576L)
  }

  test("q241 small analog: Zipf postings are the closed-form delta runs, " +
      "hapax words trimmed") {
    // 1024 docs: df(w_r) = 1023/r + 1; postings '0' + (df-1)×(',r'); the
    // 1024 unique h<d> tokens must all fall to minDf=2
    val got = TextAnalysis.invertedIndex(
        TextAnalysis.q241Frame(spark, 1024L), "text", minDf = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size == 256, s"expected 256 vocabulary rows, got ${got.size}")
    assert(!got.keys.exists(_.startsWith("h")), "hapax words survived minDf")
    for (r <- 16 to 271) {
      val df = 1023L / r + 1
      val postings = "0" + s",$r" * (df - 1).toInt
      assert(got(s"w$r") == ((df, postings)), s"w$r: got ${got(s"w$r")}")
    }
  }

  test("q241 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q241Frame(spark).count() == 1048576L)
  }

  test("q244 small analog: harmonic vocab collapse + weighted pair counts " +
      "match a local replay, 1-char heavy hitters excluded") {
    // 64 docs → 256 tokens, rank r(t) = 256 div (t+1); replay the whole
    // collapse → pair-explode → weighted count → (n desc, pair) cut in
    // plain Scala and compare ordered rows
    val spell = (r: Long) => r.toString.map(c => ('a' + (c - '0')).toChar)
    val wc = (0L until 256L).map(t => spell(256L / (t + 1)))
      .groupBy(identity).map { case (w, ts) => w -> ts.size.toLong }
    val expected = wc.toSeq.filter(_._1.length >= 2)
      .flatMap { case (w, n) => w.sliding(2).map(p =>
        s"${p(0)} ${p(1)}" -> n) }
      .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(30)
    val got = TextAnalysis.bpePairCounts(
        TextAnalysis.q244Frame(spark, 64L), "text", 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find { case (a, b) => a != b }}")
  }

  test("q244 synthetic corpus is 2^20 documents / 2^22 tokens") {
    val f = TextAnalysis.q244Frame(spark)
    assert(f.count() == 1048576L)
    assert(f.select(sum(size(split(col("text"), " ")))).head.getLong(0)
      == (4L << 20))
  }

  test("q258 small analog: planted bigram counts follow the divisor " +
      "curve and lift collapses to ratio6(T, n)") {
    // 4096 docs: n_r = 4095/r + 1 for r in [16, 80); the doc-unique
    // fillers keep every other pair at count 1, so the top-40 cut is
    // exactly r in [16, 56); T = 2·4096 + 4·Σ n_r, and with na = nb = n
    // the lift is the half-up integer (2nT·10⁶ + n²) div 2n² over 10⁶
    val nOf = (r: Long) => 4095L / r + 1
    val t = 2L * 4096 + 4L * (16L until 80L).map(nOf).sum
    val expected = (16L until 56L).map { r =>
      val n = nOf(r)
      val lift = ((2L * n * t * 1000000L + n * n) / (2L * n * n)).toDouble /
        1000000L
      (s"u$r", s"v$r", n, lift)
    }.sortBy { case (a, b, n, _) => (-n, a, b) }
    val got = TextAnalysis.cooccurrence(
        TextAnalysis.q258Frame(spark, 4096L), "text", win = 2, k = 40)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ==
      expected.map(x => (x._1, x._2, x._3)),
      s"first diff: ${got.zip(expected).find { case (a, b) => a != b }}")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-9, s"lift ${g._1}: ${g._4} vs ${e._4}")
    }
  }

  test("q258 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q258Frame(spark).count() == 1048576L)
  }

  test("q259 small analog: rank rollup matches a driver-side tf-idf " +
      "replay over the planted df spectrum") {
    val docs = 4096L
    val divisors = (d: Long) => (16L until 48L).filter(r => d % r == 0)
    val dfOf = (r: Long) => (docs - 1) / r + 1
    val r6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-doc ranked words: h<d> (idf ln N), w<r> desc by r, z (0)
    val rows = (0L until docs).flatMap { d =>
      val ws = Seq((s"h$d", r6(math.log(docs.toDouble)))) ++
        (Seq((s"z", r6(2 * math.log(docs.toDouble / docs)))) ++
          divisors(d).map(r =>
            (s"w$r", r6(math.log(docs.toDouble / dfOf(r))))))
          .sortBy { case (w, t) => (-t, w) }
      ws.take(3).zipWithIndex.map { case ((w, t), i) =>
        (w.substring(0, 1), i + 1, t)
      }
    }
    val expected = rows.groupBy { case (p, r, _) => (p, r) }
      .map { case ((p, r), xs) =>
        ((p, r), (xs.size.toLong, xs.map(_._3).min, xs.map(_._3).max)) }
    val got = TextAnalysis.q259TfidfAtScale0(spark, docs)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == expected.keySet,
      s"groups: got ${got.keySet}, want ${expected.keySet}")
    expected.foreach { case (k, (n, lo, hi)) =>
      val (gn, glo, ghi) = got(k)
      assert(gn == n, s"$k count $gn vs $n")
      assert(math.abs(glo - lo) < 1e-9 && math.abs(ghi - hi) < 1e-9,
        s"$k envelope ($glo, $ghi) vs ($lo, $hi)")
    }
  }

  test("q259 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q259Frame(spark).count() == 1048576L)
  }

  test("q263 small analog: each planted class trips exactly its reason " +
      "bits and the rollup matches the closed form") {
    val docs = 4096L
    val expected = TextAnalysis.q263Classes.zipWithIndex.map {
      case ((_, reasons, nt), i) =>
        val n = (docs - 1 - i) / 8 + 1
        reasons -> ((n, n * nt))
    }.toMap
    val got = TextAnalysis.q263FiltergateAtScale0(spark, docs)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expected, s"got $got, want $expected")
  }

  test("q263 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q263Frame(spark).count() == 1048576L)
  }

  test("q268 small analog: tier assignment matches a naive driver-side " +
      "sort + NTILE simulation, boundaries inside classes") {
    val docs = 4096L
    // rarity per class: T = 10m, cnt_c = (c+1)m → T div cnt = 10/(c+1)
    val rarity = Map(0L -> 10L, 1L -> 5L, 2L -> 3L, 3L -> 2L)
    val ordered = (0L until docs).map(d => (rarity(d % 4), d)).sorted
    val (q, rem) = (docs / 3, docs % 3)
    def bucketOf(rank: Long): Int = // rank is 1-based
      (if (rank <= rem * (q + 1)) (rank + q) / (q + 1)
       else rem + (rank - rem * (q + 1) + q - 1) / q).toInt
    val expected = ordered.zipWithIndex
      .map { case ((r, d), i) => (bucketOf(i + 1), d % 4, r, d) }
      .groupBy { case (b, c, _, _) => (b, c) }
      .map { case ((b, c), xs) =>
        (b, c) -> ((xs.size.toLong, xs.map(_._3).min, xs.map(_._3).max,
          xs.map(_._4).sum)) }
    val got = TextAnalysis.q268RarityAtScale0(spark, docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, {
      val d = (got.keySet ++ expected.keySet)
        .find(k => got.get(k) != expected.get(k))
      s"first diff at $d: got ${d.flatMap(got.get)}, " +
        s"want ${d.flatMap(expected.get)}"
    })
    // both boundary classes really split across tiers
    assert(got.keySet.count(_._2 == 2L) == 2, "rarity-3 class not split")
    assert(got.keySet.count(_._2 == 1L) == 2, "rarity-5 class not split")
  }

  test("q268 synthetic corpus is at the claimed scale") {
    assert(TextAnalysis.q268Frame(spark).count() == 1048576L)
  }
}
