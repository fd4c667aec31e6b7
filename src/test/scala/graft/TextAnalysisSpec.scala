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
}
