package graft

import org.apache.spark.sql.functions._

import graft.ext.Importance
import graft.graph.Algorithms

class ImportanceSpec extends GraftSuite {
  import spark.implicits._

  test("dsir: target-like docs outscore target-unlike docs") {
    // target vocabulary {alpha beta}, pool vocabulary {gamma delta}; the
    // mixed doc sits between the two pure pool docs
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (10L, "alpha beta alpha beta alpha", false), // target-like
      (11L, "alpha beta gamma delta", false),      // mixed
      (12L, "gamma delta gamma delta gamma", false) // target-unlike
    ).toDF("doc_id", "text", "tgt")
    val scores = Importance.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("dsir_score")).toMap
    assert(scores(10L) > scores(11L), s"target-like vs mixed: $scores")
    assert(scores(11L) > scores(12L), s"mixed vs target-unlike: $scores")
  }

  test("dsir: bigram counts and coverage over the documents table") {
    val rows = Importance.q149DsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") >= 1)
      assert(r.getAs[Double]("dsir_score") > 0.0)
    }
    // every doc with >= 2 tokens scores
    val nDocs = Tables.documents(spark, sf)
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 2).count()
    assert(rows.length.toLong == nDocs)
  }

  test("landmarkBfs matches per-landmark single-source BFS") {
    // 6-node graph: 0→1→2→3, 3→0 cycle, 4→5 island
    val v = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (4L, 5L))
      .toDF("src", "dst")
    val landmarks = Seq(0L, 4L)
    val got = Algorithms.landmarkBfs(v, e, landmarks, maxIter = 10)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("landmark")) ->
        Option(r.getAs[java.lang.Long]("dist")).map(_.toLong)).toMap
    val want = landmarks.flatMap { lm =>
      Algorithms.shortestPaths(v, e.withColumn("w", lit(1L)),
          sourceId = lm, maxIter = 10)
        .collect().map(r => (r.getAs[Long]("id"), lm) ->
          Option(r.getAs[java.lang.Long]("dist")).map(_.toLong))
    }.toMap
    assert(got == want)
    // island is unreachable from 0; cycle unreachable from 4
    assert(got((4L, 0L)).isEmpty && got((1L, 4L)).isEmpty)
    assert(got((3L, 0L)).contains(3L) && got((5L, 4L)).contains(1L))
  }
}
