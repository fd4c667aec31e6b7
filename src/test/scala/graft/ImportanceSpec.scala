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

  test("q261 small analog: class rollup matches a full driver-side DSIR " +
      "replay (hashes, buckets, smoothing, sorted-bucket fold)") {
    val docs = 4096L
    val perClass = docs / 64
    def tok(x: Long) = ('a' + (x % 26)).toChar.toString + x.toString
    def tv(t: String) = 31L * t.length + t.head.toLong
    val classBigrams = (0L until 64L).map { c =>
      val vs = Seq(c, (c * 7 + 3) % 64, (c * 13 + 5) % 64,
        (c * 29 + 11) % 64).map(x => tv(tok(x)))
      c -> vs.sliding(2).map(p => (p(0) * 1000003L + p(1)) % 1009).toSeq
    }.toMap
    val ct = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cr = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    classBigrams.foreach { case (c, bgs) => bgs.foreach { b =>
      if (c < 8) ct(b) += perClass else cr(b) += perClass } }
    val (st, sr) = (ct.values.sum, cr.values.sum)
    def ratio(b: Long) = ((ct(b) + 1) * (sr + 1009)).toDouble /
      ((cr(b) + 1) * (st + 1009)).toDouble
    val expScore = classBigrams.map { case (c, bgs) =>
      val byB = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      val s = byB.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (b, n)) =>
        acc + n.toDouble * ratio(b) }
      c -> s / bgs.size
    }
    val got = Importance.dsirWeights(Importance.q261Frame(spark, docs),
        "doc_id", "text", col("doc_id") % 64 < 8)
      .groupBy((col("doc_id") % 64).as("cls"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_bigrams")).as("minb"), max(col("n_bigrams")).as("maxb"),
        min(col("dsir_score")).as("mins"), max(col("dsir_score")).as("maxs"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == (0L until 64L).toSet)
    (0L until 64L).foreach { c =>
      val (n, minb, maxb, mins, maxs) = got(c)
      assert(n == perClass && minb == 3 && maxb == 3, s"class $c: $n")
      assert(mins == maxs, s"class $c score not uniform")
      assert(mins == expScore(c), s"class $c: $mins vs ${expScore(c)}")
    }
  }

  test("q261 synthetic corpus is at the claimed scale") {
    assert(Importance.q261Frame(spark).count() == 1048576L)
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
