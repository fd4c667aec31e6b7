package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling}

class SamplingSpec extends GraftSuite {

  test("rate thresholds quantize to /256 and cover the endpoints") {
    assert(Sampling.rateThreshold(0.0) == "00") // bucket < "00" admits nothing
    assert(Sampling.rateThreshold(1.0) == "g0") // 'g' > 'f' admits everything
    assert(Sampling.rateThreshold(0.5) == "80")
    intercept[IllegalArgumentException](Sampling.rateThreshold(1.5))
  }

  test("shuffleOrder: dense 1..N rank equal to an exact md5-order replay") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val ids = docs.collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(s"seedX:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = ids.sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val got = Sampling.shuffleOrder(docs, col("doc_id"), "seedX")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSeq.sorted == (1L to ids.length).toList,
      "ranks must be a dense 1..N permutation")
    assert(got == expected,
      "two-phase bucketed rank must equal the single-order md5 rank")
  }

  test("stratified sample is deterministic, within tolerance, strata-scoped") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val rates = Map("en" -> 0.5, "es" -> 0.1) // other langs: dropped
    def run() = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), rates)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val a = run().toSet
    assert(a == run().toSet, "sample must be identical across runs")
    assert(a.forall { case (_, l) => rates.contains(l) },
      "unlisted strata must be dropped")
    val byLang = a.groupBy(_._2).view.mapValues(_.size).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (l, r) =>
      val got = byLang.getOrElse(l, 0).toDouble / totals(l)
      // md5 buckets are uniform; on dozens of rows per stratum allow a
      // generous binomial tolerance — determinism, not precision, is the
      // contract under test
      assert(math.abs(got - r) < 0.25, s"stratum $l: kept $got, wanted ~$r")
    }
  }

  test("q247 small analog: rate-ladder selection matches an exact " +
      "MessageDigest replay — rate 0 and the missing stratum keep nothing, " +
      "rate 1.0 keeps everything") {
    val n = 17L * 64
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(2)
    val thr = Sampling.q247Rates.map { case (s, r) =>
      val q = math.round(r * 256).toInt
      s -> (if (q >= 256) "g0" else f"$q%02x")
    }.toMap
    val expected = (0L until n).filter { id =>
      thr.get(s"s${id % 17}").exists(bucket(id) < _)
    }.toSet
    val got = Sampling.stratifiedSample(Sampling.q247Frame(spark, n),
        col("stratum"), col("doc_id"), Sampling.q247Rates.toMap)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"diff: ${(got -- expected).take(3)} / ${(expected -- got).take(3)}")
    assert(!got.exists(id => id % 17 == 0), "rate-0 stratum leaked rows")
    assert(!got.exists(id => id % 17 == 16), "unlisted stratum leaked rows")
    assert((0L until n).count(id => id % 17 == 15 && got(id)) == 64,
      "rate-1.0 stratum must keep every row")
  }

  test("q247 synthetic frame is at the claimed scale") {
    assert(Sampling.q247Frame(spark).count() == (1L << 20))
  }

  test("q255 small analog: temperature selection over the power-of-4 " +
      "ladder matches an exact driver-side replay; tiny strata ride the " +
      "g0 sentinel, the head is suppressed hardest") {
    val rows = 256L
    val ladder = Sampling.q255Ladder(rows)
    assert(ladder.map(_._2).sum == rows, ladder.toString)
    val bounds = ladder.scanLeft(("", 0L)) {
      case ((_, acc), (s, c)) => (s, acc + c) }.tail
    def stratumOf(id: Long): String = bounds.find(id < _._2).get._1
    val ns = ladder.toMap
    val den = ns.keys.toSeq.sorted.foldLeft(0.0)((a, s) => a + math.sqrt(ns(s).toDouble))
    def rate(s: String): Double =
      math.min(1.0, 0.25 * rows * (math.sqrt(ns(s).toDouble) / den) / ns(s))
    def thr(s: String): String = {
      val q = math.floor(rate(s) * 256).toInt
      if (q >= 256) "g0" else f"$q%02x"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(2)
    val expected = (0L until rows)
      .filter(id => bucket(id) < thr(stratumOf(id))).toSet
    val got = Sampling.temperatureMix(Sampling.q255Frame(spark, rows),
        "stratum", col("doc_id"), targetFrac = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"diff: ${(got -- expected).take(3)} / ${(expected -- got).take(3)}")
    // the planted shape's two contract points
    assert(thr("t1") == "g0", "smallest stratum must hit the rate-1 sentinel")
    assert(rate("t0") < rate(ladder.last._1),
      "head must be suppressed below the largest tail stratum")
  }

  test("q255 synthetic frame is at the claimed scale with the exact ladder") {
    val counts = Sampling.q255Frame(spark)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Sampling.q255Ladder(1L << 20).toMap, counts.toString)
    assert(counts.values.sum == (1L << 20))
  }

  test("temperature mix matches an independent driver-side replay exactly") {
    // the operator derives rates IN-PLAN; this recomputes the whole chain
    // (counts → sorted-fold Σ√n → rate → /256 threshold byte → md5 bucket)
    // in plain Scala and demands the identical selected set — any drift in
    // fold order, quantization, or hashing shows up as a set difference
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ns = docs.groupBy(_._2).view.mapValues(_.size).toMap
    val nTot = docs.length.toDouble
    val den = ns.keys.toSeq.sorted.foldLeft(0.0)((a, l) => a + math.sqrt(ns(l)))
    def thr(l: String): String = {
      val rate = math.min(1.0, 0.5 * nTot * (math.sqrt(ns(l)) / den) / ns(l))
      val q = math.floor(rate * 256).toInt
      if (q >= 256) "g0" else f"$q%02x"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(2)
    val expected = docs.filter { case (id, l) => bucket(id) < thr(l) }
      .map(_._1).toSet
    def run() = Sampling.temperatureMix(
        Tables.documents(spark, sf).select("doc_id", "lang"),
        "lang", col("doc_id"), targetFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = run()
    assert(got == expected, s"selection drifted: ${(got diff expected).take(5)} " +
      s"extra, ${(expected diff got).take(5)} missing")
    assert(got == run(), "must be identical across runs")
  }

  test("sequence packing is an exact per-shard prefix sum; docs straddle chunks") {
    import spark.implicits._
    // docsPerShard=1 over 4 docs derives shards=4 in-plan; shard 0 holds
    // docs 0, 8, 16 (sizes 1000, 1500, 600) which concat to 3100 tokens
    // → doc 8 straddles the 2048 boundary, doc 16 starts inside chunk 1
    val docs = Seq((0L, 1000L), (8L, 1500L), (16L, 600L), (1L, 100L))
      .toDF("doc_id", "t")
    val out = ext.Pipeline.packSequences(docs, "doc_id", col("t"),
        budget = 2048, docsPerShard = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((0L, 1000L, 0L, 0L)))
    assert(out(8L) == ((0L, 1500L, 0L, 1000L))) // starts in chunk 0, crosses
    assert(out(16L) == ((0L, 600L, 1L, 452L))) // 2500 = 2048 + 452
    assert(out(1L) == ((1L, 100L, 0L, 0L))) // its own shard starts fresh
  }

  test("q232 small analog: the gate's cycling lengths pack exactly as the " +
      "driver-side simulation of the same window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, lit}
    // 4096 docs / docsPerShard 256 → 16 derived shards; same 64/128/192
    // cycle as the gate (period 3 over id div 256, walked in id order
    // within each shard)
    val docs = spark.range(4096).select(col("id").as("doc_id"),
      (lit(64L) * (expr("(id div 256) % 3") + 1)).as("t"))
    val got = ext.Pipeline.packSequences(docs, "doc_id", col("t"),
        budget = 2048, docsPerShard = 256)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 4096)
    for (s <- 0L until 16L) {
      var startTok = 0L
      for (k <- 0L until 256L) {
        val id = s + 16L * k
        val tok = 64L * (1 + (id / 256) % 3)
        val exp = (s, tok, startTok / 2048, startTok % 2048)
        assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
        startTok += tok
      }
    }
  }

  test("chunk overlap: hand-checked starts, tail shortening, overlap") {
    import spark.implicits._
    // 5 tokens, window 3, stride 2 → starts 0/2/4; the last chunk is the
    // 1-token tail; middle chunk overlaps the first by one token
    val docs = Seq((7L, "A b c d e")).toDF("doc_id", "text")
    val out = ext.Pipeline.chunkOverlap(docs, "doc_id", "text",
        window = 3, stride = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).sorted
    assert(out.toSeq == Seq(
      (0, 3, "a b c"), (2, 3, "c d e"), (4, 1, "e")))
  }

  test("q262 small analog: (class, start) rollup matches the closed-form " +
      "chunk table") {
    val docs = 4096L
    val expected = (0L until 97L).flatMap { cls =>
      val n = cls + 1
      val nDocs = (docs - 1 - cls) / 97 + 1
      (0L to (n - 1) / 32).map { k =>
        val ct = math.min(64L, n - k * 32).toInt
        val txt = (k * 32 until math.min(k * 32 + 64, n))
          .map(j => s"t$j").mkString(" ")
        ((cls, (k * 32).toInt),
          (nDocs, ct, ct, txt, txt, nDocs * txt.length))
      }
    }.toMap
    val got = ext.Pipeline.chunkOverlap(
        ext.Pipeline.q262Frame(spark, docs), "doc_id", "text",
        window = 64, stride = 32)
      .groupBy((col("doc_id") % 97).as("cls"), col("start_tok"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chunk_tok")).as("min_ct"),
        max(col("n_chunk_tok")).as("max_ct"),
        min(col("chunk_text")).as("min_text"),
        max(col("chunk_text")).as("max_text"),
        sum(length(col("chunk_text"))).as("sum_chars"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getString(5),
          r.getString(6), r.getLong(7)))).toMap
    assert(got == expected, {
      val d = (got.keySet ++ expected.keySet)
        .find(k => got.get(k) != expected.get(k))
      s"first diff at $d: got ${d.flatMap(got.get)}, " +
        s"want ${d.flatMap(expected.get)}"
    })
  }

  test("q262 synthetic corpus is at the claimed scale") {
    assert(ext.Pipeline.q262Frame(spark).count() == 1048576L)
  }

  test("q264 small analog: per-source top-5 under the hot source matches " +
      "a driver-side quality + rank replay") {
    val docs = 16384L
    def text(m: Int) = (0 to 9 + m / 2).map(j => s"w$j").mkString(" ")
    def quality(m: Int): Double = {
      val nt = 10L + m / 2
      val lc = text(m).length.toLong
      val num = 2L * (24L * nt * math.min(nt, 100L) + 3200L * nt +
        300L * math.min(lc - nt + 1, 8 * nt)) * 1000000L + 8000L * nt
      (num / (2L * 8000L * nt)).toDouble / 1000000L
    }
    val expected = (0L until docs)
      .map { d =>
        val src = if (d % 2 == 0) "hot" else s"s${d % 8191}"
        (src, d, quality((d % 32).toInt))
      }
      .groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex.map {
          case ((s, d, q), i) => (s, d, q, i + 1) }
      }.toSet
    val got = ext.Pipeline.q264SourcecapAtScale0(spark, docs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expected,
      s"diff: ${(got diff expected).take(3)} vs ${(expected diff got).take(3)}")
    // the hot source's winners: the five lowest even ids of variant 15
    assert(got.filter(_._1 == "hot").map(_._2) ==
      Set(30L, 62L, 94L, 126L, 158L))
  }

  test("q264 synthetic corpus is at the claimed scale, half of it hot") {
    val f = ext.Pipeline.q264Frame(spark)
    assert(f.count() == 1048576L)
    assert(f.filter(col("source") === "hot").count() == 524288L)
  }

  test("q269 small analog: every cluster lands whole in one split and " +
      "the rollup matches a driver-side md5 replay") {
    val docs = 4096L
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(cluster: Long): String =
      md.digest(cluster.toString.getBytes("UTF-8"))
        .take(1).map(b => f"${b & 0xff}%02x").mkString
    def splitOf(cluster: Long): String = {
      val b = bucket(cluster)
      if (b < "cd") "train" else if (b < "e6") "val" else "test"
    }
    val expected = (0L until docs).map(d => (splitOf(d / 4), d, d / 4))
      .groupBy(_._1).map { case (s, xs) =>
        s -> ((xs.size.toLong, xs.map(_._3).distinct.size.toLong,
          xs.map(_._2).sum, xs.map(_._3).sum)) }
    val got = ext.Sampling.q269ClustersplitAtScale0(spark, docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"got $got, want $expected")
    // structural leakage-safety: docs = 4 x clusters in every split
    got.values.foreach { case (n, nc, _, _) => assert(n == 4 * nc) }
  }

  test("q269 synthetic corpus is at the claimed scale") {
    assert(ext.Sampling.q269Frame(spark).count() == 1048576L)
  }

  test("bpe pair counts weight by word frequency, deterministic top-k") {
    import spark.implicits._
    // "ab" appears twice, "ba" once; single-char "x" contributes no pair
    val docs = Seq((1L, "Ab x ab"), (2L, "ba")).toDF("doc_id", "text")
    val out = ext.TextAnalysis.bpePairCounts(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a b", 2L), ("b a", 1L)))
  }

  test("bpe encode: hand-derived trainer rounds and greedy application") {
    import spark.implicits._
    // vocab: "aa"×2, "ab"×1 → round 1 pairs: (a,a)=2, (a,b)=1 → merge (a,a)
    // round 2 pairs: (a,b)=1 (from "ab" only) → merge (a,b)
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val out = ext.TextAnalysis.bpeEncode(docs, "text", 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    assert(out("aa") == ((2L, 1, "aa")))
    assert(out("ab") == ((1L, 1, "ab")))
  }

  test("bpe encode: left-to-right greedy on overlapping pairs, lex tiebreak") {
    import spark.implicits._
    // (a,a) counts 3 (two OVERLAPPING adjacencies in "aaa" + one in "aa");
    // (b,b) counts 3 across three "bb" words → lexicographic tiebreak
    // picks (a,a); "aaa" must merge greedily to [aa, a], never [a, aa]
    val docs = Seq((1L, "aaa bb aa bb bb")).toDF("doc_id", "text")
    val out = ext.TextAnalysis.bpeEncode(docs, "text", 1)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out("aaa") == "aa a")
    assert(out("aa") == "aa")
    assert(out("bb") == "b b") // (b,b) lost the tiebreak, round budget spent
  }

  test("cluster split keeps every near-dup cluster in exactly one split") {
    val clusters = Dedup.q47DedupClusters(spark, sf)
    val out = Sampling.clusterSplit(clusters, "cluster")
      .select("doc_id", "cluster", "split").collect()
    assert(out.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
    val byCluster = out.groupBy(_.getLong(1)).values
    assert(byCluster.forall(_.map(_.getString(2)).toSet.size == 1),
      "a cluster straddled two splits — that's the leak this exists to stop")
    // the corpus has enough clusters that all three splits are non-empty is
    // NOT guaranteed at a 0.8/0.1 split over ~490 clusters; train must be
    assert(out.exists(_.getString(2) == "train"))
  }

  test("largestRemainderAlloc sums exactly to the budget with ranked remainders") {
    import spark.implicits._
    // W=9, B=7: bases 3/2/0, remainders 8/3/7 → leftover 2 goes to a and c
    val w = Seq(("a", 5L), ("b", 3L), ("c", 1L)).toDF("s", "w")
    val got = Sampling.largestRemainderAlloc(w, "s", "w", 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(got.values.sum == 7L)
    // all-equal weights: the name tiebreak decides who gets the leftover
    val eq = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("s", "w")
    val got2 = Sampling.largestRemainderAlloc(eq, "s", "w", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got2 == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("ticketSample matches an exact MessageDigest replay of the priorities") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, (i % 4 + 1).toInt))
    val df = rows.toDF("id", "w")
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rows.map { case (i, w) =>
      val pri = (1 to w).map { r =>
        java.lang.Long.parseLong(md5hex(s"$i:$r").take(8), 16)
      }.min
      (i, w, pri)
    }.sortBy(t => (t._3, t._1)).take(10)
    val got = Sampling.ticketSample(df, "id", col("w"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("groupSample: exactly min(k, |stratum|) rows, a pure function of data") {
    import spark.implicits._
    val df = ((1L to 30L).map(i => (i, "big")) ++ Seq((41L, "tiny")))
      .toDF("id", "s")
    def run() = Sampling.groupSample(df, "s", col("id"), k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    val got = run()
    assert(got.count(_._1 == "big") == 5, "big stratum must yield exactly k")
    assert(got.count(_._1 == "tiny") == 1, "small stratum yields all it has")
    assert(got == run(), "sample changed between runs")
    // the md5 order must match an exact driver-side replay
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectedBig = (1L to 30L).sortBy(i => (md5hex(i.toString), i))
      .take(5).toSet
    assert(got.filter(_._1 == "big").map(_._2) == expectedBig)
  }

  test("ringAssign: minimal movement, exact successor-on-ring replay") {
    import spark.implicits._
    val df = (1L to 100L).toList.toDF("doc_id")
    val got = Sampling.ringAssign(df, col("doc_id"),
        shards = 4, vnodes = 3, removedShard = 1)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Int]("shard_full"), r.getAs[Int]("shard_reduced"),
          r.getAs[Boolean]("moved"), r.getAs[Boolean]("stable_ok")))).toMap
    assert(got.size == 100)
    assert(got.values.forall(_._4), "minimal-movement invariant")
    assert(got.values.forall(v => v._3 == (v._1 == 1)),
      "exactly the removed shard's keys move")
    assert(got.values.forall(v => v._2 != 1), "nobody lands on the dead shard")
    // driver-side replay: successor (first ring point at-or-after, wrap)
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u32 = (s: String) => java.lang.Long.parseLong(md5hex(s).take(8), 16)
    def owner(k: Long, shards: Seq[Int]): Int = {
      val ring = for (s <- shards; v <- 0 until 3)
        yield (u32(s"$s:$v") * 16 + s, s)
      val kh = u32(k.toString)
      val cand = ring.filter(_._1 / 16 >= kh)
      (if (cand.nonEmpty) cand.min else ring.min)._2
    }
    (1L to 10L).foreach { k =>
      assert(got(k)._1 == owner(k, 0 to 3), s"key $k full")
      assert(got(k)._2 == owner(k, Seq(0, 2, 3)), s"key $k reduced")
    }
  }

  test("rendezvousAssign: minimal movement, exact md5-argmax replay") {
    import spark.implicits._
    val df = (1L to 100L).toList.toDF("doc_id")
    val got = Sampling.rendezvousAssign(df, col("doc_id"),
        shards = 4, removedShard = 1)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Int]("shard_full"), r.getAs[Int]("shard_reduced"),
          r.getAs[Boolean]("moved"), r.getAs[Boolean]("stable_ok")))).toMap
    assert(got.size == 100)
    assert(got.values.forall(_._4), "minimal-movement invariant")
    assert(got.values.forall(v => v._3 == (v._1 == 1)),
      "exactly the removed shard's keys move")
    assert(got.values.forall(v => v._2 != 1), "nobody lands on the dead shard")
    // driver-side replay of the argmax for a few keys
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def win(k: Long, shards: Seq[Int]): Int = shards.maxBy { s =>
      (java.lang.Long.parseLong(md5hex(s"$k#$s").take(8), 16), s)
    }
    (1L to 10L).foreach { k =>
      assert(got(k)._1 == win(k, 0 to 3), s"key $k full")
      assert(got(k)._2 == win(k, Seq(0, 2, 3)), s"key $k reduced")
    }
  }

  test("universeSample keeps parent and child tables join-consistent") {
    import spark.implicits._
    val parents = (1L to 200L).map(k => (k, s"p$k")).toDF("key", "pay")
    val children = (1L to 200L).flatMap(k =>
      (1 to 3).map(i => (k, i))).toDF("key", "seq")
    val pk = Sampling.universeSample(parents, "key", 10, 0)
      .select("key").collect().map(_.getLong(0)).toSet
    val ck = Sampling.universeSample(children, "key", 10, 0)
      .select("key").collect().map(_.getLong(0)).toSet
    assert(pk == ck, s"universe mismatch: ${pk -- ck} / ${ck -- pk}")
    assert(pk.nonEmpty && pk.size < 200, s"degenerate sample: ${pk.size}")
    // every kept child key keeps ALL its rows (3 each), never a fraction
    val cnt = Sampling.universeSample(children, "key", 10, 0)
      .groupBy("key").count().collect().map(_.getLong(1)).toSet
    assert(cnt == Set(3L), cnt.toString)
  }

  /** q217 pins: the gate frame is 2²⁰ rows, and on a 64-row analog of the
    * SAME generator the lottery favors weight monotonically — a higher-
    * weight row holds more tickets, so the min priority over a superset
    * of tickets can only be ≤ (pinned per-id: adding tickets to the same
    * id never worsens its priority). Semantics vs the oracle are q120's;
    * this pins the generator wiring and the explode bound. */
  test("q217: frame is 2^20 rows; more tickets never worsen an id's priority") {
    assert(Sampling.q217Frame(spark).count() == (1L << 20))
    val small = Sampling.q217Frame(spark, rows = 64L)
    val k = 64
    val p4 = Sampling.ticketSample(small, "doc_id", col("w"), k)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("priority")).toMap
    val p1 = Sampling.ticketSample(small, "doc_id", lit(1), k)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("priority")).toMap
    // every id's weighted priority (min over w >= 1 tickets, ticket 1
    // included) is <= its single-ticket priority
    assert(p1.forall { case (id, p) => p4(id) <= p },
      p1.filter { case (id, p) => p4(id) > p }.take(3).toString)
    assert(p4.values.toSet.size > 1, "degenerate priorities")
  }
}
