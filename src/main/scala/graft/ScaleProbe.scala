package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling-exponent probe: time a query family at sf0.1 and at a
  * derived ~10×-ROWS corpus, and report observed wall-clock exponents —
  * the closest local[32] proxy for the "would this hold at 100×" claims
  * the operator scaladocs make.
  *
  * This is NOT [[SkewAudit]]'s corpus: that one derives verbatim twins
  * (every shingle repeats in all copies) to maximize key heat. Here the
  * derivation is the IID direction — more rows of the same per-row
  * character, the way a real corpus grows:
  *   - lineitem / customer: key-shifted copies (10× the entities,
  *     per-entity degree unchanged) — only the tables the probe set
  *     reads are derived; extend the derivation alongside `probes`;
  *   - documents: copy i rewrites every token with an `_i` suffix, so
  *     copies share no shingles — near-dup structure per copy matches the
  *     original corpus, cross-copy similarity is zero;
  *   - embeddings: copy i rotates the vector by 8·i positions — a
  *     permutation keeps norms but moves direction, so sign-LSH buckets
  *     spread instead of crowding.
  *
  * Usage: `sbt "runMain graft.ScaleProbe"`. One warmup + 2 timed runs per
  * (query, scale); prints a table with the log10 ratio as the observed
  * exponent (1.0 = linear; anything ≲ 1.2 at this size is shuffle-log
  * noise, not superlinearity). SPARK_GRAFT_ONLY filters queries.
  */
/** Scaling-exponent probe for the ITERATIVE GRAPH families whose registry
  * queries run on fixed-size graphs (q145 SCC on 25 nations, q94 LPA on
  * 25 nations) — the corpus-derivation trick in [[ScaleProbe]] cannot
  * scale those, so this probe synthesizes the q204/q205 range-built
  * graphs (same generators, parameterized block count) at 1× and 10×
  * and times the SAME algorithm entry points the registry queries call.
  * VERDICT r9 item 7: q112's measured 100× exponent does not transfer to
  * SCC's trim+FW-BW loop (different frame-growth behavior) or LPA's
  * tally loop; measure them directly.
  *
  * Round 11 adds the q219–q222 gate families (pageRank, SSSP, triangle
  * wedge join, k-core peel) on their own generator parameter.
  *
  * Usage: `sbt "runMain graft.GraphScaleProbe"`. [[ProbeRunner]]
  * protocol (warmup + min-of-2 at 1×, single timed big run); per-decade
  * exp = log10(ratio) / log10(scale ratio).
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    import graft.graph.Algorithms

    // 1× ≈ 130k–190k edges, 10× ≈ 1.3M–1.9M — the 10× points sit just
    // past the q204/q205 registry scale, so the registry rows interpolate
    def sccRun(blocks: Long): Unit =
      Algorithms.stronglyConnectedComponents(
          Algorithms.q204Vertices(spark, blocks),
          Algorithms.q204Edges(spark, blocks))
        .groupBy(org.apache.spark.sql.functions.col("scc_id")).count()
        .write.format("noop").mode("overwrite").save()
    def lpaRun(blocks: Long): Unit =
      Algorithms.labelPropagation(
          spark.range(blocks * (Algorithms.q205SpokesPerBlock + 1))
            .select(org.apache.spark.sql.functions.col("id")),
          Algorithms.q205Edges(spark, blocks), Algorithms.lpaIters)
        .groupBy(org.apache.spark.sql.functions.col("lbl")).count()
        .write.format("noop").mode("overwrite").save()
    val fams = Seq(
      ProbeRunner.Fam("scc_trim_fwbw", sccRun, 64L, 640L),
      ProbeRunner.Fam("lpa_majority", lpaRun, 1024L, 10240L))

    // round-11 extension: the q219-q222 gate families, scaled on their
    // own generator parameter (block count — vertex/edge volume grows,
    // per-block structure and iteration/peel depth stay fixed, so the
    // probe isolates volume, not diameter)
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def prRun(blocks: Long): Unit =
      ProbeRunner.noop(Algorithms.pageRank(
        spark.range(blocks * Algorithms.q219BlockSize).select(col("id")),
        Algorithms.q219Edges(spark, blocks), Algorithms.q219Iters)
        .groupBy(pmod(col("id"), lit(2L))).count())
    def ssspRun(blocks: Long): Unit = {
      val n = blocks * Algorithms.q220ChainLen
      ProbeRunner.noop(Algorithms.shortestPaths(
        spark.range(n + 1).select(col("id")),
        Algorithms.q220Edges(spark, blocks), sourceId = n, maxIter = 12)
        .groupBy(pmod(col("id"), lit(512L))).count())
    }
    def triRun(blocks: Long): Unit =
      ProbeRunner.noop(Algorithms.triangleCounts(
        Algorithms.q221Edges(spark, blocks))
        .groupBy(col("n_tri")).count())
    def kcoreRun(blocks: Long): Unit =
      ProbeRunner.noop(Algorithms.kCore(
        spark.range(blocks * 10).select(col("id")),
        Algorithms.q222Edges(spark, blocks), k = 2, maxIter = 10)
        .groupBy(col("in_core")).count())
    // round-12 extension: the q229 HITS family — same volume axis as
    // pagerank_parity (block count; iteration depth fixed at the gate's 4)
    def hitsRun(blocks: Long): Unit =
      ProbeRunner.noop(Algorithms.hits(
        spark.range(blocks * Algorithms.q219BlockSize).select(col("id")),
        Algorithms.q229Edges(spark, blocks), Algorithms.q229Iters)
        .groupBy(pmod(col("id"), lit(2L))).count())
    val fams8 = Seq(
      ProbeRunner.Fam("pagerank_parity", prRun, 128L, 1024L),
      ProbeRunner.Fam("sssp_chains", ssspRun, 16384L, 131072L),
      ProbeRunner.Fam("triangles_clique", triRun, 4096L, 32768L),
      ProbeRunner.Fam("kcore_peel", kcoreRun, 6144L, 49152L),
      ProbeRunner.Fam("hits_maxnorm", hitsRun, 128L, 1024L))

    ProbeRunner.runProbe(spark, fams, bigOverSmall = 10.0)
    ProbeRunner.runProbe(spark, fams8, bigOverSmall = 8.0)
    spark.stop()
  }
}

/** Shared timing harness for the generator-parameterized probes
  * ([[SimScaleProbe]], [[RelScaleProbe]]): noop-writer sink, warmup at 1×
  * (codegen + JIT, which also warms the family), min-of-2 at 1×, a single
  * timed run at the big point, exponent normalized per decade as
  * `log10(ratio) / log10(bigOverSmall)`. Coarse would-it-survive
  * exponents, not benchmarks — the 1×-vs-8× protocol lives here once so
  * the probes cannot drift apart. */
private[graft] object ProbeRunner {
  case class Fam(name: String, run: Long => Unit, s1: Long, s8: Long)

  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def runProbe(spark: SparkSession, fams: Seq[Fam],
               bigOverSmall: Double = 8.0, nameWidth: Int = 18): Unit = {
    def timed(run: Long => Unit, p: Long): Double = {
      CacheRegistry.drainForMeasurement(spark)
      val t0 = System.nanoTime()
      run(p)
      (System.nanoTime() - t0) / 1e9
    }
    // header derives from bigOverSmall — the graph families probe at 10×,
    // so a hardcoded "t_8x_s" would mislabel their big point
    val bigLabel =
      if (bigOverSmall == bigOverSmall.toLong.toDouble)
        s"t_${bigOverSmall.toLong}x_s"
      else f"t_${bigOverSmall}%.1fx_s"
    println(f"${"family"}%-18s ${"t_1x_s"}%8s $bigLabel%8s ${"ratio"}%7s ${"exp"}%5s")
    fams.foreach { f =>
      timed(f.run, f.s1) // warmup (codegen + JIT)
      val t1 = math.min(timed(f.run, f.s1), timed(f.run, f.s1))
      val t8 = timed(f.run, f.s8)
      val ratio = t8 / t1
      val exp = math.log10(ratio) / math.log10(bigOverSmall)
      println(f"${f.name}%-18s $t1%8.2f $t8%8.2f $ratio%7.2f $exp%5.2f")
    }
  }
}

/** Scaling-exponent probe for the SYNTHETIC similarity/dedup families
  * behind the q207/q208/q209 at-scale gates — [[ScaleProbe]]'s corpus
  * derivation scales the parquet tables, but these operators' gate rows
  * run on range-built corpora, so the right probe axis is the generator
  * parameter itself (cluster size for the vector families — holding
  * cluster count fixed keeps the dimensionality and plane count honest —
  * and doc count for MinHash). 1× vs 8× with the exponent normalized per
  * decade: exp = log10(ratio) / log10(8).
  *
  * Cost control: the 1× point takes min-of-2 after a warmup (it also
  * warms codegen for the family); the 8× point is a single timed run —
  * these are coarse would-it-survive exponents, not benchmarks.
  *
  * Usage: `sbt "runMain graft.SimScaleProbe"`; results recorded in
  * SCALE_PROBE.md.
  */
object SimScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    import graft.ext.{Dedup, Similarity}
    import ProbeRunner.{Fam, noop}

    def annRun(size: Long): Unit =
      noop(Similarity.annCosineTopK(
        Similarity.q207Corpus(spark, Similarity.q207Clusters, size),
        Similarity.q207QueryVecs(spark), k = 8,
        targetBucket = size, maxBucket = Similarity.q207Clusters * size,
        dim = 2 * Similarity.q207Clusters))
    def bruteRun(size: Long): Unit =
      noop(Similarity.cosineTopK(
        Similarity.q207Corpus(spark, Similarity.q207Clusters, size),
        Similarity.q207QueryVecs(spark), 8))
    def minhashRun(docs: Long): Unit =
      noop(Dedup.nearDupMinHash(
        Dedup.q209Corpus(spark, docs = docs), "doc_id", "text"))
    // round-14: exact PPJoin jaccard after the xxhash64 payload cut —
    // planted pair count scales with the corpus (docs/256 per class, the
    // q250 gate's ratio), so the row measures the whole prefix-filter +
    // verify pipeline with candidate volume growing in proportion
    def jaccardRun(docs: Long): Unit =
      noop(Dedup.ngramJaccardPairs(
          Dedup.q250Corpus(spark, docs = docs, pairsPerClass = docs / 256),
          "doc_id", "text")
        .groupBy(org.apache.spark.sql.functions.col("jaccard")).count())
    // round-12 extension: the q230/q235 gate families
    def kmeansRun(vecs: Long): Unit =
      noop(Similarity.kMeans(Similarity.q230Frame(spark, vecs), "vec_id",
          "embedding", Similarity.kMeansK, Similarity.kMeansIters)
        .groupBy(org.apache.spark.sql.functions.col("cluster")).count())
    def linkageRun(keys: Long): Unit = {
      val clean = Similarity.q235Clean(spark, keys)
      noop(Similarity.linkRecords(clean, Similarity.q235Dirty(clean))
        .groupBy(org.apache.spark.sql.functions.col("method")).count())
    }
    // round-13 extension: SemDeDup probed along its DOCUMENTED scale axis
    // (k ∝ n, cell size held at 256) — the pair stage is then linear
    // (Σ|cell|² = n·256), and the probe deliberately exposes the flat
    // broadcast-argmin assignment's n·k = n²/256 term (the stage a
    // production deployment swaps for IVF-bucketed assignment; see the
    // semanticDedup scaladoc)
    def semdedupRun(vecs: Long): Unit =
      // routing pinned flat: this row MEASURES the flat argmin's n·k
      // term — the auto route would swap it away above the crossover
      noop(Similarity.semanticDedup(
          Similarity.q230Frame(spark, vecs).select(
            org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding")),
          "vec_id", "embedding", k = (vecs / 256).toInt, iters = 1,
          threshold = 0.9, routing = "flat")
        .groupBy(org.apache.spark.sql.functions.col("kept")).count())
    // round-14: the shipped IVF swap, probed on the IDENTICAL corpus, k,
    // and sizes as semdedup_cells — the exponent gap between the two rows
    // IS the N·k → N·√k claim, measured
    def semdedupIvfRun(vecs: Long): Unit =
      noop(Similarity.semanticDedupIvf(
          Similarity.q230Frame(spark, vecs).select(
            org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding")),
          "vec_id", "embedding", k = (vecs / 256).toInt, iters = 1,
          threshold = 0.9)
        .groupBy(org.apache.spark.sql.functions.col("kept")).count())
    val fams = Seq(
      // 1× = 2^18 vectors (quarter registry scale), 8× = 2^21
      Fam("ann_multiprobe", annRun, 8192L, 65536L),
      Fam("brute_cosine", bruteRun, 8192L, 65536L),
      // 1× = 2^17 docs, 8× = 2^20 (the registry-gate scale)
      Fam("minhash_lsh", minhashRun, 131072L, 1048576L),
      Fam("jaccard_ppjoin", jaccardRun, 1L << 17, 1L << 20),
      // 1× = 2^17, 8× = 2^20 (the registry-gate scale)
      Fam("kmeans_lloyd", kmeansRun, 1L << 17, 1L << 20),
      Fam("record_linkage", linkageRun, 1L << 17, 1L << 20),
      // 1× = 2^14 (k=64 cells), 8× = 2^17 (k=512 cells)
      Fam("semdedup_cells", semdedupRun, 1L << 14, 1L << 17),
      Fam("semdedup_ivf", semdedupIvfRun, 1L << 14, 1L << 17))

    ProbeRunner.runProbe(spark, fams)
    spark.stop()
  }
}

/** Flat-vs-IVF crossover probe for SemDeDup's clustering stage — pins
  * the k at/above which [[graft.ext.Similarity.semanticDedup]]'s `"auto"`
  * routing should pick the two-level path ([[graft.ext.Similarity.
  * semanticDedupIvfK]]). Unlike [[SimScaleProbe]]'s exponent rows (1× vs
  * 8× of each path separately), this times BOTH paths end-to-end at the
  * SAME sizes along the documented scale axis (k = n/256, the cell-size-
  * 256 discipline) and reports the head-to-head seconds — the crossover
  * is where flat's n·k assignment overtakes IVF's higher stage constant.
  * Sizes via SPARK_GRAFT_XOVER_LOG2 (comma-separated log2 doc counts,
  * default "20,21,22" — the r14 verdict's requested 2²²–2²⁴ bracket
  * minus sizes whose flat run would exceed the probe budget; raise it
  * when a bigger box warrants). One timed run per (path, size) after a
  * shared small warmup, largest last, flat first at each size so the
  * shared q230Frame/codegen warmth never favors the flat row.
  * `sbt "runMain graft.IvfCrossoverProbe"`; results in SCALE_PROBE.md. */
object IvfCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    import graft.ext.Similarity
    import org.apache.spark.sql.functions.col
    import ProbeRunner.noop
    def run(flavor: String, n: Long): Double = {
      CacheRegistry.drainForMeasurement(spark)
      val corpus = Similarity.q230Frame(spark, n)
        .select(col("vec_id"), col("embedding"))
      val k = math.max(1, (n / 256).toInt)
      val t0 = System.nanoTime()
      noop(Similarity.semanticDedup(corpus, "vec_id", "embedding", k,
          iters = 1, threshold = 0.9,
          routing = if (flavor == "flat") "flat" else "ivf")
        .groupBy(col("kept")).count())
      (System.nanoTime() - t0) / 1e9
    }
    run("flat", 1L << 12) // warmup: codegen + JIT for both path families
    run("ivf", 1L << 12)
    val sizes = sys.env.getOrElse("SPARK_GRAFT_XOVER_LOG2", "20,21,22")
      .split(",").map(_.trim.toInt).sorted
    println(f"${"n_log2"}%6s ${"k"}%8s ${"flat_s"}%8s ${"ivf_s"}%8s ${"flat/ivf"}%9s")
    sizes.foreach { lg =>
      val n = 1L << lg
      val tf = run("flat", n)
      val ti = run("ivf", n)
      println(f"$lg%6d ${n / 256}%8d $tf%8.2f $ti%8.2f ${tf / ti}%9.2f")
    }
    spark.stop()
  }
}

/** Scaling-exponent probe for the q210–q213 at-scale gate shapes
  * (salted two-phase top-k, as-of union-sort, salted equi-join, range
  * prefix sum) — same 1×-vs-8× protocol as [[SimScaleProbe]], scaling
  * the row count while holding group/key/user cardinality fixed so the
  * per-task volume (the thing the plans exist to bound) is what grows.
  * All four are single-pass shuffle shapes, so the honest expectation is
  * exp ≈ 1.0 (scan/shuffle-bound); the probe exists to catch a
  * SUPERLINEAR term (a resort, a blowup join) appearing at size, not to
  * claim sublinearity. `sbt "runMain graft.RelScaleProbe"`; results in
  * SCALE_PROBE.md. */
object RelScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    import org.apache.spark.sql.functions._
    import graft.ops.{Joins, Windows}
    import ProbeRunner.{Fam, noop}

    def topkRun(rows: Long): Unit =
      noop(Windows.perGroupTopK(Windows.q210Frame(spark, rows),
        group = Seq(col("g")), order = Seq(col("v").desc, col("id")),
        saltSrc = col("id"), k = 5))
    def asofRun(events: Long): Unit =
      noop(Joins.q211Rollup(Joins.asOfJoin(
        Joins.q211Left(spark, events = events), Joins.q211Right(spark),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        rightPayload = Seq("ts", "quote"))))
    def saltedRun(rows: Long): Unit =
      noop(Joins.saltedJoin(Joins.q212Probe(spark, rows),
          Joins.q212Build(spark), key = "k", saltSrc = col("id"), salts = 16)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("id")).as("s")))
    def prefixRun(keys: Long): Unit =
      noop(Windows.rangePrefixSum(
        spark.range(keys).select(col("id"), (col("id") - keys / 2).as("v")),
        "id", "v", "cum"))

    // round-12 extension: the q231/q232/q234 gate shapes
    import graft.ops.Relational
    import graft.ext.{Pipeline, TextAnalysis}
    def skylineRun(perGroup: Long): Unit =
      noop(Relational.skyline2d(Relational.q231Frame(spark, perGroup),
          "g", "x", "y")
        .groupBy(col("g")).count())
    def seqpackRun(docs: Long): Unit =
      noop(Pipeline.packSequences(
          spark.range(docs).select(col("id").as("doc_id"),
            (lit(64L) * (expr("(id div 256) % 3") + 1)).as("t")),
          "doc_id", col("t"), budget = 2048, docsPerShard = 4096L)
        .groupBy(col("shard")).count())
    def phraseRun(docs: Long): Unit =
      noop(TextAnalysis.phraseSearch(TextAnalysis.q234Frame(spark, docs),
          "doc_id", "text")
        .groupBy(pmod(col("doc_id"), lit(2L))).count())

    // round-13 extension: the q240–q246 gate shapes, each scaled on its
    // own generator parameter (doc/row count; structure fixed)
    import graft.ext.{Profiling, Versioning}
    def boilerRun(docs: Long): Unit =
      noop(TextAnalysis.removeBoilerplate(
        TextAnalysis.q240Frame(spark, docs), "doc_id", "text", minDocs = 16))
    def invindexRun(docs: Long): Unit =
      noop(TextAnalysis.invertedIndex(
        TextAnalysis.q241Frame(spark, docs), "text", minDf = 2L))
    def bpeRun(docs: Long): Unit =
      noop(TextAnalysis.bpePairCounts(
        TextAnalysis.q244Frame(spark, docs), "text", 30))
    def upsertRun(base: Long): Unit =
      noop(Versioning.q242Merged(spark, base = base, wave = base >> 4))
    def profileRun(rows: Long): Unit =
      noop(Profiling.profileNumeric(
        Profiling.q243Frame(spark, rows), Profiling.q243Cols))
    def hllRun(rows: Long): Unit =
      noop(Relational.q245Raw(spark, rows, keysPerGroup = rows >> 6))
    def cubeRun(rows: Long): Unit =
      noop(Relational.q246Run(spark, rows))

    val fams = Seq(
      Fam("topk_two_phase", topkRun, 1L << 21, 1L << 24),
      Fam("asof_union_sort", asofRun, 1L << 20, 1L << 23),
      Fam("salted_join", saltedRun, 1L << 20, 1L << 23),
      Fam("range_prefix_sum", prefixRun, 1L << 20, 1L << 23),
      // 1× = 2048/group (768k rows), 8× = the 3.1M-row gate shape
      Fam("skyline_staircase", skylineRun, 2048L, 16384L),
      // 1× = 2^17 docs, 8× = 2^20 (the registry-gate scale)
      Fam("seqpack_window", seqpackRun, 1L << 17, 1L << 20),
      Fam("phrase_posjoin", phraseRun, 1L << 17, 1L << 20),
      // round-13 gate families; big point = the registry-gate scale
      Fam("boilerplate_scrub", boilerRun, 1L << 17, 1L << 20),
      Fam("invindex_zipf", invindexRun, 1L << 17, 1L << 20),
      Fam("bpe_collapse", bpeRun, 1L << 17, 1L << 20),
      Fam("upsert_merge", upsertRun, 1L << 17, 1L << 20),
      Fam("profile_onescan", profileRun, 1L << 17, 1L << 20),
      Fam("hll_dedup_first", hllRun, 1L << 20, 1L << 23),
      Fam("cube_expand", cubeRun, 1L << 19, 1L << 22))

    ProbeRunner.runProbe(spark, fams)
    spark.stop()
  }
}

/** Scaling-exponent probe for the ten q257–q266 curation-gate families
  * added in the back half of round 13 — same 1×-vs-8× protocol as
  * [[SimScaleProbe]]/[[RelScaleProbe]], each family scaled on its own
  * generator parameter with structure fixed. The scan-shaped families
  * (filtergate, urldedup, chunking) honestly expect exp ≈ 1; the probe
  * exists to catch a superlinear term (a resort, a blowup join, a
  * vocabulary explosion) appearing at size.
  * `sbt "runMain graft.CurationScaleProbe"`; results in SCALE_PROBE.md. */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    import org.apache.spark.sql.functions._
    import graft.ext.{Dedup, Importance, Pipeline, Similarity, TextAnalysis, Urls}
    import ProbeRunner.{Fam, noop}

    def pqadcRun(vecs: Long): Unit =
      noop(Similarity.pqAdcTopK(Similarity.q257Frame(spark, vecs),
        "vec_id", "embedding", Seq((1, 2), (3, 2)),
        Similarity.pqK, Similarity.pqIters, Similarity.pqTopK))
    def cooccurRun(docs: Long): Unit =
      noop(TextAnalysis.cooccurrence(TextAnalysis.q258Frame(spark, docs),
        "text", win = 2, k = 40))
    def tfidfRun(docs: Long): Unit =
      noop(TextAnalysis.q259TfidfAtScale0(spark, docs))
    def urlRun(urls: Long): Unit =
      noop(Urls.q260Frame(spark, urls)
        .withColumn("curl", Urls.canonicalizeUrl(col("url")))
        .groupBy(col("curl"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("kd"),
          sum(length(col("url"))).as("ct")))
    def dsirRun(docs: Long): Unit =
      noop(Importance.dsirWeights(Importance.q261Frame(spark, docs),
          "doc_id", "text", col("doc_id") % 64 < 8)
        .groupBy((col("doc_id") % 64).as("cls")).count())
    def chunkRun(docs: Long): Unit =
      noop(Pipeline.chunkOverlap(Pipeline.q262Frame(spark, docs),
        "doc_id", "text", window = 64, stride = 32))
    def gateRun(docs: Long): Unit =
      noop(TextAnalysis.q263FiltergateAtScale0(spark, docs))
    def capRun(docs: Long): Unit =
      noop(Pipeline.q264SourcecapAtScale0(spark, docs))
    def verbatimRun(docs: Long): Unit =
      noop(Dedup.q265VerbatimAtScale0(spark, docs))
    def exciseRun(docs: Long): Unit =
      noop(Dedup.q266SpanexcisionAtScale0(spark, docs))

    // big point = the registry-gate scale (2^20) for every family
    val fams = Seq(
      Fam("pqadc_lut", pqadcRun, 1L << 17, 1L << 20),
      Fam("cooccur_window", cooccurRun, 1L << 17, 1L << 20),
      Fam("tfidf_rank", tfidfRun, 1L << 17, 1L << 20),
      Fam("urldedup_collapse", urlRun, 1L << 17, 1L << 20),
      Fam("dsir_buckets", dsirRun, 1L << 17, 1L << 20),
      Fam("chunk_overlap", chunkRun, 1L << 17, 1L << 20),
      Fam("filter_gate", gateRun, 1L << 17, 1L << 20),
      Fam("sourcecap_salted", capRun, 1L << 17, 1L << 20),
      Fam("verbatim_windows", verbatimRun, 1L << 17, 1L << 20),
      Fam("span_excision", exciseRun, 1L << 17, 1L << 20))

    ProbeRunner.runProbe(spark, fams)
    spark.stop()
  }
}

object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)

    val scratch = Files.createTempDirectory("graft_scale").toString

    // documents: token-suffix rewrite per copy — zero cross-copy shingle
    // overlap (copy 0 keeps the original text verbatim)
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until copies).map { i =>
      val txt = if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$i"))), " ")
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        txt.as("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/documents.parquet")

    // embeddings: rotate by 8·i positions per copy (norm-preserving
    // permutation, direction moves → buckets spread)
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until copies).map { i =>
      val rot = if (i == 0) col("embedding")
        else transform(sequence(lit(0), lit(63)),
          k => element_at(col("embedding"), pmod(k + lit(8 * i), lit(64)) + 1))
      emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")

    // facts: key-shifted copies, many even files (SkewAudit's discipline)
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until copies).map(i => li.select(
        (col("l_orderkey") + lit(i * 10000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(i * 1000000L)).as("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/lineitem.parquet")

    val cust = spark.read.parquet(s"$srcDir/customer.parquet")
    (0 until copies).map(i => cust.select(
        (col("c_custkey") + lit(i * 1000000L)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")))
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/customer.parquet")

    // events: ids and users shifted per copy — 10× the users, per-user
    // event stream unchanged (entity-bounded windows stay entity-bounded)
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    (0 until copies).map(i => ev.select(
        (col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/events.parquet")

    val probes = Seq("q1_agg", "q9_window_topk", "q31_minhash_lsh",
      "q42_ann_topk", "q112_cc_alternating",
      // round-8 extension: the token-join, capped-PPJoin, segment, and
      // event-windowed families — each a different shuffle shape
      "q136_bm25", "q148_containment", "q114_segment_dedup",
      "q174_rolling_dau", "q103_funnel")
      .filter(n => SparkEntry.onlyFilter.forall(_.contains(n)))

    def timeOne(name: String, dir: String): Double = {
      val q = SparkEntry.queries(name)
      def run(): Double = {
        CacheRegistry.drainForMeasurement(spark)
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup: JIT + codegen + file listing
      math.min(run(), run())
    }

    println(f"${"query"}%-22s ${"t_1x_s"}%8s ${"t_10x_s"}%8s ${"ratio"}%7s ${"exp"}%5s")
    // scratch cleanup in a finally: a probe that dies mid-run (the 100×
    // q148 attempt filled the disk with sort spill) must not also leak a
    // multi-GB derived corpus on top of the condition that killed it
    try {
      probes.foreach { name =>
        val t1 = timeOne(name, srcDir)
        val t10 = timeOne(name, scratch)
        val ratio = t10 / t1
        val exp = math.log10(ratio)
        println(f"$name%-22s $t1%8.2f $t10%8.2f $ratio%7.2f $exp%5.2f")
      }
    } finally {
      try {
        import scala.jdk.CollectionConverters._
        Files.walk(Paths.get(scratch)).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}

/** State-store growth probe for the four stateful streaming runtimes the
  * q206/q214/q224/q233 gates exercise (VERDICT r12 item 8): the gates pin
  * CORRECTNESS (output + numRowsTotal cadence) but only wall-clock was
  * ever measured — this probe puts a number on state growth the way
  * [[ScaleProbe]] did for batch, by re-running each runtime at 1× and 4×
  * key volume and reading `stateOperators.{numRowsTotal,memoryUsedBytes}`
  * from the progress events.
  *
  * Method: a [[org.apache.spark.sql.streaming.StreamingQueryListener]]
  * records (Σ numRowsTotal, Σ memoryUsedBytes) per micro-batch (summed
  * across operators — the stream-stream join reports both sides under one
  * operator entry). The listener bus is async, so each measurement waits
  * for the event stream to go quiescent before reading. Reported per run:
  * the peak-memory batch's rows/bytes and the derived bytes-per-state-row
  * — if state is per-key bounded (the scaladoc claims), bytes-per-row
  * must be ~flat from 1× to 4× and peak rows must scale ~4×; superlinear
  * bytes-per-row growth would mean per-key state accumulating history.
  *
  * Scales are chosen to keep every memory-sink drain within its
  * documented ≤65,536-row bound: 1× = 2,048 users, 4× = 8,192
  * (q214/q224 run 8 waves → ≤65,536 output rows at 4×).
  *
  * Usage: `sbt "runMain graft.StreamStateProbe"`. Run-once measurement
  * harness — NOT part of the bench or the oracle registry (wall-clock of
  * streaming gates is commit cadence, not volume; see SCALE_PROBE.md).
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent,
      QueryStartedEvent, QueryTerminatedEvent}

    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryIdle(e: QueryIdleEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) buf.synchronized {
          buf += ((ops.map(_.numRowsTotal).sum,
            ops.map(_.memoryUsedBytes).sum))
        }
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    println(f"${"runtime"}%-18s ${"scale"}%5s ${"users"}%6s ${"batches"}%7s " +
      f"${"peak_rows"}%10s ${"peak_mem_b"}%12s ${"b_per_row"}%9s")
    def measure(name: String, tag: String, users: Long)(run: => Unit): Unit = {
      buf.synchronized(buf.clear())
      run
      // listener bus is async: wait until no new progress event for 1s
      var last = -1; var stable = 0
      while (stable < 5) {
        Thread.sleep(200)
        val n = buf.synchronized(buf.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val obs = buf.synchronized(buf.toVector)
      val (pr, pm) = if (obs.isEmpty) (0L, 0L) else obs.maxBy(_._2)
      val bpr = pm.toDouble / math.max(pr, 1L)
      println(f"$name%-18s $tag%5s $users%6d ${obs.size}%7d " +
        f"$pr%10d $pm%12d $bpr%9.1f")
    }

    import graft.streaming.Streams
    for ((tag, u) <- Seq(("1x", 2048L), ("4x", 8192L))) {
      measure("q206_fmgws", tag, u) { Streams.q206Run(spark, u) }
      measure("q214_streamjoin", tag, u) {
        Streams.q214Run(spark, u, waves = 8, sweep = true, wavesPerBatch = 4)
      }
      measure("q224_dedup", tag, u) { Streams.q224Run(spark, u, waves = 8) }
      measure("q233_sessionwin", tag, u) { Streams.q233Run(spark, u, waves = 4) }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
