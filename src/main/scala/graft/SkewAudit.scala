package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Empirical skew audit at ~10× the bench scale factor — the check that
  * plan-shape arguments ("no value-keyed windows", "groupBy+join sizing")
  * actually hold on data: for every stage of the most expensive queries,
  * record max-task-time / median-task-time. A ratio ≫ 1 on a many-task
  * stage means one straggler owns the stage — the single-hot-partition
  * class every dedup/bucketing operator here is designed to avoid.
  *
  * Usage: `sbt "runMain graft.SkewAudit"` — derives a ~10× corpus by
  * unioning sf0.1's documents with 9 id-shifted copies (50k docs) into a
  * scratch dir, runs the audit set against it, and prints one table row
  * per (query, stage) with tasks ≥ 4, flagging ratios > 4.
  */
object SkewAudit {

  final class TaskStats extends SparkListener {
    val byStage = scala.collection.concurrent.TrieMap[Int, List[Long]]()
    val stageName = scala.collection.concurrent.TrieMap[Int, String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskInfo.successful)
        byStage.updateWith(t.stageId)(l =>
          Some(t.taskInfo.duration :: l.getOrElse(Nil)))
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stageName.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n'))
    def reset(): Unit = { byStage.clear(); stageName.clear() }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    // ~10× corpus: id-shifted copies, so dedup finds the same clusters per
    // copy (shingles repeat 10×) — shared shingles across copies make the
    // inverted-index/bucket paths STRICTLY hotter than an iid corpus would,
    // which is the point of a skew audit
    val scratch = Files.createTempDirectory("graft_skew").toString
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until copies).map(i => docs.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/documents.parquet")

    // ~10× embeddings: id-shifted copies with a small per-copy element
    // jitter (direction moves slightly, so copies are near- but not
    // exact-duplicates — they crowd the sign-LSH buckets, which is the
    // stress the derived plane count + maxBucket cap must absorb)
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until copies).map(i => emb.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        expr(s"transform(embedding, x -> CAST(x + ${i * 0.001} AS FLOAT))")
          .as("embedding"),
        col("label")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")

    // ~10× events: ids and users shifted per copy, so per-entity windows
    // stay entity-bounded (10× the users, same events-per-user) — the
    // honest scale direction for an event log
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    (0 until copies).map(i => ev.select(
        (col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/events.parquet")

    // ~10× transactions: order AND part keys shifted per copy — the honest
    // scale direction for a transaction log (more orders over more items,
    // per-item degree unchanged; the hub-cap's own stress case is covered
    // by SimilaritySpec's fixture instead)
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    (0 until copies).map(i => ord.select(
        (col("o_orderkey") + lit(i * 10000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(i * 1000000L)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")))
      .reduce(_ unionByName _)
      // 32 even files: a union of 10 monolithic copies scans as ~30 splits
      // with row-group-residual imbalance that false-flags as task skew —
      // a real 10× table is many files, which is what the audit should read
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/orders.parquet")
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

    // dimension tables don't scale with the fact tables — copied verbatim
    // so dim-joining audit queries (q151) resolve against the scratch dir
    spark.read.parquet(s"$srcDir/nation.parquet")
      .write.mode("overwrite").parquet(s"$scratch/nation.parquet")

    // ~10× part: keys shifted, names UNCHANGED — every sorted-neighborhood
    // block gets 10× deeper with identical-name runs 10× longer, the worst
    // legal input for a per-block window sort + rank-offset join
    val pt = spark.read.parquet(s"$srcDir/part.parquet")
    (0 until copies).map(i => pt.select(
        (col("p_partkey") + lit(i * 1000000L)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")))
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$scratch/part.parquet")

    val audit: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q31_minhash_lsh", "q35_ngram_jaccard", "q41_simhash",
        "q47_dedup_clusters", "q50_train_pipeline",
        // the ANN path: plane count derives from the 10× corpus (12
        // planes at 20k vs 10 at 2k), cap in-plan — the round-6 scaling
        // claim under empirical load
        "q42_ann_topk", "q48_embed_neardup",
        // round-6 additions: the token pair join (w·|tokens| shuffle),
        // hot-term posting lists (df-bounded collect on 10× shared
        // vocabulary — stopword lists grow 10×), shingle first-seen
        // (every shingle repeats in all 10 copies: maximal key heat on
        // the groupBy.min+join path), and the entity-keyed event ops
        "q95_cooccur", "q97_inverted_index", "q101_novelty",
        "q96_scd2", "q103_funnel",
        // round-6 late additions: span excision (per-doc windows + covered
        // positions repeating in all 10 copies), segment dedup (EVERY
        // segment text is a 10-member hot keeper group — the maximal
        // stress for the groupBy+min-struct+join discipline), the pair-set
        // source rollup, vocab probe (a 10× hotter stopword head), and the
        // ticket explode+min-agg
        "q113_span_excision", "q114_segment_dedup", "q123_source_overlap",
        "q122_vocab_coverage", "q120_ticket_sample",
        // round-6 session-3 additions: the Zipf-skewed token-frequency
        // join (10× hotter stopword head), the query-term token filter +
        // per-doc fold, the shared-neighbor self-join under the hub cap,
        // the per-entity successor window, and the dim-keyed component agg
        "q133_rarity_bucket", "q136_bm25", "q134_link_pred",
        "q137_transitions", "q139_feature_norm",
        // session-4 additions: the bigram-key model join (a 10× hotter
        // stopword-PAIR head than q133's unigrams), the two wordcount-
        // shaped sketches, and the KS pair-partitioned cumulative window
        "q140_lm_score", "q141_count_min", "q142_diversity",
        "q144_ks_drift",
        // round-7 additions: URL canonicalization (pure-expression map +
        // one key agg — the audit proves the single exchange stays flat),
        // and containment, whose CONTAINER side indexes its full shingle
        // set: 10 identical copies make every posting list 10× longer AND
        // give every doc 9 perfect containers — the worst legal input for
        // the prefix-probe × full-postings join
        "q147_url_dedup", "q148_containment",
        // round-7 session-2: DSIR — 10 identical copies make every bigram
        // bucket 10× hotter, but the feature space is CAPPED at 1009
        // buckets, so the stress lands exactly on the broadcast-stats +
        // groupBy(doc,bucket) discipline; and the stream-enrich batch
        // form — a dim-broadcast join + event-time window at 10× events
        "q149_dsir_weights", "q151_stream_enrich",
        // phrase search: the top bigram repeats in all 10 copies, so the
        // phrase-match join probes a 10× hotter single key — the 1-row
        // broadcast + groupBy(doc) discipline must keep it flat
        "q153_phrase_search",
        // round-7 session-3: winnowing — every fingerprint repeats in all
        // 10 copies (10× hotter inverted-index buckets, df-cap on the
        // line) over doc-keyed window stacks; and sorted-neighborhood —
        // 10× deeper blocks with 10× longer identical-name runs against
        // the per-block rank join
        "q156_winnowing", "q157_sorted_neighborhood",
        // rank-sum drift shares q144's pair-partitioned cumulative shape;
        // audited on its own because its per-pair reduction (rank terms)
        // is a heavier window payload than KS's two counters
        "q159_mannwhitney",
        // aHash: the mapPartitions hash pass must stay flat at 10× docs,
        // and the (blk, v) bucket join gets 10× deeper buckets (identical
        // copies hash identically — every bucket is maximally hot)
        "q160_ahash_neardup",
        // round-7 session-4: rolling DAU — the ×7 cover explode runs on
        // distinct (user, day) at 10× users, and the cover-day groupBy is
        // the hot exchange the audit must show flat; ACF — the corpus
        // collapse shuffle at 10× events feeding the dashboard-sized lag
        // join; margin mining — the all-pairs baseline at 10× embeddings
        // (156M candidate dots) with BOTH top-k windows keyed on the
        // query/corpus ids — the salted two-phase top-k under its
        // heaviest legal load
        "q174_rolling_dau", "q176_acf", "q179_margin_mining",
        // round-8: the twin-corpus CC — ngramJaccardPairs gives every doc
        // 9 verbatim twins (quadratic true pair set, the q148 analysis),
        // then alternating-star must absorb 100× the edges without a hot
        // partition
        "q112_cc_alternating")
        // same SPARK_GRAFT_ONLY convention as Verify/Bench — isolating one
        // query is how an audit anomaly gets separated from loop state
        .filter(n => SparkEntry.onlyFilter.forall(_.contains(n)))
        .map(n => n -> SparkEntry.queries(n)) ++
      // --- iterative graph family at 10× edges (round-8): the registered
      // q94/q145 run on the 25-node nation demo graph, so the LOOP
      // operators are audited here on corpus-sized graphs instead —
      // 6M-edge bipartite order↔part for CC + LPA (part hubs are the hot
      // keys), and 6M ring edges (one cycle per order) for SCC's
      // trim + FW-BW-MIN rounds.
      Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
        "x_cc_bipartite_6m" -> ((s, dir) => {
          val li = s.read.parquet(s"$dir/lineitem.parquet")
          val edges = li.select(col("l_orderkey").as("src"),
            (col("l_partkey") + lit(100000000L)).as("dst"))
          val verts = edges.select(col("src").as("id"))
            .union(edges.select(col("dst").as("id"))).distinct()
          graft.graph.Algorithms.ccAlternating(verts, edges)
        }),
        "x_lpa_bipartite_6m" -> ((s, dir) => {
          val li = s.read.parquet(s"$dir/lineitem.parquet")
          val edges = li.select(col("l_orderkey").as("src"),
            (col("l_partkey") + lit(100000000L)).as("dst"))
          val verts = edges.select(col("src").as("id"))
            .union(edges.select(col("dst").as("id"))).distinct()
          graft.graph.Algorithms.labelPropagation(verts, edges, iters = 3)
        }),
        "x_scc_rings_6m" -> ((s, dir) => {
          val li = s.read.parquet(s"$dir/lineitem.parquet")
          // one directed ring per order: linenumber i → i+1, max wraps to
          // min — every vertex is on a cycle, so trim removes nothing and
          // the FW-BW-MIN rounds carry the full graph
          val v = li.select(
            (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
            col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
          val nxt = v.groupBy("ok").agg(min("ln").as("lo"), max("ln").as("hi"))
          val edges = v.join(nxt, Seq("ok"))
            .select(col("id").as("src"),
              (col("ok") * 8 + when(col("ln") === col("hi"), col("lo"))
                .otherwise(col("ln") + 1)).as("dst"))
          graft.graph.Algorithms.stronglyConnectedComponents(
            v.select("id"), edges)
        }))
        .filter { case (n, _) => SparkEntry.onlyFilter.forall(_.contains(n)) }

    // JIT/codegen warmup: the first query otherwise pays compilation on a
    // few tasks and false-flags as skew (observed: the same stage at 3.4×
    // cold vs 1.1× warm) — task-time ratios should measure data balance,
    // not JVM state
    Seq("documents", "events", "embeddings", "orders", "lineitem").foreach {
      t =>
        spark.read.parquet(s"$scratch/$t.parquet")
          .groupBy(spark_partition_id()).count()
          .write.format("noop").mode("overwrite").save()
    }

    println(f"${"query"}%-20s ${"stage"}%6s ${"tasks"}%6s ${"med_ms"}%8s ${"max_ms"}%8s ${"ratio"}%6s flag")
    val flagged = scala.collection.mutable.ArrayBuffer[String]()
    audit.foreach { case (name, q) =>
      // Bench's inter-run hygiene: without the localCheckpoint sweep +
      // double-gc, one query's pinned blocks bill the next — the loop
      // once showed q50 at 263s that reruns at 30s in isolation, with
      // per-task balance unchanged (allocation debt, not skew)
      CacheRegistry.drainForMeasurement(spark)
      stats.reset()
      val t0 = System.nanoTime()
      q(spark, scratch).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // single-digit-task stages can't exhibit task skew; everything else
      // is the audit surface
      val rows = stats.byStage.toSeq.sortBy(_._1)
        .map { case (sid, ds) => (sid, ds.sorted) }
        .filter(_._2.size >= 4)
      rows.foreach { case (sid, ds) =>
        val med = math.max(1L, ds(ds.size / 2))
        val ratio = ds.last.toDouble / med
        val flag = if (ratio > 4 && ds.last > 500) "<-- SKEW" else ""
        if (flag.nonEmpty) flagged += s"$name stage $sid"
        val sn = stats.stageName.getOrElse(sid, "").take(40)
        println(f"$name%-20s $sid%6d ${ds.size}%6d $med%8d ${ds.last}%8d $ratio%6.1f $flag $sn")
      }
      println(f"$name%-20s total ${secs}%.1fs over ${rows.size} audited stages")
    }
    println(if (flagged.isEmpty) "SKEW AUDIT CLEAN: no stage ratio > 4 with max > 500ms"
            else s"SKEW FLAGS: ${flagged.mkString(", ")}")
    // scratch is a temp dir; leave cleanup to the OS but try politely
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(scratch)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
