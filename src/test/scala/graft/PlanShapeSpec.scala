package graft

/** Physical-plan regression guards for the scale-critical shapes: these
  * queries are only 100 TB-safe because of a specific plan property
  * (single shuffle, broadcast dim, no nested-loop join, pushed filters).
  * A refactor that silently loses the property still returns correct rows
  * at test scale — these assertions are what catch it. */
class PlanShapeSpec extends GraftSuite {

  private def plan(q: String): String = {
    // other suites leave library-persisted frames behind; the cache manager
    // would swap matching subtrees for InMemoryRelations (whose stringified
    // inner plan differs), making these assertions order-dependent
    spark.catalog.clearCache()
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
  }

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q44 as-of join: exactly one shuffle and one sort — never a range join blowup") {
    val p = plan("q44_asof_join")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(400))
    assert(count(p, "+- Sort ") == 1)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q3 customer join broadcasts WITHOUT a hint while the side fits") {
    // round-9 contract: q3 carries no broadcast() hint (customer scales
    // with the data — a forced hint is an OOM at 100x), and the planner's
    // size statistics pick broadcast-hash on their own at any sf where
    // customer is under the threshold. If this fails, either the
    // statistics path broke or someone re-added the hint's tradeoff
    // without revisiting Relational.scala's q3 comment.
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q5 dimension joins broadcast, fact side never shuffles for the join") {
    val p = plan("q5_join_region")
    assert(count(p, "BroadcastHashJoin") == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q2 filter reaches the parquet scan (pushdown + column pruning)") {
    val p = plan("q2_filter_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(600))
    // projection pruned to the 4 referenced columns — a scan of all 8
    // lineitem columns would mean pruning regressed
    assert(!p.contains("l_orderkey"))
  }

  test("near-dup detectors never fall back to a nested-loop or cartesian join") {
    for (q <- Seq("q31_minhash_lsh", "q35_ngram_jaccard", "q41_simhash")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("dedup substrate carries no value-keyed window (df/bucket sizing is agg+join)") {
    // count().over(Window.partitionBy(valueCol)) concentrates every row of
    // a hot key on one task — the df-count and bucket-size computations
    // must stay groupBy.count + join (map-side partial agg, no single-task
    // key concentration). Any Window node in these plans is a regression.
    for (q <- Seq("q31_minhash_lsh", "q35_ngram_jaccard", "q41_simhash",
                  "q47_dedup_clusters")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q: value-keyed window in dedup plan")
    }
  }

  test("q62 decontamination broadcasts the benchmark; corpus joins are hash, never nested-loop") {
    // the benchmark side is small by definition — its distinct shingles
    // must reach the corpus as a broadcast, so the corpus text is scanned
    // once and never shuffled for the membership test
    val p = plan("q62_decontaminate")
    assert(p.contains("BroadcastExchange"), "benchmark shingles must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q113 span excision: benchmark broadcast, doc-keyed windows only, no HOF") {
    val p = plan("q113_span_excision")
    // the benchmark shingle set reaches the corpus as a broadcast (q62's
    // contract); coverage joins back on the doc key — no nested loop
    assert(p.contains("BroadcastExchange"), "benchmark must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // token pipeline stays codegen'd: no interpreted lambda in the explode path
    assert(!p.contains("lambdafunction"), p.take(400))
  }

  test("q114 segment dedup: first-occurrence keeper is agg+join, never a window") {
    // ROW_NUMBER over PARTITION BY seg would concentrate every occurrence
    // of a hot boilerplate segment on one task — the keeper must stay
    // groupBy(seg).min + equi-join (map-side partial absorbs the hot key)
    val p = plan("q114_segment_dedup")
    assert(!p.contains("Window"), "value-keyed window in segment dedup")
    assert(!p.contains("lambdafunction"), p.take(400))
  }

  test("q116 fuzzy NN: quadratic runs on distinct values; rows join the tiny NN table") {
    val p = plan("q116_fuzzy_nn")
    // the per-value answer table broadcasts back onto the row stream; the
    // within-block self-join must be an equi-join on the block key
    assert(p.contains("BroadcastExchange"), "NN table must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q120 ticket sample: top-k is a TakeOrdered, never a global sort") {
    val p = plan("q120_ticket_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("lambdafunction"), p.take(400))
  }

  test("q16 range join keeps the equi-key shuffle (band is a post-join filter)") {
    val p = plan("q16_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("exploded token pipelines carry no interpreted lambda (HOF) expressions") {
    // HOFs (filter/transform/aggregate over arrays) evaluate interpreted —
    // fine per-row over a small array, fatal in an exploded hot path. The
    // exploded pipelines must tokenize via explode(split) + plain Filter.
    // (q41/q35 keep deliberate per-row lambdas on grouped arrays, so only
    // the pure exploded pipelines are asserted lambda-free.)
    for (q <- Seq("q24_wordcount", "q29_tfidf")) {
      val p = plan(q)
      assert(!p.contains("lambdafunction"), s"$q: ${p.take(400)}")
    }
  }

  test("simhash vote aggregate stays under the codegen field limit") {
    // 64 one-sum-per-bit buffers exceed spark.sql.codegen.maxFields (100)
    // and silently drop the aggregate out of whole-stage codegen; the
    // packed form needs 33 (32 lane-pairs + row count). The whole q41 plan
    // holds ~48 partial_sums across all its aggregates; unpacked votes
    // would push it past 80.
    val p = plan("q41_simhash")
    assert(count(p, "partial_sum") <= 60, "vote packing regressed: " +
      count(p, "partial_sum") + " partial sums")
  }

  test("q28 brute-force cosine broadcasts queries; corpus side is never shuffled") {
    val p = plan("q28_similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query side must broadcast")
    // the only hash shuffles allowed are the two-phase top-k on (qid, salt)
    assert(count(p, "Exchange hashpartitioning") <= 2, p.take(400))
  }

  test("q69 bloom path: benchmark reaches the corpus only as broadcasts") {
    // the corpus scan must meet the benchmark as a broadcast set (exact
    // flag) and a broadcast one-row map (bloom bits) — any sort-merge join
    // against the benchmark side means the corpus shuffled for membership
    val p = plan("q69_bloom_decontaminate")
    assert(p.contains("BroadcastExchange"), "benchmark must broadcast")
    assert(p.contains("BroadcastHashJoin"), "exact membership must hash-join")
    assert(!p.contains("CartesianProduct"))
    // the doc_id-keyed rejoin (NULL-text docs back onto the output) may
    // sort-merge two corpus-derived frames — only a SHINGLE-keyed merge
    // join would mean the corpus shuffled to meet the benchmark
    assert(!p.contains("SortMergeJoin [shingle"),
      "corpus shuffled to meet the benchmark side:\n" + p.take(600))
  }

  test("q70 incremental dedup joins stay bucketed — no nested-loop fallback") {
    val p = plan("q70_incremental_dedup")
    assert(!p.contains("CartesianProduct"), p.take(400))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
    assert(!p.contains("Window"), "value-keyed window in dedup plan")
  }

  test("q74 semantic dedup: pairs form within cells only — no cartesian pair join") {
    // the within-cluster self-join must stay an equi-join on the cluster
    // id (cost Σ|cell|²), and the Lloyd assignment's only non-equi join is
    // the deliberate k-row centroid broadcast cross — a CartesianProduct
    // anywhere means a |corpus|² pair explosion at scale
    val p = plan("q74_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("BroadcastExchange"), "centroids must broadcast")
  }

  test("q77 temperature mix: rates broadcast; the corpus never shuffles for the join") {
    val p = plan("q77_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), "rate frame must broadcast-hash-join")
    assert(!p.contains("SortMergeJoin"),
      "corpus shuffled to meet the |strata|-row rate frame:\n" + p.take(600))
  }

  test("versioning joins stay key-partitioned — no cartesian or nested-loop blowup") {
    // upsert's anti-join and the diff's full-outer join must both remain
    // equi-joins on the key: a nested-loop fallback would be |corpus|²
    for (q <- Seq("q79_upsert", "q80_snapshot_diff")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q82 triangles: wedge and closing joins stay equi-keyed") {
    // the whole point of the degree orientation is that wedges form via an
    // equi-join on the center vertex and close via an equi-semi-join on
    // the endpoint pair — a nested-loop anywhere is the |E|² blowup
    val p = plan("q82_triangles")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("q39 fingerprint: native expression, no interpreted HOF on the hot path") {
    // the rolling hash was the last transform+aggregate HOF pair evaluated
    // per corpus row in a registered query; HOF lambdas run interpreted
    // (no whole-stage codegen), so their reappearance is a perf regression
    val p = plan("q39_fingerprint")
    assert(p.contains("rolling_fingerprint"), p.take(600))
    assert(!p.contains("lambdafunction"), p.take(600))
  }

  test("q84 packing: exactly one shuffle (the shard exchange) feeds the prefix sum") {
    // shard is the ONLY partitioning the plan needs: scan → project →
    // exchange on shard → in-partition ordered sum. A second exchange
    // means the window or a stray repartition re-shuffled the corpus.
    val p = plan("q84_sequence_pack")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(600))
  }

  test("q90 bpe pairs: two hash shuffles (vocab-sized), top-k never sorts globally") {
    // shuffle 1 groups tokens into (word, count); shuffle 2 aggregates
    // pairs — both carry the VOCABULARY, not the corpus. The top-30 cut
    // must stay TakeOrdered (per-partition heads + driver merge), never an
    // Exchange rangepartitioning full sort.
    val p = plan("q90_bpe_pairs")
    assert(count(p, "Exchange hashpartitioning") == 2, p.take(600))
    assert(!p.contains("Exchange rangepartitioning"), p.take(600))
    assert(p.contains("TakeOrdered"), p.take(600))
  }

  test("q89 frame sampling: zero shuffles — scan, generate, slice, filter") {
    // per-payload byte slicing is embarrassingly parallel; any Exchange
    // here means something re-partitioned the corpus for per-row work
    val p = plan("q89_frame_sample")
    assert(!p.contains("Exchange"), p.take(600))
  }

  test("q83 resample: windows are entity-keyed (grid-bounded), never value-keyed") {
    // partitionBy(user_id) over a span-sized grid is bounded by
    // span/step rows per task — assert no cartesian grid blowup and no
    // nested-loop in the grid join
    val p = plan("q83_resample")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("q85 profile: column pruning survives the wide aggregate") {
    // the profile touches 4 of lineitem's 8 columns; if pruning regressed
    // the scan would read them all and the one-scan argument halves
    val p = plan("q85_profile")
    assert(!p.contains("l_orderkey") && !p.contains("l_shipdate"),
      "profile scan reads columns it never aggregates:\n" + p.take(600))
  }

  test("q86 constraints: FK anti-join broadcasts the parent, no cartesian") {
    val p = plan("q86_constraints")
    assert(p.contains("BroadcastHashJoin"), "parent side must broadcast")
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q72 count-min cells meet the probe side as a broadcast") {
    // the sketch is depth×width rows by construction; if it ever arrives
    // at the estimate join via a shuffle instead of a broadcast, the
    // sketch-sized-shuffle contract is broken
    val p = plan("q72_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), "cells must broadcast-hash-join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q95 cooccurrence: pair match is one doc-keyed LEAD window — " +
      "never a range/nested loop, never a value-keyed window") {
    // r16: the ±w match reads each token's successors via LEAD over the
    // per-doc position order (one token-table exchange + doc-bounded
    // sort) instead of exploding to (doc_id, pos) equality and joining
    // the token table back — a per-doc range join would still plan as a
    // nested loop, and a VALUE-keyed window would hot-spot, so both stay
    // banned; the one allowed window must be partitioned by doc_id
    val p = plan("q95_cooccur")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
    assert(p.contains("Window"), "pair path lost its LEAD window")
    assert(p.contains("windowspecdefinition(doc_id"),
      "the pair window must be doc-keyed: " + p.take(600))
  }

  test("q97 inverted index: agg-only pipeline — no windows, no join blowups") {
    val p = plan("q97_inverted_index")
    assert(!p.contains("Window"), "posting build must stay groupBy, not window")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q96 scd2: both window passes share ONE entity-keyed exchange+sort") {
    val p = plan("q96_scd2")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(600))
    assert(count(p, "+- Sort ") == 1, "lag/lead/row_number must reuse one sort")
    assert(p.contains("user_id"), "window key must be the entity key")
  }

  test("q94 label propagation: tally joins stay equi-keyed across rounds") {
    val p = plan("q94_label_prop")
    assert(!p.contains("CartesianProduct"), p.take(600))
    // windows exist but partition by vertex id (degree-bounded); the
    // catastrophic shape would be a nested-loop edge join
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q99 pq: centroids always broadcast — every nested-loop is a broadcast build") {
    // kMeans deliberately crossJoins broadcast(centroids): k rows against
    // the corpus. The corpus must never be the inner side or shuffle for
    // the assignment — each BroadcastNestedLoopJoin must carry a broadcast
    // build side, and there must be no raw CartesianProduct
    val p = plan("q99_pq")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(count(p, "BroadcastNestedLoopJoin") ==
      count(p, "BroadcastNestedLoopJoin BuildRight") +
        count(p, "BroadcastNestedLoopJoin BuildLeft"),
      "non-broadcast nested loop in the assignment path")
  }

  test("q111 multiway join: dims broadcast, facts equi-join, date filter pushed") {
    val p = plan("q111_multiway_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // nation and region ride broadcast; the customer/supplier joins may be
    // broadcast or shuffled by size, but never a nested loop
    assert(count(p, "BroadcastHashJoin") >= 2, p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      "date slice must reach the orders scan")
  }

  test("q107 retention: distinct-first aggregation chain, never a per-user window") {
    // the scale property is that raw events collapse to distinct
    // (user, day) before any user-level work — a window (or a distinct
    // count over raw events) would put each user's full event history on
    // one task
    val p = plan("q107_retention")
    assert(!p.contains("Window"), "retention must not use windows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashAggregate"), "distinct must be a hash aggregate")
  }

  test("q108 attribution: inherits the as-of single-sort shape through the rollup") {
    val p = plan("q108_attribution")
    assert(count(p, "+- Sort ") == 1, "asof must stay one sort; rollup adds none")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q109 sketch union: sketches aggregate partially map-side, no distinct-expand mixing") {
    // the scale property: HLL buffers partial-aggregate (ObjectHashAggregate
    // with a partial mode) and the exact-distinct branch is deduplicated
    // BEFORE counting — a plan that mixed countDistinct into the sketch
    // aggregate would expand per (group, key) with a 16KB buffer each
    val p = plan("q109_sketch_union")
    assert(p.contains("ObjectHashAggregate"), "hll sketches use object agg")
    assert(!p.contains("Expand"), "no distinct-rewrite expand in the sketch path")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("q147 url dedup: one shuffle total — canonicalization is pure codegen") {
    // the scale property: canonicalizeUrl is string expressions only, so
    // the whole query is scan → project → partial agg → ONE exchange →
    // final agg. A second exchange or a Window means the canonicalization
    // stopped being a per-row expression.
    val p = plan("q147_url_dedup")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(500))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
    // column pruning reaches the scan: the canonicalization only needs
    // (doc_id, source, n_chars) — reading `text` for a URL dedup would
    // drag the corpus body across the 100 TB scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      p.linesIterator.find(_.contains("ReadSchema")).getOrElse("no scan"))
  }

  test("q148 containment: PPJoin shape — no cartesian, no value-keyed window") {
    val p = plan("q148_containment")
    assert(!p.contains("CartesianProduct"), "containment fell back to cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "value-keyed window in containment plan")
  }

  test("q188/q194 gates are pure projections — zero exchanges in the plan") {
    // the whole point of the filter/blocklist gates is that they run
    // inline in an ingest scan; ANY Exchange means a shuffle crept in
    for (q <- Seq("q188_filter_gate", "q194_blocklist")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q: gate plan gained a shuffle")
    }
  }

  test("q192 universe sample: the key-hash filter sits below the join exchange") {
    // sampling must cut data BEFORE the shuffle — the md5-nibble Filter
    // has to print after (= physically below) the first Exchange, inside
    // the scan stage, and the join must stay a real equi-join
    val p = plan("q192_universe_sample")
    val ex = p.indexOf("Exchange")
    val f = p.indexOf("md5")
    assert(ex >= 0 && f > ex, s"filter/exchange order broke: ex=$ex f=$f")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "join degenerated")
  }

  test("q190 quantile norm: pooled dictionary broadcasts into the range join") {
    // the rank lookup is a non-equi join — correct ONLY as a broadcast of
    // the dictionary-sized pooled frame; a CartesianProduct would pair
    // row-level frames
    val p = plan("q190_quantile_norm")
    assert(p.contains("BroadcastNestedLoopJoin"), "dictionary not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q174 rolling DAU: cover-day distinct + groupBy, never a window") {
    val p = plan("q174_rolling_dau")
    assert(!p.contains("Window"), "value-keyed window in rolling-DAU plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q179 margin mining: B side broadcasts, no cartesian fallback") {
    val p = plan("q179_margin_mining")
    assert(p.contains("BroadcastExchange"), "B side must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q149 DSIR: bucket statistics broadcast, no value-keyed window") {
    // the 1009-bucket ratio frame must reach the per-doc counts as a
    // broadcast — a shuffled join on `bucket` would hash-partition the
    // corpus-sized (doc, bucket) frame by a 1009-value key (hot buckets =
    // hot partitions); and nothing here may sort per value
    val p = plan("q149_dsir_weights")
    assert(p.contains("BroadcastExchange"), "bucket ratios must broadcast")
    assert(!p.contains("Window"), "value-keyed window in DSIR plan")
    // (a BroadcastNestedLoopJoin IS expected here: the one-row totals
    // frame crossJoins in as a broadcast, the library-wide totals idiom)
    assert(!p.contains("CartesianProduct"))
  }

  test("q189 JL projection stays a pure scan-side projection — zero exchanges") {
    // the round-8 scalar-column output contract must not cost a shuffle:
    // 16 rounded dot products + element_at over one scan, codegen'd
    val p = plan("q189_jl_projection")
    assert(!p.contains("Exchange"), "JL projection plan gained a shuffle")
    // `*(N) Project` = the projection sits inside SOME whole-stage-codegen
    // stage (executedPlan renders the codegen star, not the node name);
    // the stage NUMBER is upstream-renumbering noise, so don't pin it
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      "projection fell out of codegen")
  }

  test("q195 diff explain: one join, no window, scan pruned to compare columns") {
    // the column-attribution drill-down is one equi-join on the key plus
    // per-row comparisons; a second join or a window means the concat_ws
    // output step restructured the plan
    val p = plan("q195_diff_explain")
    assert(count(p, "Join") == 1, p.take(600))
    assert(!p.contains("Window"), "value-keyed window in diff-explain plan")
    assert(!p.contains("CartesianProduct"))
  }

  // --- the q210–q217 at-scale gates: plan properties behind the scale claims

  test("q210 two-phase top-k: rank-limit pushdown both phases, never a one-task window") {
    val p = plan("q210_topk_atscale")
    // Spark 4 inserts WindowGroupLimit (Partial before the exchange,
    // Final after) for each rn<=k window — 4 nodes total. Losing them
    // means every task sorts its full input instead of keeping k rows.
    assert(count(p, "WindowGroupLimit") == 4, p.take(800))
    // one exchange per phase, keyed (g, salt) then (g) — and no global
    // single-partition collapse anywhere
    assert(count(p, "Exchange hashpartitioning") == 2, p.take(800))
    assert(!p.contains("Exchange SinglePartition"), "global window leaked in")
    assert(count(p, "+- Window ") == 2)
  }

  test("q211 as-of at scale keeps the q44 contract: one shuffle + one sort feed the fill") {
    val p = plan("q211_asof_atscale")
    // one hash exchange for the union sort + one for the user rollup;
    // exactly one sort (the per-key union order) and one window (the
    // forward fill) — a range-join rewrite or resort would break 100 TB
    assert(count(p, "Exchange hashpartitioning") == 2, p.take(800))
    assert(count(p, "+- Sort ") == 1, p.take(800))
    assert(count(p, "+- Window ") == 1)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q212 salted join: the spread keys reach the join; probe side never pre-shuffles") {
    val p = plan("q212_saltedjoin_atscale")
    // the join must be keyed (k, __salt) — that pair appearing in the
    // join/exchange keys IS the guaranteed celebrity-key spread; the
    // replicated build side stays small enough that the planner
    // broadcasts it, so the 2^20-row probe pays no join shuffle at all
    assert(count(p, "__salt") >= 2, p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // only the rollup shuffles the probe side
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
  }

  test("q213 prefix sum: range slices + one bounded offsets window + broadcast-back") {
    val p = plan("q213_prefixsum_atscale")
    // the 256-way range partition is the scale mechanism; exactly ONE
    // single-partition exchange exists (the <=256-row per-slice offsets
    // window — bounded by construction), and the offsets return to the
    // data as a broadcast join, never a shuffle
    assert(p.contains("Exchange rangepartitioning"), p.take(800))
    assert(count(p, "Exchange SinglePartition") == 1, p.take(800))
    assert(count(p, "BroadcastHashJoin") == 1, p.take(800))
  }

  test("q215 bm25 at scale: query-term filter precedes any shuffle; top-k is TakeOrdered") {
    val p = plan("q215_bm25_atscale")
    // tokens not in the query must die at the explode, before the tf
    // shuffle — at 100 TB this filter is the difference between shuffling
    // 2 matched terms per doc and the whole token stream
    assert(p.contains("IN (q3,q7)"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "global sort replaced the top-k")
    assert(!p.contains("CartesianProduct"))
  }

  test("q217 ticket lottery: top-k is TakeOrdered, no global sort anywhere") {
    val p = plan("q217_ticket_atscale")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("+- Sort "), "a full sort crept into the lottery")
  }

  // q219/q220/q222 are iterative (Pregel drives actions inside the query
  // body, so there is no single static plan to pin) — their scale
  // properties are pinned structurally in PregelSpec instead, the
  // q201/q204/q205 precedent. The two non-iterative round-11 gates get
  // plan pins here:

  test("q221 triangles at scale: every join stays equi-keyed — no cartesian, " +
      "no nested loop") {
    val p = plan("q221_triangles_atscale")
    // the wedge self-join keys on the center u and the closing join is a
    // semi on (y,z); a range/nested-loop fallback would be the deg²
    // blowup the orientation exists to prevent
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("LeftSemi"), "closing join lost its semi shape")
    assert(!p.contains("Window"), "no window belongs in the wedge pipeline")
  }

  test("q223 media at scale: one rollup shuffle after the typed decode, " +
      "partial aggregation map-side") {
    val p = plan("q223_media_atscale")
    // the typed mapPartitions stage (object serde boundary) must feed a
    // partially-aggregated rollup: exactly one hash exchange, no window,
    // no join — anything else means the decode path gained a shuffle
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(p.contains("MapPartitions"), "typed decode stage vanished")
    assert(count(p, "HashAggregate") == 2, "partial agg lost map-side half")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  // Round-12 gates: q229/q236 are Pregel-iterative (pinned in PregelSpec),
  // q233 is a streaming query (pinned in SinkStreamSpec via the progress
  // API), q230's Lloyd loop builds its plan through eager persists. The
  // six static-plan gates get pins here:

  test("q231 skyline at scale: one window over the distinct-x frame, " +
      "equi-join back — never a dominance cross product") {
    val p = plan("q231_skyline_atscale")
    assert(count(p, "Window") == 1, "staircase lost its single window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q232 seqpack at scale: one packing window, the shard count joins " +
      "as a single 1-row broadcast") {
    val p = plan("q232_seqpack_atscale")
    assert(count(p, "Window") == 1, "packing window count changed")
    // the derived shard count is crossJoin(broadcast(1-row)) — exactly one
    assert(count(p, "BroadcastNestedLoopJoin") == 1, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q234 phrase at scale: the argmax probes back as a broadcast — " +
      "the corpus never reshuffles to learn the phrase") {
    val p = plan("q234_phrase_atscale")
    assert(p.contains("BroadcastHashJoin"), "1-row phrase probe lost broadcast")
    assert(p.contains("TakeOrderedAndProject"), "argmax lost its top-1 form")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q235 linkage at scale: both stages stay equi-keyed — the " +
      "Levenshtein never degrades to a nested loop") {
    val p = plan("q235_linkage_atscale")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q237 equidepth at scale: the 16-row bounds frame broadcasts; the " +
      "corpus never sort-merges") {
    val p = plan("q237_equidepth_atscale")
    assert(p.contains("BroadcastHashJoin"), "bounds join lost broadcast")
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q238 hilbert at scale: the 16-step fold is shuffle-free — exactly " +
      "the rollup's one exchange, no join, no window") {
    val p = plan("q238_hilbert_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q239 zorder at scale: the interleave is shuffle-free — same " +
      "contract as the hilbert fold") {
    val p = plan("q239_zorder_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q240 boilerplate at scale: line frequency is aggregate-shaped — " +
      "never a value-keyed window over line text, never a nested loop") {
    val p = plan("q240_boilerplate_atscale")
    assert(!p.contains("Window"), "line df acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q241 invindex at scale: the (word, doc) dedup and the posting " +
      "build share ONE word-keyed exchange; no window, no join") {
    // hashpartitioning(word) satisfies the dedup aggregate's
    // ClusteredDistribution(word, doc_id) — same word ⇒ same partition ⇒
    // same (word, doc_id) co-located — so Catalyst plans the distinct and
    // the collect_list around a single shuffle. Two exchanges here means
    // that sharing regressed; the dedup's SEMANTICS are pinned by the
    // repeated-word unit test in TextAnalysisSpec.
    val p = plan("q241_invindex_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(800))
  }

  test("q242 upsert at scale: the wave broadcasts into the anti-join — " +
      "the corpus never shuffles for the merge; only the rollup exchanges") {
    val p = plan("q242_upsert_atscale")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "merge lost its broadcast anti-join: " + p.take(800))
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q243 profile at scale: ONE source scan feeds all 41 aggregates — " +
      "adding columns must never add scans or shuffles") {
    val p = plan("q243_profile_atscale")
    assert(count(p, "Range (") == 1, "profile no longer single-scan: " +
      p.take(800))
    assert(count(p, "Exchange hashpartitioning") == 0, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q245 hll at scale: dedup-first is exactly TWO exchanges — the " +
      "extra distinct shuffle q13's comment buys to keep HLL buffers " +
      "per-GROUP, never per (group, key)") {
    // deliberately NOT the q241 single-exchange sharing: here the dedup
    // aggregate is count-only (no collect over the dedup key), so the
    // planner keys the distinct on (g, k) — the documented q13 tradeoff.
    // THREE exchanges would mean a redundant shuffle crept in; ONE would
    // mean the distinct collapsed into the HLL aggregate, i.e. a
    // per-(group, key) partial buffer — the gigabytes-of-state shape the
    // dedup-first discipline exists to prevent.
    val p = plan("q245_hll_atscale")
    assert(count(p, "Exchange hashpartitioning") == 2, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q246 cube at scale: grouping sets are ONE Expand into ONE " +
      "exchange — map-side partials absorb the 4x amplification") {
    val p = plan("q246_cube_atscale")
    assert(count(p, "Expand") >= 1, "cube lost its Expand form: " + p.take(800))
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q247 stratified at scale: selection is a pure codegen'd filter — " +
      "the gate's rollup owns the ONLY exchange; no count pass, no join") {
    val p = plan("q247_stratified_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q248 funnel at scale: entity-keyed groupBys and equi-joins only — " +
      "no window, no per-entity event collection, no nested loop") {
    val p = plan("q248_funnel_atscale")
    assert(!p.contains("Window"), "funnel acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("collect_list"), "funnel must never collect events")
  }

  test("q244 bpe at scale: vocab collapse + pair stats are the only " +
      "shuffles; the cut is a TakeOrdered, never a global sort") {
    val p = plan("q244_bpe_atscale")
    assert(count(p, "Exchange hashpartitioning") == 2, p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-k lost its " +
      "TakeOrdered form: " + p.take(800))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(800))
  }

  test("q249 simhash at scale: fingerprint votes and block buckets are " +
      "aggregate/equi-join shaped — no window, no nested loop") {
    val p = plan("q249_simhash_atscale")
    assert(!p.contains("Window"), "simhash acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q250 jaccard at scale: df ranking and prefix join stay " +
      "aggregate/equi-keyed — never a value-keyed window, never a " +
      "nested loop") {
    val p = plan("q250_jaccard_atscale")
    assert(!p.contains("Window"), "shingle df acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q251 decontaminate at scale: benchmark membership broadcasts — " +
      "the corpus is never shuffled for the probe") {
    // the 1-row bloom-map cross join is a broadcast nested loop BY DESIGN
    // (bcast-ok: 1-row aggregate), so the pin here is the membership side:
    // a SortMergeJoin on the shingle would mean the corpus started
    // shuffling by shingle value — the exact anti-shape the broadcast
    // contract forbids. The id-keyed left-outer rejoin may legitimately
    // sort-merge; it keys on doc_id, not the shingle.
    val p = plan("q251_decontaminate_atscale")
    assert(p.contains("BroadcastHashJoin"), "membership join lost broadcast")
    assert(!p.contains("SortMergeJoin [shingle"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q252 diff at scale: ONE full-outer sort-merge join on the key — " +
      "each version shuffles exactly once, plus the rollup's exchange") {
    val p = plan("q252_diff_atscale")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      "diff lost its full-outer sort-merge form: " + p.take(800))
    assert(count(p, "Exchange hashpartitioning") == 3, p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("q253 incremental at scale: batch probes the index via equi-joins " +
      "only — no window, no nested loop") {
    val p = plan("q253_incremental_atscale")
    assert(!p.contains("Window"), "incremental dedup acquired a window")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q255 temperature at scale: the derived rate frame broadcasts — " +
      "the corpus is never shuffled for the draw, never sort-merged") {
    val p = plan("q255_temperature_atscale")
    assert(p.contains("BroadcastHashJoin"), "rate join lost broadcast: " +
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("q256 weighted jaccard at scale: bag counts and the shingle " +
      "self-join stay aggregate/equi-keyed — no window, no nested loop") {
    val p = plan("q256_wjaccard_atscale")
    assert(!p.contains("Window"), "bag counts acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q257 pq/adc at scale: the LUT meets the codes as a broadcast " +
      "hash join and the top-k is a TakeOrdered — never a nested loop " +
      "over the corpus") {
    val p = plan("q257_pqadc_atscale")
    assert(p.contains("BroadcastHashJoin"), "LUT join lost broadcast: " +
      p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-k lost TakeOrdered")
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q258 cooccur at scale: the pair match is one doc-keyed LEAD " +
      "window — never a per-doc range join or nested loop") {
    // r16: same rewrite as the q95 pin — the successor window replaces
    // the explode-to-positions equi-join; the window key must stay the
    // doc (bounded partition), and the cut a global TakeOrdered
    val p = plan("q258_cooccur_atscale")
    assert(p.contains("TakeOrderedAndProject"), "top-40 lost TakeOrdered")
    assert(p.contains("windowspecdefinition(doc_id"),
      "pair window must be doc-keyed: " + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q259 tfidf at scale: one doc-partitioned rank window, the df " +
      "side joins equi-keyed — never a global window or nested loop") {
    val p = plan("q259_tfidf_atscale")
    // rank ≤ 3 must keep its WindowGroupLimit halves (each task retains 3
    // rows per doc BEFORE the window's exchange — the q210 top-k shape)
    val wgl = count(p, "WindowGroupLimit")
    assert(wgl == 2, s"rank lost its WindowGroupLimit pushdown ($wgl)")
    assert(count(p, "Window") - wgl == 1, "rank lost its single window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q260 urldedup at scale: canonicalization is pure projected " +
      "string work — the collapse is the only exchange, no join") {
    val p = plan("q260_urldedup_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q261 dsir at scale: bucket ratios broadcast onto the per-doc " +
      "counts — the bigram build stays a (doc, pos) equi-join") {
    val p = plan("q261_dsir_atscale")
    assert(p.contains("BroadcastHashJoin"), "ratio join lost broadcast: " +
      p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("q262 chunk at scale: chunking is scan + explode — the " +
      "verification rollup's exchange is the only shuffle, no join") {
    val p = plan("q262_chunk_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    assert(p.contains("Generate"), "chunk explode vanished")
  }

  test("q263 filtergate at scale: the gate is a pure projection — the " +
      "verification rollup's exchange is the plan's only shuffle") {
    val p = plan("q263_filtergate_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q264 sourcecap at scale: exactly the two salted-top-k windows — " +
      "the hot source spreads over salts before the final rank") {
    val p = plan("q264_sourcecap_atscale")
    val wgl = count(p, "WindowGroupLimit")
    assert(count(p, "Window") - wgl == 2,
      s"salted two-phase lost a window pass (wgl=$wgl): " + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q265 verbatim at scale: window multiplicity is an aggregate and " +
      "dup windows return via a semi join — never a value-keyed window") {
    val p = plan("q265_verbatim_atscale")
    assert(p.contains("LeftSemi"), "dup-window filter lost its semi join: " +
      p.take(800))
    assert(!p.contains("Window"), "window census acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q266 spanexcision at scale: the benchmark shingles broadcast — " +
      "the corpus is never nested-loop-joined or value-shuffled") {
    val p = plan("q266_spanexcision_atscale")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark shingle probe lost broadcast: " + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "a corpus-sized sort-merge appeared: " + p.take(800))
  }

  test("q267 retention at scale: raw events collapse to distinct " +
      "(user, day) first — no per-user window, no nested loop") {
    val p = plan("q267_retention_atscale")
    assert(!p.contains("Window"), "cohort matrix acquired a window pass")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q268 rarity at scale: the distinct-score cumulative rides " +
      "rangePrefixSum's range slices; no cartesian anywhere") {
    // (BroadcastNestedLoopJoin appears several times, but each is a
    // 1-row global aggregate — T and N — re-printed wherever the shared
    // `scored` subtree recurs in the unreused plan string; the
    // load-bearing pins are the range repartition and no-cartesian)
    val p = plan("q268_rarity_atscale")
    assert(p.contains("rangepartitioning"),
      "rangePrefixSum's range slices vanished: " + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q269 clustersplit at scale: the split is a pure projection — " +
      "the rollup owns the shuffles, no join, no window") {
    val p = plan("q269_clustersplit_atscale")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q270 correlations at scale: all ten co-moments ride ONE " +
      "map-side-partial aggregate — a single exchange, no join") {
    val p = plan("q270_correlations_atscale")
    assert(count(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(count(p, "HashAggregate") == 2, "partial agg lost map-side half")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
  }

  test("q254 containment at scale: the df-cap drops hot tokens via a " +
      "broadcast ANTI-join (map-side, before any token shuffle); " +
      "everything else stays equi-keyed") {
    val p = plan("q254_containment_atscale")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "df-cap lost its broadcast anti-join: " + p.take(800))
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }
}
