package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data curation: the composition the north-star
  * operators exist FOR, as one declarative pipeline —
  *
  *   near-dup clustering (q47's prefix-filtered Jaccard pairs → connected
  *   components) → keep each cluster's canonical document → quality gate
  *   (q37's composite score) → per-document token budget (q38's stats).
  *
  * Every stage is an already-oracled operator; composing them in one plan
  * is the point: Catalyst sees the whole dataflow, so the quality filter
  * and column pruning push into the same scans the dedup stage reads, and
  * nothing materializes between stages except what the Pregel loop
  * checkpoints. The oracle replays the identical composition in DuckDB
  * from the same verified CTE pieces.
  */
object Pipeline {

  /** Curated corpus: canonical (lowest-doc_id) representative of every
    * near-dup cluster that clears the quality bar, with its token stats.
    * Quality and token columns come from ONE scan+tokenization
    * ([[TextAnalysis.docStats]]) — joining the standalone q37/q38 queries
    * instead would read and tokenize the corpus once per stage, since
    * Catalyst does not merge scans across plan branches. */
  def trainPipeline(spark: SparkSession, dir: String,
                    minQuality: Double): DataFrame = {
    val clusters = Dedup.q47DedupClusters(spark, dir)       // doc_id, cluster
    val stats = TextAnalysis.docStats(Tables.documents(spark, dir))
    clusters.filter(col("doc_id") === col("cluster"))
      .select("doc_id")
      .join(stats, "doc_id")
      .filter(col("quality") >= minQuality)
      .select("doc_id", "quality", "n_tokens", "est_bpe")
  }

  def q50TrainPipeline(spark: SparkSession, dir: String): DataFrame =
    trainPipeline(spark, dir, minQuality = 0.7)

  /** [[trainPipeline]] plus the decontamination stage — the full modern
    * curation chain: near-dup clustering → canonical per cluster →
    * benchmark n-gram scrub → quality gate → token stats. COMPOSED from
    * trainPipeline (not a re-spelling of it), so the canonical-selection
    * and quality-gate logic lives in exactly one place. Kept as its own
    * query (q63) so q50's cross-round bench series stays comparable. */
  def fullPipeline(spark: SparkSession, dir: String,
                   minQuality: Double): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clean = Dedup.decontaminate(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text")
      .filter(!col("contaminated"))
      .select("doc_id")
    trainPipeline(spark, dir, minQuality).join(clean, "doc_id")
  }

  def q63FullPipeline(spark: SparkSession, dir: String): DataFrame =
    fullPipeline(spark, dir, minQuality = 0.7)

  val q63FullPipelineSql: String = s"""
    WITH RECURSIVE ${Dedup.clusterCtes},
    ${Dedup.contaminationCtes},
    q AS (${TextAnalysis.q37QualityScoreSql}),
    tk AS (${TextAnalysis.q38TokenStatsSql})
    SELECT c.doc_id, q.quality, tk.n_tokens, tk.est_bpe
    FROM clusters c
    JOIN q ON q.doc_id = c.doc_id
    JOIN tk ON tk.doc_id = c.doc_id
    LEFT JOIN hits5 h ON h.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster AND q.quality >= 0.7
      AND c.doc_id % 97 <> 0 AND COALESCE(h.n_hit, 0) = 0"""

  val q50TrainPipelineSql: String = s"""
    WITH RECURSIVE ${Dedup.clusterCtes},
    q AS (${TextAnalysis.q37QualityScoreSql}),
    tk AS (${TextAnalysis.q38TokenStatsSql})
    SELECT c.doc_id, q.quality, tk.n_tokens, tk.est_bpe
    FROM clusters c
    JOIN q ON q.doc_id = c.doc_id
    JOIN tk ON tk.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster AND q.quality >= 0.7"""

  // --- q64_source_cap: per-source document cap (domain balancing) ---------
  /** Keep at most k documents per source, best quality first — the
    * domain-balancing step that stops one crawl domain from dominating a
    * training mix. Pure composition of verified pieces: quality from the
    * single-scan [[TextAnalysis.docStats]], capping via the salted
    * two-phase [[graft.ops.Windows.perGroupTopK]] (a hot source's rows
    * spread over 64 salt partitions before the final per-source rank, so
    * a domain with billions of pages cannot pin one task). Determinism
    * across engines holds because q37 already hash-certifies the quality
    * doubles bit-identical. */
  def q64SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // source rides the docStats scan — a join back onto a second documents
    // scan would re-read the corpus for one column
    val stats = TextAnalysis.docStats(docs, carry = Seq("source"))
    graft.ops.Windows.perGroupTopK(stats,
      group = Seq(col("source")),
      order = Seq(col("quality").desc, col("doc_id")),
      saltSrc = col("doc_id"), k = 5)
      .select(col("source"), col("doc_id"), col("quality"),
        col("rn").cast("int").as("rank"))
  }

  val q64SourceCapSql: String = s"""
    WITH q AS (${TextAnalysis.q37QualityScoreSql}),
    s AS (SELECT q.doc_id, q.quality, d.source
          FROM q JOIN documents d ON d.doc_id = q.doc_id),
    r AS (SELECT source, doc_id, quality,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY quality DESC, doc_id) AS rank
          FROM s)
    SELECT source, doc_id, quality, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5"""

  // --- q84_sequence_pack: concat-and-chunk token packing ------------------
  /** GPT-style sample packing: documents are (conceptually) concatenated
    * in a deterministic order and chunked into fixed `budget`-token
    * training sequences; each document reports which sequence its first
    * token lands in and at what offset (documents straddle chunk
    * boundaries — that IS concat-and-chunk packing, not bin packing).
    *
    * Scale shape: packing is per-SHARD (`doc_id % shards`), which is how
    * real packers run — one global order would serialize the corpus. The
    * per-shard running total is an ordered window whose partition is one
    * shard, and the shard count is DERIVED from the corpus IN-PLAN:
    * shards = ⌈n / docsPerShard⌉ from a one-row count aggregate broadcast
    * back onto the scan. No task ever owns more than ~docsPerShard rows no
    * matter how the corpus grows — a fixed shard constant would make each
    * shard a corpus/k single-task sort at 100×. Ceiling division is pure
    * integer arithmetic (`(n + per − 1) div per`), so the count→shards step
    * is bit-exact in any engine, like the packing arithmetic itself.
    * Token counts use the est_bpe estimator (length/4,
    * [[TextAnalysis.docStats]]) — swap in real tokenizer counts by passing
    * a different `tokens` column. */
  def packSequences(docs: DataFrame, id: String, tokens: org.apache.spark.sql.Column,
                    budget: Long, docsPerShard: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && docsPerShard > 0, s"budget/docsPerShard must be positive")
    // one-row broadcast: the count aggregate is a metadata-cheap scan next
    // to the window pass, and `greatest(1, …)` keeps an empty corpus legal
    val nShards = docs.select(col(id)).agg(count(lit(1)).as("n_docs"))
      .select(greatest(lit(1L),
        expr(s"(n_docs + ${docsPerShard - 1}) div $docsPerShard")).as("shards"))
    val w = Window.partitionBy(col("shard")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bcast-ok: nShards is a 1-row global aggregate
    docs.crossJoin(broadcast(nShards))
      .select(col(id), pmod(col(id), col("shards")).as("shard"),
        tokens.cast("long").as("n_tok"))
      .withColumn("end_tok", sum(col("n_tok")).over(w))
      // `div`, not `/`: Spark rewrites long / long to DOUBLE division,
      // which stops being exact past 2^53 cumulative tokens — `div` is
      // true integer division, so the claimed bit-exactness actually holds
      .select(col(id), col("shard"), col("n_tok"),
        expr(s"(end_tok - n_tok) div $budget").as("seq_idx"),
        pmod(col("end_tok") - col("n_tok"), lit(budget)).as("seq_offset"))
  }

  /** docsPerShard for the registered q84: the test-scale setting of the
    * ⟨docs-per-task⟩ knob (production would use ~100k). What CORRECTNESS
    * certifies is that the shard count is DERIVED from a corpus count
    * in-plan — the identical `(n + per − 1) div per` expression runs in
    * both engines (sf0.01: ⌈500/64⌉ = 8 shards; sf0.1: ⌈5000/64⌉ = 79). */
  private val q84DocsPerShard = 64L

  def q84SequencePack(spark: SparkSession, dir: String): DataFrame =
    packSequences(
      Tables.documents(spark, dir)
        .select(col("doc_id"), ceil(length(col("text")) / lit(4.0)).cast("long").as("t")),
      "doc_id", col("t"), budget = 2048, docsPerShard = q84DocsPerShard)

  // shards is the same generated ceiling-division expression the Scala plan
  // runs (q32/q60/q73's shared-constant pattern) — the engines cannot
  // disagree on the shard count without failing the hash
  val q84SequencePackSql: String = s"""
    WITH n AS (
      SELECT GREATEST(1, (COUNT(*) + ${q84DocsPerShard - 1}) // $q84DocsPerShard)
               AS shards
      FROM documents),
    d AS (
      SELECT doc_id, doc_id % n.shards AS shard,
             CAST(CEIL(length(text) / 4.0) AS BIGINT) AS n_tok
      FROM documents, n),
    c AS (SELECT doc_id, shard, n_tok,
                 SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
          FROM d)
    SELECT doc_id, shard, n_tok,
           CAST((end_tok - n_tok) // 2048 AS BIGINT) AS seq_idx,
           CAST((end_tok - n_tok) % 2048 AS BIGINT) AS seq_offset
    FROM c"""

  // --- q91_chunk_overlap: RAG-style overlapping token windows -------------
  /** Retrieval chunking: windows of `window` tokens every `stride`
    * tokens (stride < window ⇒ adjacent chunks overlap by window−stride,
    * so no query phrase straddles a boundary unseen). Chunk starts are
    * 0, stride, 2·stride, … up to the last start < n — every token lands
    * in ≥ 1 chunk and tail chunks may run short. Pure per-document
    * arithmetic (explode + native slice/concat — no HOF lambdas, no
    * shuffle): the plan is a single scan however large the corpus. */
  def chunkOverlap(docs: DataFrame, id: String, text: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs.select(col(id), graft.ops.Text.tokenize(col(text)).as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") > 0)
      .select(col(id), col("toks"), col("n_tok"),
        // CAST: `div` yields LONG; keep k (hence start/count columns) INT
        // so the oracle's INT arithmetic matches the schema exactly
        explode(expr(s"sequence(0, CAST((n_tok - 1) div $stride AS INT))"))
          .as("k"))
      .select(col(id),
        (col("k") * stride).as("start_tok"),
        least(lit(window), col("n_tok") - col("k") * stride).as("n_chunk_tok"),
        concat_ws(" ",
          slice(col("toks"), col("k") * lit(stride) + 1, lit(window)))
          .as("chunk_text"))
  }

  def q91ChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    chunkOverlap(Tables.documents(spark, dir), "doc_id", "text",
      window = 64, stride = 32)

  val q91ChunkOverlapSql: String = raw"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
               AS ts
      FROM documents),
    dd AS (SELECT doc_id, ts, len(ts) AS n FROM d WHERE len(ts) > 0),
    c AS (SELECT doc_id, ts, n, CAST(r.k AS INT) AS k
          FROM dd, unnest(range(0, ((n - 1) // 32) + 1)) AS r(k))
    SELECT doc_id,
           k * 32 AS start_tok,
           CAST(LEAST(64, n - k * 32) AS INT) AS n_chunk_tok,
           array_to_string(ts[k * 32 + 1 : k * 32 + 64], ' ') AS chunk_text
    FROM c"""

  // --- q232_seqpack_atscale: the packing window at ≥1M documents ----------
  /** At-scale correctness coverage for [[packSequences]] — q84 runs the
    * shard-derivation + per-shard running-total window over ≤5k documents
    * (sf0.1: 79 shards × ~64 docs); this replays the SAME entry point over
    * 2²⁰ range-synthesized documents, where the in-plan ceiling division
    * actually derives 256 shards and every shard's window carries 4,096
    * rows of genuinely mixed lengths. Token counts cycle 64/128/192 by
    * `(id div 256) % 3`, so within a shard (ids ≡ s mod 256, walked in id
    * order) the k-th document has length `64·(1 + k % 3)` — every shard
    * sees the identical length sequence and the packing arithmetic
    * (seq_idx/seq_offset off a 2048-token budget that mixed cycles
    * straddle unevenly) is integer-exact. The oracle replays the window
    * over the same range generator in DuckDB — one partitioned cumulative
    * sum, bit-for-bit. Output is the per-shard rollup (256 rows) whose
    * sums pin every document's packing coordinates. */
  private[graft] val q232Docs = 1L << 20
  private[graft] val q232PerShard = 4096L

  def q232SeqpackAtScale(spark: SparkSession, dir: String): DataFrame =
    packSequences(
      spark.range(q232Docs).select(col("id").as("doc_id"),
        (lit(64L) * (expr("(id div 256) % 3") + 1)).as("t")),
      "doc_id", col("t"), budget = 2048, docsPerShard = q232PerShard)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"),
        max(col("seq_idx")).as("max_seq"), sum(col("seq_idx")).as("sum_seq"),
        sum(col("seq_offset")).as("sum_off"))

  private[graft] def q232OracleSql(docs: Long = q232Docs): String = s"""
    WITH n AS (
      SELECT GREATEST(1, (COUNT(*) + ${q232PerShard - 1}) // $q232PerShard)
               AS shards
      FROM range(0, $docs)),
    d AS (
      SELECT u.i AS doc_id, u.i % n.shards AS shard,
             64 * (1 + (u.i // 256) % 3) AS n_tok
      FROM range(0, $docs) AS u(i), n),
    c AS (SELECT doc_id, shard, n_tok,
                 SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
          FROM d)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           CAST(MAX((end_tok - n_tok) // 2048) AS BIGINT) AS max_seq,
           CAST(SUM((end_tok - n_tok) // 2048) AS BIGINT) AS sum_seq,
           CAST(SUM((end_tok - n_tok) % 2048) AS BIGINT) AS sum_off
    FROM c GROUP BY shard"""

  // --- q262_chunk_atscale: RAG chunking at 2^20 documents ------------------
  /** At-scale correctness coverage for [[chunkOverlap]] — q91 chunks the
    * ~500-doc sf corpus; this replays the SAME entry point (window 64,
    * stride 32) over 2²⁰ range-built documents whose token count walks
    * 1..97 by `id % 97` (tokens `t0 t1 …`, so chunk CONTENT is a pure
    * function of the class): lengths below/at/above the window and every
    * stride remainder occur, tail chunks run short, and the corpus
    * explodes to ~2.1M chunks over ~51M tokens. Because content is
    * class-determined, the rollup by (class, start_tok) pins everything:
    * the count pins the chunk-per-doc arithmetic, min = max pins
    * uniformity of both the short-tail length and the exact chunk text,
    * and the char sum pins the slice+join against a CLOSED-FORM oracle
    * (range SQL emits the expected chunk strings directly — no token
    * logic on the oracle side). Scale shape under test: chunking stays a
    * single scan + explode (no shuffle before the verification rollup's
    * one exchange). */
  private[graft] val q262Docs = 1L << 20

  private[graft] def q262Frame(spark: SparkSession,
                               docs: Long = q262Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, CAST(id % 97 AS INT)),
                                   j -> concat('t', j)), ' ')""").as("text"))

  def q262ChunkAtScale(spark: SparkSession, dir: String): DataFrame =
    chunkOverlap(q262Frame(spark), "doc_id", "text",
      window = 64, stride = 32)
      .groupBy((col("doc_id") % 97).as("cls"), col("start_tok"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chunk_tok")).as("min_ct"),
        max(col("n_chunk_tok")).as("max_ct"),
        min(col("chunk_text")).as("min_text"),
        max(col("chunk_text")).as("max_text"),
        sum(length(col("chunk_text"))).as("sum_chars"))

  private[graft] def q262OracleSql(docs: Long = q262Docs): String = s"""
    WITH cls AS (
      SELECT c.i AS cls, c.i + 1 AS n,
             ($docs - 1 - c.i) // 97 + 1 AS n_docs
      FROM range(0, 97) AS c(i)),
    ch AS (
      SELECT cls, n, n_docs, CAST(r.k AS INT) AS k
      FROM cls, unnest(range(0, ((n - 1) // 32) + 1)) AS r(k)),
    x AS (
      SELECT cls, n_docs, CAST(k * 32 AS INT) AS start_tok,
             CAST(LEAST(64, n - k * 32) AS INT) AS ct,
             array_to_string(list_transform(
               range(k * 32, LEAST(k * 32 + 64, n)), j -> 't' || j), ' ')
               AS txt
      FROM ch)
    SELECT CAST(cls AS BIGINT) AS cls, start_tok,
           CAST(n_docs AS BIGINT) AS n_docs,
           ct AS min_ct, ct AS max_ct,
           txt AS min_text, txt AS max_text,
           CAST(n_docs * length(txt) AS BIGINT) AS sum_chars
    FROM x"""

  // --- q264_sourcecap_atscale: domain balancing under a hot source --------
  /** At-scale correctness coverage for the q64 composition — docStats
    * quality feeding the salted two-phase [[graft.ops.Windows.perGroupTopK]]
    * — under the skew it exists for: 2²⁰ range-built documents where ONE
    * source ('hot', every even id — 2¹⁹ documents) holds half the corpus
    * and 8,191 long-tail sources split the rest (~64 docs each). Text
    * cycles 16 variants of strictly increasing token count (10..25), so
    * quality is strictly increasing in the variant and the per-source
    * top-5 is deterministic with doc_id tiebreaks. The 32-branch text
    * CASE is shared verbatim with the oracle, which recomputes quality
    * from the 32 variant literals (one tiny CTE, the q37 arithmetic) and
    * replays the rank window — so a salt-phase bug that drops a
    * candidate from a 2¹⁹-row group, or a quality drift at volume, moves
    * a row out of the 40,960-row result. Scale shape under test: the
    * hot source's rows spread over 64 salt partitions BEFORE the final
    * per-source rank — no single task ever owns the hot domain. */
  private[graft] val q264Docs = 1L << 20
  private[graft] val q264Sources = 8191L

  private[graft] def q264TextSql: String =
    (0 until 32).map { m =>
      val v = m / 2
      s"WHEN $m THEN '${(0 to 9 + v).map(j => s"w$j").mkString(" ")}'"
    }.mkString("CASE doc_id % 32 ", " ", " END")

  private[graft] def q264SourceSql: String = s"""
    CASE WHEN doc_id % 2 = 0 THEN 'hot'
         ELSE 's' || CAST(doc_id % $q264Sources AS STRING) END"""

  private[graft] def q264Frame(spark: SparkSession,
                               docs: Long = q264Docs): DataFrame =
    spark.range(docs).select(col("id").as("doc_id"))
      .select(col("doc_id"), expr(q264SourceSql).as("source"),
        expr(q264TextSql).as("text"))

  def q264SourcecapAtScale(spark: SparkSession, dir: String): DataFrame =
    q264SourcecapAtScale0(spark, q264Docs)

  private[graft] def q264SourcecapAtScale0(spark: SparkSession,
                                           docs: Long): DataFrame = {
    val stats = TextAnalysis.docStats(q264Frame(spark, docs),
      carry = Seq("source"))
    graft.ops.Windows.perGroupTopK(stats,
      group = Seq(col("source")),
      order = Seq(col("quality").desc, col("doc_id")),
      saltSrc = col("doc_id"), k = 5)
      .select(col("source"), col("doc_id"), col("quality"),
        col("rn").cast("int").as("rank"))
  }

  private[graft] def q264OracleSql(docs: Long = q264Docs): String = raw"""
    WITH vt0 AS (
      SELECT m.i AS m,
             ${q264TextSql.replace("doc_id % 32", "m.i")} AS text
      FROM range(0, 32) AS m(i)),
    vt AS (
      SELECT m,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x <> '')) AS nt,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x IN ('the', 'a'))) AS ns,
             length(text) AS lc
      FROM vt0),
    vq AS (
      SELECT m,
             CASE WHEN nt > 0 THEN
               CAST((2 * (24 * nt * LEAST(nt, 100)
                          + 3200 * (nt - ns)
                          + 300 * LEAST(lc - nt + 1, 8 * nt))
                     * 1000000 + 8000 * nt)
                    // (2 * 8000 * nt) AS DOUBLE) / 1000000
             END AS quality
      FROM vt),
    d AS (
      SELECT u.i AS doc_id,
             ${q264SourceSql.replace("doc_id", "u.i")} AS source,
             u.i % 32 AS m
      FROM range(0, $docs) AS u(i)),
    r AS (
      SELECT d.source, d.doc_id, vq.quality,
             ROW_NUMBER() OVER (PARTITION BY d.source
                                ORDER BY vq.quality DESC, d.doc_id) AS rank
      FROM d JOIN vq USING (m))
    SELECT source, doc_id, quality, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q262_chunk_atscale" -> q262ChunkAtScale _,
    "q264_sourcecap_atscale" -> q264SourcecapAtScale _,
    "q50_train_pipeline" -> q50TrainPipeline _,
    "q63_full_pipeline"  -> q63FullPipeline _,
    "q64_source_cap"     -> q64SourceCap _,
    "q84_sequence_pack"  -> q84SequencePack _,
    "q91_chunk_overlap"  -> q91ChunkOverlap _,
    "q232_seqpack_atscale" -> q232SeqpackAtScale _,
  )

  def oracles: Map[String, String] = Map(
    "q262_chunk_atscale" -> q262OracleSql(),
    "q264_sourcecap_atscale" -> q264OracleSql(),
    "q50_train_pipeline" -> q50TrainPipelineSql,
    "q63_full_pipeline"  -> q63FullPipelineSql,
    "q64_source_cap"     -> q64SourceCapSql,
    "q84_sequence_pack"  -> q84SequencePackSql,
    "q91_chunk_overlap"  -> q91ChunkOverlapSql,
    "q232_seqpack_atscale" -> q232OracleSql(),
  )
}
