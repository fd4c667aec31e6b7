package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * near-dup cluster that clears the quality bar, with its token stats. */
  def trainPipeline(spark: SparkSession, dir: String,
                    minQuality: Double): DataFrame = {
    val clusters = Dedup.q47DedupClusters(spark, dir)       // doc_id, cluster
    val quality = TextAnalysis.q37QualityScore(spark, dir)  // doc_id, ..., quality
    val tokens = TextAnalysis.q38TokenStats(spark, dir)     // doc_id, n_tokens, ...
      .select(col("doc_id"), col("n_tokens"), col("est_bpe"))
    clusters.filter(col("doc_id") === col("cluster"))
      .select("doc_id")
      .join(quality.select("doc_id", "quality"), "doc_id")
      .filter(col("quality") >= minQuality)
      .join(tokens, "doc_id")
  }

  def q50TrainPipeline(spark: SparkSession, dir: String): DataFrame =
    trainPipeline(spark, dir, minQuality = 0.7)

  val q50TrainPipelineSql: String = s"""
    WITH RECURSIVE ${Dedup.ngramPairCtes},
    tp AS (
      SELECT p.id_a, p.id_b FROM pairs p
      JOIN sizes za ON za.doc_id = p.id_a
      JOIN sizes zb ON zb.doc_id = p.id_b
      WHERE CAST(p.inter AS DOUBLE) / (za.sz + zb.sz - p.inter) >= 0.8),
    e AS (SELECT id_a AS a, id_b AS b FROM tp
          UNION SELECT id_b, id_a FROM tp),
    reach AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
    clusters AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster
      FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id),
    q AS (${TextAnalysis.q37QualityScoreSql}),
    tk AS (${TextAnalysis.q38TokenStatsSql})
    SELECT c.doc_id, q.quality, tk.n_tokens, tk.est_bpe
    FROM clusters c
    JOIN q ON q.doc_id = c.doc_id
    JOIN tk ON tk.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster AND q.quality >= 0.7"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_train_pipeline" -> q50TrainPipeline _,
  )

  def oracles: Map[String, String] = Map(
    "q50_train_pipeline" -> q50TrainPipelineSql,
  )
}
