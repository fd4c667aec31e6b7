package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Result of a Pregel run: final vertex state + how many supersteps ran. */
final case class PregelResult(vertices: DataFrame, supersteps: Int)

/** DataFrame-native Pregel/BSP loop — the Spark form of the reference's
  * vertex paradigm (`/root/reference/daemons/core/module_vertex.py:76-180`,
  * initiator FSM `/root/reference/daemons/initiator/module_vertex.py:98-172`).
  *
  * Mapping of the reference machinery:
  *   - superstep barrier (SHIFT→COMPUTE→PROCESS surveyor FSM): each loop
  *     iteration's Spark action is a natural global barrier;
  *   - message routing via the nanomsg vertexbroker topic prefix
  *     (`module_vertex.py:94-96`): a shuffle on `dst` — and exactly-once,
  *     where the reference's relay is at-most-once by design
  *     (`module_vertex.py:150-159` throws duplicates away); we document the
  *     deviation as a fix, not a parity break;
  *   - double-buffered message queues (`module_vertex.py:80-81,116-125`):
  *     the messages DataFrame of superstep N is consumed to build vertices
  *     N+1 — the dataflow IS the double buffer;
  *   - vote-to-halt (`module_vertex.py:165-179`): a `halt` boolean column
  *     produced by the vertex program; the loop stops when every vertex
  *     votes halt, or at `maxIter` (pagerank's superstep cap,
  *     `examples/pagerank/pagerank.py:39-43`).
  *
  * Scale design: vertices and messages both hash-partition on `id`, so the
  * post-aggregation join can reuse the exchange; per-superstep state is
  * persisted (memory-and-disk) and lineage is truncated with an eager
  * `localCheckpoint` every `checkpointEvery` supersteps — without it the
  * join-per-iteration plan grows exponentially and kills the driver long
  * before 100 TB kills the executors.
  */
object Pregel {

  /** Run a vertex program.
    *
    * @param vertices initial state, must carry an `id` column (+ state cols)
    * @param edges    `src`, `dst` (+ optional edge attribute cols)
    * @param maxIter  superstep cap (G6)
    * @param sendMsg  message payload, evaluated per out-edge over the
    *                 vertex⋈edges triplet (vertex state + edge attrs);
    *                 null = send nothing (G2's `forward`)
    * @param mergeMsg commutative+associative aggregation over the `msg`
    *                 column — Catalyst makes it a partial agg, i.e. the
    *                 map-side combine remap never had
    * @param vprog    vertex update: receives current state joined with the
    *                 aggregated `msg` column (null when no messages) and the
    *                 0-based superstep; returns the new state with the same
    *                 `id` + state columns, optionally a `halt` boolean for
    *                 vote-to-halt (G5)
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int,
          sendMsg: Column, mergeMsg: Column => Column,
          vprog: (DataFrame, Int) => DataFrame,
          checkpointEvery: Int = 2): DataFrame =
    runWithStats(vertices, edges, maxIter, sendMsg, mergeMsg, vprog,
      checkpointEvery).vertices

  def runWithStats(vertices: DataFrame, edges: DataFrame, maxIter: Int,
                   sendMsg: Column, mergeMsg: Column => Column,
                   vprog: (DataFrame, Int) => DataFrame,
                   checkpointEvery: Int = 2): PregelResult = {
    require(vertices.columns.contains("id"), "vertices need an `id` column")
    require(edges.columns.contains("src") && edges.columns.contains("dst"),
      "edges need `src` and `dst` columns")

    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    var v = vertices.localCheckpoint(true)
    var prev: DataFrame = null
    var step = 0
    var allHalt = false

    while (step < maxIter && !allHalt) {
      // Plan aliases (not df("col") attribute refs): after superstep 1 the
      // vertex frame's lineage contains the edge frame, so attribute-id
      // references would trip DetectAmbiguousSelfJoin.
      val triplets = v.as("__v").join(e.as("__e"), col("__v.id") === col("__e.src"))
      val msgs = triplets
        .select(col("__e.dst").as("id"), sendMsg.as("msg"))
        .filter(col("msg").isNotNull)
      val agg = msgs.groupBy(col("id")).agg(mergeMsg(col("msg")).as("msg"))
      val joined = v.join(agg, Seq("id"), "left_outer")
      val nv0 = vprog(joined, step)
      val voteToHalt = nv0.columns.contains("halt")

      // Materialize every superstep (bounded lineage between checkpoints);
      // hard-truncate lineage every `checkpointEvery` supersteps. The
      // checkpoint is LAZY: the halt-check action below materializes it in
      // the same Spark job — an eager checkpoint would run a second job per
      // checkpointed superstep for nothing.
      val nv =
        if ((step + 1) % checkpointEvery == 0) nv0.localCheckpoint(false)
        else nv0.persist(StorageLevel.MEMORY_AND_DISK)
      allHalt =
        if (voteToHalt) nv.filter(!col("halt")).isEmpty // action → barrier
        else { nv.count(); false }                      // action → barrier

      if (prev != null) prev.unpersist(false)
      prev = v
      v = nv
      step += 1
    }

    val result = v.drop("halt").localCheckpoint(true)
    if (prev != null) prev.unpersist(false)
    v.unpersist(false)
    e.unpersist(false)
    PregelResult(result, step)
  }
}
