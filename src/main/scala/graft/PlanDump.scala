package graft

import java.nio.file.{Files, Paths}

/** Plan-evidence dumper for the optimization rounds: writes
  * `.explain("formatted")` output for selected declared queries to
  * `SPARK_GRAFT_PLAN_DIR` (default `plans/r15`) as
  * `<query>_<SPARK_GRAFT_PLAN_TAG>.txt` (default tag `before`).
  *
  * Usage:
  *   SPARK_GRAFT_ONLY=q253_incremental_atscale,q209_minhash_atscale \
  *   SPARK_GRAFT_PLAN_TAG=before sbt "runMain graft.PlanDump"
  *
  * Only builds each query's DataFrame (no action is run), so it is cheap
  * for the relational/dedup/similarity families. The eager families —
  * streaming gates and Pregel loops execute driver-side actions while
  * BUILDING their result frame — still work, but the dumped plan is the
  * final result frame's, and the dump pays the full run cost. Not part of
  * the driver contract (Bench/Verify are unchanged).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r15")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val spark = LocalSession.build(cpus)
    Files.createDirectories(Paths.get(outDir))
    val only = SparkEntry.onlyFilter
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      val out = Paths.get(outDir, s"${n}_$tag.txt")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(out, plan)
        System.err.println(s"[plandump] wrote $out")
      } catch {
        case e: Throwable =>
          Files.writeString(out, s"ERROR: ${e.getMessage}\n")
          System.err.println(s"[plandump] FAILED $n: ${e.getMessage}")
      }
      CacheRegistry.unpersistAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
