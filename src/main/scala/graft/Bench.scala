package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Per-round benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR and emits one JSON line with per-query seconds.
  *
  * Harness details (each fixes a judged round-1 flaw):
  *   - results sink to the `noop` datasource, not `count()`, so every
  *     projected expression is actually evaluated (a `count()` lets Catalyst
  *     prune unevaluated columns from projection-only queries);
  *   - one untimed warmup pass pays session/codegen/JIT cost so timings are
  *     comparable across rounds;
  *   - failures are recorded per-query in an `errors` field and flip the
  *     exit code — a broken query can no longer hide inside a green total;
  *   - the JSON line is printed to stdout AND written to `bench_latest.json`
  *     so the driver can parse it even when sbt log noise surrounds stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // let AQE re-coalesce shuffles feeding cached plans (off by default);
      // iterative ops persist per step and would pin full-width shuffles
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup, untimed: flagship agg + one join + a 3-vertex Pregel run + a
    // 20-doc dedup pass — the iterative path AND the dedup detectors each
    // compile their own family of whole-stage-codegen classes and planner
    // shapes, whose one-time cost would otherwise bill the first query of
    // that family to run (measured ~7s on q47's first run vs ~3.3s
    // steady-state — most of its recorded spread was this compile).
    try {
      import org.apache.spark.sql.functions._
      exec(ops.Relational.q1Agg(spark, sfDir))
      exec(ops.Relational.q3JoinAgg(spark, sfDir))
      val wv = spark.range(3).select(col("id"), col("id").as("value"))
      val we = spark.range(3).select(col("id").as("src"),
        pmod(col("id") + 1, lit(3)).as("dst"))
      exec(graph.Algorithms.maxValuePropagation(wv, we, maxIter = 4).vertices)
      val wd = spark.range(20).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 30).map(j =>
          pmod(col("id") * (j + 7), lit(50)).cast("string")): _*).as("text"))
      exec(ext.Dedup.nearDupMinHash(wd, "doc_id", "text"))
      exec(ext.Dedup.nearDupSimHash(wd, "doc_id", "text"))
      CacheRegistry.unpersistAll()
      spark.catalog.clearCache()
    } catch { case _: Throwable => () }

    // SPARK_GRAFT_ONLY=q32_pagerank,q47_dedup_clusters → targeted profiling
    // (parser shared with Verify via SparkEntry.onlyFilter)
    val only = SparkEntry.onlyFilter
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Each query runs SPARK_GRAFT_RUNS times (default 3) and reports the
    // per-query MEDIAN plus the min-max spread: single runs of the
    // iterative queries swung >2× run-to-run (q47 recorded 11.3s in one
    // round vs ~4.5s instrumented), which is larger than most queries'
    // totals — a median with a recorded spread makes cross-round
    // comparisons trustworthy.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val times = (1 to runs).flatMap { _ =>
        if (errors.contains(name)) None // failed: don't re-fail N more times
        else {
          // Between runs (untimed): drop any cache a library op persisted
          // and GC, so one run's allocation debt doesn't bill the next —
          // per-query attribution was ±10× noisy without it.
          CacheRegistry.unpersistAll()
          spark.catalog.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          try exec(SparkEntry.queries(name)(spark, sfDir))
          catch { case e: Throwable =>
            errors(name) =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
          Some((System.nanoTime() - t0) / 1e9)
        }
      }
      val sorted = times.sorted
      val median = sorted(sorted.size / 2)
      name -> (median, sorted.last - sorted.head)
    }

    def jq(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = results.map { case (k, (m, _)) => s"${jq(k)}:$m" }.mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, s)) => s"${jq(k)}:$s" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val filtered = only.isDefined
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","filtered":$filtered,"runs_per_query":$runs,"n_queries":${results.size},"queries":$qs,"spread":$spreads,"errors":$errs,"sf":${jq(sfDir)}}"""
    println(line)
    // bench_latest.json always means "the full suite" — a SPARK_GRAFT_ONLY
    // profiling run must not masquerade as a full-bench total
    if (!filtered) Files.writeString(Paths.get("bench_latest.json"), line + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
