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

    // Warmup, untimed: flagship agg + one join + a 3-vertex Pregel run —
    // the iterative path compiles its own family of codegen classes and
    // planner shapes, whose one-time cost would otherwise bill the first
    // graph query that happens to run.
    try {
      import org.apache.spark.sql.functions._
      exec(ops.Relational.q1Agg(spark, sfDir))
      exec(ops.Relational.q3JoinAgg(spark, sfDir))
      val wv = spark.range(3).select(col("id"), col("id").as("value"))
      val we = spark.range(3).select(col("id").as("src"),
        pmod(col("id") + 1, lit(3)).as("dst"))
      exec(graph.Algorithms.maxValuePropagation(wv, we, maxIter = 4).vertices)
      spark.catalog.clearCache()
    } catch { case _: Throwable => () }

    // SPARK_GRAFT_ONLY=q32_pagerank,q47_dedup_clusters → targeted profiling
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      // Between queries (untimed): drop any cache a library op persisted and
      // GC, so one query's allocation debt doesn't bill the next one's wall
      // time — per-query attribution was ±10× noisy without it, and cache
      // buildup over 47 queries inflated the full run well beyond the sum
      // of standalone timings.
      CacheRegistry.unpersistAll() // drain the library-operator cache registry
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try exec(SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    def jq(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = results.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val filtered = only.isDefined
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","filtered":$filtered,"n_queries":${results.size},"queries":$qs,"errors":$errs,"sf":${jq(sfDir)}}"""
    println(line)
    // bench_latest.json always means "the full suite" — a SPARK_GRAFT_ONLY
    // profiling run must not masquerade as a full-bench total
    if (!filtered) Files.writeString(Paths.get("bench_latest.json"), line + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
