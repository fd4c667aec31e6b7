ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / scalacOptions += "-deprecation"
name := "remapspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through verbatim instead of wrapping every
// line in sbt's `[info] ` logger prefix — the bench/verify drivers parse
// stdout lines as JSON and the prefix broke that (BENCH_r02 "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's `[success] Total time: …` epilogue: it lands on stdout
// AFTER the bench's summary JSON, so every BENCH_r*.json recorded
// "parsed": null — the driver's last-line parse read the epilogue, not the
// JSON. With it off, the JSON is the final stdout line. Success is still
// observable via the exit code (Bench exits nonzero on any query error).
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude it
// from the unused-settings lint so every sbt run doesn't open with a [warn]
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pin the initial heap to the max: growing 2G→8G mid-bench shifts the
  // GC cadence between runs of the same query and showed up as spread
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // throughput collector: this is a single-JVM batch workload with no
  // latency SLO — G1's concurrent cycles overlapped the timed bench runs
  // (measured ~0.4s slower medians and ~2× the spread on the iterative
  // dedup family vs ParallelGC)
  "-XX:+UseParallelGC",
)
