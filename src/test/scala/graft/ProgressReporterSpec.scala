package graft

import java.util.concurrent.ConcurrentLinkedQueue

import graft.driver.ProgressReporter
import graft.driver.ProgressReporter._

class ProgressReporterSpec extends GraftSuite {

  /** Listener events are delivered async on the bus thread — poll until
    * the condition holds instead of racing it. */
  private def eventually(timeoutMs: Long = 10000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(cond, "condition not met within timeout")
  }

  test("progress events observed for a run of q1 (jobs, stages, completion)") {
    val events = new ConcurrentLinkedQueue[Event]()
    val r = ProgressReporter.attach(spark, events.add(_))
    try {
      SparkEntry.queries("q1_agg")(spark, sf).collect()
      eventually() {
        val evs = events.toArray(Array.empty[Event])
        evs.exists(_.isInstanceOf[JobStarted]) &&
          evs.collect { case JobEnded(_, ok) => ok }.contains(true) &&
          evs.exists { case StageProgress(_, done, total) =>
            total > 0 && done == total
          case _ => false }
      }
      eventually() {
        val s = r.snapshot
        s.jobsSubmitted >= 1 && s.jobsSucceeded >= 1 &&
          s.jobsFailed == 0 && s.tasksCompleted >= 1
      }
      // the human-readable status line the reference logged per completion
      assert(r.snapshot.toString.contains("submitted"))
    } finally spark.sparkContext.removeSparkListener(r)
  }

  test("a failing job reports the failed attempt and the failed job") {
    val events = new ConcurrentLinkedQueue[Event]()
    val r = ProgressReporter.attach(spark, events.add(_))
    try {
      import spark.implicits._
      intercept[Exception] {
        spark.range(10).as[Long]
          .map(i => if (i >= 0) throw new RuntimeException("boom") else i)
          .collect()
      }
      eventually() {
        r.snapshot.jobsFailed >= 1 && r.snapshot.taskFailures >= 1 &&
          events.toArray(Array.empty[Event])
            .exists(_.isInstanceOf[TaskRetried])
      }
    } finally spark.sparkContext.removeSparkListener(r)
  }
}
