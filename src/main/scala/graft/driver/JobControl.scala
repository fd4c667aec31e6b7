package graft.driver

import java.util.concurrent.{ConcurrentHashMap, Executors, ThreadFactory}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerStageSubmitted,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.{Success => TaskSuccess, TaskFailedReason}

/** Submit / track / cancel facade — the Spark form of remap's initiator
  * entry point (`/root/reference/daemons/initiator/http_interface.py:45-64`:
  * POST /jobs starts a job, GET /jobs lists them, DELETE cancels;
  * GET /apps lists the registered applications; GET /nodes the workers).
  *
  * Under Spark the scheduler owns placement, retry, and parallelism, so
  * what remains of the initiator surface is exactly this: name → async
  * run → status. Each submission runs on its own pool thread inside a
  * Spark JOB GROUP named by the job id, which is what makes cancellation
  * real: `cancelJobGroup(id, interruptOnCancel=true)` stops every Spark
  * job the query spawned, including mid-stage tasks — the counterpart of
  * the initiator revoking a planned job's task allocations.
  *
  * Scale note: this is driver-side control plane only — O(submitted jobs)
  * heap, zero involvement in the data path. The run action materializes
  * the query to the `noop` sink (every projected expression is evaluated,
  * nothing is collected to the driver); a deployment that wants results
  * lands them through a real sink inside the query itself.
  */
final class JobControl(spark: SparkSession, sfDir: String,
                       maxJobHistory: Int = 10000) {
  import JobControl._

  private val seq = new AtomicInteger
  private val jobs = new ConcurrentHashMap[String, JobInfo]()
  private val pool = Executors.newCachedThreadPool(new ThreadFactory {
    private val n = new AtomicInteger
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-job-${n.incrementAndGet()}")
      t.setDaemon(true); t
    }
  })

  // --- per-job progress (remap's monitor shows task movement per job:
  // `daemons/initiator/monitor.py:32-45` reads the initiator's
  // tasks/allocatedtasks/completedtasks dicts). Under Spark the submit
  // thread runs every Spark job inside the job-group named by our id, so
  // a listener can attribute stage/task events back to the tracked job
  // via the `spark.jobGroup.id` property on SparkListenerJobStart.
  // Listener-bus discipline: O(1) counter bumps only, never blocking.
  // Retention: `jobs` and `progressById` are the driver-side job HISTORY,
  // one small record per submitted job, capped at `maxJobHistory`: when a
  // submit pushes the history past the cap, the OLDEST TERMINAL jobs are
  // evicted together with their progress entries in one sweep (the two
  // maps cannot drift), so a long-lived driver's control plane stays
  // bounded. Queued/Running jobs are never evicted — the cap applies to
  // history, not to live work.
  private val progressById = new ConcurrentHashMap[String, MutableProgress]()
  private val stageOwner = new ConcurrentHashMap[Int, String]()
  // per-stage set of completed task INDICES: a logical task counts toward
  // tasksCompleted exactly once no matter which stage ATTEMPT or
  // speculative copy finishes it — counting only attempt 0 undercounted
  // after a fetch-failure retry (the successes land in attempt 1+ and the
  // progress fraction could never reach 100). Swept with stageOwner.
  private val stageTaskDone =
    new ConcurrentHashMap[Int, java.util.Set[Int]]()
  // sparkJobId → its stage ids, so onJobEnd can sweep stageOwner entries
  // for stages that never fire completion events (SKIPPED stages reusing
  // cached/shuffle output, or stages abandoned by a job abort) — without
  // the sweep stageOwner grows without bound on a long-lived driver
  private val jobStages = new ConcurrentHashMap[Int, Seq[Int]]()
  private val listener = new SparkListener {
    override def onJobStart(ev: SparkListenerJobStart): Unit = {
      val gid = Option(ev.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).orNull
      if (gid != null && jobs.containsKey(gid)) {
        val p = progressById.computeIfAbsent(gid, _ => new MutableProgress)
        p.sparkJobs.incrementAndGet()
        ev.stageInfos.foreach(si => stageOwner.put(si.stageId, gid))
        jobStages.put(ev.jobId, ev.stageInfos.map(_.stageId))
      }
    }
    override def onJobEnd(ev: org.apache.spark.scheduler.SparkListenerJobEnd)
        : Unit = {
      val stages = jobStages.remove(ev.jobId)
      if (stages != null) stages.foreach { sid =>
        stageOwner.remove(sid); stageTaskDone.remove(sid)
      }
    }
    override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
      val p = owner(ev.stageInfo.stageId)
      if (p != null) {
        p.stagesSubmitted.incrementAndGet()
        // first attempt only: a fetch-failure resubmit re-runs tasks the
        // total already counts
        if (ev.stageInfo.attemptNumber() == 0)
          p.tasksTotal.addAndGet(ev.stageInfo.numTasks)
      }
    }
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val p = owner(ev.stageInfo.stageId)
      if (p != null && ev.stageInfo.failureReason.isEmpty)
        p.stagesCompleted.incrementAndGet()
      // the owner map is keyed by stageId (attempts share it); drop the
      // mapping only once no further attempt can arrive — failed attempts
      // and never-completed (skipped/aborted) stages are swept at job end
      if (ev.stageInfo.failureReason.isEmpty) {
        stageOwner.remove(ev.stageInfo.stageId)
        stageTaskDone.remove(ev.stageInfo.stageId)
      }
    }
    override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
      val p = owner(ev.stageId)
      if (p != null) ev.reason match {
        // count by task INDEX, once per stage: tasksTotal counts attempt-0
        // partitions, and indices are stable across attempts, so dedup on
        // the index keeps tasksCompleted ≤ tasksTotal (no >100% from
        // retry/speculative copies) while still crediting a task whose
        // only success lands in attempt 1+ (no permanent undercount)
        case TaskSuccess =>
          val done = stageTaskDone.computeIfAbsent(ev.stageId,
            _ => ConcurrentHashMap.newKeySet[Int]())
          if (done.add(ev.taskInfo.index)) p.tasksCompleted.incrementAndGet()
        case r: TaskFailedReason if r.countTowardsTaskFailures =>
          p.taskRetries.incrementAndGet()
        case _ => ()
      }
    }
    private def owner(stageId: Int): MutableProgress = {
      val gid = stageOwner.get(stageId)
      if (gid == null) null else progressById.get(gid)
    }
  }
  spark.sparkContext.addSparkListener(listener)

  /** Point-in-time progress for a tracked job — zeros until its first
    * Spark job enters the scheduler (a QUEUED job has no stages yet). */
  def progressOf(id: String): Progress = Option(progressById.get(id))
    .map(_.snapshot).getOrElse(Progress(0, 0, 0, 0, 0, 0))

  /** The registered applications — remap's GET /apps listed the app
    * directories the initiator could start (`initiator.py` list_apps). */
  def listApps: Seq[String] = graft.SparkEntry.queries.keys.toSeq.sorted

  /** Start a registered query asynchronously; returns immediately with the
    * tracked handle (remap's POST /jobs → 201 + job doc; its required
    * `priority` field — `http_interface.py:49` — maps to a Spark
    * scheduler pool below). Unknown names are rejected here,
    * synchronously — the initiator's RemapException → HTTP 400 path.
    *
    * Priority semantics: the job's Spark jobs run in scheduler pool
    * `graft-p<priority>`. Under `spark.scheduler.mode=FAIR` with pool
    * weights configured (`spark.scheduler.allocation.file`), higher-
    * weighted pools get proportionally more concurrent task slots —
    * the Spark form of remap's priority cores
    * (`daemons/node/node_hardware.py:9-16`). Under the default FIFO
    * scheduler the property is recorded but inert; priority NEVER
    * changes results, only resource share. */
  def submit(name: String, priority: Int = 0): JobInfo = {
    require(graft.SparkEntry.queries.contains(name),
      s"unknown app '$name' — not in SparkEntry.queries")
    val id = s"job-${seq.incrementAndGet()}"
    val info = JobInfo(id, name, Queued, System.currentTimeMillis(), None, None,
      priority)
    jobs.put(id, info)
    evictHistory()
    pool.execute { () =>
      // Queued→Running ONLY: a cancel that lands while the job is still in
      // the pool queue sets CANCELLED before any job group exists, so its
      // cancelJobGroup is a no-op — unconditionally stamping Running here
      // would resurrect the job and run the cancelled query to completion
      val claimed = jobs.computeIfPresent(id, (_, j) =>
        if (j.status == Queued) j.copy(status = Running) else j)
      if (claimed != null && claimed.status == Running) {
        // job-group and pool are thread-local state; this worker owns the id
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          s"graft-p$priority")
        spark.sparkContext.setJobGroup(id, s"graft $name",
          interruptOnCancel = true)
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          finish(id, Succeeded, None)
        } catch {
          case e: Throwable =>
            // a cancel() raced the run: the group cancellation surfaces as a
            // SparkException in this thread; keep the user-intent status
            val wasCancelled = jobs.get(id) != null &&
              jobs.get(id).status == Cancelled
            if (!wasCancelled)
              finish(id, Failed,
                Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300)))
        } finally {
          spark.sparkContext.clearJobGroup()
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        }
      }
    }
    info
  }

  /** Evict the oldest TERMINAL jobs (and their progress entries, same
    * sweep) once the history exceeds `maxJobHistory`. O(n log n) on the
    * ≤ cap+1-entry control-plane map — negligible next to a submit. */
  private def evictHistory(): Unit =
    if (jobs.size > maxJobHistory) {
      val terminal = Set(Succeeded, Failed, Cancelled)
      listJobs.filter(j => terminal.contains(j.status))
        .take(jobs.size - maxJobHistory)
        .foreach { j => jobs.remove(j.id); progressById.remove(j.id) }
    }

  private def finish(id: String, st: String, err: Option[String]): Unit =
    jobs.computeIfPresent(id, (_, j) =>
      // terminal states are sticky: a late FAILED from the worker thread
      // must not overwrite the CANCELLED the user observed
      if (j.status == Cancelled || j.status == Succeeded || j.status == Failed) j
      else j.copy(status = st, finishedMs = Some(System.currentTimeMillis()),
        error = err))

  def get(id: String): Option[JobInfo] = Option(jobs.get(id))

  def listJobs: Seq[JobInfo] =
    // submission order — numeric id suffix, not lexicographic ("job-10"
    // must not sort between "job-1" and "job-2")
    jobs.values.toArray(Array.empty[JobInfo]).toSeq
      .sortBy(_.id.stripPrefix("job-").toLong)

  /** Cancel a submitted job (remap's DELETE /jobs/<id>; 404 when unknown →
    * `false` here). Cancelling an already-finished job is a no-op that
    * still returns true — the job exists; there is just nothing to stop. */
  def cancel(id: String): Boolean = Option(jobs.get(id)) match {
    case None => false
    case Some(j) =>
      if (j.status == Queued || j.status == Running) {
        jobs.computeIfPresent(id, (_, x) =>
          if (x.status == Queued || x.status == Running)
            x.copy(status = Cancelled,
              finishedMs = Some(System.currentTimeMillis()))
          else x)
        spark.sparkContext.cancelJobGroup(id)
      }
      true
  }

  /** The worker inventory — remap's GET /nodes listed the node daemons and
    * their cores. Spark's equivalent is the executor set; on local[n] that
    * is the single driver entry. */
  def listNodes: Seq[NodeInfo] =
    spark.sparkContext.getExecutorMemoryStatus.toSeq.map {
      case (addr, (maxMem, remaining)) => NodeInfo(addr, maxMem, remaining)
    }.sortBy(_.address)

  def shutdown(): Unit = {
    spark.sparkContext.removeSparkListener(listener)
    pool.shutdownNow()
  }
}

object JobControl {
  val Queued = "QUEUED"
  val Running = "RUNNING"
  val Succeeded = "SUCCEEDED"
  val Failed = "FAILED"
  val Cancelled = "CANCELLED"

  final case class JobInfo(id: String, name: String, status: String,
                           submittedMs: Long, finishedMs: Option[Long],
                           error: Option[String], priority: Int = 0)
  final case class NodeInfo(address: String, maxMemBytes: Long,
                            remainingMemBytes: Long)

  /** Per-job progress counters — the Spark rendering of the initiator's
    * "N tasks left, N committed, N complete, N failed" per-job state. */
  final case class Progress(sparkJobs: Int, stagesSubmitted: Int,
                            stagesCompleted: Int, tasksTotal: Int,
                            tasksCompleted: Int, taskRetries: Int) {
    /** Completed fraction of first-attempt tasks, in [0, 100]; 0 before
      * any stage is known. */
    def pct: Int =
      if (tasksTotal <= 0) 0
      else math.min(100, (tasksCompleted * 100L / tasksTotal).toInt)
  }

  private[driver] final class MutableProgress {
    val sparkJobs = new AtomicInteger
    val stagesSubmitted = new AtomicInteger
    val stagesCompleted = new AtomicInteger
    val tasksTotal = new AtomicInteger
    val tasksCompleted = new AtomicInteger
    val taskRetries = new AtomicInteger
    def snapshot: Progress = Progress(sparkJobs.get, stagesSubmitted.get,
      stagesCompleted.get, tasksTotal.get, tasksCompleted.get,
      taskRetries.get)
  }
}
