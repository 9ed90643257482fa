package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query timed on
  * SPARK_GRAFT_SF_DIR, plus the frontier throughput headline (URLs
  * scheduled+deduped/sec — the north-rule metric). Emits ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", benchMode = true)

    // warm the JVM/codegen on the small sf first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    // min-of-2 per query: one GC-/contention-bound pass must not distort
    // the round-over-round signal (each pass still runs the full plan)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> math.min(once(), once())
    }

    // frontier throughput at this parallelism (scaling measured
    // separately by ScalingBench at local[8] vs local[32])
    val frontier = FrontierBench.run(spark, seeds = 500000)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","frontier_urls_per_sec":${frontier.urlsPerSec}%.0f,"frontier_scheduled":${frontier.scheduled},"frontier_deduped":${frontier.deduped}}"""
    println(line)
    BenchOut.write("bench.json", line)
    spark.stop()
  }
}

/** Machine-readable bench artifact: every bench main ALSO writes its
  * JSON to a file (default `target/bench*.json`, override dir with
  * GRAFT_BENCH_OUT) so the per-round artifact carries structured
  * numbers instead of a scraped log tail. */
object BenchOut {
  /** One id per JVM: every line this process appends is attributable to
    * this run, so a consumer can group/filter lines even when several
    * invocations share a file. */
  private val runId: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName.replaceAll("[^A-Za-z0-9]", "") +
      "-" + java.lang.Long.toHexString(System.currentTimeMillis())
  // appended-to names this JVM already wrote: the FIRST append of a JVM
  // truncates, so an artifact never accumulates stale lines from a
  // previous build or core-count configuration
  private val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def write(name: String, line: String, append: Boolean = false): Unit =
    try {
      val d = java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_OUT", "target"))
      java.nio.file.Files.createDirectories(d)
      val firstAppend = append && appended.add(name)
      val opts: Seq[java.nio.file.OpenOption] =
        if (append && !firstAppend)
          Seq(java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
        else
          Seq(java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      val stamped =
        if (line.startsWith("{")) s"""{"run_id":"$runId",${line.drop(1)}"""
        else line
      // `name` holds exactly THIS run's lines (truncated at the JVM's
      // first write — no stale rows from a previous build/core count);
      // the sidecar .log keeps the cross-JVM history for chunked runs.
      java.nio.file.Files.writeString(d.resolve(name), stamped + "\n", opts: _*)
      if (append) {
        val log = name.replaceAll("\\.json$", "") + ".log.json"
        java.nio.file.Files.writeString(d.resolve(log), stamped + "\n",
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      }
      ()
    } catch { case e: Exception => System.err.println(s"[bench] artifact write failed: $e") }
}

final case class FrontierBenchResult(scheduled: Long, deduped: Long, elapsedSec: Double) {
  def urlsPerSec: Double = (scheduled + deduped) / math.max(elapsedSec, 1e-9)
}

/** Cluster-utilization accounting for the scaling legs (populated by
  * an always-on listener in ScalingBench): total task run/cpu time
  * across the measured window, so a leg's JSON self-documents how busy
  * its executor cores actually were — the N-vs-4N efficiency story is
  * unreadable without it (BENCH.md round-5 validity rule: a pair is
  * meaningful iff both legs ran ≥90% occupancy with ~matching
  * task_cpu; ambient host interference pollutes either field). */
object UtilStats {
  val taskRunMs = new java.util.concurrent.atomic.LongAdder
  val taskCpuMs = new java.util.concurrent.atomic.LongAdder
  def reset(): Unit = { taskRunMs.reset(); taskCpuMs.reset() }
  def driverCpuMs: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
      case _ => -1L
    }
}

object FrontierBench {

  /** DEEP-FRONTIER leg: a politeness-bound crawl where pending ≫ the
    * per-wave schedule (seeds/10k hosts × 10k urls each, budget 50) —
    * the shape a broad crawl reaches after a few waves, and the one
    * the queue-head scheduler exists for: a wave must not window,
    * anti-join or rewrite the deep backlog. Reports seconds per
    * steady-state wave (waves 2-4; wave 1 pays the one-time lazy cut
    * of the seed queue). */
  def runDeep(spark: SparkSession, seeds: Int,
              hostsOverride: Option[Int] = None): (Double, Long) = {
    val ck = Scratch.dir("frontier-deep")
    try {
      // hostsOverride holds the per-wave work CONSTANT while seeds
      // scale the queue depth — the pending-independence experiment
      // (a flat engine shows equal sec/wave at 10k vs 20k urls/host)
      val hosts = hostsOverride.getOrElse(math.max(20, seeds / 10000))
      val cfg = graft.frontier.FrontierConfig(
        checkpointDir = ck.toString, hostBudget = 50, seenShards = 64,
        outlinksPerUrl = 2, hostPool = hosts, fastMode = true,
        compactEvery = 3)
      val f = new graft.frontier.Frontier(spark, cfg)
      val seedDf = graft.frontier.Frontier
        .syntheticSeeds(spark, seeds, hostPool = hosts)
        .repartition(spark.sparkContext.defaultParallelism)
      f.initialize(seedDf)
      // waves 1-3 are the crawl's startup transient: the one-time cut
      // of the full seed queue (wave 1) and the first compaction
      // (wave 3), which folds the jumbo cut delta into the RANK-banded
      // base. Steady state — the shape a 10^10 crawl spends its life
      // in — starts after it; waves 4-7 cover one mandatory refill
      // pulse, one in-window compaction (wave 6, amortized cost
      // included honestly) and two quiet waves.
      (1 to 3).foreach(_ => f.runWave())
      val t0 = System.nanoTime()
      val rs = (4 to 7).map(_ => f.runWave())
      val perWave = (System.nanoTime() - t0) / 1e9 / 4.0
      (perWave, rs.map(_.scheduled).sum)
    } finally Scratch.delete(ck)
  }

  /** Initialize + two waves over `seeds` synthetic URLs; throughput =
    * (scheduled + deduped) / elapsed across the waves. The synthetic
    * host pool grows with the corpus (real crawls discover more hosts
    * as they widen), so wave size scales with seed count instead of
    * saturating at a fixed politeness ceiling. */
  def run(spark: SparkSession, seeds: Int): FrontierBenchResult = {
    val ck = Scratch.dir("frontier-bench")
    try {
      val cfg = graft.frontier.FrontierConfig(
        checkpointDir = ck.toString, hostBudget = 200, seenShards = 64,
        outlinksPerUrl = 3, hostPool = math.max(2000, seeds / 500),
        fastMode = true)
      val f = new graft.frontier.Frontier(spark, cfg)
      val seedDf = graft.frontier.Frontier
        .syntheticSeeds(spark, seeds, hostPool = math.max(200, seeds / 2000))
        .repartition(spark.sparkContext.defaultParallelism)
      val t0 = System.nanoTime()
      val r0 = f.initialize(seedDf)
      val r1 = f.runWave()
      val r2 = f.runWave()
      val elapsed = (System.nanoTime() - t0) / 1e9
      FrontierBenchResult(r1.scheduled + r2.scheduled,
        r0.deduped + r1.deduped + r2.deduped, elapsed)
    } finally Scratch.delete(ck) // a 8M-seed run leaves ~1.5 GB otherwise
  }
}

/** North-rule scaling evidence: the same frontier job at N vs 4N
  * parallelism. One measurement per JVM (pass cores as arg) — invoke
  * twice and combine:
  *   tools/scalingbench.sh 2 8000000
  *   tools/scalingbench.sh 8 8000000
  * With GRAFT_EXECUTORS=N set, runs on `local-cluster[N,1,memMB]`
  * instead of local[cores]: N REAL executor JVMs (own heap, own GC,
  * netty shuffle) — the faithful in-sandbox stand-in for an N- vs
  * 4N-executor spark-submit cluster. GRAFT_EXEC_MEM_MB sizes each
  * executor (default 2048). Each prints one JSON line. */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val seeds = args.lift(1).map(_.toInt).getOrElse(1000000)
    val execs = sys.env.get("GRAFT_EXECUTORS").map(_.toInt)
    val execCores = sys.env.getOrElse("GRAFT_EXEC_CORES", "4").toInt
    val memMb = sys.env.getOrElse("GRAFT_EXEC_MEM_MB", "8192").toInt
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = execs match {
      case Some(n) =>
        // a production job keeps ONE shuffle-partition setting as the
        // cluster grows N→4N; sizing it to the larger config keeps task
        // granularity identical across both measurements
        val sp = sys.env.getOrElse("GRAFT_SP", "32").toInt
        GraftSession.create(s"local-cluster[$n,$execCores,$memMb]",
          shufflePartitions = sp, benchMode = true, extraConf = Map(
          "spark.executor.extraClassPath" -> classesDir,
          "spark.executor.memory" -> s"${memMb}m",
          // each executor JVM must see only ITS cores: otherwise GC/JIT
          // pools size themselves for the whole 32-hw-thread box in
          // every executor, and N small executors pay an unrealistic
          // thread-storm tax a real N-node cluster never sees
          "spark.executor.extraJavaOptions" -> s"-XX:ActiveProcessorCount=$execCores",
          // short tasks: the default 3 s delay-scheduling wait idles
          // the other executors whenever the preferred one is busy
          "spark.locality.wait" -> "0"))
      case None => GraftSession.create(s"local[$cores]", benchMode = true)
    }
    // always-on utilization accounting: every leg's JSON carries its
    // own occupancy evidence (task_run/task_cpu/driver_cpu) so a
    // polluted draw is detectable from the artifact alone
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskInfo != null) {
          UtilStats.taskRunMs.add(te.taskInfo.duration)
          if (te.taskMetrics != null)
            UtilStats.taskCpuMs.add(te.taskMetrics.executorCpuTime / 1000000L)
        }
      }
    })
    // GRAFT_JOBLOG=1: per-job wall times to stderr (perf forensics)
    if (sys.env.get("GRAFT_JOBLOG").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val epoch = System.nanoTime()
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
            .orElse(j.stageInfos.lastOption.map(_.name.take(120)))
            .getOrElse("?")
          starts.put(j.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
            val now = System.nanoTime()
            // start/end offsets let a consumer rebuild the busy/idle
            // timeline and measure driver-serial gaps between jobs
            System.err.println(
              f"[joblog] job=${j.jobId}%4d ${(now - t0) / 1e9}%6.2fs  " +
                f"s=${(t0 - epoch) / 1e9}%.2f e=${(now - epoch) / 1e9}%.2f  $desc")
          }
        }
        private val stageTaskMs =
          new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val secs = (for (a <- si.completionTime; b <- si.submissionTime) yield (a - b) / 1e3)
            .getOrElse(-1.0)
          val tsum = Option(stageTaskMs.remove(si.stageId)).map(_.sum).getOrElse(0L) / 1e3
          if (secs > 1.0)
            System.err.println(f"[stagelog] stage=${si.stageId}%4d $secs%6.2fs " +
              f"tsum=$tsum%6.2fs tasks=${si.numTasks} ${si.name.take(120)}")
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          // stragglers: a task whose run time would dominate a 4-core
          // stage wall (skew is invisible at 1 core — everything
          // serializes — but halves 4N scaling)
          val ti = te.taskInfo
          if (ti != null)
            stageTaskMs.computeIfAbsent(te.stageId,
              _ => new java.util.concurrent.atomic.LongAdder).add(ti.duration)
          if (ti != null && ti.duration > sys.env.getOrElse("GRAFT_TASKLOG_MS", "4000").toLong) {
            val m = te.taskMetrics
            val gc = if (m != null) m.jvmGCTime else -1L
            val cpu = if (m != null) m.executorCpuTime / 1000000L else -1L
            val fetch = m match {
              case null => -1L
              case mm => mm.shuffleReadMetrics.fetchWaitTime
            }
            System.err.println(f"[tasklog] stage=${te.stageId}%4d task=${ti.index}%4d " +
              f"${ti.duration / 1e3}%6.2fs cpu=${cpu / 1e3}%.1fs gc=${gc / 1e3}%.1fs " +
              f"fetchWait=${fetch / 1e3}%.1fs exec=${ti.executorId}")
          }
        }
      })
    }
    // warm-up (JIT/codegen) — in chunk mode the phase timer starts
    // after this, so chunked and unchunked elapsed are comparable
    FrontierBench.run(spark, seeds = 20000)
    // fixed single-thread calibration: ambient host noise moved
    // single-leg times up to ~1.7x this round, so every measurement
    // self-documents its window (compare calib_ms across legs — a
    // pair is only meaningful when both legs calibrate alike)
    val calibMs = {
      def once(): Double = {
        val t0 = System.nanoTime()
        var h = 1469598103934665603L
        var i = 0
        while (i < 200000000) { h = (h ^ i) * 1099511628211L; i += 1 }
        if (h == 42L) println("") // defeat dead-code elimination
        (System.nanoTime() - t0) / 1e6
      }
      once(); math.min(once(), once())
    }
    val par = execs.getOrElse(cores)
    val mode = if (execs.isDefined) "executors" else "threads"
    if (args.lift(2).contains("deep")) {
      val (perWave, sched) = FrontierBench.runDeep(spark, seeds,
        sys.env.get("GRAFT_DEEP_HOSTS").flatMap(_.toIntOption))
      val line =
        f"""{"metric":"deep_frontier_wave","unit":"sec/wave","mode":"$mode","cores":$par,"pending":$seeds,"sec_per_wave":$perWave%.2f,"scheduled":$sched,"calib_ms":$calibMs%.0f}"""
      println(line)
      BenchOut.write("scalingbench.json", line, append = true)
      spark.stop()
      return
    }
    (args.lift(2), args.lift(3)) match {
      case (Some(ck), phaseOpt @ Some(_)) =>
        // CHUNKED mode for inputs too large for one sandbox invocation:
        // `... <cores> <seeds> <ckdir> init` then `... <ckdir> wave` per
        // wave — each phase in a fresh JVM resuming the shared
        // checkpoint (the manifest protocol makes this exact); sum the
        // per-phase elapsed_sec and counts across invocations.
        val phase = phaseOpt.get
        val cfg = graft.frontier.FrontierConfig(checkpointDir = ck,
          hostBudget = 200, seenShards = 64, outlinksPerUrl = 3,
          hostPool = math.max(2000, seeds / 500), fastMode = true)
        val f = new graft.frontier.Frontier(spark, cfg)
        val t0 = System.nanoTime()
        val r =
          if (phase == "init") {
            val seedDf = graft.frontier.Frontier.syntheticSeeds(spark, seeds,
              hostPool = math.max(200, seeds / 2000))
              .repartition(spark.sparkContext.defaultParallelism)
            f.initialize(seedDf)
          } else f.runWave()
        val el = (System.nanoTime() - t0) / 1e9
        val line =
          f"""{"metric":"frontier_chunk","phase":"$phase","mode":"$mode","cores":$par,"seeds":$seeds,"elapsed_sec":$el%.1f,"scheduled":${r.scheduled},"deduped":${r.deduped},"calib_ms":$calibMs%.0f}"""
        println(line)
        BenchOut.write("scalingbench.json", line, append = true)
      case _ =>
        UtilStats.reset()
        val dcpu0 = UtilStats.driverCpuMs
        val r = FrontierBench.run(spark, seeds = seeds)
        val taskRun = UtilStats.taskRunMs.sum() / 1e3
        val taskCpu = UtilStats.taskCpuMs.sum() / 1e3
        val dcpu = (UtilStats.driverCpuMs - dcpu0) / 1e3
        val line =
          f"""{"metric":"frontier_throughput","unit":"urls/sec","mode":"$mode","cores":$par,"seeds":$seeds,"urls_per_sec":${r.urlsPerSec}%.0f,"elapsed_sec":${r.elapsedSec}%.1f,"scheduled":${r.scheduled},"deduped":${r.deduped},"task_run_sec":$taskRun%.1f,"task_cpu_sec":$taskCpu%.1f,"driver_cpu_sec":$dcpu%.1f,"calib_ms":$calibMs%.0f}"""
        println(line)
        BenchOut.write("scalingbench.json", line, append = true)
    }
    spark.stop()
  }
}
