package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query timed on
  * SPARK_GRAFT_SF_DIR, plus the frontier throughput headline (URLs
  * scheduled+deduped/sec — the north-rule metric). Emits ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]")

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
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","frontier_urls_per_sec":${frontier.urlsPerSec}%.0f,"frontier_scheduled":${frontier.scheduled},"frontier_deduped":${frontier.deduped}}""")
    spark.stop()
  }
}

final case class FrontierBenchResult(scheduled: Long, deduped: Long, elapsedSec: Double) {
  def urlsPerSec: Double = (scheduled + deduped) / math.max(elapsedSec, 1e-9)
}

object FrontierBench {
  /** Initialize + two waves over `seeds` synthetic URLs; throughput =
    * (scheduled + deduped) / elapsed across the waves. */
  def run(spark: SparkSession, seeds: Int): FrontierBenchResult = {
    val ck = java.nio.file.Files.createTempDirectory("graft-frontier-bench").toString
    val cfg = graft.frontier.FrontierConfig(
      checkpointDir = ck, hostBudget = 200, seenShards = 64,
      outlinksPerUrl = 3, hostPool = 2000)
    val f = new graft.frontier.Frontier(spark, cfg)
    val seedDf = graft.frontier.Frontier.syntheticSeeds(spark, seeds)
      .repartition(spark.sparkContext.defaultParallelism)
    val t0 = System.nanoTime()
    val r0 = f.initialize(seedDf)
    val r1 = f.runWave()
    val r2 = f.runWave()
    val elapsed = (System.nanoTime() - t0) / 1e9
    FrontierBenchResult(r1.scheduled + r2.scheduled,
      r0.deduped + r1.deduped + r2.deduped, elapsed)
  }
}

/** North-rule scaling evidence: the same frontier job at local[8] vs
  * local[32] (the sandbox proxy for N vs 4N executors). One measurement
  * per JVM (pass cores as arg) — invoke twice and combine:
  *   sbt "runMain graft.ScalingBench 8 1000000"
  *   sbt "runMain graft.ScalingBench 32 1000000"
  * Each prints one JSON line with urls/sec at that parallelism. */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val seeds = args.lift(1).map(_.toInt).getOrElse(1000000)
    val spark = GraftSession.create(s"local[$cores]")
    FrontierBench.run(spark, seeds = 20000) // warm-up (JIT/codegen)
    val r = FrontierBench.run(spark, seeds = seeds)
    println(
      f"""{"metric":"frontier_throughput","unit":"urls/sec","cores":$cores,"seeds":$seeds,"urls_per_sec":${r.urlsPerSec}%.0f,"elapsed_sec":${r.elapsedSec}%.1f,"scheduled":${r.scheduled},"deduped":${r.deduped}}""")
    spark.stop()
  }
}
