package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for a set of SparkEntry queries into
  * files (the plans/rNN before/after artifact).
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>
  * Writes <outDir>/<query>_<suffix>.txt. Constructing a staged query
  * performs its staging writes (needed — later plan nodes read the
  * staged parquet). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.create(benchMode = true)
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote $n")
      } catch {
        case e: Exception => System.err.println(s"[plandump] $n failed: $e")
      }
    }
    spark.stop()
  }
}
