package graft.tools

import graft.{GraftSession, SparkEntry}

/** Profile one SparkEntry query: warm run timings + formatted plan.
  * Usage: runMain graft.tools.QueryProfile <query-name> [sfDir] [runs] */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.create()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
