package graft.tools
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[4]")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    spark.stop()
  }
}
