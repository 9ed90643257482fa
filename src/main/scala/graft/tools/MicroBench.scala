package graft.tools
import graft.GraftSession
import org.apache.spark.sql.functions._
/** Internal probe: does pure UDF compute scale with cores? */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.create(s"local[$cores]")
    import spark.implicits._
    val df = spark.range(n).select(
      concat(lit("https://www.host"), (col("id") % 5000).cast("string"),
        lit(".example.org/p/"), col("id").cast("string"), lit("?b=2&a=1")).as("url"))
    // warmup
    df.limit(100000).select(graft.Functions.surt(col("url"))).agg(count(lit(1))).collect()
    val t0 = System.nanoTime()
    df.select(graft.Functions.surt(col("url")).as("s")).agg(max(length(col("s")))).collect()
    val el = (System.nanoTime()-t0)/1e9
    println(f"""{"cores":"$cores","n":$n,"surt_per_sec":${n/el}%.0f,"sec":$el%.1f}""")
    spark.stop()
  }
}
