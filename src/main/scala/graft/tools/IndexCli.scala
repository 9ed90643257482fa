package graft.tools

import graft.GraftSession
import graft.operators.CdxPipeline

/** CLI parity surface with the reference's `index` / `cdx-index`
  * commands (/root/reference/src/commands/main.ts): distributed scan +
  * index, output printed in file order (per-file order is exact; file
  * order follows the argument order via the sort key).
  *
  * Usage: runMain graft.tools.IndexCli [--format cdxj|cdx|json] [--all] <warc files…>
  */
object IndexCli {
  def main(args: Array[String]): Unit = {
    var format = "json"
    var all = false
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--format" => format = args(i + 1); i += 2
        case "--all"    => all = true; i += 1
        case f          => files += f; i += 1
      }
    }
    require(files.nonEmpty, "usage: IndexCli [--format cdxj|cdx|json] [--all] <warc files…>")
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
    val lines =
      if (format == "json") CdxPipeline.indexLines(spark, files.toSeq)
      else CdxPipeline.cdxLines(spark, files.toSeq, format = format, all = all)
    lines.collect().foreach(println)
    spark.stop()
  }
}
