package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration. Local mode
  * mirrors the cluster layout: shuffle partitions sized to cores (not
  * 200), AQE on for runtime skew handling. */
object GraftSession {
  def create(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
             shufflePartitions: Int = -1): SparkSession = {
    val cores = "local\\[(\\d+)\\]".r.findFirstMatchIn(master).map(_.group(1).toInt).getOrElse(32)
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-warc-engine")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: spark.driver.memory cannot be set here — in local mode the
      // JVM is already running; the heap comes from build.sbt's fork
      // javaOptions (-Xmx) or spark-submit --driver-memory on a cluster.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.registerAll(spark)
    spark
  }
}
