package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for Spark specs (one JVM-wide session; tests are
  * forked by sbt so this is safe). */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.create("local[4]")
}

trait SparkTestBase { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkTestBase.spark
  def fixturePath(name: String): String =
    getClass.getResource(s"/warcio/$name").getPath
  def sfDir: String = "/root/testdata/sf0.001"
}
