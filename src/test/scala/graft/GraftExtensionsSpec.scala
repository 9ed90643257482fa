package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared test session is built with
  * spark.sql.extensions=graft.GraftExtensions (see SparkTestBase); the
  * injected functions must resolve without any explicit registration. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {
  test("extension-injected native functions resolve in SQL") {
    val out = spark.sql("SELECT surt_native('https://www.example.com/a?b=1&A=2') AS k")
      .collect().head.getString(0)
    assert(out == "com,example)/a?a=2&b=1")
    val ts = spark.sql("SELECT timestamp14_native('2017-03-06T04:02:06Z') AS t")
      .collect().head.getString(0)
    assert(ts == "20170306040206")
  }
}
