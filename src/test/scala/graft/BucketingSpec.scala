package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing the CDX-style table by its
  * join key removes the exchange on BOTH sides — the storage-layout
  * lever for repeated large-table joins at 100 TB. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // a fresh derby metastore won't know about stale dirs from previous
    // JVMs — remove the locations directly
    for (t <- Seq("orders_b", "customer_b")) {
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }

    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")

    val joined = spark.table("orders_b").hint("merge") // force SMJ (small dims would broadcast)
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: SortMergeJoin with zero Exchange below it
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // correctness vs the plain (shuffling) join
    val expect = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }
}
