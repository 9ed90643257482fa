package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class WarcDataSourceSpec extends AnyFunSuite with SparkTestBase {

  test("format(\"warc\") reads fixtures with offset/length parity") {
    val df = spark.read.format("warc").load(fixturePath("example.warc.gz"))
    val rows = df.select("offset", "length", "warcType")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toVector
    assert(rows == Vector(
      (0L, 353L, "warcinfo"), (353L, 431L, "warcinfo"),
      (784L, 1228L, "response"), (2012L, 609L, "request"),
      (2621L, 586L, "revisit"), (3207L, 609L, "request")))
  }

  test("v2 scan agrees with the v1 binaryFile scan") {
    val v2 = spark.read.format("warc").load(fixturePath("example.warc")).collect()
    val v1 = WarcScan.warcRecords(spark, Seq(fixturePath("example.warc"))).toDF().collect()
    assert(v2.length == v1.length)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("offset"), r.getAs[String]("warcType"), r.getAs[String]("recordId"))
    assert(v2.map(key).toSet == v1.map(key).toSet)
  }

  test("column pruning reaches the scan (payload not materialized)") {
    val df = spark.read.format("warc").load(fixturePath("example.warc.gz"))
      .select("offset", "warcType")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=offset,warcType") || !plan.contains("payload"),
      s"payload not pruned:\n$plan")
    assert(df.count() == 6)
  }

  test("warcType filter pushes down into the scan") {
    val df = spark.read.format("warc").load(fixturePath("example.warc.gz"))
      .filter(col("warcType") === "response")
    val desc = df.queryExecution.executedPlan.toString
    assert(df.count() == 1)
    assert(desc.contains("typeFilter=response"), s"filter not pushed:\n$desc")
  }

  test("range splits: oversized .warc.gz scanned by many tasks, byte-exact offsets") {
    import graft.core.WarcWriter
    val dir = graft.Scratch.dir("warcsplit")
    val bytes = (0 until 120).map { i =>
      val payload = (s"doc $i " + "z" * 800).getBytes("UTF-8")
      val r = WarcWriter.create(url = s"https://ex.org/p/$i", date = "2020-01-01T00:00:00Z",
        warcType = "resource", payload = payload,
        recordId = f"00000000-0000-0000-0000-$i%012d")
      WarcWriter.serialize(r, WarcWriter.CdxDigest, gzip = true)
    }.reduce(_ ++ _)
    val f = dir.resolve("big.warc.gz")
    java.nio.file.Files.write(f, bytes)

    val whole = spark.read.format("warc").load(f.toString)
      .select("offset", "length", "recordId").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val split = spark.read.format("warc").option("splitSize", "4096")
      .load(f.toString)
    assert(split.rdd.getNumPartitions > 1,
      s"expected >1 partitions for a ${bytes.length}-byte file at splitSize=4096")
    val splitRows = split.select("offset", "length", "recordId").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(splitRows.length == 120, "split scan duplicated or dropped records")
    assert(splitRows.toSet == whole, "split offsets/lengths differ from whole-file scan")
  }

  test("multi-file load unions per-file partitions") {
    val df = spark.read.format("warc")
      .load(fixturePath("example.warc.gz"), fixturePath("example-resource.warc.gz"))
    assert(df.select("filename").distinct().count() == 2)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("directory load resolves through Hadoop FS, including a file: URI") {
    val dir = graft.Scratch.dir("warcdirload")
    val src = java.nio.file.Paths.get(fixturePath("example.warc.gz"))
    java.nio.file.Files.copy(src, dir.resolve("a.warc.gz"))
    java.nio.file.Files.copy(src, dir.resolve("b.warc.gz"))
    val plain = spark.read.format("warc").load(dir.toString)
    assert(plain.select("filename").distinct().count() == 2)
    val viaUri = spark.read.format("warc").load("file:" + dir.toString)
    assert(viaUri.count() == plain.count())
  }
}

class LenientScanSpec extends org.scalatest.funsuite.AnyFunSuite with graft.SparkTestBase {
  test("lenient scan skips a corrupt file instead of failing the job") {
    val dir = graft.Scratch.dir("lenient")
    val good = java.nio.file.Paths.get(fixturePath("example.warc.gz"))
    java.nio.file.Files.copy(good, dir.resolve("good.warc.gz"))
    // truncated gzip: invalid member
    val corrupt = java.nio.file.Files.readAllBytes(good).take(100)
    java.nio.file.Files.write(dir.resolve("bad.warc.gz"), corrupt)
    val rows = WarcScan.warcRecords(spark, Seq(dir.toString)).collect()
    assert(rows.length == 6) // only the good file's records
    assert(rows.forall(_.filename == "good.warc.gz"))
  }
}
