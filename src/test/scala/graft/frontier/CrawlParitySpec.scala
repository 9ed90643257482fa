package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import java.nio.file.Files

/** North-rule comparator: the distributed frontier must reproduce the
  * sequential reference crawler's ordering + seen membership exactly,
  * under the same seed list + politeness budget. */
class CrawlParitySpec extends AnyFunSuite with SparkTestBase {

  test("distributed schedule == sequential reference schedule, 3 waves") {
    parityRun("crawl-parity", FrontierConfig(
      checkpointDir = graft.Scratch.dir("crawl-parity").toString,
      hostBudget = 4, seenShards = 8, outlinksPerUrl = 3, hostPool = 60), waves = 3)
  }

  test("refill stress: headMult=1 (refill every wave) still matches the reference, 5 waves") {
    // M = hostBudget: every scheduled host drains its whole head each
    // wave and must refill from the bucketed backlog before the next —
    // the maximum-traffic path through fence raises + stale-copy
    // filtering. Exactness must be bit-identical to the sequential
    // reference anyway.
    parityRun("crawl-parity-refill", FrontierConfig(
      checkpointDir = graft.Scratch.dir("crawl-parity-refill").toString,
      hostBudget = 4, headMult = 1, backlogBuckets = 8,
      seenShards = 8, outlinksPerUrl = 3, hostPool = 60), waves = 5)
  }

  private def parityRun(name: String, cfg: FrontierConfig, waves: Int): Unit = {

    // identical seed list on both sides
    val seedRows = Frontier.syntheticSeeds(spark, 1000).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq

    val sim = new ReferenceCrawler.Sim(cfg)
    sim.initialize(seedRows)

    val f = new Frontier(spark, cfg)
    import spark.implicits._
    f.initialize(seedRows.toDF("url", "priority"))

    for (wave <- 1 to waves) {
      val expect = sim.runWave().map { case (e, rank) =>
        (e.priority, e.host, e.surtKey, rank)
      }
      f.runWave()
      val got = f.scheduledDf(wave)
        .select("priority", "host", "surt_key", "rank_in_host")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2, t._3)).toVector
      assert(got == expect, s"wave $wave schedule differs from reference")
    }

    // URL-seen membership identical
    val engineSeen = f.seenDf(waves).collect().map(_.getString(0)).toSet
    assert(engineSeen == sim.seenSet, "seen membership differs from reference")
  }
}

class WarcSinkSpec extends AnyFunSuite with SparkTestBase {
  test("distributed WARC sink: write then rescan round-trips records") {
    import graft.sources.{WarcScan, WarcSink}
    val src = WarcScan.warcRecords(spark, Seq(fixturePath("example.warc.gz")))
    val outDir = graft.Scratch.dir("warcsink").toString
    WarcSink.write(src.repartition(2), outDir)
    val files = new java.io.File(outDir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.nonEmpty)
    val back = WarcScan.warcRecords(spark, files.map(_.getPath).toSeq)
    val origKey = src.collect().map(r => (r.recordId, r.warcType, r.targetUri,
      Option(r.payload).map(_.length).getOrElse(0))).toSet
    val backKey = back.collect().map(r => (r.recordId, r.warcType, r.targetUri,
      Option(r.payload).map(_.length).getOrElse(0))).toSet
    assert(backKey == origKey)
    // payload digests preserved verbatim through the sink
    val origDig = src.collect().flatMap(r => Option(r.payloadDigest)).toSet
    val backDig = back.collect().flatMap(r => Option(r.payloadDigest)).toSet
    assert(backDig == origDig)
  }
}
