package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

class SeenFilterSpec extends AnyFunSuite {
  test("cuckoo filter: no false negatives, low false positives, serialization") {
    val keys = (0 until 5000).map(i => s"com,example)/page/$i")
    val c = SeenFilter.Cuckoo.create(5000)
    keys.foreach(k => assert(c.insert(k)))
    keys.foreach(k => assert(c.mightContain(k), s"false negative for $k"))
    val fp = (5000 until 15000).count(i => c.mightContain(s"com,example)/page/$i"))
    assert(fp < 50, s"cuckoo FP rate too high: $fp/10000")
    val round = SeenFilter.Cuckoo.deserialize(c.serialize())
    keys.foreach(k => assert(round.mightContain(k)))
  }

  test("bloom fallback: no false negatives") {
    val b = SeenFilter.Bloom.create(1000)
    val keys = (0 until 1000).map(i => SeenFilter.hashKey(s"k$i"))
    keys.foreach(b.insertHash)
    keys.foreach(k => assert(b.mightContainHash(k)))
    val fp = (1000 until 11000).count(i => b.mightContainHash(SeenFilter.hashKey(s"k$i")))
    assert(fp < 200, s"bloom FP rate too high: $fp/10000")
  }

  test("cuckoo insert failure rolls back: no previously-inserted key lost") {
    val c = SeenFilter.Cuckoo.create(16) // tiny, forced to overflow
    val inserted = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var sawFailure = false
    while (i < 100000 && !sawFailure) {
      val h = SeenFilter.hashKey(s"rollback$i")
      if (c.insertHash(h)) inserted += h else sawFailure = true
      i += 1
    }
    assert(sawFailure, "tiny cuckoo should eventually reject an insert")
    // a failed insert must leave the table untouched — a dropped victim
    // fingerprint would be a false negative (seen URL re-scheduled)
    inserted.foreach(h => assert(c.mightContainHash(h), "rollback lost a key"))
    (0 until 1000).foreach(j => c.insertHash(SeenFilter.hashKey(s"extra$j")))
    inserted.foreach(h => assert(c.mightContainHash(h), "later failure lost a key"))
  }

  test("updateShardChainHashes: streaming inserts, chain grows, no false negatives") {
    var chain: Seq[Array[Byte]] = Seq.empty
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    for (w <- 0 until 5) {
      val keys = (0 until 3000).map(i => s"w$w-k$i")
      all ++= keys
      chain = SeenFilter.updateShardChainHashes(chain, keys.iterator.map(SeenFilter.hashKey))
    }
    all.foreach(k => assert(SeenFilter.mightContainChain(chain, k), s"chain lost $k"))
    assert(chain.length >= 2, "chain should have appended blobs on overflow")
    val fp = (0 until 10000).count(i => SeenFilter.mightContainChain(chain, s"absent$i"))
    assert(fp < 100, s"chain FP rate too high: $fp/10000")
  }

  test("buildShard: cuckoo primary, bloom fallback on overflow") {
    val shard = SeenFilter.buildShard(Iterator("a", "b", "c"), 3)
    assert(java.nio.ByteBuffer.wrap(shard).getInt() == 0x43554b31)
    assert(SeenFilter.mightContain(shard, "a"))
    assert(!SeenFilter.mightContain(shard, "zzz"))
    // overflow: expected=4 buckets but many keys → falls back to bloom
    val keys = (0 until 100000).map(i => s"key$i")
    val forced = {
      val cuckoo = SeenFilter.Cuckoo.create(16)
      var ok = true
      val it = keys.iterator
      while (ok && it.hasNext) ok = cuckoo.insertHash(SeenFilter.hashKey(it.next()))
      ok
    }
    assert(!forced, "tiny cuckoo should overflow")
  }
}

class FrontierSpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(name: String): String = {
    val p = graft.Scratch.dir(s"frontier-$name")
    p.toString
  }

  private def runWaves(dirName: String, waves: Int, partitions: Int): (Frontier, Vector[WaveResult]) = {
    val cfg = FrontierConfig(checkpointDir = tmpDir(dirName), hostBudget = 5, seenShards = 16)
    val f = new Frontier(spark, cfg)
    val seeds = Frontier.syntheticSeeds(spark, 2000).repartition(partitions)
    val r0 = f.initialize(seeds)
    val rs = (1 to waves).map(_ => f.runWave()).toVector
    (f, r0 +: rs)
  }

  test("waves run, schedule under budget, seen set grows monotonically") {
    val (f, rs) = runWaves("basic", 3, 8)
    assert(rs.last.wave == 3)
    // budget respected
    for (w <- 1 to 3) {
      val sched = f.scheduledDf(w)
      val perHost = sched.groupBy("host").count().collect()
      assert(perHost.forall(_.getLong(1) <= 5), "host budget violated")
      assert(sched.count() > 0)
    }
    // seen grows, includes all scheduled
    assert(rs(2).seenTotal >= rs(1).seenTotal)
    val seen3 = f.seenDf(3).collect().map(_.getString(0)).toSet
    val sched2 = f.scheduledDf(2).select("surt_key").collect().map(_.getString(0)).toSet
    assert(sched2.subsetOf(seen3))
  }

  test("determinism: same seed + budget → identical schedule at different parallelism") {
    val (f1, _) = runWaves("det1", 2, 2)
    val (f2, _) = runWaves("det2", 2, 16)
    for (w <- 1 to 2) {
      val a = f1.scheduledDf(w).select("surt_key", "priority", "rank_in_host")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toVector
      val b = f2.scheduledDf(w).select("surt_key", "priority", "rank_in_host")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toVector
      assert(a == b, s"wave $w schedule differs across parallelism")
    }
    val s1 = f1.seenDf(2).collect().map(_.getString(0)).toSet
    val s2 = f2.seenDf(2).collect().map(_.getString(0)).toSet
    assert(s1 == s2, "seen membership differs across parallelism")
  }

  test("no URL is ever scheduled twice (seen-set correctness)") {
    val (f, _) = runWaves("noredo", 4, 8)
    val all = (1 to 4).flatMap(w => f.scheduledDf(w).select("surt_key").collect().map(_.getString(0)))
    assert(all.size == all.toSet.size, "a surt_key was scheduled in two waves")
  }

  test("robots: /private paths on blocked hosts never scheduled") {
    val (f, _) = runWaves("robots", 3, 8)
    for (w <- 1 to 3) {
      val bad = f.scheduledDf(w)
        .collect()
        .filter { r =>
          val host = r.getAs[String]("host")
          val url = r.getAs[String]("canonical_url")
          url.contains("/private") &&
            java.lang.Math.floorMod(SeenFilter.hashKey(host), 5L) == 0L
        }
      assert(bad.isEmpty, s"robots-disallowed URL scheduled in wave $w")
    }
  }

  test("exactly-once resume: delete later state, resume reproduces identical wave") {
    val cfg = FrontierConfig(checkpointDir = tmpDir("resume"), hostBudget = 5, seenShards = 16)
    val f = new Frontier(spark, cfg)
    f.initialize(Frontier.syntheticSeeds(spark, 2000))
    f.runWave(); f.runWave()
    val wave2 = f.scheduledDf(2).select("surt_key", "rank_in_host")
      .collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._1).toVector

    // simulate crash mid-wave-2: remove the manifest (uncommitted) and
    // corrupt its outputs; the engine must redo wave 2 identically
    Files.delete(Paths.get(cfg.checkpointDir, "MANIFEST-2.json"))
    def rmRec(p: Path): Unit = if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    rmRec(Paths.get(cfg.checkpointDir, "scheduled", "wave=2"))
    rmRec(Paths.get(cfg.checkpointDir, "seen", "wave=2"))
    rmRec(Paths.get(cfg.checkpointDir, "frontier", "wave=2"))

    assert(f.latestCommittedWave() == 1)
    val redo = f.runWave()
    assert(redo.wave == 2)
    val wave2redo = f.scheduledDf(2).select("surt_key", "rank_in_host")
      .collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._1).toVector
    assert(wave2 == wave2redo, "resumed wave 2 differs from original")
  }

  test("real robots table: RFC-9309 gate + crawl-delay budget cap inside the wave") {
    import spark.implicits._
    val cfg = FrontierConfig(checkpointDir = tmpDir("realrobots"), hostBudget = 5,
      seenShards = 8, waveWindowSec = 6)
    // every synthetic host gets the same robots: /seed paths with an odd
    // doc index disallowed; crawl-delay 3 caps the budget at 6/3 = 2
    val seeds = Frontier.syntheticSeeds(spark, 400)
    val hosts = {
      val f0 = new Frontier(spark, FrontierConfig(checkpointDir = tmpDir("realrobots-probe")))
      f0.initialize(seeds)
      f0.pendingDf(0).select("host").distinct().as[String].collect().toSeq
    }
    val robots = hosts.map(h =>
      (h, "User-agent: *\nDisallow: /seed/1\nCrawl-delay: 3\n")).toDF("host", "robots_txt")
    val f = new Frontier(spark, cfg, robots = Some(robots))
    f.initialize(seeds)
    f.runWave()
    val sched = f.scheduledDf(1)
    // robots: no scheduled path starts with /seed/1
    val bad = sched.filter(
      org.apache.spark.sql.functions.col("canonical_url").rlike("://[^/]+/seed/1")).count()
    assert(bad == 0, "robots-disallowed path scheduled")
    // crawl-delay: per-host budget capped at waveWindowSec/delay = 2 (< hostBudget 5)
    val maxPerHost = sched.groupBy("host").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPerHost <= 2, s"crawl-delay cap violated: $maxPerHost")
    assert(sched.count() > 0)
  }

  test("hot-host skew: zipf head host bounded by budget, salting active") {
    val (f, _) = runWaves("skew", 2, 8)
    val sched = f.scheduledDf(2)
    val byHost = sched.groupBy("host").count().orderBy(org.apache.spark.sql.functions.desc("count"))
      .collect()
    assert(byHost.head.getLong(1) <= 5)
    // frontier itself accumulates the skew (host0 gets the zipf mass)
    val pending = spark.read.parquet(cfg2Path(f) + "/frontier/wave=2")
    val pendingByHost = pending.groupBy("host").count()
      .orderBy(org.apache.spark.sql.functions.desc("count")).collect()
    assert(pendingByHost.head.getLong(1) > pendingByHost.last.getLong(1))
  }

  private def cfg2Path(f: Frontier): String = {
    val field = classOf[Frontier].getDeclaredField("cfg")
    field.setAccessible(true)
    field.get(f).asInstanceOf[FrontierConfig].checkpointDir
  }
}
