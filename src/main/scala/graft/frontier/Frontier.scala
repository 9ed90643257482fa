package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Functions
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The crawl frontier + fetch scheduler (north rule, BASELINE.json).
  *
  * A wave is one iterative batch round:
  *   candidates (pending ∪ discovered)
  *     → canonicalize (WHATWG normalize) → SURT key → host
  *     → in-batch dedup (groupBy surt, deterministic min)
  *     → seen-set subtraction: partitioned cuckoo/bloom shard PREFILTER
  *       (candidates cogroup with their shard's filter chain executor-
  *       side; the driver holds no filter state) + exact anti-join on
  *       survivors — approximate filters can never drop a URL
  *       incorrectly, they only shrink the join
  *     → robots filter (broadcast rules)
  *     → per-host politeness budget: two-phase top-K (salted local top-K
  *       then host-level top-K) so one hot host cannot skew a partition
  *     → scheduled wave, committed with an atomic manifest; seen +
  *       frontier + per-partition lineage metrics checkpointed
  *
  * Determinism: every ordering is total — (priority, surt_key) with surt
  * as the tiebreak — so the same seed list + budget reproduce the same
  * schedule and seen membership at ANY parallelism. Exactly-once resume:
  * a wave exists iff its manifest file exists; outputs are idempotent
  * overwrites, so a crash between writes re-runs the wave with identical
  * results.
  *
  * Scale notes (10^10 URLs): seen shards are hash-partitioned by
  * `pmod(hash(surt), shards)`; at 10^10 keys and 4096 shards each shard
  * holds ~2.4M fingerprints (~10 MB cuckoo) — executors hold only probed
  * shards. The exact anti-join shuffles only filter-positive candidates
  * (~FP-rate of the batch). Hot hosts are bounded by the salt phase
  * before any host-level shuffle.
  */
final case class FrontierConfig(
    checkpointDir: String,
    hostBudget: Int = 8, // fetches per host per wave
    // salt width bounds the hottest (host, salt) window group at
    // ~hottest-host/salt rows; 32 keeps a 5%-of-wave Zipf head host
    // from serializing one reducer (phase-2 input stays ≤ salt*budget
    // rows per host, so a wider salt costs almost nothing)
    salt: Int = 32,
    seenShards: Int = 64,
    outlinksPerUrl: Int = 3,
    hostPool: Int = 200, // synthetic outlink host universe
    seed: Long = 42L,
    agent: String = "graft", // user-agent for robots group selection
    waveWindowSec: Int = 60, // politeness window a wave's budget paces over
    /** bench mode: skip observability-only jobs (sorted user-facing
      * write, per-partition metrics, state count reports) — semantics
      * unchanged. Defaults from the GRAFT_BENCH env for CLI runs. */
    fastMode: Boolean = sys.env.get("GRAFT_BENCH").contains("1")
)

final case class WaveResult(
    wave: Int,
    candidates: Long,
    deduped: Long,
    fresh: Long,
    allowed: Long,
    scheduled: Long,
    seenTotal: Long,
    pendingTotal: Long,
    elapsedSec: Double
)

class Frontier(spark: SparkSession, cfg: FrontierConfig,
               /** optional real robots table (host, robots_txt); when
                 * absent the deterministic synthetic rule applies */
               robots: Option[DataFrame] = None) {
  import spark.implicits._
  Functions.registerAll(spark)

  private def dir(parts: String*): String = (cfg.checkpointDir +: parts).mkString("/")

  // ----------------------------------------------------------------
  // URL canonicalization + keys
  // ----------------------------------------------------------------

  /** url → (surt_key, canonical_url, host); unparseable URLs dropped.
    * Single fused UDF (one parse, one string-conversion boundary). */
  private def canonicalized(urls: DataFrame): DataFrame =
    urls
      .withColumn("c", call_udf("canon_all", col("url")))
      .withColumn("canonical_url", col("c._1"))
      .withColumn("surt_key", col("c._2"))
      .withColumn("host", col("c._3"))
      .drop("c")
      .filter(col("host").isNotNull && col("surt_key").isNotNull)

  // ----------------------------------------------------------------
  // Seen-set shards
  // ----------------------------------------------------------------

  /** Incrementally maintained filter-shard chains: each wave inserts
    * only the NEW keys into its shard's chain — O(fresh) maintenance,
    * not O(seen) (SeenFilter.updateShardChainHashes appends a blob on
    * overflow). Cogroup, not collect_list: a hot wave's keys STREAM
    * through the insert loop instead of riding one giant array row
    * through the shuffle. `prevShards` may be empty (wave 0). */
  private def updateShards(prevShards: DataFrame, newKeys: DataFrame): DataFrame = {
    val n = cfg.seenShards
    val keysByShard = newKeys.select(col("surt_key")).as[String]
      .groupByKey(k => java.lang.Math.floorMod(SeenFilter.hashKey(k), n.toLong).toInt)
    val prevByShard = prevShards.as[(Int, Seq[Array[Byte]])].groupByKey(_._1)
    keysByShard.cogroup(prevByShard) { (shard, ks, ps) =>
      val prev = ps.flatMap(_._2).toSeq
      Iterator.single(
        (shard, SeenFilter.updateShardChainHashes(prev, ks.map(SeenFilter.hashKey))))
    }.toDF("shard", "filters")
  }

  /** Union of per-wave seen DELTAS for waves 0..wave. Seen state is
    * stored as deltas — each wave persists ONLY its fresh keys — so
    * per-wave seen maintenance writes O(fresh), not O(total seen) (at
    * 10^10 URLs a full rewrite would move ~1 TB of key strings every
    * wave). The explicit schema skips footer sampling, so an
    * uncommitted (crashed) later wave's partial files are never
    * touched: partition pruning on `wave` drops them at planning. */
  private def seenUpTo(wave: Int): DataFrame = {
    import org.apache.spark.sql.types.{StructType, StructField, StringType}
    spark.read.schema(StructType(Seq(StructField("surt_key", StringType))))
      .parquet(dir("seen"))
      .where(col("wave") <= wave)
      .select("surt_key")
  }

  private def emptyShards(): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("shard", IntegerType),
        StructField("filters", ArrayType(BinaryType)))))
  }

  /** Split candidates into definitely-new vs maybe-seen, then
    * exact-anti-join only the maybe side (approximate filters can never
    * drop a URL — they only shrink the exact join's probe side).
    *
    * EXECUTOR-SIDE probe: candidates and filter shards cogroup on shard
    * id, so each task parses only its own shard's chain and streams its
    * candidates through it. The driver holds NO filter state and the
    * full filter set is never broadcast — per-task memory is
    * O(seen/shards) at ANY seen-set size (at 10^10 URLs / 4096 shards
    * that is ~6 MB of cuckoo tables per task, vs a ~25 GB driver
    * collect+broadcast per wave in the naive design). */
  private def subtractSeen(cands: DataFrame, seen: DataFrame, shards: DataFrame): DataFrame = {
    val n = cfg.seenShards
    val candT = cands
      .select(col("surt_key"), col("canonical_url"), col("host"),
        col("priority").cast("int"))
      .as[(String, String, String, Int)]
    val candByShard = candT.groupByKey(c =>
      java.lang.Math.floorMod(SeenFilter.hashKey(c._1), n.toLong).toInt)
    val shardByShard = shards.as[(Int, Seq[Array[Byte]])].groupByKey(_._1)
    val flagged = candByShard.cogroup(shardByShard) { (_, cs, ss) =>
      val probes = ss.flatMap(_._2).map(SeenFilter.parse).toArray
      if (probes.isEmpty) cs.map(c => (c._1, c._2, c._3, c._4, false))
      else cs.map { c =>
        val h = SeenFilter.hashKey(c._1)
        var maybe = false
        var i = 0
        while (!maybe && i < probes.length) {
          maybe = probes(i).mightContainHash(h); i += 1
        }
        (c._1, c._2, c._3, c._4, maybe)
      }
    }.toDF("surt_key", "canonical_url", "host", "priority", "maybe_seen")
    // the cogroup exchange is planned once and reused across both branches
    val definitelyNew = flagged.filter(!col("maybe_seen")).drop("maybe_seen")
    val maybe = flagged.filter(col("maybe_seen")).drop("maybe_seen")
    val verified = maybe.join(seen.select("surt_key"), Seq("surt_key"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  // ----------------------------------------------------------------
  // Robots / politeness
  // ----------------------------------------------------------------

  /** Robots gate. With a real robots table (`robots`: host,
    * robots_txt) the rules are parsed once per host and broadcast
    * (Robots.applyRobots — RFC 9309 longest-match semantics) against
    * the URL path. Without one, the deterministic synthetic rule
    * (every 5th host by hash disallows /private) keeps benches and
    * oracles reproducible. */
  private def applyRobots(df: DataFrame): DataFrame = robots match {
    case Some(r) =>
      val pathOf = udf((url: String) =>
        url.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "") match {
          case "" => "/"
          case p  => p
        })
      Robots.applyRobots(df.withColumn("__path", pathOf(col("canonical_url"))),
          r, "host", "__path", agent = cfg.agent)
        .drop("__path")
    case None =>
      val disallowed = udf((host: String, url: String) => {
        val blocked = java.lang.Math.floorMod(SeenFilter.hashKey(host), 5L) == 0L
        blocked && url.contains("/private")
      })
      df.filter(!disallowed(col("host"), col("canonical_url")))
  }

  /** Two-phase per-host top-K with salting (hot-host skew control).
    * With a robots table, a host's Crawl-delay shrinks its budget to
    * floor(waveWindowSec / delay) — politeness pacing expressed as a
    * per-wave cap (broadcast join of the tiny per-host delay table). */
  private def hostBudget(df: DataFrame): DataFrame = {
    val k = cfg.hostBudget
    // literal budget when no robots table: the per-host k_eff column is
    // only materialized on the robots path, so the common path keeps
    // its constant-folded filters
    val (withK, kCol) = robots match {
      case Some(r) =>
        val delays = Robots.crawlDelays(r, cfg.agent)
          .select(col("host"),
            least(lit(k), greatest(lit(1),
              floor(lit(cfg.waveWindowSec) / col("crawl_delay")).cast("int"))).as("k_eff"))
        (df.join(broadcast(delays), Seq("host"), "left")
          .withColumn("k_eff", coalesce(col("k_eff"), lit(k))), col("k_eff"))
      case None => (df, lit(k))
    }
    val salted = withK.withColumn("salt", pmod(hash(col("surt_key")), lit(cfg.salt)))
    val w1 = Window.partitionBy(col("host"), col("salt"))
      .orderBy(col("priority"), col("surt_key"))
    val local = salted.withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= kCol)
    val w2 = Window.partitionBy(col("host")).orderBy(col("priority"), col("surt_key"))
    val out = local.withColumn("rank_in_host", row_number().over(w2))
      .filter(col("rank_in_host") <= kCol)
      .drop("salt", "rn1")
    if (robots.isDefined) out.drop("k_eff") else out
  }

  // ----------------------------------------------------------------
  // Synthetic discovery (outlinks) — deterministic, Zipf-skewed hosts
  // ----------------------------------------------------------------

  private def discoverOutlinks(scheduled: DataFrame): DataFrame = {
    val n = cfg.outlinksPerUrl
    val pool = cfg.hostPool
    val seed = cfg.seed
    val gen = udf((surt: String) => {
      val h0 = SeenFilter.hashKey(surt + ":" + seed)
      (0 until n).map { i =>
        val h = SeenFilter.hashKey(surt + "#" + i)
        // Zipf-ish skew: cube of uniform concentrates on low host ids
        val u = (java.lang.Math.floorMod(h, 1000000L)) / 1000000.0
        val hostId = (pool * u * u * u).toInt
        val path = java.lang.Math.floorMod(h ^ h0, 100000L)
        val priv = if (java.lang.Math.floorMod(h, 7L) == 0L) "/private" else ""
        (s"https://www.host$hostId.example.org$priv/p/$path?x=1",
          java.lang.Math.floorMod(h, 100L).toInt)
      }
    })
    scheduled.select(explode(gen(col("surt_key"))).as("link"))
      .select(col("link._1").as("url"), col("link._2").as("priority"))
  }

  // ----------------------------------------------------------------
  // Checkpointing
  // ----------------------------------------------------------------

  private def manifestPath(wave: Int): java.nio.file.Path =
    Paths.get(dir(s"MANIFEST-$wave.json"))

  def latestCommittedWave(): Int = {
    val d = Paths.get(cfg.checkpointDir)
    if (!Files.exists(d)) return -1
    val re = "MANIFEST-(\\d+)\\.json".r
    val it = Files.list(d).iterator()
    var best = -1
    while (it.hasNext) {
      it.next().getFileName.toString match {
        case re(n) => best = math.max(best, n.toInt)
        case _     =>
      }
    }
    best
  }

  private def commit(wave: Int, result: WaveResult): Unit = {
    val json =
      s"""{"wave":$wave,"candidates":${result.candidates},"deduped":${result.deduped},
         |"fresh":${result.fresh},"allowed":${result.allowed},"scheduled":${result.scheduled},
         |"seen_total":${result.seenTotal},"pending_total":${result.pendingTotal},
         |"elapsed_sec":${result.elapsedSec}}""".stripMargin.replace("\n", "")
    val tmp = Paths.get(dir(s".MANIFEST-$wave.tmp"))
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(wave), StandardCopyOption.ATOMIC_MOVE)
  }

  // ----------------------------------------------------------------
  // Waves
  // ----------------------------------------------------------------

  /** Initialize state from a seed URL list (DataFrame with url,
    * priority). Commits wave 0 (nothing scheduled yet). */
  def initialize(seeds: DataFrame): WaveResult = {
    val t0 = System.nanoTime()
    val debug = sys.env.get("GRAFT_DEBUG").contains("1")
    var tPhase = t0
    def phase(name: String): Unit = if (debug) {
      val now = System.nanoTime()
      System.err.println(f"[frontier] init $name: ${(now - tPhase) / 1e9}%.2fs")
      tPhase = now
    }
    val canon = canonicalized(seeds)
      .groupBy("surt_key")
      .agg(min("priority").as("priority"),
        min("canonical_url").as("canonical_url"), min("host").as("host"))
    val pending = canon.select("surt_key", "canonical_url", "host", "priority")
    // count observed on the write job itself — no read-back count job
    val obs = org.apache.spark.sql.Observation()
    pending.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(dir("frontier", "wave=0"))
    phase("frontier write")
    // seen = surt_key projection of the JUST-WRITTEN frontier: a
    // single-column parquet read, not a recompute of the whole
    // canonicalize+dedup DAG (which would double init cost)
    spark.read.parquet(dir("frontier", "wave=0")).select("surt_key")
      .write.mode("overwrite").parquet(dir("seen", "wave=0"))
    phase("seen write")
    updateShards(emptyShards(), spark.read.parquet(dir("seen", "wave=0")))
      .write.mode("overwrite").parquet(dir("shards", "wave=0"))
    phase("shards build")
    val n = obs.get("n").asInstanceOf[Long]
    val res = WaveResult(0, n, n, n, n, 0, n, n, (System.nanoTime() - t0) / 1e9)
    commit(0, res)
    res
  }

  /** Run the next wave after the latest committed one. */
  def runWave(): WaveResult = {
    val prev = latestCommittedWave()
    require(prev >= 0, "frontier not initialized")
    val wave = prev + 1
    val t0 = System.nanoTime()
    val debug = sys.env.get("GRAFT_DEBUG").contains("1")
    val fast = cfg.fastMode
    var tPhase = t0
    def phase(name: String): Unit = if (debug) {
      val now = System.nanoTime()
      System.err.println(f"[frontier] wave=$wave $name: ${(now - tPhase) / 1e9}%.2fs")
      tPhase = now
    }

    val pending = spark.read.parquet(dir("frontier", s"wave=$prev"))
    val seen = seenUpTo(prev)
    val shards = spark.read.parquet(dir("shards", s"wave=$prev"))

    // 1. schedule from pending under politeness budget
    val allowed = applyRobots(pending)
    val scheduled = hostBudget(allowed)
      .withColumn("wave", lit(wave))
      .select("host", "surt_key", "canonical_url", "priority", "rank_in_host", "wave")
    val scheduledOut = if (fast) scheduled else scheduled.orderBy("priority", "host", "surt_key")
    // count observed on the write job itself — no read-back count job
    val schedObs = org.apache.spark.sql.Observation()
    scheduledOut.observe(schedObs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(dir("scheduled", s"wave=$wave"))
    val scheduledR = spark.read.parquet(dir("scheduled", s"wave=$wave"))
    phase("schedule+write")

    // per-partition lineage metrics
    if (!fast) {
      scheduledR.groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("n_scheduled"), countDistinct(col("host")).as("n_hosts"))
        .withColumn("wave", lit(wave))
        .write.mode("overwrite").parquet(dir("metrics", s"wave=$wave"))
      phase("metrics")
    }

    // 2. discover outlinks of the scheduled batch; canonicalize + dedup
    val discovered = canonicalized(discoverOutlinks(scheduledR))
    val candNorm = discovered
      .groupBy("surt_key")
      .agg(min("priority").as("priority"),
        min("canonical_url").as("canonical_url"), min("host").as("host"))

    // 3. seen-set subtraction (cuckoo/bloom prefilter + exact anti-join).
    // `fresh` feeds BOTH state updates below — persist so the discovery
    // + subtraction DAG runs once, not three times.
    val fresh = subtractSeen(
      candNorm.select("surt_key", "canonical_url", "host", "priority"), seen, shards)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFresh = fresh.count()
    phase("discover+subtract")

    // 4. new state: pending minus scheduled, plus fresh discoveries.
    // No re-dedup needed: `stillPending` ⊆ seen and `fresh` ∩ seen = ∅
    // (fresh was anti-joined), and both sides are internally deduped —
    // so plain unions replace two full-state shuffles per wave.
    val stillPending = pending.join(
      scheduledR.select("surt_key"), Seq("surt_key"), "left_anti")
    val newPending = stillPending.unionByName(fresh)
      .select("surt_key", "canonical_url", "host", "priority")
    // internal state is written UNSORTED — ordering semantics live in
    // the data itself (priority, surt_key, rank_in_host); only the
    // user-facing scheduled output pays for a global sort
    newPending.write.mode("overwrite").parquet(dir("frontier", s"wave=$wave"))
    phase("newPending write")

    // seen DELTA: persist only this wave's fresh keys (O(fresh) write);
    // readers union committed deltas via partition pruning (seenUpTo)
    fresh.select("surt_key").write.mode("overwrite").parquet(dir("seen", s"wave=$wave"))
    phase("seen delta write")

    // incremental shard maintenance: insert only this wave's fresh keys
    updateShards(shards, fresh.select("surt_key"))
      .write.mode("overwrite").parquet(dir("shards", s"wave=$wave"))
    fresh.unpersist(blocking = false)
    phase("shards update")

    // scheduled count came from the write job's Observation; state-size
    // reports are observability, skipped in bench mode
    val nScheduled = schedObs.get("n").asInstanceOf[Long]
    val nSeen = if (fast) -1L else seenUpTo(wave).count()
    val nPending = if (fast) -1L else spark.read.parquet(dir("frontier", s"wave=$wave")).count()
    val res = WaveResult(wave, nFresh, nFresh, nFresh, nScheduled,
      nScheduled, nSeen, nPending, (System.nanoTime() - t0) / 1e9)
    commit(wave, res)
    res
  }

  def scheduledDf(wave: Int): DataFrame = spark.read.parquet(dir("scheduled", s"wave=$wave"))
  /** Pending frontier state as of `wave` — exposed so the scheduling
    * step (robots + politeness budget + ordering) of wave+1 can be
    * oracle-checked against its exact input. */
  def pendingDf(wave: Int): DataFrame = spark.read.parquet(dir("frontier", s"wave=$wave"))
  /** Full seen membership as of `wave` (union of committed deltas). */
  def seenDf(wave: Int): DataFrame = seenUpTo(wave)
  def metricsDf(wave: Int): DataFrame = spark.read.parquet(dir("metrics", s"wave=$wave"))
}

object Frontier {
  /** Seed list extracted from the images table (north rule: the frontier
    * runs OVER the image+caption corpus): each caption carries a URL
    * token; priority derives from the perceptual hash so identical
    * images crawl at identical priority. */
  def seedsFromImages(images: DataFrame): DataFrame =
    images.select(
      regexp_extract(col("caption"), "(https?://\\S+)", 1).as("url"),
      pmod(col("phash"), lit(100)).cast("int").as("priority"))
      .filter(length(col("url")) > 0)

  /** Deterministic seed list synthesized from the images/documents
    * tables (no external data): URL-shaped strings exercising every SURT
    * category (www prefixes, ports, query sort, %-encoding). */
  def syntheticSeeds(spark: SparkSession, n: Int, seed: Long = 42L,
                     hostPool: Int = 200): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val h = SeenFilter.hashKey(s"seed:$seed:$i")
      val u = (java.lang.Math.floorMod(h, 1000000L)) / 1000000.0
      val hostId = (hostPool * u * u * u).toInt
      val www = if (i % 3 == 0) "www." else if (i % 7 == 0) "www2." else ""
      val port = if (i % 11 == 0) ":8443" else ""
      val q = if (i % 2 == 0) s"?b=$i&a=${i % 10}" else ""
      (s"https://${www}host$hostId.example.org$port/seed/$i$q",
        java.lang.Math.floorMod(h, 100L).toInt)
    }.toDF("url", "priority")
  }
}
