package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Functions

/** The crawl frontier + fetch scheduler (north rule, BASELINE.json).
  *
  * A wave is one iterative batch round:
  *   candidates (pending ∪ discovered)
  *     → canonicalize (WHATWG normalize) → SURT key → host
  *     → in-batch dedup (groupBy surt, deterministic min)
  *     → seen-set subtraction: candidates shuffle by shard id ONLY;
  *       each task loads its shard's LSM level files (each level =
  *       cuckoo/bloom filter + exact 64-bit hash run) directly from
  *       storage and decides membership in-task — no anti-join against
  *       the seen store, no shard state in the shuffle, no filter
  *       state on the driver
  *     → robots filter (executor-side rule join)
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
  * holds ~2.4M fingerprints (~10 MB cuckoo) + ~20 MB of exact hash
  * runs — a task reads only the shards its candidates probe. Per-wave
  * seen-subtraction cost: shuffle O(candidates); storage read
  * O(probed shards); state write O(shards touched by fresh keys). Hot
  * hosts are bounded by the salt phase before any host-level shuffle.
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
    /** auto-fold seen string deltas into the compacted base every K
      * committed waves (compactSeen(wave-1) post-commit), so a long
      * crawl's `seenUpTo` unions O(K) dirs instead of O(waves) with no
      * manual calls. ≤0 disables (manual compaction only). */
    compactEvery: Int = 8,
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

  /** Session Hadoop conf (incl. runtime `spark.hadoop.*` — object-store
    * auth etc.), broadcast once so EXECUTOR-side filesystem access
    * (level reads/writes) sees exactly what driver-side index I/O sees.
    * A bare `new Configuration()` in a task only reads classpath
    * defaults and silently drops session-supplied fs settings. */
  private lazy val taskConfB = spark.sparkContext.broadcast(
    new graft.SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  /** Exposed for tests asserting the executor-visible conf contents. */
  private[frontier] def taskHadoopConfBroadcast = taskConfB

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
  // Seen-set shards — LSM level FILES + a tiny per-wave index
  // ----------------------------------------------------------------
  // Shard state = an ordered list of immutable LEVEL files (each a
  // cuckoo/bloom filter + the exact sorted hash run it was built
  // from, `SeenFilter.buildLevel`), living under
  // `shards/wave=<created>/s<shard>-n<count>.lvl`. The task that
  // probes or updates shard s reads its level files DIRECTLY from
  // storage — shard state never rides a shuffle (r2's cogroup
  // exchanged ~10 B/key of shard blobs per wave; at 10^10 keys that is
  // ~100 GB of shuffle a wave no longer pays). Per-wave maintenance
  // writes ONE new level per touched shard — O(batch) bytes, amortized
  // O(log) via the logarithmic merge — and reads only the levels being
  // merged, so state write amplification is O(fresh), never O(seen).
  // A per-wave INDEX file lists each shard's level paths; levels
  // dropped by a committed wave are pruned with a one-wave lag.

  private def indexFilePath(wave: Int): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(cfg.checkpointDir, s"shards/wave=$wave/INDEX.txt")

  /** shard id → ordered level paths (relative to `shards/`). */
  private def readIndex(wave: Int): Map[Int, Seq[String]] = {
    val p = indexFilePath(wave)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) return Map.empty
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(f.open(p), "UTF-8"))
    try {
      val n = in.readLine().trim.toInt
      require(n == cfg.seenShards,
        s"checkpoint has $n seen shards but config says ${cfg.seenShards}")
      Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty)
        .map { l =>
          val a = l.trim.split(" ")
          a(0).toInt -> a.drop(1).toSeq
        }
        .toMap
    } finally in.close()
  }

  private def writeIndex(wave: Int, idx: Map[Int, Seq[String]]): Unit = {
    val p = indexFilePath(wave)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val sb = new StringBuilder
    sb.append(cfg.seenShards).append('\n')
    idx.foreach { case (s, paths) =>
      sb.append(s)
      paths.foreach(pp => sb.append(' ').append(pp))
      sb.append('\n')
    }
    val out = f.create(p, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Insert this wave's fresh keys into their shards: one shuffle of
    * the KEYS (grouped by shard id); each group's task decides the
    * logarithmic merge from level COUNTS (encoded in the filenames —
    * no reads needed to decide), loads ONLY the levels being merged,
    * and writes one new level file under `wave` (deterministic name +
    * content — task retries and wave re-runs converge on identical
    * files; the manifest gates visibility). Returns each touched
    * shard's new level-path list (≤ seenShards small rows to the
    * driver — accounting, not state). */
  private def updateShardFiles(prevIdx: Map[Int, Seq[String]], newKeys: DataFrame,
                               wave: Int): Map[Int, Seq[String]] = {
    val n = cfg.seenShards
    val ckDir = cfg.checkpointDir
    val prevIdxB = spark.sparkContext.broadcast(prevIdx)
    val confB = taskConfB
    import spark.implicits._
    newKeys.select(col("surt_key")).as[String]
      .groupByKey(k => java.lang.Math.floorMod(SeenFilter.hashKey(k), n.toLong).toInt)
      .flatMapGroups { (shard, keys) =>
        val prevPaths = prevIdxB.value.getOrElse(shard, Nil)
        val counts = prevPaths.map(Frontier.levelCountFromPath)
        val batch = keys.map(SeenFilter.hashKey).toArray
        val k = SeenFilter.levelsToMerge(counts, batch.length)
        val (retained, merged) = prevPaths.splitAt(prevPaths.length - k)
        // oldest-first merge keeps accumulation sorted
        val mergedRuns = merged.map(pp => Frontier.loadLevel(ckDir, pp, confB.value.value).hashes)
        val run = SeenFilter.mergeIntoRun(batch, mergedRuns.reverse)
        val rel = Frontier.storeLevel(ckDir, wave, shard, SeenFilter.buildLevel(run),
          run.length, confB.value.value)
        Iterator.single((shard, retained :+ rel))
      }.collect().toMap
  }

  /** GC level files with a ONE-WAVE LAG, SELF-HEALINGLY: at commit of
    * wave N, enumerate every on-disk `.lvl` file and delete the ones
    * referenced by NEITHER index(N) nor index(N-1) (a level dropped
    * from an index can never reappear in a later one). The lag keeps a
    * re-run of wave N (after an uncommitted crash OR a hand-deleted
    * manifest) fully resolvable from index(N-1). Diffing the DISK
    * against the live set — not index(N-2) against index(N-1) — means
    * a crash between commit(N) and the prune leaks nothing
    * permanently: the next committed wave's prune reclaims whatever
    * the missed one would have. Cost: one recursive listing of
    * `shards/` (O(shards·log(levels)) entries) + O(dead) deletes —
    * cheap next to the wave's own I/O. Index files older than N-1 are
    * unreachable from any resume path and are swept the same way. */
  private def pruneSupersededShardFiles(wave: Int): Unit = {
    if (wave < 2) return
    val live: Set[String] =
      (readIndex(wave).values.flatten ++ readIndex(wave - 1).values.flatten).toSet
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(cfg.checkpointDir, "shards")
    try {
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return
      val waveDirRe = "wave=(\\d+)".r
      fs.listStatus(root).foreach { d =>
        d.getPath.getName match {
          case waveDirRe(w) =>
            val dirWave = w.toInt
            fs.listStatus(d.getPath).foreach { f =>
              val name = f.getPath.getName
              val rel = s"wave=$dirWave/$name"
              val dead =
                if (name.endsWith(".lvl")) !live.contains(rel)
                else if (name == "INDEX.txt") dirWave < wave - 1
                else false
              if (dead) { try { fs.delete(f.getPath, false); () } catch { case _: Exception => } }
            }
            // reclaims the wave dir once empty (non-recursive delete is
            // a harmless no-op while anything inside is still live)
            try { fs.delete(d.getPath, false); () } catch { case _: Exception => }
          case _ =>
        }
      }
    } catch { case _: Exception => }
  }

  /** Compacted base (`seen_base/upto=B`) + per-wave seen DELTAS for
    * waves in (B, wave]. Seen state is stored as deltas — each wave
    * persists ONLY its fresh keys — so per-wave seen maintenance
    * writes O(fresh), not O(total seen) (at 10^10 URLs a full rewrite
    * would move ~1 TB of key strings every wave). Paths are
    * enumerated explicitly, so an uncommitted (crashed) later wave's
    * partial files — and any delta dir already folded into the base —
    * are never read. */
  private def seenUpTo(wave: Int): DataFrame = {
    import org.apache.spark.sql.types.{StructType, StructField, StringType}
    val schema = StructType(Seq(StructField("surt_key", StringType)))
    val base = latestSeenBase(wave)
    val b = base.getOrElse(-1)
    val paths = base.map(bb => dir("seen_base", s"upto=$bb")).toSeq ++
      seenDeltaWaves().filter(w => w > b && w <= wave).sorted.map(w => dir("seen", s"wave=$w"))
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*).select("surt_key")
  }

  /** Committed delta-dir wave numbers present on disk. */
  private def seenDeltaWaves(): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(cfg.checkpointDir, "seen")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .flatMap(st => st.getPath.getName.stripPrefix("wave=").toIntOption.filter(_ =>
        st.getPath.getName.startsWith("wave=")))
  }

  /** Largest published compaction base ≤ wave, if any. */
  private def latestSeenBase(wave: Int): Option[Int] = {
    val re = "SEEN_BASE-(\\d+)\\.json".r
    val best = listMarkerWaves(re).filter(_ <= wave)
    if (best.isEmpty) None else Some(best.max)
  }

  /** Wave numbers of marker files `<re>` in the checkpoint root —
    * through the checkpoint's Hadoop FileSystem (NOT java.nio), so the
    * commit protocol works on hdfs:/s3a:/file: alike. */
  private def listMarkerWaves(re: scala.util.matching.Regex): Seq[Int] = {
    val d = new org.apache.hadoop.fs.Path(cfg.checkpointDir)
    val fs = Frontier.rawFs(d, spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) return Nil
    fs.listStatus(d).toSeq.flatMap(st => st.getPath.getName match {
      case re(n) => Some(n.toInt)
      case _     => None
    })
  }

  /** Atomic marker publish: write to a dot-tmp on the SAME filesystem,
    * then rename onto the final name (atomic on HDFS and posix local
    * fs; the accepted create-then-rename pattern on object stores). */
  private def publishMarker(name: String, json: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(cfg.checkpointDir)
    val fs = Frontier.rawFs(d, spark.sessionState.newHadoopConf())
    fs.mkdirs(d)
    val tmp = new org.apache.hadoop.fs.Path(d, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(d, name)
    fs.delete(dst, false) // idempotent re-publish (wave re-run)
    require(fs.rename(tmp, dst), s"marker publish failed: $dst")
  }

  private def deleteMarker(name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(cfg.checkpointDir, name)
    try { Frontier.rawFs(p, spark.sessionState.newHadoopConf()).delete(p, false); () }
    catch { case _: Exception => }
  }

  /** Compact seen string deltas: fold waves ≤ `upTo` (which must be
    * committed) into one base dir, publish it with an atomic marker,
    * then GC the folded delta dirs and the superseded base. Readers
    * enumerate (base, deltas > base) explicitly, so a crash anywhere
    * in the GC leaves only unread garbage — never a duplicate or a
    * dangling reference — and a resumed wave > `upTo` still rewrites
    * only its own delta (exactly-once semantics untouched). Run every
    * K waves so `seenUpTo` unions O(K) dirs instead of O(waves) —
    * a 10^4-wave crawl otherwise pays 10^4-dir listing+planning per
    * observability read. */
  def compactSeen(upTo: Int): Unit = {
    require(upTo <= latestCommittedWave(), s"wave $upTo not committed yet")
    val prevBase = latestSeenBase(upTo)
    if (prevBase.contains(upTo)) return // already compacted to here
    seenUpTo(upTo).write.mode("overwrite").parquet(dir("seen_base", s"upto=$upTo"))
    publishMarker(s"SEEN_BASE-$upTo.json", s"""{"upto":$upTo}""")
    // GC (failures harmless; read path already ignores all of these)
    val conf = spark.sessionState.newHadoopConf()
    def rm(path: String): Unit =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf).delete(p, true); ()
      } catch { case _: Exception => }
    prevBase.foreach { b =>
      deleteMarker(s"SEEN_BASE-$b.json")
      rm(dir("seen_base", s"upto=$b"))
    }
    seenDeltaWaves().filter(_ <= upTo).foreach(w => rm(dir("seen", s"wave=$w")))
  }

  /** Dedup candidates in-batch AND drop already-seen ones in ONE
    * shuffle: candidates group by shard id; shard = f(surt), so every
    * duplicate of a surt lands in the same group, where a hash-map
    * fold reproduces the groupBy-min dedup (min priority / canonical /
    * host per surt — the same deterministic tie-breaks a separate
    * `groupBy(surt).agg(min…)` stage computed, whose whole extra
    * shuffle of the candidate set this fusion deletes). Each group's
    * task then loads its shard's level files directly and decides
    * membership IN-TASK: per level, the cuckoo/bloom filter
    * prefilters (O(1) per key, mostly-negative), and only filter hits
    * binary-search that level's exact hash run. No anti-join against the seen store exists — a
    * wave's seen-subtraction shuffle is O(candidates) at ANY seen-set
    * size (r2 shuffled the full 10^10-key seen store through a
    * SortMergeJoin every wave). The driver holds no filter state;
    * per-task memory is O(seen/shards) state (~30 MB/shard at 10^10
    * keys / 4096 shards) + O(distinct candidates/shard) for the dedup
    * map (wave-bounded: ~250k entries at a 10^9-candidate wave over
    * 4096 shards).
    *
    * Exactness: membership = 64-bit hash equality (see SeenFilter's
    * exact-runs note: ~5e-10 false-drop probability per candidate at
    * 10^10 seen keys, and a false drop only skips one fetch). */
  private def subtractSeen(cands: DataFrame, prevIdx: Map[Int, Seq[String]]): DataFrame = {
    val n = cfg.seenShards
    val ckDir = cfg.checkpointDir
    val idxB = spark.sparkContext.broadcast(prevIdx)
    val confB = taskConfB
    // group granularity: a multiple k of the shard count, sized so the
    // stage keeps ~2 groups per core even when seenShards < cores
    // (16-shard test configs on a 32-core session would otherwise run
    // the whole subtract on 16 tasks). floorMod(h, n·k) nests inside
    // floorMod(h, n), so every group still holds surts of exactly ONE
    // shard (group mod n) — dedup correctness and single-shard state
    // loading are preserved; a shard's state is read ≤ k times. At
    // production scale (shards ≫ cores) k = 1.
    val k = math.max(1,
      (2 * spark.sparkContext.defaultParallelism + n - 1) / n)
    val groups = (n.toLong * k)
    val candT = cands
      .select(col("surt_key"), col("canonical_url"), col("host"),
        col("priority").cast("int"))
      .as[(String, String, String, Int)]
    candT.groupByKey(c =>
        java.lang.Math.floorMod(SeenFilter.hashKey(c._1), groups).toInt)
      .flatMapGroups { (group, cs) =>
        val shard = group % n
        // in-batch dedup: min per field, mirroring groupBy(surt).agg(min…).
        // String mins use CODE-POINT order (= Spark's UTF8String binary
        // order), not Java's UTF-16 order — they differ for
        // supplementary-plane characters, and the representative must
        // match what a SQL-side min over the same data would keep.
        val agg = new java.util.HashMap[String, Array[AnyRef]]()
        cs.foreach { c =>
          val cur = agg.get(c._1)
          if (cur == null)
            agg.put(c._1, Array[AnyRef](c._2, c._3, Integer.valueOf(c._4)))
          else {
            if (Frontier.codePointLess(c._2, cur(0).asInstanceOf[String])) cur(0) = c._2
            if (Frontier.codePointLess(c._3, cur(1).asInstanceOf[String])) cur(1) = c._3
            if (c._4 < cur(2).asInstanceOf[Integer].intValue()) cur(2) = Integer.valueOf(c._4)
          }
        }
        val levels = idxB.value.getOrElse(shard, Nil)
          .map(rel => Frontier.loadLevel(ckDir, rel, confB.value.value)).toArray
        import scala.jdk.CollectionConverters._
        agg.entrySet().iterator().asScala
          .filter { e =>
            levels.isEmpty || {
              val h = SeenFilter.hashKey(e.getKey)
              var seen = false
              var i = 0
              while (!seen && i < levels.length) {
                seen = levels(i).contains(h); i += 1
              }
              !seen
            }
          }
          .map { e =>
            val v = e.getValue
            (e.getKey, v(0).asInstanceOf[String], v(1).asInstanceOf[String],
              v(2).asInstanceOf[Integer].intValue())
          }
      }.toDF("surt_key", "canonical_url", "host", "priority")
  }

  // ----------------------------------------------------------------
  // Robots / politeness
  // ----------------------------------------------------------------

  /** Parsed robots state, materialized ONCE PER ROBOTS-TABLE VERSION
    * into the checkpoint (`robots_parsed/{rules,delays}` + a
    * fingerprint marker) and read back as parquet. Rationale: the raw
    * robots table changes slowly but the gate runs every wave — at
    * 10^8 hosts, re-running groupBy(host)+parse per wave is a
    * full-table parse pass for an input that did not change. The
    * fingerprint (agent + row count + order-independent content hash)
    * costs one narrow scan per Frontier INSTANCE; waves then pay only
    * the parquet read of the parsed form. A different robots snapshot
    * or agent re-parses and atomically re-publishes. */
  private lazy val robotsTables: Option[(DataFrame, DataFrame)] = robots.map { r =>
    import org.apache.spark.sql.types._
    val rulesSchema = StructType(Seq(
      StructField("host", StringType),
      StructField("rules", ArrayType(StructType(Seq(
        StructField("_1", BooleanType), StructField("_2", StringType)))))))
    val delaysSchema = StructType(Seq(
      StructField("host", StringType), StructField("crawl_delay", DoubleType)))
    // order-independent content hash; decimal sum cannot overflow ANSI
    val fpRow = r.select(count(lit(1)),
      sum(xxhash64(col("host"), col("robots_txt")).cast(DecimalType(38, 0)))).head()
    val fp = cfg.agent.replaceAll("[^A-Za-z0-9]", "_") +
      s"-c${fpRow.getLong(0)}-h${if (fpRow.isNullAt(1)) "0" else fpRow.getDecimal(1).toBigInteger.toString}"
    val markerName = s"ROBOTS_PARSED-$fp.marker"
    val markerP = new org.apache.hadoop.fs.Path(cfg.checkpointDir, markerName)
    val fs = Frontier.rawFs(markerP, spark.sessionState.newHadoopConf())
    if (!fs.exists(markerP)) {
      Robots.hostRules(r, cfg.agent)
        .write.mode("overwrite").parquet(dir("robots_parsed", "rules"))
      Robots.crawlDelays(r, cfg.agent)
        .write.mode("overwrite").parquet(dir("robots_parsed", "delays"))
      // retire markers of superseded robots versions, then publish
      try fs.listStatus(new org.apache.hadoop.fs.Path(cfg.checkpointDir))
        .filter(_.getPath.getName.startsWith("ROBOTS_PARSED-"))
        .foreach(st => fs.delete(st.getPath, false))
      catch { case _: Exception => }
      publishMarker(markerName, s"""{"fingerprint":"$fp"}""")
    }
    // explicit schemas: an all-allowed crawl yields an EMPTY delays
    // table, whose parquet dir has no data file to infer from
    (spark.read.schema(rulesSchema).parquet(dir("robots_parsed", "rules")),
      spark.read.schema(delaysSchema).parquet(dir("robots_parsed", "delays")))
  }

  /** Robots gate. With a real robots table (`robots`: host,
    * robots_txt) the PRE-PARSED per-host rules (robotsTables — RFC
    * 9309 longest-match semantics) are joined against the URL path.
    * Without one, the deterministic synthetic rule (every 5th host by
    * hash disallows /private) keeps benches and oracles reproducible. */
  private def applyRobots(df: DataFrame): DataFrame = robotsTables match {
    case Some((rules, _)) =>
      val pathOf = udf((url: String) =>
        url.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "") match {
          case "" => "/"
          case p  => p
        })
      Robots.applyRulesTable(df.withColumn("__path", pathOf(col("canonical_url"))),
          rules, "host", "__path")
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
    val (withK, kCol) = robotsTables match {
      case Some((_, delaysTable)) =>
        val delays = delaysTable
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

  def latestCommittedWave(): Int = {
    val re = "MANIFEST-(\\d+)\\.json".r
    val waves = listMarkerWaves(re)
    if (waves.isEmpty) -1 else waves.max
  }

  private def commit(wave: Int, result: WaveResult): Unit = {
    val json =
      s"""{"wave":$wave,"candidates":${result.candidates},"deduped":${result.deduped},
         |"fresh":${result.fresh},"allowed":${result.allowed},"scheduled":${result.scheduled},
         |"seen_total":${result.seenTotal},"pending_total":${result.pendingTotal},
         |"elapsed_sec":${result.elapsedSec}}""".stripMargin.replace("\n", "")
    publishMarker(s"MANIFEST-$wave.json", json)
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
    // canonicalize+dedup DAG (which would double init cost). The seen
    // delta write and the shard build both derive from it and are
    // independent — submitted concurrently (same rationale as the
    // per-wave state writes).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Frontier.stateWriteEc
    val frontier0 = spark.read.parquet(dir("frontier", "wave=0"))
    val fSeen = Future {
      frontier0.select("surt_key")
        .write.mode("overwrite").parquet(dir("seen", "wave=0"))
    }
    val fShards = Future {
      writeIndex(0, updateShardFiles(Map.empty, frontier0.select("surt_key"), 0))
    }
    Await.result(fSeen, Duration.Inf)
    Await.result(fShards, Duration.Inf)
    phase("seen+shards build (concurrent)")
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
    val prevIdx = readIndex(prev)

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

    // 2+3. discover outlinks of the scheduled batch; canonicalize,
    // then dedup + seen-subtract in ONE shard-keyed shuffle (the
    // in-batch groupBy-min dedup is fused into the shard probe —
    // subtractSeen). `fresh` feeds the state updates below — persist
    // so the discovery + subtraction DAG runs once.
    val discovered = canonicalized(discoverOutlinks(scheduledR))
    val fresh = subtractSeen(
      discovered.select("surt_key", "canonical_url", "host", "priority"), prevIdx)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFresh = fresh.count()
    phase("discover+subtract")

    // 4. new state: pending minus scheduled, plus fresh discoveries.
    // No re-dedup needed: `stillPending` ⊆ seen and `fresh` ∩ seen = ∅
    // (fresh was subtracted), and both sides are internally deduped —
    // so plain unions replace two full-state shuffles per wave.
    //
    // The three state sinks below (frontier, seen delta, shard files)
    // all hang off the PERSISTED `fresh` and are mutually independent,
    // so their jobs are submitted CONCURRENTLY — at small executor
    // counts each job alone underfills the cluster during its stage
    // tails, and overlapping them recovers that idle time. Crash
    // consistency is unaffected: any subset of the writes is invisible
    // until the manifest commits, and a re-run overwrites all three
    // idempotently.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      Frontier.stateWriteEc
    val stillPending = pending.join(
      scheduledR.select("surt_key"), Seq("surt_key"), "left_anti")
    val newPending = stillPending.unionByName(fresh)
      .select("surt_key", "canonical_url", "host", "priority")
    val fPending = Future {
      // internal state is written UNSORTED — ordering semantics live in
      // the data itself (priority, surt_key, rank_in_host); only the
      // user-facing scheduled output pays for a global sort
      newPending.write.mode("overwrite").parquet(dir("frontier", s"wave=$wave"))
    }
    val fSeen = Future {
      // seen DELTA: persist only this wave's fresh keys (O(fresh) write)
      fresh.select("surt_key").write.mode("overwrite").parquet(dir("seen", s"wave=$wave"))
    }
    val fShards = Future {
      // incremental shard maintenance: insert only this wave's fresh keys
      val updatedShards = updateShardFiles(prevIdx, fresh.select("surt_key"), wave)
      writeIndex(wave, prevIdx ++ updatedShards)
      updatedShards
    }
    Await.result(fPending, Duration.Inf)
    Await.result(fSeen, Duration.Inf)
    Await.result(fShards, Duration.Inf)
    fresh.unpersist(blocking = false)
    phase("state writes (frontier+seen+shards, concurrent)")

    // scheduled count came from the write job's Observation; state-size
    // reports are observability, skipped in bench mode
    val nScheduled = schedObs.get("n").asInstanceOf[Long]
    val nSeen = if (fast) -1L else seenUpTo(wave).count()
    val nPending = if (fast) -1L else spark.read.parquet(dir("frontier", s"wave=$wave")).count()
    val res = WaveResult(wave, nFresh, nFresh, nFresh, nScheduled,
      nScheduled, nSeen, nPending, (System.nanoTime() - t0) / 1e9)
    commit(wave, res)
    // reclaim shard files superseded one wave ago (lag keeps a re-run
    // of THIS wave resolvable from the previous index)
    pruneSupersededShardFiles(wave)
    // periodic seen-delta compaction, part of the wave loop (not a
    // manual API): fold deltas ≤ wave-1 — strictly-older-than-latest,
    // the crash-replay shape the resume suite proves — every K
    // committed waves. O(seen) I/O amortized to O(seen/K) per wave.
    if (cfg.compactEvery > 0 && wave > 0 && wave % cfg.compactEvery == 0)
      compactSeen(wave - 1)
    res
  }

  /** Seen-membership probe: the fresh (never-seen) subset of `urls`
    * (url, priority) as of the latest committed wave — the wave's
    * subtraction step standalone (in-batch deduped, like the wave).
    * Shuffles O(probe urls) only; each task loads its shard's level
    * files directly. */
  def freshOnly(urls: DataFrame): DataFrame = {
    val prev = latestCommittedWave()
    require(prev >= 0, "frontier not initialized")
    subtractSeen(
      canonicalized(urls).select("surt_key", "canonical_url", "host", "priority"),
      readIndex(prev))
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

  /** Small shared pool for concurrent state-write job submission (the
    * jobs themselves run on the cluster; these threads only block on
    * job completion). */
  private[frontier] lazy val stateWriteEc: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, r => {
        val t = new Thread(r, "frontier-state-write")
        t.setDaemon(true)
        t
      }))

  /** `a < b` in Unicode CODE-POINT order — identical to UTF-8 binary
    * order (UTF-8 preserves code-point order), which is what Spark's
    * UTF8String-backed `min` compares. Java String `<` compares UTF-16
    * code units, which inverts supplementary-plane vs U+E000–U+FFFF;
    * the fix-up below remaps the first differing units so surrogates
    * (and therefore supplementary code points) sort last — the
    * standard O(1)-after-common-prefix UTF-16-as-UTF-8 comparison.
    * (Known limit, shared with any code-point comparator: ILL-FORMED
    * strings — lone surrogates — sort here by their would-be code
    * point, whereas UTF8String encodes them as `?`; canonicalized
    * URLs are well-formed, so the divergence is unreachable from the
    * wave path.) */
  private[frontier] def codePointLess(a: String, b: String): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    if (i == n) return a.length < b.length
    var ca = a.charAt(i).toInt
    var cb = b.charAt(i).toInt
    if (ca >= 0xd800 && cb >= 0xd800) {
      ca += (if (ca < 0xe000) 0x2000 else -0x800)
      cb += (if (cb < 0xe000) 0x2000 else -0x800)
    }
    ca < cb
  }

  /** Relative level path → absolute Hadoop path under `shards/`. */
  private[frontier] def levelPath(ckDir: String, rel: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(ckDir, s"shards/$rel")

  private val LevelName = ".*-n(\\d+)\\.lvl".r

  /** Level key count parsed from the filename — merge decisions need
    * no reads. */
  private[frontier] def levelCountFromPath(rel: String): Int = rel match {
    case LevelName(n) => n.toInt
    case _            => throw new IllegalArgumentException(s"bad level path: $rel")
  }

  /** Unwrap local-fs checksum wrapping for marker files: tests (and
    * operators) delete markers through plain java.nio, which would
    * strand `.crc` sidecars and fail later checksum reads. Non-local
    * filesystems pass through untouched. */
  private[frontier] def rawFs(p: org.apache.hadoop.fs.Path,
                              conf: org.apache.hadoop.conf.Configuration)
      : org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case fs                                         => fs
    }

  /** Executor-side level read (direct storage access, not a shuffle).
    * `conf` is the broadcast SESSION Hadoop conf — session-supplied fs
    * settings (`spark.hadoop.*` auth) must reach task-side reads too,
    * not only driver-side index I/O. */
  private[frontier] def loadLevel(ckDir: String, rel: String,
                                  conf: org.apache.hadoop.conf.Configuration)
      : SeenFilter.LevelProbe = {
    val p = levelPath(ckDir, rel)
    val in = p.getFileSystem(conf).open(p)
    try SeenFilter.parseLevel(in.readAllBytes()) finally in.close()
  }

  /** Executor-side level write: temp file + rename, deterministic name
    * `wave=<w>/s<shard>-n<count>.lvl` (one level per (wave, shard)).
    * Task retries and wave re-runs produce byte-identical content, so
    * any interleave of attempts converges on the same file. Returns
    * the relative path for the index. */
  private[frontier] def storeLevel(ckDir: String, wave: Int, shard: Int,
                                   bytes: Array[Byte], count: Int,
                                   conf: org.apache.hadoop.conf.Configuration): String = {
    val rel = f"wave=$wave/s$shard%05d-n$count%010d.lvl"
    val p = levelPath(ckDir, rel)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // NO delete-before-rename: a zombie attempt deleting a published
    // file and dying pre-rename would leave a committed index pointing
    // at nothing. Rename only; if it fails because another attempt
    // already published (identical deterministic bytes), that IS
    // success.
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      require(fs.exists(p), s"level write lost: $p")
    }
    rel
  }

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
