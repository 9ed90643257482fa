package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Functions

/** The crawl frontier + fetch scheduler (north rule, BASELINE.json):
  * a per-host QUEUE-HEAD scheduler over head/fence/backlog state.
  *
  * A wave is one iterative batch round:
  *   schedule: per-host top-k_eff window over the HEAD table only —
  *       O(heads), never O(pending); the same windowed frame yields
  *       the head remainder (no state-vs-schedule anti-join)
  *     → discover outlinks → canonicalize (WHATWG normalize) → SURT
  *     → in-batch dedup + seen-set subtraction fused in ONE shuffle:
  *       candidates group by shard id; each task loads its shard's LSM
  *       level files (cuckoo/bloom filter + exact 64-bit hash run)
  *       directly from storage and decides membership in-task — no
  *       anti-join against the seen store, no shard state in the
  *       shuffle, no filter state on the driver
  *     → robots gate at INSERT (pre-parsed rule join) — pending only
  *       ever holds allowed rows; seen membership stays pre-robots
  *     → head/fence/backlog maintenance (see maintainFrontier):
  *       fresh routes by fence, spill appends a bucketed backlog
  *       delta, needy hosts refill from their buckets only
  *     → scheduled wave committed with an atomic manifest; seen +
  *       state + per-partition lineage metrics checkpointed
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
  * costs: seen-subtraction shuffle O(candidates); storage read
  * O(probed shards); state writes O(fresh + heads + hosts); scheduling
  * shuffle O(heads); backlog touched only by appends and needy-bucket
  * refills. A 10^10-row pending backlog is NEVER windowed, anti-joined,
  * or rewritten by a wave — the r3 design's remaining O(pending)
  * scheduling cost is gone.
  */
final case class FrontierConfig(
    checkpointDir: String,
    hostBudget: Int = 8, // fetches per host per wave
    // salt width bounds the hottest (host, salt) window group at
    // ~hottest-host/salt rows; 32 keeps a 5%-of-wave Zipf head host
    // from serializing one reducer in the INIT top-M split (phase-2
    // input stays ≤ salt*headMult*budget rows per host)
    salt: Int = 32,
    /** per-host QUEUE-HEAD capacity multiplier: the head table targets
      * M = headMult × hostBudget rows per host, so a host needs a
      * backlog refill only every ~(headMult−1) waves. 1 = refill every
      * wave (maximum backlog traffic, still exact). */
    headMult: Int = 4,
    /** backlog host-hash buckets: refills read ONLY the buckets of
      * needy hosts (directory-level pruning). Production sizing:
      * ~total-backlog/bucket should fit a comfortable scan unit. */
    backlogBuckets: Int = 64,
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

  /** Reclaim base dirs whose publish marker never landed (a crash
    * between the O(state)-sized base write and the marker): readers
    * already ignore them, but nothing else ever deletes them — each
    * crash would otherwise strand a full state-sized directory
    * forever. Runs at the next compaction of the same kind. */
  private def sweepOrphanBases(baseDir: String, markerPrefix: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(cfg.checkpointDir, baseDir)
    try {
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return
      fs.listStatus(root).foreach { st =>
        st.getPath.getName.stripPrefix("upto=").toIntOption.foreach { u =>
          if (!markerExists(s"$markerPrefix$u.json"))
            try { fs.delete(st.getPath, true); () } catch { case _: Exception => }
        }
      }
    } catch { case _: Exception => }
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

  private def markerExists(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(cfg.checkpointDir, name)
    Frontier.rawFs(p, spark.sessionState.newHadoopConf()).exists(p)
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
    sweepOrphanBases("seen_base", "SEEN_BASE-")
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
      // retire superseded markers BEFORE touching the shared parquet:
      // a crash mid-overwrite must never leave an old marker
      // validating new or partially-written rule data
      try fs.listStatus(new org.apache.hadoop.fs.Path(cfg.checkpointDir))
        .filter(_.getPath.getName.startsWith("ROBOTS_PARSED-"))
        .foreach(st => fs.delete(st.getPath, false))
      catch { case _: Exception => }
      Robots.hostRules(r, cfg.agent)
        .write.mode("overwrite").parquet(dir("robots_parsed", "rules"))
      Robots.crawlDelays(r, cfg.agent)
        .write.mode("overwrite").parquet(dir("robots_parsed", "delays"))
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

  /** Attach the effective per-host budget `k_eff` = hostBudget, shrunk
    * by a robots Crawl-delay to floor(waveWindowSec / delay) —
    * politeness pacing expressed as a per-wave cap (broadcast join of
    * the tiny per-host delay table). Without a robots table the budget
    * is a constant-folded literal. */
  private def withKeff(df: DataFrame): DataFrame = {
    val k = cfg.hostBudget
    robotsTables match {
      case Some((_, delaysTable)) =>
        val delays = delaysTable
          .select(col("host"),
            least(lit(k), greatest(lit(1),
              floor(lit(cfg.waveWindowSec) / col("crawl_delay")).cast("int"))).as("k_eff"))
        df.join(broadcast(delays), Seq("host"), "left")
          .withColumn("k_eff", coalesce(col("k_eff"), lit(k)))
      case None => df.withColumn("k_eff", lit(k))
    }
  }

  // ----------------------------------------------------------------
  // Queue-head frontier state: head + fence + bucketed backlog
  // ----------------------------------------------------------------
  // The pending frontier is split per host into a small HEAD (the
  // rows scheduling actually consults) and an append-only host-
  // bucketed BACKLOG, separated by a per-host FENCE — a (priority,
  // surt) watermark.
  //
  //   head(host)        = all pending rows ≤ fence(host)   (≈ M rows)
  //   backlogLive(host) = all pending rows > fence(host)
  //
  // fence = NULL means "never spilled": the host has NO backlog rows
  // and its whole queue sits in the head. Fences are MONOTONE — set
  // once (first spill, at the then-Mth-best row), raised by refills,
  // never lowered — so a row moved from backlog to head can ignore its
  // stale backlog copy forever: stale copies (≤ fence) are invisible
  // to every read (all backlog reads filter `> fence`) and are
  // physically dropped at backlog compaction.
  //
  // EXACTNESS (the invariant the parity suites + q29/q35 oracles
  // gate): after each wave's maintenance, any host with live backlog
  // (bn > 0) holds ≥ hostBudget head rows (refilled to M when it
  // dropped below). head = pending ≤ fence and backlog = pending >
  // fence then give per-host top-k_eff(head) == top-k_eff(pending)
  // for every k_eff ≤ hostBudget — scheduling from the head equals
  // scheduling from the full pending set, while touching O(heads)
  // instead of O(pending) rows.
  //
  // Costs per wave: scheduling shuffles O(head); insertion shuffles
  // O(fresh + hosts) (fence join + host group); spill appends
  // O(spilled) as a new bucketed delta (never rewrites the backlog);
  // refill reads ONLY the backlog buckets containing needy hosts —
  // directory-pruned — amortized O(scheduled) rows moved per wave.
  // Nothing anywhere is O(pending).

  private val PendingSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("surt_key", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("canonical_url", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("priority", org.apache.spark.sql.types.IntegerType)))

  private def headM: Int = math.max(cfg.hostBudget, cfg.headMult * cfg.hostBudget)

  private def bucketCol: org.apache.spark.sql.Column =
    pmod(hash(col("host")), lit(cfg.backlogBuckets))

  /** Priority band: monotone in priority (band 0 = best), clamped.
    * Refills read band 0 first and provably stop there when every
    * taken row's priority stays inside it — O(taken)-ish reads instead
    * of re-scanning a host's whole deep queue on every refill. Band
    * and bucket are FOLDED into one partition value `bkb = bucket*16 +
    * band` (dir `bkb=<v>`): a single partition column keeps the
    * dynamic-partition writer on its fast path while preserving both
    * prunings. */
  private val BandWidth = 8
  private val MaxBand = 15
  private def bandCol: org.apache.spark.sql.Column =
    least(lit(MaxBand), greatest(lit(0),
      (col("priority") / lit(BandWidth)).cast("int")))
  private def bkbCol: org.apache.spark.sql.Column =
    bucketCol * lit(MaxBand + 1) + bandCol

  /** One maintenance dir per wave holding the wave's state
    * partitions: `dest=head` (flat files + an optional `refill`
    * subdir) and `dest=spill/bkb=<bucket*16+band>` (the backlog
    * delta), written as two concurrent jobs; per-host head/spill
    * counts come back as cheap columnar reads of what was written.
    * (The per-host fence table lives separately under
    * `fence/wave=N`.) */
  private def maintDir(wave: Int): String = dir("maint", s"wave=$wave")
  private def headDir(wave: Int): String = maintDir(wave) + "/dest=head"
  private def spillDir(wave: Int): String = maintDir(wave) + "/dest=spill"

  private def pathExists(d: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def emptyPending: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], PendingSchema)

  /** Schema-pinned recursive read (bucket subdirs are storage layout,
    * not data); empty frame when the dest partition wrote no rows. */
  private def readDest(d: String): DataFrame =
    if (!pathExists(d)) emptyPending
    else spark.read.schema(PendingSchema).option("recursiveFileLookup", "true").parquet(d)

  private def headDf(wave: Int): DataFrame = readDest(headDir(wave))

  private val FenceSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("fp", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("fs", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("bn", org.apache.spark.sql.types.LongType)))

  /** (host, fp, fs, bn): fence priority/surt (NULL = never spilled)
    * and live-backlog row count. One row per host that ever spilled. */
  private def fenceDf(wave: Int): DataFrame =
    spark.read.schema(FenceSchema).parquet(dir("fence", s"wave=$wave"))

  /** Wave numbers whose maint dir still holds a spill (backlog delta)
    * partition. */
  private def backlogDeltaWaves(): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(cfg.checkpointDir, "maint")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName.stripPrefix("wave=").toIntOption
        .filter(_ => st.getPath.getName.startsWith("wave="))
        .filter(w => fs.exists(new org.apache.hadoop.fs.Path(spillDir(w))))
    }
  }

  private def latestBacklogBase(wave: Int): Option[Int] = {
    val re = "BACKLOG_BASE-(\\d+)\\.json".r
    val c = listMarkerWaves(re).filter(_ <= wave)
    if (c.isEmpty) None else Some(c.max)
  }

  /** Top-level backlog dirs readable as of `wave`: compacted base +
    * newer deltas, enumerated explicitly (an uncommitted crashed
    * wave's partial delta and folded deltas are never read). */
  private def backlogDirs(wave: Int): Seq[String] = {
    val base = latestBacklogBase(wave)
    val b = base.getOrElse(-1)
    base.map(bb => dir("backlog_base", s"upto=$bb")).toSeq ++
      backlogDeltaWaves().filter(w => w > b && w <= wave).sorted.map(spillDir)
  }

  /** Live backlog rows as of `wave`: fence join drops stale copies of
    * refilled rows. O(backlog) — observability/compaction path only,
    * never part of a wave. */
  private def backlogLive(wave: Int, fence: DataFrame): DataFrame = {
    // enumerate concrete bucket dirs (partition discovery would treat
    // the delta=N roots as conflicting partition structures)
    val dirs = backlogBucketDirs(wave, (0 until cfg.backlogBuckets).toSet)
    if (dirs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], PendingSchema)
    val raw = spark.read.schema(PendingSchema)
      .option("recursiveFileLookup", "true").parquet(dirs: _*)
      .select("surt_key", "canonical_url", "host", "priority")
    raw.join(fence.select(col("host"), col("fp"), col("fs")), Seq("host"), "inner")
      .filter(col("fp").isNotNull &&
        (col("priority") > col("fp") ||
          (col("priority") === col("fp") && col("surt_key") > col("fs"))))
      .select("surt_key", "canonical_url", "host", "priority")
  }

  /** The bkb=<bucket*16+band> subdirectories of the readable backlog
    * dirs whose logical bucket is in `buckets` and which physically
    * exist — the directory-pruned refill read set. `bandZeroOnly`
    * keeps only band-0 dirs. */
  private def backlogBucketDirs(wave: Int, buckets: Set[Int],
                                bandZeroOnly: Boolean = false): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    backlogDirs(wave).flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        n.stripPrefix("bkb=").toIntOption match {
          case Some(v) if n.startsWith("bkb=") &&
              buckets.contains(v / (MaxBand + 1)) &&
              (!bandZeroOnly || v % (MaxBand + 1) == 0) =>
            Some(st.getPath.toString)
          case _ => None
        }
      }
    }
  }


  /** Fold backlog deltas ≤ `upTo` (committed) into one compacted
    * bucketed base, dropping dead rows (≤ fence — stale refill copies)
    * for good. Marker-published; readers enumerate (base, deltas >
    * base) so a crash anywhere leaves only unread garbage. Runs every
    * `compactEvery` waves from the wave loop: O(backlog) I/O amortized
    * to O(backlog/K) per wave. */
  def compactBacklog(upTo: Int): Unit = {
    require(upTo <= latestCommittedWave(), s"wave $upTo not committed yet")
    if (latestBacklogBase(upTo).contains(upTo)) return
    if (backlogDirs(upTo).isEmpty) return
    sweepOrphanBases("backlog_base", "BACKLOG_BASE-")
    val prevBase = latestBacklogBase(upTo)
    val live = backlogLive(upTo, fenceDf(upTo))
    live.select(col("surt_key"), col("canonical_url"), col("host"), col("priority"),
        bkbCol.as("bkb"))
      .repartition(col("bkb"))
      .write.partitionBy("bkb").mode("overwrite")
      .parquet(dir("backlog_base", s"upto=$upTo"))
    publishMarker(s"BACKLOG_BASE-$upTo.json", s"""{"upto":$upTo}""")
    val conf = spark.sessionState.newHadoopConf()
    def rm(path: String): Unit =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf).delete(p, true); ()
      } catch { case _: Exception => }
    prevBase.foreach { b =>
      deleteMarker(s"BACKLOG_BASE-$b.json")
      rm(dir("backlog_base", s"upto=$b"))
    }
    // folded spill deltas go; their maint dir disappears once the
    // head/fence partitions were pruned too (non-recursive no-op else)
    backlogDeltaWaves().filter(_ <= upTo).foreach { w =>
      rm(spillDir(w))
      try {
        val p = new org.apache.hadoop.fs.Path(maintDir(w))
        val fs = p.getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), false)
        fs.delete(p, false); ()
      } catch { case _: Exception => }
    }
  }

  /** Delete superseded per-wave state: fence dirs and the head/fence
    * partitions of maint dirs ≤ wave-2 (resume reads at most state
    * wave-1; spill partitions are BACKLOG and live until compaction).
    * Self-healing (diffs the disk, not a fixed offset). */
  private def pruneFrontierState(wave: Int): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    def waveDirs(kind: String): Seq[(Int, org.apache.hadoop.fs.Path)] = {
      val root = new org.apache.hadoop.fs.Path(cfg.checkpointDir, kind)
      try {
        val fs = root.getFileSystem(conf)
        if (!fs.exists(root)) Nil
        else fs.listStatus(root).toSeq.flatMap { d =>
          d.getPath.getName.stripPrefix("wave=").toIntOption
            .filter(_ => d.getPath.getName.startsWith("wave="))
            .map(w => (w, d.getPath))
        }
      } catch { case _: Exception => Nil }
    }
    for ((w, p) <- waveDirs("fence") if w <= wave - 2) {
      try { p.getFileSystem(conf).delete(p, true); () } catch { case _: Exception => }
      deleteMarker(s"FENCES-$w.m")
    }
    for ((w, p) <- waveDirs("maint") if w <= wave - 2) {
      val fs = p.getFileSystem(conf)
      for (sub <- Seq("dest=head", "_SUCCESS"))
        try { fs.delete(new org.apache.hadoop.fs.Path(p, sub), true); () }
        catch { case _: Exception => }
      // reclaim the wave dir once the spill partition is also gone
      try { fs.delete(p, false); () } catch { case _: Exception => }
    }
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
    * priority). Canonicalizes + dedups, admits everything to the SEEN
    * set (membership parity with the reference is insert-time,
    * pre-robots), gates robots at insert, and writes the whole
    * allowed queue as the wave-0 head — the per-host top-M cut is
    * LAZY (wave 1's schedule window, which must sort the head anyway,
    * trims it and sets the first fences), so init is pure O(seeds)
    * I/O with zero exchanges. Commits wave 0. */
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
      .select("surt_key", "canonical_url", "host", "priority")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Frontier.stateWriteEc
    val obs = org.apache.spark.sql.Observation()
    val fSeen = Future {
      canon.select("surt_key").observe(obs, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(dir("seen", "wave=0"))
    }
    val fShards = Future {
      writeIndex(0, updateShardFiles(Map.empty, canon.select("surt_key"), 0))
    }
    val headObs = org.apache.spark.sql.Observation()
    val fState = Future {
      // LAZY head split: the ENTIRE allowed seed set becomes the head
      // — no window, no shuffle, a straight filtered write. Wave 1's
      // schedule window (which must sort the head anyway) performs the
      // per-host top-M cut and sets the first fences; init itself is
      // O(seeds) I/O with zero exchanges.
      applyRobots(canon).observe(headObs, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(headDir(0))
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], FenceSchema)
        .write.mode("overwrite").parquet(dir("fence", "wave=0"))
    }
    Await.result(fSeen, Duration.Inf)
    Await.result(fShards, Duration.Inf)
    Await.result(fState, Duration.Inf)
    canon.unpersist(blocking = false)
    phase("seen+shards+head/backlog split (concurrent)")
    val n = obs.get("n").asInstanceOf[Long]
    // allowed/pending reflect the robots-gated head actually written;
    // candidates/deduped/seen reflect pre-gate admission (seen parity)
    val nAllowed = headObs.get("n").asInstanceOf[Long]
    val res = WaveResult(0, n, n, n, nAllowed, 0, n, nAllowed,
      (System.nanoTime() - t0) / 1e9)
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

    val prevIdx = readIndex(prev)
    val head = headDf(prev)
    val fencePrev = fenceDf(prev)

    // 1. schedule from the HEAD under the politeness budget: a plain
    // per-host window — head rows per host are bounded by ~M, so no
    // salting is needed here (hot-host mass lives in the backlog, not
    // the head). The SAME ranked frame yields both the scheduled rows
    // (rank ≤ k_eff) and the head remainder (rank > k_eff) — no
    // anti-join of state against schedule exists anymore.
    // The same ranked frame ALSO drives the LAZY head cut (see
    // maintainFrontier): never-spilled hosts whose queue overflowed M
    // get trimmed here — rank > M rows spill, the rank-M row becomes
    // the first fence — since this window must sort the head anyway,
    // the cut costs no extra shuffle, ever.
    val w = Window.partitionBy(col("host")).orderBy(col("priority"), col("surt_key"))
    // FENCE-FREE FAST PATH: the previous wave records whether ANY host
    // has a fence (a tiny disk marker — no job). Most crawls' early
    // waves (and wide-shallow crawls forever) have none, and then the
    // fence join, the needy probe and the fencePrev reads all vanish.
    val hasFences = markerExists(s"FENCES-$prev.m")
    val M = headM
    var extraPersists: List[DataFrame] = Nil
    val (ranked, saltDropped) =
      if (hasFences) {
        // fenced steady state: heads are already cut to ~M per host —
        // a plain window suffices. row_number and lead share ONE
        // Window pass (same partitioning + ordering): has_next at the
        // rank-M row tells whether the host's queue overflows M
        // without a second count-over-partition pass.
        val r = withKeff(head)
          .join(fencePrev.select(col("host"), col("fp"), col("fs")), Seq("host"), "left")
          .withColumn("rank_in_host", row_number().over(w))
          .withColumn("has_next", lead(col("surt_key"), 1).over(w).isNotNull)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (r, None)
      } else {
        // fence-free waves hold UNCUT queues (the whole seed list
        // after init; a new hot host's first wave): the schedule/cut
        // window gets the SALTED pre-phase so one Zipf-head host
        // cannot serialize a reducer — phase 1 keeps per-(host, salt)
        // top-M (a superset of the true top-M; rows it drops have ≥ M
        // better rows in their own salt group, hence are outside the
        // global top-M and spill directly — exact), phase 2 ranks the
        // ≤ salt×M survivors per host. has_next = "host total exceeds
        // this rank" comes from a per-host count join (survivor-local
        // lead() cannot see salt-dropped rows — a fence must be set
        // whenever ANYTHING spilled).
        val base = withKeff(head)
          .withColumn("fp", lit(null).cast("int"))
          .withColumn("fs", lit(null).cast("string"))
        val wSalt = Window
          .partitionBy(col("host"), pmod(hash(col("surt_key")), lit(cfg.salt)))
          .orderBy(col("priority"), col("surt_key"))
        val p1 = base.withColumn("rn1", row_number().over(wSalt))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        extraPersists ::= p1
        val cnts = base.groupBy("host").agg(count(lit(1)).as("cnt"))
        val r = p1.filter(col("rn1") <= M).drop("rn1")
          .withColumn("rank_in_host", row_number().over(w))
          .join(cnts, Seq("host"))
          .withColumn("has_next", col("cnt") > col("rank_in_host"))
          .drop("cnt")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (r, Some(p1.filter(col("rn1") > M)
          .select("surt_key", "canonical_url", "host", "priority")))
      }
    val scheduled = ranked.filter(col("rank_in_host") <= col("k_eff"))
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

    // 4. state updates. The three sinks (seen delta, shard files, and
    // the head/fence/backlog maintenance chain) all hang off the
    // PERSISTED `fresh` and are mutually independent, so their jobs
    // are submitted CONCURRENTLY. Crash consistency is unaffected: any
    // subset of the writes is invisible until the manifest commits,
    // and a re-run overwrites everything idempotently.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      Frontier.stateWriteEc
    val fSeen = Future {
      val t = System.nanoTime()
      // seen DELTA: persist only this wave's fresh keys (O(fresh) write)
      fresh.select("surt_key").write.mode("overwrite").parquet(dir("seen", s"wave=$wave"))
      if (debug) System.err.println(
        f"[frontier]     fSeen: ${(System.nanoTime() - t) / 1e9}%.2fs")
    }
    val fShards = Future {
      val t = System.nanoTime()
      // incremental shard maintenance: insert only this wave's fresh keys
      val updatedShards = updateShardFiles(prevIdx, fresh.select("surt_key"), wave)
      writeIndex(wave, prevIdx ++ updatedShards)
      if (debug) System.err.println(
        f"[frontier]     fShards: ${(System.nanoTime() - t) / 1e9}%.2fs")
      updatedShards
    }
    val fState = Future {
      maintainFrontier(ranked, fencePrev, fresh, wave, hasFences, nFresh, saltDropped)
    }
    Await.result(fSeen, Duration.Inf)
    Await.result(fShards, Duration.Inf)
    Await.result(fState, Duration.Inf)
    fresh.unpersist(blocking = false)
    ranked.unpersist(blocking = false)
    extraPersists.foreach(_.unpersist(blocking = false))
    phase("state writes (head/fence/backlog+seen+shards, concurrent)")

    // scheduled count came from the write job's Observation; state-size
    // reports are observability, skipped in bench mode
    val nScheduled = schedObs.get("n").asInstanceOf[Long]
    val nSeen = if (fast) -1L else seenUpTo(wave).count()
    val nPending = if (fast) -1L
      else headDf(wave).count() +
        fenceDf(wave).agg(coalesce(sum(col("bn")), lit(0L))).head().getLong(0)
    val res = WaveResult(wave, nFresh, nFresh, nFresh, nScheduled,
      nScheduled, nSeen, nPending, (System.nanoTime() - t0) / 1e9)
    commit(wave, res)
    // reclaim shard files superseded one wave ago (lag keeps a re-run
    // of THIS wave resolvable from the previous index), plus head/fence
    // dirs older than the resume horizon
    pruneSupersededShardFiles(wave)
    pruneFrontierState(wave)
    // periodic compaction, part of the wave loop (not a manual API):
    // fold seen + backlog deltas ≤ wave-1 — strictly-older-than-latest,
    // the crash-replay shape the resume suite proves — every K
    // committed waves. O(state) I/O amortized to O(state/K) per wave.
    if (cfg.compactEvery > 0 && wave > 0 && wave % cfg.compactEvery == 0) {
      compactSeen(wave - 1)
      compactBacklog(wave - 1)
    }
    res
  }

  /** The wave's head/fence/backlog maintenance — every step costs
    * O(head + fresh + hosts + refilled-backlog), never O(pending):
    *
    *  1. LAZY CUT, fused into the schedule window: the ranked head
    *     frame (already sorted per host for scheduling) trims each
    *     never-spilled host whose queue exceeded M — rank > M rows
    *     spill, the rank-M row becomes the host's first fence. The
    *     cut is free (the schedule had to sort the head anyway) and
    *     finite-fence hosts are never trimmed (fences are monotone —
    *     no row at-or-below a fence may ever re-enter the backlog,
    *     where stale refill copies live).
    *  2. fresh (robots-gated at insert) joins the post-cut fence
    *     table and ROUTES with no window at all: above-fence rows
    *     append to the wave's backlog delta; everything else goes
    *     straight to the head. A brand-new host's whole queue rides
    *     in the head until the next schedule window cuts it — bounded
    *     overgrowth for one wave, exactness unaffected (the head is
    *     still exactly "pending at-or-below the fence").
    *  3. state lands in TWO writes: the head (pure cached scans — no
    *     shuffle) and the bucketed spill delta (one small shuffle of
    *     just the spilled rows); per-host head/spill counts come back
    *     as columnar reads of what was written.
    *  4. refill: hosts with live backlog (bn > 0) whose head dropped
    *     below hostBudget pull their per-host top-(M − |head|) back
    *     from the backlog — reading ONLY the needy hosts' bucket
    *     dirs — and their fences RAISE to the max refilled row (stale
    *     copies left behind become invisible to every later read).
    */
  private def maintainFrontier(ranked: DataFrame, fencePrev: DataFrame,
                               fresh: DataFrame, wave: Int,
                               hasFences: Boolean, nFresh: Long,
                               saltDropped: Option[DataFrame]): Unit = {
    import spark.implicits._
    val debug = sys.env.get("GRAFT_DEBUG").contains("1")
    var tSub = System.nanoTime()
    def sub(name: String): Unit = if (debug) {
      val now = System.nanoTime()
      System.err.println(f"[frontier]   maint $name: ${(now - tSub) / 1e9}%.2fs")
      tSub = now
    }
    val M = headM
    val pcols = Seq("surt_key", "canonical_url", "host", "priority")
    val wHost = Window.partitionBy(col("host")).orderBy(col("priority"), col("surt_key"))
    // a crashed earlier attempt may have left partial subdirs; the
    // wave's state is rebuilt from scratch (invisible until commit)
    try {
      val p = new org.apache.hadoop.fs.Path(maintDir(wave))
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true); ()
    } catch { case _: Exception => }

    // 1. lazy cut from the schedule frame (all cached scans)
    val keepHead = ranked.filter(col("rank_in_host") > col("k_eff") &&
        (col("fp").isNotNull || col("rank_in_host") <= M))
      .select(pcols.map(col): _*)
    val schedSpill = ranked.filter(col("fp").isNull && col("rank_in_host") > M)
      .select(pcols.map(col): _*)
      // phase-1 salt drops are provably outside the per-host top-M
      .unionByName(saltDropped.getOrElse(emptyPending))
    // first-spill fences: one row per overflowing never-spilled host
    val schedFence = ranked.filter(col("fp").isNull &&
        col("rank_in_host") === M && col("has_next"))
      .select(col("host"), col("priority").as("nfp"), col("surt_key").as("nfs"))

    // 2. fresh routing against the POST-CUT fence view (when no fences
    // existed before, the route table is just this wave's fence sets)
    val fenceRoute =
      if (hasFences)
        fencePrev.select(col("host"), col("fp"), col("fs"))
          .join(schedFence, Seq("host"), "full_outer")
          .select(col("host"),
            coalesce(col("nfp"), col("fp")).as("fp"),
            coalesce(col("nfs"), col("fs")).as("fs"))
      else schedFence.select(col("host"), col("nfp").as("fp"), col("nfs").as("fs"))
    val freshAllowed = applyRobots(fresh.select(pcols.map(col): _*))
    val fj = freshAllowed.join(fenceRoute, Seq("host"), "left")
    val aboveFence = col("fp").isNotNull &&
      (col("priority") > col("fp") ||
        (col("priority") === col("fp") && col("surt_key") > col("fs")))
    val freshHead = fj.filter(!aboveFence).select(pcols.map(col): _*)
    val freshSpill = fj.filter(aboveFence).select(pcols.map(col): _*)

    // 3. two state writes — INDEPENDENT jobs over cached inputs,
    // submitted concurrently: shuffle-free head, bucketed spill delta
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = Frontier.stateWriteEc
      val fHead = Future {
        val t = System.nanoTime()
        // narrow coalesce: the union doubles partition count; halve it
        // back so the head dir keeps ~one file per core
        keepHead.unionByName(freshHead)
          .coalesce(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(headDir(wave))
        if (debug) System.err.println(
          f"[frontier]     fHead: ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
      val fSpill = Future {
        val t = System.nanoTime()
        // banded like the compacted base — but ONLY when this wave's
        // spill is big enough for bands to carry real mass: every
        // (bucket, band) dir costs a fixed create+commit, so a small
        // delta collapses into band 0, which phase-A refills always
        // read anyway (a superset read never breaks the settled test —
        // unread rows still live strictly above band 0). The big
        // deltas (a seed-queue cut) and every compacted base stay
        // fully banded.
        // cut waves (!hasFences — the giant seed-queue trim) always
        // band: their spill IS the deep backlog later refills must
        // band-prune; steady-state deltas band only above ~5k rows/dir
        // (schedSpill is empty once every host is fenced, so nFresh
        // bounds the steady spill)
        val bandIt = !hasFences || nFresh > 5000L * cfg.backlogBuckets * (MaxBand + 1)
        schedSpill.unionByName(freshSpill)
          .withColumn("bkb", if (bandIt) bkbCol else bucketCol * lit(MaxBand + 1))
          .repartition(col("bkb")) // one file per (bucket, band) dir
          .write.partitionBy("bkb").mode("overwrite").parquet(spillDir(wave))
        if (debug) System.err.println(
          f"[frontier]     fSpill: ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
      Await.result(fHead, Duration.Inf)
      Await.result(fSpill, Duration.Inf)
    }
    sub("head+spill writes (concurrent)")

    // fence accounting from the written state + the in-memory fence sets
    val spilledCounts = readDest(spillDir(wave))
      .groupBy("host").agg(count(lit(1)).as("spilled"))
    val headCounts = readDest(headDir(wave))
      .groupBy("host").agg(count(lit(1)).as("hc"))
    val fence2Base =
      if (hasFences) fenceRoute.join(fencePrev.select(col("host"), col("bn")), Seq("host"), "left")
      else fenceRoute.withColumn("bn", lit(0L))
    val fence2 = fence2Base
      .join(spilledCounts, Seq("host"), "full_outer")
      .select(col("host"), col("fp"), col("fs"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("spilled"), lit(0L))).as("bn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4. refill: needy = live backlog and head below the politeness budget
    val needy = fence2
      .join(headCounts, Seq("host"), "left")
      .select(col("host"), col("fp"), col("fs"), col("bn"),
        coalesce(col("hc"), lit(0L)).as("hc"))
      .filter(col("bn") > 0 && col("hc") < cfg.hostBudget)
      .withColumn("deficit", lit(M.toLong) - col("hc"))
      .withColumn("bucket", bucketCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rlOpt: Option[DataFrame] = None
    var rlBOpt: Option[DataFrame] = None
    var settledOpt: Option[DataFrame] = None
    var needyBOpt: Option[DataFrame] = None
    // provably-empty shortcut: with no pre-existing fences, only hosts
    // that spilled THIS wave have bn > 0, and such a host kept ranks
    // (k_eff, M] in its head — at least M − hostBudget ≥ hostBudget
    // rows when headMult ≥ 2 — so it cannot be needy. Skips the probe
    // job on every fence-free wave.
    val needyEmpty =
      if (!hasFences && cfg.headMult >= 2) true
      else needy.isEmpty
    sub("fence2+needy")
    val fenceFinal =
      if (needyEmpty) fence2
      else {
        // TWO-PHASE BANDED REFILL. Phase A reads the needy buckets'
        // spill DELTAS (recent, small, unbanded) plus only the BAND-0
        // slice of the compacted base. A host is settled by phase A
        // when it yields its full deficit AND the worst taken row's
        // priority stays strictly inside band 0 — every unread base
        // row then has a strictly higher priority, so the taken set
        // provably equals the global per-host top-deficit. Hosts that
        // fail the test re-read all bands (phase B) — rare, and cheap
        // exactly when the queue is shallow. Net effect: a refill
        // costs O(taken + band-0 slice), not a rescan of the host's
        // whole deep queue.
        val buckets = needy.select("bucket").distinct().as[Int].collect().toSet
        def liveRanked(dirs: Seq[String], who: DataFrame): DataFrame = {
          val raw =
            if (dirs.isEmpty) emptyPending
            else spark.read.schema(PendingSchema)
              .option("recursiveFileLookup", "true").parquet(dirs: _*)
          raw.join(who.select(col("host"), col("fp"), col("fs"), col("deficit")),
              Seq("host"), "inner")
            .filter(aboveFence) // strictly above: stale refill copies drop out
            .withColumn("rk", row_number().over(wHost))
        }
        val rlA = liveRanked(backlogBucketDirs(wave, buckets, bandZeroOnly = true), needy)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rlOpt = Some(rlA)
        // per-host phase-A outcome: settled iff deficit met inside band 0
        val aAgg = rlA.groupBy("host").agg(
          sum(when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("takenA"),
          max(when(col("rk") <= col("deficit"), col("priority"))).as("worstA"))
        val settled = needy.join(aAgg, Seq("host"), "left")
          .select(col("host"), col("deficit"),
            (coalesce(col("takenA"), lit(0L)) === col("deficit") &&
              col("worstA") < BandWidth).as("ok"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        settledOpt = Some(settled)
        val needyB = needy.join(settled.filter(!col("ok")).select("host"), Seq("host"), "inner")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        needyBOpt = Some(needyB)
        val anyB = !needyB.isEmpty
        val takenARows = rlA
          .join(settled.filter(col("ok")).select("host"), Seq("host"), "inner")
          .filter(col("rk") <= col("deficit"))
          .select(pcols.map(col): _*)
        val (takenBRows, bAgg) =
          if (!anyB) (emptyPending, None)
          else {
            val bBuckets = needyB.select("bucket").distinct().as[Int].collect().toSet
            val rlB = liveRanked(backlogBucketDirs(wave, bBuckets), needyB)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            rlBOpt = Some(rlB)
            val agg = rlB.groupBy("host").agg(
              count(lit(1)).as("liveCnt"),
              sum(when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("takenCnt"),
              max(when(col("rk") <= col("deficit"),
                struct(col("priority").as("p"), col("surt_key").as("s")))).as("mx"))
            (rlB.filter(col("rk") <= col("deficit")).select(pcols.map(col): _*), Some(agg))
          }
        // refilled rows APPEND to the head partition (this wave's dir
        // was cleared above, so only this run's files exist)
        takenARows.unionByName(takenBRows)
          .write.mode("overwrite").parquet(headDir(wave) + "/refill")
        // fence/bn updates: settled hosts advance arithmetically (bn
        // was exact, deficit rows left); phase-B hosts resync from the
        // rows actually read — exact even if a compaction physically
        // dropped dead rows
        val aFence = rlA
          .join(settled.filter(col("ok")).select("host"), Seq("host"), "inner")
          .filter(col("rk") <= col("deficit"))
          .groupBy("host").agg(
            count(lit(1)).as("takenCntA"),
            max(struct(col("priority").as("p"), col("surt_key").as("s"))).as("mxA"))
        val withA = fence2.join(aFence, Seq("host"), "left")
          .select(col("host"),
            when(col("takenCntA").isNotNull, col("mxA.p")).otherwise(col("fp")).as("fp"),
            when(col("takenCntA").isNotNull, col("mxA.s")).otherwise(col("fs")).as("fs"),
            when(col("takenCntA").isNotNull, col("bn") - col("takenCntA"))
              .otherwise(col("bn")).as("bn"))
        bAgg match {
          case None => withA
          case Some(agg) =>
            val adj = needyB.select(col("host"), lit(true).as("isNeedy"))
              .join(agg, Seq("host"), "left")
            withA.join(adj, Seq("host"), "left")
              .select(col("host"),
                when(col("takenCnt").isNotNull && col("takenCnt") > 0, col("mx.p"))
                  .otherwise(col("fp")).as("fp"),
                when(col("takenCnt").isNotNull && col("takenCnt") > 0, col("mx.s"))
                  .otherwise(col("fs")).as("fs"),
                when(col("isNeedy"),
                  coalesce(col("liveCnt"), lit(0L)) - coalesce(col("takenCnt"), lit(0L)))
                  .otherwise(col("bn")).as("bn"))
        }
      }
    sub("refill")
    val fenceObs = org.apache.spark.sql.Observation()
    fenceFinal.select("host", "fp", "fs", "bn")
      .observe(fenceObs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(dir("fence", s"wave=$wave"))
    deleteMarker(s"FENCES-$wave.m")
    if (fenceObs.get("n").asInstanceOf[Long] > 0L)
      publishMarker(s"FENCES-$wave.m", "{}")
    sub("fence write")
    fence2.unpersist(blocking = false)
    needy.unpersist(blocking = false)
    rlOpt.foreach(_.unpersist(blocking = false))
    rlBOpt.foreach(_.unpersist(blocking = false))
    settledOpt.foreach(_.unpersist(blocking = false))
    needyBOpt.foreach(_.unpersist(blocking = false))
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
  /** FULL pending frontier as of `wave` (head ∪ live backlog) — the
    * observability/oracle view. Wave scheduling itself never touches
    * this; exposing it lets wave+1's schedule be re-derived from the
    * complete pending set and compared against the head-only schedule
    * — i.e. the oracle CHECKS the queue-head invariant. O(pending)
    * read; valid for waves ≥ latestCommitted−1 (older head/fence dirs
    * are pruned). */
  def pendingDf(wave: Int): DataFrame =
    headDf(wave).unionByName(backlogLive(wave, fenceDf(wave)))
  /** Per-host queue-head table as of `wave` (the rows wave+1's
    * scheduling actually consults). */
  def headTableDf(wave: Int): DataFrame = headDf(wave)
  /** Per-host fence/backlog accounting as of `wave`. */
  def fenceTableDf(wave: Int): DataFrame = fenceDf(wave)
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
      java.util.concurrent.Executors.newFixedThreadPool(8, r => {
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
