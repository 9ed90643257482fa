package graft.frontier

/** Compact approximate-membership filters for the URL-seen set.
  *
  * Primary: a cuckoo filter (2-choice, 4-slot buckets, 16-bit
  * fingerprints → ~0.01% FP at 95% load, supports deletion). Fallback: a
  * blocked Bloom filter. Both serialize to byte arrays so the seen-set
  * ships as PARTITIONED SHARDS: executors build one filter chain per hash
  * shard, candidates shuffle to their shard's partition, and the probe
  * happens executor-side in a cogroup — the driver never holds any filter
  * state (north rule: "partitioned cuckoo-filter URL-seen set, bloom
  * fallback per executor").
  *
  * Filters are a PREFILTER only — survivors still pass an exact
  * anti-join, so false positives cannot drop URLs incorrectly; the
  * filter exists to keep the exact join's probe side small. */
object SeenFilter {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashKey(key: String): Long = {
    var h = 1469598103934665603L
    var i = 0
    while (i < key.length) { h = (h ^ key.charAt(i)) * 1099511628211L; i += 1 }
    mix64(h)
  }

  // =================================================================
  // Cuckoo filter
  // =================================================================

  /** buckets = power of two; 4 x 16-bit slots per bucket (0 = empty). */
  final class Cuckoo(val numBuckets: Int, val table: Array[Short]) {
    require(Integer.bitCount(numBuckets) == 1, "numBuckets must be a power of 2")
    private val mask = numBuckets - 1

    private def fingerprint(h: Long): Short = {
      val f = ((h >>> 48) & 0xffff).toInt
      (if (f == 0) 1 else f).toShort
    }
    private def bucket1(h: Long): Int = (h & mask).toInt
    private def altBucket(b: Int, f: Short): Int =
      (b ^ (mix64(f & 0xffffL) & mask)).toInt & mask

    def insert(key: String): Boolean = insertHash(hashKey(key))

    def insertHash(h: Long): Boolean = {
      val f = fingerprint(h)
      val b1 = bucket1(h)
      val b2 = altBucket(b1, f)
      if (tryPut(b1, f) || tryPut(b2, f)) return true
      // cuckoo eviction — the displacement chain is recorded so a FAILED
      // insert can be rolled back exactly. Without rollback the final
      // homeless fingerprint (a PREVIOUSLY INSERTED key's) would be
      // silently dropped → a false negative → a seen URL re-scheduled.
      var b = if ((mix64(h) & 1) == 0) b1 else b2
      var cur = f
      var kicks = 0
      val rnd = new java.util.Random(h)
      val pathSlots = new Array[Int](500)
      val pathVals = new Array[Short](500)
      while (kicks < 500) {
        val slot = b * 4 + rnd.nextInt(4)
        pathSlots(kicks) = slot
        pathVals(kicks) = table(slot)
        val evicted = table(slot)
        table(slot) = cur
        cur = evicted
        b = altBucket(b, cur)
        kicks += 1
        if (tryPut(b, cur)) return true
      }
      var i = kicks - 1
      while (i >= 0) { table(pathSlots(i)) = pathVals(i); i -= 1 }
      false // full — caller should grow or fall back to bloom
    }

    private def tryPut(b: Int, f: Short): Boolean = {
      var s = b * 4
      val end = s + 4
      while (s < end) {
        if (table(s) == 0) { table(s) = f; return true }
        s += 1
      }
      false
    }

    def mightContain(key: String): Boolean = mightContainHash(hashKey(key))

    def mightContainHash(h: Long): Boolean = {
      val f = fingerprint(h)
      val b1 = bucket1(h)
      val b2 = altBucket(b1, f)
      contains(b1, f) || contains(b2, f)
    }

    private def contains(b: Int, f: Short): Boolean = {
      var s = b * 4
      val end = s + 4
      while (s < end) {
        if (table(s) == f) return true
        s += 1
      }
      false
    }

    def serialize(): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + table.length * 2)
      bb.putInt(0x43554b31) // "CUK1"
      bb.putInt(numBuckets)
      table.foreach(bb.putShort)
      bb.array()
    }
  }

  object Cuckoo {
    def create(expectedItems: Long): Cuckoo = {
      // 4 slots/bucket at ≤95% load
      var buckets = 1
      while (buckets.toLong * 4 * 95 / 100 < expectedItems) buckets <<= 1
      new Cuckoo(math.max(buckets, 16), new Array[Short](math.max(buckets, 16) * 4))
    }
    def deserialize(bytes: Array[Byte]): Cuckoo = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      require(bb.getInt() == 0x43554b31, "bad cuckoo magic")
      val buckets = bb.getInt()
      val table = new Array[Short](buckets * 4)
      var i = 0
      while (i < table.length) { table(i) = bb.getShort(); i += 1 }
      new Cuckoo(buckets, table)
    }
  }

  // =================================================================
  // Blocked bloom fallback
  // =================================================================

  final class Bloom(val bits: Array[Long]) {
    private val nBits = bits.length * 64L
    def insertHash(h: Long): Unit = {
      var i = 0
      var hh = h
      while (i < 3) {
        val bit = java.lang.Math.floorMod(hh, nBits)
        bits((bit >>> 6).toInt) |= (1L << (bit & 63))
        hh = mix64(hh)
        i += 1
      }
    }
    def mightContainHash(h: Long): Boolean = {
      var i = 0
      var hh = h
      while (i < 3) {
        val bit = java.lang.Math.floorMod(hh, nBits)
        if ((bits((bit >>> 6).toInt) & (1L << (bit & 63))) == 0) return false
        hh = mix64(hh)
        i += 1
      }
      true
    }
    def serialize(): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
      bb.putInt(0x424c4d31) // "BLM1"
      bb.putInt(bits.length)
      bits.foreach(bb.putLong)
      bb.array()
    }
  }

  object Bloom {
    def create(expectedItems: Long, bitsPerItem: Int = 12): Bloom =
      new Bloom(new Array[Long](math.max(16, ((expectedItems * bitsPerItem + 63) / 64).toInt)))
    def deserialize(bytes: Array[Byte]): Bloom = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      require(bb.getInt() == 0x424c4d31, "bad bloom magic")
      val n = bb.getInt()
      val bits = new Array[Long](n)
      var i = 0
      while (i < n) { bits(i) = bb.getLong(); i += 1 }
      new Bloom(bits)
    }
  }

  /** Common probe interface over parsed filters. */
  sealed trait Probe extends Serializable { def mightContainHash(h: Long): Boolean }

  /** Parse a blob once; probe many times (deserializing per probe would
    * copy the whole table per row — the cardinal sin of the hot path). */
  def parse(blob: Array[Byte]): Probe =
    if (java.nio.ByteBuffer.wrap(blob).getInt() == 0x43554b31) {
      val c = Cuckoo.deserialize(blob)
      new Probe { def mightContainHash(h: Long): Boolean = c.mightContainHash(h) }
    } else {
      val b = Bloom.deserialize(blob)
      new Probe { def mightContainHash(h: Long): Boolean = b.mightContainHash(h) }
    }

  /** Polymorphic probe over a serialized shard (cuckoo or bloom) —
    * convenience for tests; use ShardProbe/parse in hot paths. */
  def mightContain(shardBytes: Array[Byte], key: String): Boolean =
    parse(shardBytes).mightContainHash(hashKey(key))

  /** Build one shard from an iterator of keys: cuckoo first, bloom
    * fallback if the cuckoo overflows (reference-north-rule behavior). */
  def buildShard(keys: Iterator[String], expected: Long): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    keys.foreach(k => buf += hashKey(k))
    val cuckoo = Cuckoo.create(math.max(expected, buf.length))
    var ok = true
    val it = buf.iterator
    while (ok && it.hasNext) ok = cuckoo.insertHash(it.next())
    if (ok) cuckoo.serialize()
    else {
      val bloom = Bloom.create(math.max(expected, buf.length))
      buf.foreach(bloom.insertHash)
      bloom.serialize()
    }
  }

  // =================================================================
  // Incremental shard chains
  // =================================================================
  // A shard is a CHAIN of filter blobs: probes check every blob; new
  // keys insert into the newest cuckoo blob, and when it fills a fresh
  // blob (sized ≥ 2× the last) is appended. This makes per-wave filter
  // maintenance O(new keys) instead of O(all seen keys) — at 10^10 URLs
  // rebuilding every wave would dominate the wave.

  def mightContainChain(blobs: Seq[Array[Byte]], key: String): Boolean = {
    val h = hashKey(key)
    blobs.exists(b => parse(b).mightContainHash(h))
  }

  /** Insert a STREAM of key hashes into the chain, appending a fresh
    * geometrically-grown blob on overflow. Streaming matters: the caller
    * (shard maintenance cogroup) never materializes a wave's keys — a hot
    * wave's millions of new keys flow through O(1) memory beyond the
    * filter tables themselves. */
  def updateShardChainHashes(blobs: Seq[Array[Byte]], hashes: Iterator[Long]): Seq[Array[Byte]] = {
    if (!hashes.hasNext) return blobs
    val out = blobs.toBuffer
    // resume inserting into the newest blob if it is a cuckoo
    var cur: Cuckoo = null
    if (out.nonEmpty && java.nio.ByteBuffer.wrap(out.last).getInt() == 0x43554b31) {
      cur = Cuckoo.deserialize(out.remove(out.length - 1))
    }
    var lastCap: Long = if (cur != null) cur.numBuckets.toLong * 4 else 0L
    while (hashes.hasNext) {
      val h = hashes.next()
      if (cur == null) {
        cur = Cuckoo.create(math.max(lastCap * 2, 4096L))
        lastCap = cur.numBuckets.toLong * 4
      }
      if (!cur.insertHash(h)) {
        // insertHash rolled the table back; seal it and start a bigger one
        out += cur.serialize()
        cur = Cuckoo.create(math.max(lastCap * 2, 4096L))
        lastCap = cur.numBuckets.toLong * 4
        require(cur.insertHash(h), "insert into a fresh cuckoo cannot fail")
      }
    }
    out += cur.serialize()
    out.toSeq
  }

  /** Insert `keys` into the chain, appending a new blob on overflow. */
  def updateShardChain(blobs: Seq[Array[Byte]], keys: Seq[String]): Seq[Array[Byte]] =
    updateShardChainHashes(blobs, keys.iterator.map(hashKey))

  // =================================================================
  // Exact-hash sorted runs (the shard's EXACT membership)
  // =================================================================
  // 64-bit key hashes stored as a chain of SORTED runs, maintained with
  // the logarithmic method (merge the newest runs whenever an incoming
  // batch is at least as large): amortized O(log) inserts, O(log n)
  // runs, binary-search probes. This lets seen-set membership be
  // decided INSIDE the shard probe task, so a wave's seen-subtraction
  // shuffles O(candidates) — never the 10^10-key seen store (r2's
  // per-wave anti-join shuffled ~0.5-1 TB of SURT strings).
  //
  // Exactness: membership is hash64 equality. A false drop needs a
  // 64-bit collision between a candidate and a DIFFERENT seen key:
  // P ≈ n_seen/2^64 ≈ 5e-10 per candidate at 10^10 seen keys — a
  // handful of falsely-skipped URLs over an entire crawl, each merely
  // not fetched (state is never corrupted). The cuckoo chain stays as
  // the O(1) prefilter: exact runs are only searched on filter hits.

  private val RunMagic = 0x58435431 // "XCT1"

  def encodeRun(sorted: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + sorted.length * 8)
    bb.putInt(RunMagic)
    bb.putInt(sorted.length)
    var i = 0
    while (i < sorted.length) { bb.putLong(sorted(i)); i += 1 }
    bb.array()
  }

  def runCount(blob: Array[Byte]): Int = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    require(bb.getInt() == RunMagic, "bad exact-run magic")
    bb.getInt()
  }

  def decodeRun(blob: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    require(bb.getInt() == RunMagic, "bad exact-run magic")
    val n = bb.getInt()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  private def dedupSortedInPlace(a: Array[Long]): Array[Long] = {
    if (a.length < 2) return a
    var w = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }

  private def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var w = 0
    while (i < a.length && j < b.length) {
      val v = if (a(i) <= b(j)) { val t = a(i); i += 1; t } else { val t = b(j); j += 1; t }
      if (w == 0 || out(w - 1) != v) { out(w) = v; w += 1 }
    }
    while (i < a.length) { if (w == 0 || out(w - 1) != a(i)) { out(w) = a(i); w += 1 }; i += 1 }
    while (j < b.length) { if (w == 0 || out(w - 1) != b(j)) { out(w) = b(j); w += 1 }; j += 1 }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** Insert a batch of hashes as a new sorted run, merging down runs no
    * larger than the batch (logarithmic method). MUTATES `newHashes`
    * (sorts in place) — callers pass a throwaway array. */
  def updateExactRuns(runs: Seq[Array[Byte]], newHashes: Array[Long]): Seq[Array[Byte]] = {
    if (newHashes.isEmpty) return runs
    java.util.Arrays.sort(newHashes)
    var merged = dedupSortedInPlace(newHashes)
    val out = runs.toBuffer
    while (out.nonEmpty && runCount(out.last) <= merged.length)
      merged = mergeSorted(decodeRun(out.remove(out.length - 1)), merged)
    out += encodeRun(merged)
    out.toSeq
  }

  /** Parsed probe over a run chain: binary search per run. */
  final class ExactProbe(runs: Array[Array[Long]]) extends Serializable {
    def contains(h: Long): Boolean = {
      var i = 0
      while (i < runs.length) {
        if (java.util.Arrays.binarySearch(runs(i), h) >= 0) return true
        i += 1
      }
      false
    }
    def size: Long = { var s = 0L; runs.foreach(s += _.length); s }
  }

  def parseExact(blobs: Seq[Array[Byte]]): ExactProbe =
    new ExactProbe(blobs.map(decodeRun).toArray)

  // =================================================================
  // Shard-state file format (filters chain + exact runs)
  // =================================================================
  // One compact binary blob per shard, stored as a FILE under the
  // frontier checkpoint and read DIRECTLY by the task that probes that
  // shard — shard state never rides a shuffle.

  final case class ShardState(filters: Seq[Array[Byte]], exact: Seq[Array[Byte]]) {
    def isEmpty: Boolean = filters.isEmpty && exact.isEmpty
  }
  val EmptyShardState: ShardState = ShardState(Nil, Nil)

  private val ShardMagic = 0x47534831 // "GSH1"

  def writeShardState(out: java.io.OutputStream, s: ShardState): Unit = {
    val d = new java.io.DataOutputStream(new java.io.BufferedOutputStream(out, 1 << 16))
    d.writeInt(ShardMagic)
    d.writeInt(s.filters.length)
    s.filters.foreach { b => d.writeInt(b.length); d.write(b) }
    d.writeInt(s.exact.length)
    s.exact.foreach { b => d.writeInt(b.length); d.write(b) }
    d.flush()
  }

  def readShardState(in: java.io.InputStream): ShardState = {
    val d = new java.io.DataInputStream(new java.io.BufferedInputStream(in, 1 << 16))
    require(d.readInt() == ShardMagic, "bad shard-state magic")
    def blobs(): Seq[Array[Byte]] = {
      val n = d.readInt()
      (0 until n).map { _ =>
        val len = d.readInt()
        val b = new Array[Byte](len)
        d.readFully(b)
        b
      }
    }
    ShardState(blobs(), blobs())
  }
}
