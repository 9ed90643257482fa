package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.core.{FramedRecord, WarcFraming, WarcStreaming, WarcWriter}

/** Lazy payload-pointer re-read: process ONE record's payload from a
  * `(path, offset)` pointer with bounded task memory.
  *
  * The eager scan materializes each kept payload as a JVM array (fine
  * at the ≤1 GiB WARC convention; capped at 2 GB by the JVM). Scan
  * rows retain `(filename, offset, length)` precisely so an oversized
  * body can be handled WITHOUT that cap: re-open the file, seek to the
  * member offset, and stream the payload in 64 KiB chunks through a
  * sink (`MessageDigest.update`, re-serialization, …). Memory is
  * O(64 KiB) regardless of payload size.
  *
  * Reference behavior anchor: warcio.js streams payloads through
  * AsyncIterReader (readers.ts:100-480) and digests incrementally
  * (indexer.ts digest path) — this is the same contract applied to a
  * stored pointer instead of a live stream (studied, not copied).
  */
object LazyPayload {

  /** Parse the single record at `(path, offset)`, feeding its payload
    * to `sink` chunk-by-chunk. Returns the record with headers
    * populated and the payload column EMPTY (it never materializes). */
  def streamRecordAt(path: String, offset: Long,
                     sink: (Array[Byte], Int, Int) => Unit): FramedRecord = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    try {
      if (offset > 0) in.seek(offset)
      val name = path.substring(path.lastIndexOf('/') + 1)
      val it = WarcStreaming.parseStream(in, name,
        isGzip = WarcFraming.isGzipName(name), keepPayload = false,
        rawBase = offset, payloadSink = sink)
      require(it.hasNext, s"no record at $path:$offset")
      it.next()
    } finally {
      try in.close() catch { case _: Exception => }
    }
  }

  private def mdFor(opts: WarcWriter.DigestOpts): java.security.MessageDigest =
    java.security.MessageDigest.getInstance(opts.algo match {
      case "sha-1" => "SHA-1"
      case _       => "SHA-256"
    })

  /** Chunked payload digest at a pointer: `(formattedDigest,
    * payloadLength)`. A multi-GB payload digests in O(64 KiB) memory. */
  def digestPayloadAt(path: String, offset: Long,
                      opts: WarcWriter.DigestOpts = WarcWriter.CdxDigest): (String, Long) = {
    val md = mdFor(opts)
    var n = 0L
    streamRecordAt(path, offset, (b, o, l) => { md.update(b, o, l); n += l })
    (WarcWriter.formatDigest(md.digest(), opts), n)
  }

  /** Distributed form: one row per pointer `(path, offset)` →
    * `(path, offset, payload_digest, payload_length)`. mapPartitions
    * keeps one open-file + digest at a time per task — the operator a
    * conversion/validation job uses for records the eager scan cannot
    * hold in memory. */
  def payloadDigests(pointers: DataFrame, pathCol: String = "path",
                     offsetCol: String = "offset",
                     opts: WarcWriter.DigestOpts = WarcWriter.CdxDigest): DataFrame = {
    val spark = pointers.sparkSession
    import spark.implicits._
    pointers.select(col(pathCol).cast("string"), col(offsetCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (p, off) =>
          val (digest, len) = digestPayloadAt(p, off, opts)
          (p, off, digest, len)
        }
      }.toDF("path", "offset", "payload_digest", "payload_length")
  }
}
