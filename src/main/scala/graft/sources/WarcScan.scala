package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core._

/** One WARC record as a typed Dataset row. Headers are ordered
  * Array[Struct[name,value]] — order and duplicates are load-bearing
  * (SURVEY.md §1.4). `payload` is the raw (undecoded) payload. */
final case class WarcRow(
    filename: String,
    offset: Long,
    length: Long,
    warcType: String,
    targetUri: String,
    warcDate: String,
    recordId: String,
    contentType: String,
    contentLength: Long,
    payloadDigest: String,
    blockDigest: String,
    warcVersion: String,
    warcHeaders: Seq[HeaderKV],
    httpStatusline: String,
    httpStatus: Option[Int],
    httpContentType: String,
    httpHeaders: Seq[HeaderKV],
    payload: Array[Byte],
    warning: String
)

object WarcRow {
  def fromFramed(r: FramedRecord): WarcRow = {
    val sah = StatusAndHeaders(r.warcVersion, r.warcHeaders, r.warcReencoded)
    val http = r.http
    WarcRow(
      filename = r.filename,
      offset = r.offset,
      length = r.length,
      warcType = r.warcType,
      targetUri = r.warcTargetURI,
      warcDate = sah.get("WARC-Date").orNull,
      recordId = sah.get("WARC-Record-ID").orNull,
      contentType = sah.get("Content-Type").orNull,
      contentLength = sah.get("Content-Length").flatMap(v =>
        try Some(v.trim.toLong) catch { case _: Exception => None }).getOrElse(0L),
      payloadDigest = sah.get("WARC-Payload-Digest").orNull,
      blockDigest = sah.get("WARC-Block-Digest").orNull,
      warcVersion = r.warcVersion,
      warcHeaders = r.warcHeaders,
      httpStatusline = r.httpStatusline,
      httpStatus = http.flatMap(h =>
        if (r.warcType == "response" || r.warcType == "revisit") h.statusCode else None),
      httpContentType = http.flatMap(_.get("content-type")).orNull,
      httpHeaders = r.httpHeaders,
      payload = r.payload,
      warning = r.warning
    )
  }

  def toFramed(w: WarcRow): FramedRecord =
    FramedRecord(w.filename, w.offset, w.length, w.warcVersion,
      w.warcHeaders.toVector, Set.empty, w.httpStatusline,
      w.httpHeaders.toVector, Set.empty, w.payload, w.warning)
}

/** The WARC scan (S1-S4): splittable parallel read of .warc / .warc.gz.
  *
  * v1 strategy: `binaryFile` source → one task per file → in-task framing
  * (gzip member splitting + tolerant record framing). WARC files are
  * bounded (typically ≤1 GiB by convention), so file-granular tasks give
  * a clean parallel unit at any corpus size; a 100 TB crawl is ~100k
  * files → ~100k tasks, ideal for a 1000-executor cluster. Offsets and
  * record lengths match warcio's accounting exactly (member-based for
  * .gz), verified by fixture goldens.
  *
  * Because each task holds a whole file in order, order-dependent
  * operators (request/response pairing) run fused inside the scan with
  * ZERO shuffle — see CdxPipeline.
  */
object WarcScan {

  /** Read WARC files into a typed Dataset. Column pruning note: when the
    * downstream plan does not need `payload`, pass
    * `withPayload = false` so the scan drops payload bytes at the source
    * (the reference's skipFully-vs-readFully distinction). */
  def warcRecords(spark: SparkSession, paths: Seq[String], withPayload: Boolean = true,
                  lenient: Boolean = true): Dataset[WarcRow] = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content")
    bin.as[(String, Array[Byte])].flatMap { case (path, content) =>
      val name = path.substring(path.lastIndexOf('/') + 1)
      // lenient: at corpus scale one corrupt file must not fail the job —
      // log and skip (the strict mode surfaces the exception for tests)
      val parsed =
        try WarcFraming.parseFile(content, name, WarcFraming.isGzipName(name))
        catch {
          case e: Exception if lenient =>
            System.err.println(s"[warc-scan] skipping corrupt file $name: ${e.getMessage}")
            Vector.empty[FramedRecord]
        }
      parsed.map { fr =>
        val row = WarcRow.fromFramed(fr)
        if (withPayload) row else row.copy(payload = Array.emptyByteArray)
      }
    }
  }

  /** Fused scan + per-file fold: applies `fold` to each file's records in
    * offset order inside the scan task — the zero-shuffle path for
    * order-dependent per-file operators. */
  def scanFold[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      paths: Seq[String]
  )(fold: (String, Vector[FramedRecord]) => Iterator[T]): Dataset[T] = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content")
    bin.as[(String, Array[Byte])].flatMap { case (path, content) =>
      val name = path.substring(path.lastIndexOf('/') + 1)
      fold(name, WarcFraming.parseFile(content, name, WarcFraming.isGzipName(name)))
    }
  }
}
