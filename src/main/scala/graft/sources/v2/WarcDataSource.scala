package graft.sources.v2

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 WARC reader: `spark.read.format("warc").load(paths…)`.
  *
  * The genuinely custom physical component (SURVEY.md §4): a splittable
  * scan over .warc/.warc.gz with
  *  - one input partition per file, and for .gz files larger than
  *    `splitSize` (option, default 128 MiB) MULTIPLE raw-byte-range
  *    partitions per file — the reader syncs to a gzip-member boundary,
  *    so one megafile fans out instead of pinning one task; offsets and
  *    lengths stay byte-exact (member-based);
  *  - STREAMING record-at-a-time parse (WarcStreaming): O(one record)
  *    task memory, no 2 GB file cap;
  *  - `SupportsPushDownRequiredColumns`: when `payload` isn't selected
  *    payload bytes are SKIPPED inside the parser, never inflated into
  *    the task (the reference's skipFully-vs-readFully distinction,
  *    indexer.ts:74 vs :232);
  *  - `SupportsPushDownFilters`: warcType equality/IN filters drop
  *    records before row materialization.
  */
class WarcDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcSchema.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(WarcSchema.resolvePaths(properties.asScala.toMap))
  override def supportsExternalMetadata(): Boolean = true
}

object WarcSchema {
  val headerType: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType), StructField("value", StringType))))

  val schema: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("offset", LongType),
    StructField("length", LongType),
    StructField("warcType", StringType),
    StructField("targetUri", StringType),
    StructField("warcDate", StringType),
    StructField("recordId", StringType),
    StructField("contentType", StringType),
    StructField("contentLength", LongType),
    StructField("payloadDigest", StringType),
    StructField("blockDigest", StringType),
    StructField("warcVersion", StringType),
    StructField("warcHeaders", headerType),
    StructField("httpStatusline", StringType),
    StructField("httpStatus", IntegerType),
    StructField("httpContentType", StringType),
    StructField("httpHeaders", headerType),
    StructField("payload", BinaryType),
    StructField("warning", StringType)
  ))

  def resolvePaths(props: Map[String, String]): Seq[String] = {
    val raw = props.get("paths") match {
      case Some(json) =>
        // simple JSON array of strings
        json.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
      case None => props.get("path").toSeq
    }
    raw.flatMap { p =>
      // Hadoop FS, not java.io.File: directory loads must work on any
      // scheme the partition reader itself supports (file:/hdfs:/s3a:)
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.isDirectory(hp))
        fs.listStatus(hp).filter(_.isFile)
          // Hadoop convention: dot/underscore files are metadata
          // (markers, _SUCCESS, .crc), never data
          .filter(st => { val n = st.getPath.getName; !n.startsWith(".") && !n.startsWith("_") })
          .map(_.getPath.toString).sorted.toSeq
      else Seq(p)
    }
  }
}

class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val splitSize = Option(options.get("splitSize")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    new WarcScanBuilder(paths, splitSize)
  }
}

class WarcScanBuilder(paths: Seq[String], splitSize: Long) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WarcSchema.schema
  private var typeFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("warcType", _: String) => true
      case In("warcType", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    val sets = accepted.map {
      case EqualTo(_, v: String) => Set(v)
      case In(_, vs)             => vs.map(_.asInstanceOf[String]).toSet
      case _                     => Set.empty[String]
    }
    if (sets.nonEmpty) typeFilter = Some(sets.reduce(_ intersect _))
    pushed = accepted
    rest // Spark still re-evaluates accepted filters unless we claim them
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScanV2(paths, required, typeFilter, splitSize)
}

/** One task = one file, or one RAW BYTE RANGE of an oversized .warc.gz
  * (`start`/`end`; `end = -1` ⇒ whole file). A range task syncs to the
  * first gzip-member boundary at/after `start` and owns every record
  * whose member starts before `end` — so a single 100 GB megafile fans
  * out across the cluster instead of pinning one task (SURVEY §2.1/S3:
  * member boundaries are the key to parallel scan). */
case class WarcInputPartition(path: String, start: Long, end: Long) extends InputPartition

class WarcScanV2(paths: Seq[String], required: StructType,
                 typeFilter: Option[Set[String]], splitSize: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    paths.flatMap { p =>
      val size =
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
            .getFileStatus(hp).getLen
        } catch { case _: Exception => 0L }
      // only .gz is boundary-splittable (member sync); small files and
      // plain .warc stay one-task-per-file
      if (size > splitSize && p.endsWith(".gz")) {
        val n = ((size + splitSize - 1) / splitSize).toInt
        (0 until n).map { i =>
          WarcInputPartition(p, i.toLong * splitSize,
            math.min((i + 1).toLong * splitSize, size))
        }
      } else Seq(WarcInputPartition(p, 0L, -1L))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter)
  override def description(): String =
    s"WarcScan(files=${paths.length}, columns=${required.fieldNames.mkString(",")}, " +
      s"typeFilter=${typeFilter.map(_.mkString("|")).getOrElse("none")}, splitSize=$splitSize)"
}

class WarcReaderFactory(required: StructType, typeFilter: Option[Set[String]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(p, required, typeFilter)
  }
}

class WarcPartitionReader(part: WarcInputPartition, required: StructType,
                          typeFilter: Option[Set[String]])
    extends PartitionReader[InternalRow] {
  import graft.core._

  private val needPayload = required.fieldNames.contains("payload")
  private val path = part.path
  private val name = path.substring(path.lastIndexOf('/') + 1)

  private def openAt(off: Long): java.io.InputStream = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    if (off > 0) in.seek(off)
    in
  }

  /** STREAMING read — O(one record) of task memory, payload skipped
    * inside the parser when pruned (never inflated into the task). For a
    * range partition, sync to the first valid member ≥ start and own
    * records whose member starts before `end` (the last such record may
    * read past `end`; records are emitted in offset order so the
    * takeWhile cut is exact). */
  private var stream: java.io.InputStream = _
  private lazy val records: Iterator[FramedRecord] = {
    val base: Iterator[FramedRecord] =
      if (part.end < 0) {
        stream = openAt(0)
        WarcStreaming.parseStream(stream, name,
          WarcFraming.isGzipName(name), keepPayload = needPayload)
      } else {
        val sync = WarcStreaming.syncToMemberStart(openAt, part.start, part.end)
        if (sync < 0) Iterator.empty
        else {
          stream = openAt(sync)
          WarcStreaming.parseStream(stream, name, isGzip = true,
            keepPayload = needPayload, rawBase = sync)
            .takeWhile(_.offset < part.end)
        }
      }
    base.filter(r => typeFilter.forall(_.contains(Option(r.warcType).getOrElse(""))))
  }
  private var current: FramedRecord = _

  override def next(): Boolean =
    if (records.hasNext) { current = records.next(); true } else false

  private def utf8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
  private def headersArray(hs: Seq[HeaderKV]): ArrayData =
    new GenericArrayData(hs.map(kv =>
      new GenericInternalRow(Array[Any](utf8(kv.name), utf8(kv.value)))).toArray[Any])

  override def get(): InternalRow = {
    val r = current
    val sah = StatusAndHeaders(r.warcVersion, r.warcHeaders, r.warcReencoded)
    def field(nameF: String): Any = nameF match {
      case "filename"       => utf8(r.filename)
      case "offset"         => r.offset
      case "length"         => r.length
      case "warcType"       => utf8(r.warcType)
      case "targetUri"      => utf8(r.warcTargetURI)
      case "warcDate"       => utf8(sah.get("WARC-Date").orNull)
      case "recordId"       => utf8(sah.get("WARC-Record-ID").orNull)
      case "contentType"    => utf8(sah.get("Content-Type").orNull)
      case "contentLength"  => sah.get("Content-Length").flatMap(v =>
        try Some(v.trim.toLong) catch { case _: Exception => None }).getOrElse(0L)
      case "payloadDigest"  => utf8(sah.get("WARC-Payload-Digest").orNull)
      case "blockDigest"    => utf8(sah.get("WARC-Block-Digest").orNull)
      case "warcVersion"    => utf8(r.warcVersion)
      case "warcHeaders"    => headersArray(r.warcHeaders)
      case "httpStatusline" => utf8(r.httpStatusline)
      case "httpStatus" =>
        r.http.flatMap(h =>
          if (r.warcType == "response" || r.warcType == "revisit") h.statusCode else None)
          .map(Int.box).orNull
      case "httpContentType" => utf8(r.http.flatMap(_.get("content-type")).orNull)
      case "httpHeaders"     => headersArray(r.httpHeaders)
      case "payload"         => if (needPayload) r.payload else null
      case "warning"         => utf8(r.warning)
      case other             => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(required.fieldNames.map(field))
  }

  override def close(): Unit =
    if (stream != null) { try stream.close() catch { case _: Exception => } }
}
