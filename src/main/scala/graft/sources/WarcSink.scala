package graft.sources

import org.apache.spark.sql.Dataset
import graft.core.{WarcWriter, HeaderKV, StatusAndHeaders}
import java.nio.file.{Files, Paths}

/** Distributed WARC writer (S8/S9): one `.warc.gz` file per partition,
  * one gzip member per record (the splittable layout the scan relies
  * on). Records are serialized with the engine's write path (digests
  * respected if present, Content-Length recomputed). Task-temp + rename
  * gives idempotent task retries. */
object WarcSink {

  /** Write a Dataset[WarcRow] as part-NNNNN.warc.gz files under `dir`.
    * Rows within a partition are written in encounter order — sort the
    * Dataset first if a specific record order is required. */
  def write(ds: Dataset[WarcRow], dir: String, gzip: Boolean = true): Unit = {
    Files.createDirectories(Paths.get(dir))
    val ext = if (gzip) ".warc.gz" else ".warc"
    ds.foreachPartition { (it: Iterator[WarcRow]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val tmp = Paths.get(dir, f".part-$pid%05d-$attempt.tmp")
        val out = Files.newOutputStream(tmp)
        try {
          it.foreach { row =>
            val built = WarcWriter.BuiltRecord(
              row.warcVersion,
              new WarcWriter.OrderedHeaders(row.warcHeaders.map(kv => (kv.name, kv.value))),
              Option(row.httpStatusline),
              row.httpHeaders.toVector,
              Option(row.payload).getOrElse(Array.emptyByteArray))
            out.write(WarcWriter.serialize(built, gzip = gzip))
          }
        } finally out.close()
        Files.move(tmp, Paths.get(dir, f"part-$pid%05d$ext"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }
}
