package graft

import org.apache.hadoop.conf.Configuration
import java.io.{ObjectInputStream, ObjectOutputStream}

/** Java-serializable Hadoop `Configuration` wrapper, broadcast to tasks
  * that open a `FileSystem` directly (seen-shard level I/O, lazy payload
  * pointer re-reads). Executor-side `new Configuration()` only sees the
  * classpath's core-site defaults; settings supplied through the Spark
  * session (`spark.hadoop.*` — e.g. object-store credentials) live in
  * `spark.sessionState.newHadoopConf()` on the DRIVER and must be
  * shipped explicitly, or level reads fail on any cluster whose fs auth
  * is session-configured. (Spark's own
  * `org.apache.spark.util.SerializableConfiguration` is
  * `private[spark]`; this is the same standard write/readFields
  * round-trip.) */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
