package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-directory manager for bench/oracle/test checkpoints.
  *
  * Every temp dir lives under ONE fixed root, is registered for
  * recursive deletion at JVM exit, and stale entries (from crashed
  * JVMs) are pruned at first use. Rationale: leaked bench scratch
  * (frontier checkpoints, chunk-mode state) once filled the disk and
  * destroyed a round's driver artifacts — scratch must be bounded by
  * construction, not by convention.
  */
object Scratch {

  val Root: Path = Paths.get(sys.env.getOrElse("GRAFT_SCRATCH_ROOT", "/tmp/graft-scratch"))

  /** Entries older than this are assumed leaked by a dead JVM. Kept
    * long enough that a concurrent live JVM's scratch is never touched
    * (no single bench/test invocation runs anywhere near this long). */
  private val StaleMs = 2L * 3600 * 1000

  private val mine = scala.collection.concurrent.TrieMap.empty[Path, Unit]
  @volatile private var initialized = false

  /** A fresh scratch dir `<root>/<prefix>…`, deleted at JVM exit. */
  def dir(prefix: String): Path = {
    ensureInit()
    Files.createDirectories(Root)
    val p = Files.createTempDirectory(Root, prefix + "-")
    mine.put(p, ())
    p
  }

  /** Delete now (e.g. right after a bench measurement) instead of
    * waiting for JVM exit. Safe to call twice. */
  def delete(p: Path): Unit = {
    deleteRecursively(p)
    mine.remove(p)
  }

  private def ensureInit(): Unit = if (!initialized) synchronized {
    if (!initialized) {
      initialized = true
      pruneStale()
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        mine.keys.foreach(deleteRecursively), "graft-scratch-cleanup"))
    }
  }

  /** Remove leaked entries from previous (crashed) JVMs. */
  private def pruneStale(): Unit = {
    if (!Files.isDirectory(Root)) return
    val cutoff = System.currentTimeMillis() - StaleMs
    val it = Files.list(Root).iterator()
    while (it.hasNext) {
      val p = it.next()
      val mtime = try Files.getLastModifiedTime(p).toMillis catch { case _: Exception => Long.MaxValue }
      if (mtime < cutoff) deleteRecursively(p)
    }
  }

  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    try {
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => })
      } finally walk.close()
    } catch { case _: Exception => }
  }
}
