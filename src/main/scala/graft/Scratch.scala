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

  /** Age fallback for entries with no readable owner pid (liveness is
    * primarily decided by whether the owning PROCESS is still alive —
    * sessions here can legitimately hold scratch for many hours). */
  private val StaleMs = 24L * 3600 * 1000

  private val mine = scala.collection.concurrent.TrieMap.empty[Path, Unit]
  @volatile private var initialized = false

  /** A fresh scratch dir `<root>/<prefix>…`, deleted at JVM exit. An
    * `.owner-pid` marker inside lets a later JVM's prune distinguish
    * crash-leaked dirs (owner dead → delete) from dirs a concurrent
    * live session still reads. */
  def dir(prefix: String): Path = {
    ensureInit()
    Files.createDirectories(Root)
    val p = Files.createTempDirectory(Root, prefix + "-")
    // the marker MUST exist: without it a later JVM's prune falls back
    // to the 24h age check and may delete this still-live session's
    // scratch out from under it (e.g. a long chunk-mode frontier
    // checkpoint). One retry for transient fs hiccups, then fail loudly
    // rather than hand out an unprotected dir.
    val pid = ProcessHandle.current().pid().toString
    try Files.writeString(p.resolve(".owner-pid"), pid)
    catch {
      case _: Exception =>
        try Files.writeString(p.resolve(".owner-pid"), pid)
        catch {
          case e: Exception =>
            deleteRecursively(p)
            throw new IllegalStateException(
              s"cannot write scratch owner marker in $p — refusing to hand out " +
                "an age-prunable live dir", e)
        }
    }
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

  /** Remove leaked entries whose owning process is DEAD (crashed JVMs
    * never run their exit hook); entries without a readable owner pid
    * fall back to a conservative age check. Live sessions' scratch is
    * never touched, however old. */
  private def pruneStale(): Unit = {
    if (!Files.isDirectory(Root)) return
    val cutoff = System.currentTimeMillis() - StaleMs
    val listing = Files.list(Root)
    try {
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        val ownerDead =
          try {
            val pid = Files.readString(p.resolve(".owner-pid")).trim.toLong
            !ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
          } catch {
            case _: Exception => // no/bad marker: age fallback
              val mtime = try Files.getLastModifiedTime(p).toMillis
                catch { case _: Exception => Long.MaxValue }
              mtime < cutoff
          }
        if (ownerDead) deleteRecursively(p)
      }
    } finally listing.close()
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
