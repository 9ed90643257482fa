package graft.frontier

import scala.collection.mutable

/** Single-threaded in-memory reference implementation of the frontier
  * semantics — the comparator for "reproduces the crawl ordering and
  * URL-seen membership under the same seed list and politeness budget"
  * (BASELINE.json north rule). Deliberately the simplest possible
  * sequential program: exact HashSet seen, exact sort, exact budget.
  * The distributed engine must match it bit-for-bit. */
object ReferenceCrawler {

  final case class Entry(surtKey: String, url: String, host: String, priority: Int)
  final case class Wave(scheduled: Vector[(Entry, Int)], seen: Set[String]) // (entry, rank_in_host)

  private def canonEntry(url: String, priority: Int): Option[Entry] =
    graft.Functions.canonAllFn(url) match {
      case (c, s, h) if c != null && s != null && h != null => Some(Entry(s, c, h, priority))
      case _ => None
    }

  /** Replicates Frontier.runWave semantics sequentially. */
  final class Sim(cfg: FrontierConfig) {
    private val seen = mutable.HashSet.empty[String]
    private var pending = mutable.Map.empty[String, Entry] // surt → best entry

    def initialize(seedUrls: Seq[(String, Int)]): Unit = {
      for ((u, p) <- seedUrls; e <- canonEntry(u, p)) {
        pending.get(e.surtKey) match {
          case Some(prev) =>
            // deterministic min-merge as the engine's groupBy(min) does
            pending(e.surtKey) = Entry(e.surtKey,
              Seq(prev.url, e.url).min, Seq(prev.host, e.host).min,
              math.min(prev.priority, e.priority))
          case None => pending(e.surtKey) = e
        }
        seen += e.surtKey
      }
    }

    def seenSet: Set[String] = seen.toSet
    def pendingCount: Int = pending.size

    def runWave(): Vector[(Entry, Int)] = {
      // robots filter
      val allowed = pending.values.filter { e =>
        !(java.lang.Math.floorMod(SeenFilter.hashKey(e.host), 5L) == 0L &&
          e.url.contains("/private"))
      }.toVector
      // per-host top-K by (priority, surt)
      val scheduled = allowed.groupBy(_.host).toVector.flatMap { case (_, es) =>
        es.sortBy(e => (e.priority, e.surtKey)).take(cfg.hostBudget).zipWithIndex
          .map { case (e, i) => (e, i + 1) }
      }
      // discovery + dedup + state update
      val schedKeys = scheduled.map(_._1.surtKey).toSet
      pending = pending.filterNot { case (k, _) => schedKeys.contains(k) }
      for ((e, _) <- scheduled; (url, pri) <- outlinks(e.surtKey, cfg)) {
        canonEntry(url, pri).foreach { oe =>
          if (!seen.contains(oe.surtKey)) {
            // in-batch dedup with min-merge, then admit to seen
            pending.get(oe.surtKey) match {
              case Some(prev) =>
                pending(oe.surtKey) = Entry(oe.surtKey,
                  Seq(prev.url, oe.url).min, Seq(prev.host, oe.host).min,
                  math.min(prev.priority, oe.priority))
              case None => pending(oe.surtKey) = oe
            }
          }
        }
      }
      // everything admitted this wave becomes seen
      pending.keys.foreach(seen.add)
      scheduled.sortBy { case (e, _) => (e.priority, e.host, e.surtKey) }
    }
  }

  /** The same deterministic outlink generator as the engine. */
  def outlinks(surt: String, cfg: FrontierConfig): Seq[(String, Int)] = {
    val h0 = SeenFilter.hashKey(surt + ":" + cfg.seed)
    (0 until cfg.outlinksPerUrl).map { i =>
      val h = SeenFilter.hashKey(surt + "#" + i)
      val u = (java.lang.Math.floorMod(h, 1000000L)) / 1000000.0
      val hostId = (cfg.hostPool * u * u * u).toInt
      val path = java.lang.Math.floorMod(h ^ h0, 100000L)
      val priv = if (java.lang.Math.floorMod(h, 7L) == 0L) "/private" else ""
      (s"https://www.host$hostId.example.org$priv/p/$path?x=1",
        java.lang.Math.floorMod(h, 100L).toInt)
    }
  }
}
