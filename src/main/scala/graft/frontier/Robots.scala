package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt parsing + a broadcast rule cache for the frontier's
  * politeness gate (north rule: "politeness, robots").
  *
  * Semantics follow the de-facto REP standard (RFC 9309):
  *  - `User-agent:` lines open a group; consecutive agent lines share
  *    the group's rules; `*` is the wildcard agent. Most specific
  *    agent match wins (longest agent token that is a prefix of ours).
  *  - `Allow:` / `Disallow:` values are path prefixes; `*` matches any
  *    run of characters, `$` anchors the end.
  *  - Precedence per URL: the LONGEST matching rule wins; on a
  *    length tie, Allow wins. An empty Disallow allows everything.
  *  - `Crawl-delay:` is captured per group (seconds) for the
  *    scheduler's per-host pacing.
  *
  * Behavior reference: RFC 9309 (public spec); no reference-repo code
  * involved (warcio.js has no robots component).
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class RuleSet(agent: String, rules: Seq[Rule], crawlDelay: Option[Double])

  /** Parse one robots.txt body into per-agent rule sets. */
  def parse(txt: String): Seq[RuleSet] = {
    if (txt == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, scala.collection.mutable.ArrayBuffer[Rule], Option[Double])]
    var currentAgents = List.empty[String]
    var groupOpen = false // directives seen since the last agent line
    def addAgentGroup(agent: String): Unit =
      out += ((agent.toLowerCase, scala.collection.mutable.ArrayBuffer.empty[Rule], None))
    for (raw <- txt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" =>
            if (groupOpen) { currentAgents = Nil; groupOpen = false }
            currentAgents = value.toLowerCase :: currentAgents
            addAgentGroup(value)
          case "allow" | "disallow" if currentAgents.nonEmpty =>
            groupOpen = true
            if (value.nonEmpty || key == "allow") {
              val rule = Rule(allow = key == "allow", pattern = value)
              for (a <- currentAgents; i <- out.indices.reverseIterator.find(out(_)._1 == a))
                out(i)._2 += rule
            }
          // empty Disallow: allows everything — represented by no rule
          case "crawl-delay" if currentAgents.nonEmpty =>
            groupOpen = true
            val d = value.toDoubleOption
            for (a <- currentAgents; i <- out.indices.reverseIterator.find(out(_)._1 == a))
              out(i) = (out(i)._1, out(i)._2, d)
          case _ => // sitemap etc — ignored
        }
      }
    }
    out.map { case (a, rs, cd) => RuleSet(a, rs.toSeq, cd) }.toSeq
  }

  /** Does `pattern` (with `*` wildcards, optional `$` anchor) match a
    * path prefix? Returns the matched LENGTH (specificity) or -1. */
  def matchLen(pattern: String, path: String): Int = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    // greedy left-to-right wildcard match over a PREFIX of path
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return -1
        pos = part.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return -1
        pos = at + part.length
      }
      i += 1
    }
    if (anchored && pos != path.length) return -1
    pattern.length // specificity = full pattern length ($ counts)
  }

  /** Decision for (ruleset, path): allowed? Longest match wins; tie →
    * allow; no match → allowed. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules) {
      val m = matchLen(r.pattern, path)
      if (m > bestLen || (m == bestLen && m >= 0 && r.allow && !bestAllow)) {
        if (m >= 0) { bestLen = m; bestAllow = r.allow }
      }
    }
    bestAllow
  }

  /** Pick the rule group for `agent`: longest agent token that is a
    * substring-prefix of ours, else the `*` group. */
  def groupFor(sets: Seq[RuleSet], agent: String): Option[RuleSet] = {
    val a = agent.toLowerCase
    val named = sets.filter(s => s.agent != "*" && a.contains(s.agent))
    if (named.nonEmpty) Some(named.maxBy(_.agent.length))
    else sets.find(_.agent == "*")
  }

  /** Frontier gate: filter `df` (host, path columns) against a robots
    * table (host, robots_txt). The robots table is parsed ONCE per
    * host and broadcast (it is small: one row per host in the batch —
    * the north star's "robots.txt cache broadcast"); the URL side
    * streams through a map-side filter with no shuffle. */
  def applyRobots(df: DataFrame, robots: DataFrame, hostCol: String,
                  pathCol: String, agent: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    val parsed: Map[String, Seq[Rule]] = robots
      .select(col("host"), col("robots_txt")).collect()
      .map(r => r.getString(0) ->
        groupFor(parse(r.getString(1)), agent).map(_.rules).getOrElse(Seq.empty))
      .toMap
    val b = spark.sparkContext.broadcast(parsed)
    val allowed = udf((host: String, path: String) =>
      isAllowed(b.value.getOrElse(host, Seq.empty), path))
    df.filter(allowed(col(hostCol), col(pathCol)))
  }

  /** Per-host crawl delays from the robots table (for budget pacing). */
  def crawlDelays(robots: DataFrame, agent: String = "graft"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host"), col("robots_txt")).as[(String, String)]
      .flatMap { case (h, t) =>
        groupFor(parse(t), agent).flatMap(_.crawlDelay).map(d => (h, d)) }
      .toDF("host", "crawl_delay")
  }
}
