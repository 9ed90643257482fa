package graft.frontier

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** robots.txt parsing + an executor-side join gate for the frontier's
  * politeness filter (north rule: "politeness, robots").
  *
  * Semantics follow the de-facto REP standard (RFC 9309):
  *  - `User-agent:` lines open a group; consecutive agent lines share
  *    the group's rules; `*` is the wildcard agent. Most specific
  *    agent match wins (longest agent token that is a prefix of ours).
  *    Multiple groups for the SAME agent are merged (rules
  *    concatenated in file order, first defined crawl-delay) — RFC
  *    9309 §2.2.1 requires combining them, and duplicate
  *    `User-agent: *` blocks are common in the wild.
  *  - `Allow:` / `Disallow:` values are path prefixes; `*` matches any
  *    run of characters, a TRAILING `$` anchors the end.
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

  /** Parse one robots.txt body into per-agent rule sets. Groups with
    * the same agent name are merged (file order preserved). */
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
            // the same agent listed twice in one block must not make
            // every following rule append twice
            if (!currentAgents.contains(value.toLowerCase)) {
              currentAgents = value.toLowerCase :: currentAgents
              addAgentGroup(value)
            }
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
            // first parseable value wins — a later unparseable line
            // must not clobber a valid delay back to None
            for (a <- currentAgents; i <- out.indices.reverseIterator.find(out(_)._1 == a))
              out(i) = (out(i)._1, out(i)._2, out(i)._3.orElse(d))
          case _ => // sitemap etc — ignored
        }
      }
    }
    // merge duplicate groups per agent: rules concatenate in file
    // order; the FIRST defined crawl-delay wins (RFC 9309 combining)
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, (scala.collection.mutable.ArrayBuffer[Rule], Option[Double])]
    for ((a, rs, cd) <- out) {
      merged.get(a) match {
        case Some((accRules, accCd)) =>
          accRules ++= rs
          merged(a) = (accRules, accCd.orElse(cd))
        case None => merged(a) = (rs, cd)
      }
    }
    merged.iterator.map { case (a, (rs, cd)) => RuleSet(a, rs.toSeq, cd) }.toSeq
  }

  /** Does `pattern` (with `*` wildcards, optional trailing `$` anchor)
    * match a PREFIX of `path` (all of it when anchored)? Returns the
    * matched specificity (= pattern length) or -1.
    *
    * LINEAR glob matching - robots.txt is third-party input, so a
    * regex-backed matcher would be a catastrophic-backtracking DoS
    * surface (a hostile "slash-star-a-star-a-...-$" rule against a long
    * path explores combinatorially many split points). The classic
    * linear algorithm instead: the first literal part anchors at
    * position 0; when anchored, the LAST part pins to the END of the
    * path (which fixes the greedy-leftmost false-negative, e.g.
    * pattern "/&#42;.php$" vs path "/x.php.php"); middle parts place
    * greedily left-to-right, which is optimal for existence (greedy
    * placement leaves maximal room for later parts). O(|path|*parts)
    * worst case via indexOf - no backtracking, no pattern compilation.
    */
  def matchLen(pattern: String, path: String): Int = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val ok =
      if (p.indexOf('*') < 0) {
        if (anchored) path == p else path.startsWith(p)
      } else {
        val parts = p.split("\\*", -1)
        if (!path.startsWith(parts.head)) false
        else {
          var lo = parts.head.length
          var fail = false
          // anchored: pin the last part to the end of the path
          val middleEnd =
            if (anchored) {
              val last = parts.last
              val hi = path.length - last.length
              if (hi < lo || !path.startsWith(last, hi)) { fail = true; 0 }
              else hi
            } else path.length
          val middleStop = if (anchored) parts.length - 1 else parts.length
          var i = 1
          while (!fail && i < middleStop) {
            val part = parts(i)
            if (part.nonEmpty) {
              val at = path.indexOf(part, lo)
              if (at < 0 || at + part.length > middleEnd) fail = true
              else lo = at + part.length
            }
            i += 1
          }
          !fail
        }
      }
    if (ok) pattern.length else -1
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

  /** Pick the rule group for `agent`: longest group token that is a
    * PREFIX of our product token (the UA up to the first `/`), else
    * the `*` group. Prefix, not substring — "graft" must never adopt
    * a group addressed to an unrelated bot named "raft". */
  def groupFor(sets: Seq[RuleSet], agent: String): Option[RuleSet] = {
    val product = agent.toLowerCase.split("/")(0).trim
    val named = sets.filter(s => s.agent != "*" && product.startsWith(s.agent))
    if (named.nonEmpty) Some(named.maxBy(_.agent.length))
    else sets.find(_.agent == "*")
  }

  /** The selected agent group's rules, parsed EXECUTOR-SIDE into one
    * compact row per host: `(host, rules: array<struct<allow,pattern>>)`.
    * This is the joinable form of the robots cache — at 10^6–10^8
    * hosts it stays a distributed table; nothing flows through the
    * driver. */
  /** JVM-local count of hosts whose robots.txt went through the full
    * parse in hostRules/crawlDelays — test instrumentation for the
    * parse-once-per-robots-version contract (meaningful in local mode,
    * where tests run). */
  private[frontier] val parsedHostCount = new java.util.concurrent.atomic.AtomicLong

  def hostRules(robots: DataFrame, agent: String = "graft"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    // dedupe hosts FIRST (deterministic min): a twice-fetched robots
    // row must not multiply every URL of its host through the join
    robots.groupBy(col("host"))
      .agg(org.apache.spark.sql.functions.min(col("robots_txt")).as("robots_txt"))
      .as[(String, String)]
      .map { case (h, t) =>
        parsedHostCount.incrementAndGet()
        val rules = groupFor(parse(t), agent).map(_.rules).getOrElse(Seq.empty)
        (h, rules.map(r => (r.allow, r.pattern)))
      }.toDF("host", "rules")
  }

  /** Gate `df` against an ALREADY-PARSED rule table
    * `(host, rules: array<struct<allow,pattern>>)` — the wave-loop form:
    * the frontier parses its robots snapshot once per version
    * (checkpointed), then every wave joins this table instead of
    * re-running groupBy+parse over the raw robots text. Catalyst/AQE
    * broadcasts a small rule table and falls back to a
    * host-partitioned shuffle join for giant ones; the driver never
    * holds robots state. A host with no rule row is allowed. */
  def applyRulesTable(df: DataFrame, parsedRules: DataFrame, hostCol: String,
                      pathCol: String): DataFrame = {
    val rules = parsedRules
      .withColumnRenamed("host", "__robots_host")
      .withColumnRenamed("rules", "__robots_rules")
    val allowedU = udf((rules: Seq[Row], path: String) =>
      rules == null || isAllowed(rules.map(r => Rule(r.getBoolean(0), r.getString(1))), path))
    df.join(rules, df(hostCol) === rules("__robots_host"), "left")
      .filter(allowedU(col("__robots_rules"), col(pathCol)))
      .drop("__robots_host", "__robots_rules")
  }

  /** Frontier gate: filter `df` (host, path columns) against a robots
    * table (host, robots_txt). Rules are parsed once per host into a
    * compact per-host row and joined to the URL side — Catalyst/AQE
    * broadcasts the rule table when it is small (the common case) and
    * falls back to a host-partitioned shuffle join for giant robots
    * sets; the DRIVER never collects or holds any robots state. A host
    * with no robots row is allowed (left join, null rules → allow). */
  def applyRobots(df: DataFrame, robots: DataFrame, hostCol: String,
                  pathCol: String, agent: String = "graft"): DataFrame =
    applyRulesTable(df, hostRules(robots, agent), hostCol, pathCol)

  /** Per-host crawl delays from the robots table (for budget pacing). */
  def crawlDelays(robots: DataFrame, agent: String = "graft"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.groupBy(col("host"))
      .agg(org.apache.spark.sql.functions.min(col("robots_txt")).as("robots_txt"))
      .as[(String, String)]
      .flatMap { case (h, t) =>
        parsedHostCount.incrementAndGet()
        groupFor(parse(t), agent).flatMap(_.crawlDelay).map(d => (h, d)) }
      .toDF("host", "crawl_delay")
  }
}
