package graft.frontier

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite with SparkTestBase {
  import Robots._

  val txt =
    """# comment
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Crawl-delay: 1.5
      |
      |User-agent: graft
      |User-agent: graftbot
      |Disallow: /graft-only
      |Allow:
      |
      |User-agent: empty
      |Disallow:
      |""".stripMargin

  test("parse: groups, shared agent lines, crawl-delay, empty disallow") {
    val sets = parse(txt)
    val star = sets.find(_.agent == "*").get
    assert(star.rules == Seq(Rule(false, "/private"), Rule(true, "/private/ok")))
    assert(star.crawlDelay.contains(1.5))
    val graft = sets.find(_.agent == "graft").get
    val graftbot = sets.find(_.agent == "graftbot").get
    assert(graft.rules == graftbot.rules)
    assert(graft.rules == Seq(Rule(false, "/graft-only"), Rule(true, "")))
    // empty Disallow = no rule = allow everything
    assert(sets.find(_.agent == "empty").get.rules.isEmpty)
  }

  test("matchLen: prefixes, * wildcard, $ anchor") {
    assert(matchLen("/private", "/private/x") == 8)
    assert(matchLen("/private", "/pub") == -1)
    assert(matchLen("/*.php", "/a/b.php") == 6)
    assert(matchLen("/*.php$", "/a/b.php") == 7)
    assert(matchLen("/*.php$", "/a/b.php?q=1") == -1)
    assert(matchLen("", "/anything") == 0)
  }

  test("isAllowed: longest match wins, allow wins ties, default allow") {
    val rules = Seq(Rule(false, "/private"), Rule(true, "/private/ok"))
    assert(!isAllowed(rules, "/private/secret"))
    assert(isAllowed(rules, "/private/ok/file"))
    assert(isAllowed(rules, "/public"))
    // tie: same length, allow wins
    val tie = Seq(Rule(false, "/a/b"), Rule(true, "/a/b"))
    assert(isAllowed(tie, "/a/b/c"))
  }

  test("groupFor: most specific agent, * fallback, only selected group applies") {
    val sets = parse(txt)
    assert(groupFor(sets, "GraftBot/1.0").get.agent == "graftbot")
    assert(groupFor(sets, "graft/2").get.agent == "graft")
    assert(groupFor(sets, "otherbot").get.agent == "*")
    // graft group does NOT inherit * rules: /private allowed for graft
    val g = groupFor(sets, "graft").get
    assert(isAllowed(g.rules, "/private/secret"))
    assert(!isAllowed(g.rules, "/graft-only/x"))
  }

  test("applyRobots: broadcast-join filter over (host, path)") {
    import spark.implicits._
    val urls = Seq(
      ("a.org", "/private/x"), ("a.org", "/private/ok/y"), ("a.org", "/pub"),
      ("b.org", "/private/x"), // no robots row -> allowed
      ("c.org", "/graft-only/z"), ("c.org", "/private/q")
    ).toDF("host", "path")
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /private\nAllow: /private/ok"),
      ("c.org", txt)
    ).toDF("host", "robots_txt")
    val kept = Robots.applyRobots(urls, robots, "host", "path", agent = "graft")
      .as[(String, String)].collect().toSet
    assert(kept == Set(
      ("a.org", "/private/ok/y"), ("a.org", "/pub"),
      ("b.org", "/private/x"),
      ("c.org", "/private/q"))) // graft group ignores * Disallow /private
  }

  test("matchLen: wildcard + anchor needs backtracking (greedy-leftmost bug)") {
    // greedy leftmost binds ".php" at index 2 and fails the anchor;
    // the valid end alignment must still match
    assert(matchLen("/*.php$", "/x.php.php") == 7)
    assert(matchLen("/*a*b$", "/xaxaxb") == 6)
    assert(matchLen("/*a*b$", "/xaxaxbc") == -1)
    // anchored without wildcard = exact match
    assert(matchLen("/exact$", "/exact") == 7)
    assert(matchLen("/exact$", "/exact/x") == -1)
  }

  test("parse: duplicate groups for the same agent merge (RFC 9309 combining)") {
    val dup =
      """User-agent: *
        |Disallow: /a
        |Crawl-delay: 3
        |
        |User-agent: *
        |Disallow: /b
        |Crawl-delay: 9
        |""".stripMargin
    val sets = parse(dup)
    assert(sets.count(_.agent == "*") == 1)
    val star = sets.find(_.agent == "*").get
    assert(star.rules == Seq(Rule(false, "/a"), Rule(false, "/b")))
    assert(star.crawlDelay.contains(3.0)) // first defined wins
    // the second block's rules must actually gate
    assert(!isAllowed(star.rules, "/b/x"))
  }

  test("applyRobots is executor-side: join in the plan, no driver collect, 100k hosts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, when}
    val n = 100000
    val robots = spark.range(n)
      .select(concat(lit("h"), $"id", lit(".org")).as("host"),
        concat(lit("User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
          lit("User-agent: *\nDisallow: /blocked\n")).as("robots_txt"))
    val urls = spark.range(n)
      .select(concat(lit("h"), $"id", lit(".org")).as("host"),
        when($"id" % 4 === 0, "/private/x")
          .when($"id" % 4 === 1, "/private/ok/y")
          .when($"id" % 4 === 2, "/blocked/z") // merged 2nd group must gate
          .otherwise("/pub").as("path"))
    val gated = Robots.applyRobots(urls, robots, "host", "path")
    // plan shape: a real join (broadcast or shuffle), nothing collected
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("join"), s"no join in plan:\n$plan")
    assert(gated.count() == n / 2) // only /private/ok and /pub survive
  }

  test("matchLen is linear: hostile wildcard patterns cannot backtrack-DoS") {
    // robots.txt is third-party input — this pattern/path pair makes a
    // backtracking regex explore combinatorially many split points
    val pattern = "/" + ("*a" * 20) + "$"
    val path = "/" + ("a" * 2000) + "b"
    val t0 = System.nanoTime()
    assert(matchLen(pattern, path) == -1) // ends with b, anchor fails
    assert(matchLen(pattern, "/" + ("a" * 2000)) == pattern.length)
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "matcher not linear")
    // overlap guard: the pinned suffix may not eat the matched prefix
    assert(matchLen("/a*ab$", "/ab") == -1)
    assert(matchLen("/*aa$", "/aa") == 5) // '*' matches empty
  }

  test("duplicate host rows in the robots table do not multiply URLs") {
    import spark.implicits._
    val urls = Seq(("a.org", "/private/x"), ("a.org", "/pub")).toDF("host", "path")
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /private"),
      ("a.org", "User-agent: *\nDisallow: /private") // fetched twice
    ).toDF("host", "robots_txt")
    val kept = Robots.applyRobots(urls, robots, "host", "path").collect()
    assert(kept.length == 1 && kept.head.getString(1) == "/pub",
      s"duplicate robots row multiplied URLs: ${kept.mkString(",")}")
  }

  test("groupFor matches by product-token PREFIX, not substring") {
    val sets = parse("User-agent: *\nDisallow: /a\n\nUser-agent: raft\nDisallow: /\n")
    // "graft" contains "raft" but is NOT prefixed by it — must get '*'
    assert(groupFor(sets, "graft/1.0").get.agent == "*")
    assert(groupFor(sets, "raft/2").get.agent == "raft")
  }

  test("crawl-delay: first parseable value wins; garbage cannot clobber it") {
    val sets = parse("User-agent: *\nCrawl-delay: 5\nCrawl-delay: oops\nDisallow: /x\n")
    assert(sets.find(_.agent == "*").get.crawlDelay.contains(5.0))
  }

  test("same agent listed twice in one block does not duplicate rules") {
    val sets = parse("User-agent: *\nUser-agent: *\nDisallow: /x\n")
    assert(sets.find(_.agent == "*").get.rules == Seq(Rule(false, "/x")))
  }

  test("crawlDelays extraction") {
    import spark.implicits._
    val robots = Seq(("a.org", txt), ("b.org", "User-agent: *\nDisallow: /x")).toDF("host", "robots_txt")
    val d = Robots.crawlDelays(robots, agent = "otherbot").as[(String, Double)].collect().toMap
    assert(d == Map("a.org" -> 1.5))
  }
}

/** Join-strategy guard: a giant robots rule table must NOT be
  * broadcast (driver/executor OOM at 10^6-10^8 hosts) — AQE has to
  * fall back to a host-partitioned shuffle join; a small table should
  * still broadcast. */
class RobotsJoinStrategySpec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.functions._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // materialize so AQE settles on the final physical plan
    df.queryExecution.executedPlan.toString
  }

  test("10^6-host rule table: shuffle join chosen, no broadcast; small table broadcasts") {
    val spark0 = spark
    import spark0.implicits._
    val big = spark.range(1000000).select(
      concat(lit("h"), $"id", lit(".example.org")).as("host"),
      concat(lit("User-agent: *\nDisallow: /block"), ($"id" % 7).cast("string"),
        lit("\n")).as("robots_txt"))
    val urls = spark.range(2000).select(
      concat(lit("h"), $"id" * 499, lit(".example.org")).as("host"),
      concat(lit("/block"), ($"id" % 9).cast("string"), lit("/x")).as("path"))
    val gated = Robots.applyRobots(urls, big, "host", "path")
    val plan = finalPlan(gated)
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"giant rule table was broadcast — OOM at scale:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join for the giant rule table:\n${plan.take(2000)}")
    // correctness spot-check rides along: /blockN paths of matching
    // hosts are gated, everything else passes
    val kept = gated.collect()
    assert(kept.forall { r =>
      val blocked = "/block" + (r.getAs[String]("host").drop(1).takeWhile(_.isDigit).toLong % 7)
      !r.getAs[String]("path").startsWith(blocked)
    })

    // the common small case still broadcasts (politeness gate stays cheap)
    val small = Seq(("a.org", "User-agent: *\nDisallow: /x\n")).toDF("host", "robots_txt")
    val smallPlan = finalPlan(Robots.applyRobots(urls, small, "host", "path"))
    assert(smallPlan.contains("BroadcastHashJoin"),
      s"small rule table did not broadcast:\n${smallPlan.take(2000)}")
  }
}
