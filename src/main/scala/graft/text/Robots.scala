package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the crawl pipeline's politeness gate, applied at 100 TB as a
  * map-only filter over the URL column: rules parse ONCE on the
  * driver (robots bodies are per-host config, kilobytes), the
  * compiled matchers ship in the task closure, and every row pays one
  * longest-match scan over a handful of patterns. Semantics per the
  * RFC and Google's published parser:
  *
  *  - group selection: the group whose User-agent token is the
  *    longest case-insensitive prefix of the product token wins; `*`
  *    is the fallback group, never merged with a named group;
  *  - rule matching: `*` wildcards and the `$` end anchor; the rule
  *    with the LONGEST pattern (most octets) wins; on a tie between
  *    Allow and Disallow, Allow wins; no matching rule = allowed;
  *  - empty Disallow lines allow everything (skipped), comments and
  *    unknown directives are ignored.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String) {
    // LINEAR wildcard matching, not java.util.regex: robots bodies
    // come from untrusted hosts, and a hostile '/*a*a*a*...' pattern
    // against a long path backtracks catastrophically in a regex
    // engine — the reference matchers are linear for exactly this
    // reason. '*' segments resolve left-to-right by indexOf (greedy
    // scan is correct for "matches a prefix": any placement that
    // reaches the end works, and earliest-first never overshoots);
    // '$' only anchors at the very end.
    private val anchored = pattern.endsWith("$")
    private val parts: Array[String] =
      (if (anchored) pattern.dropRight(1) else pattern).split("\\*", -1)
    private[Robots] def matches(path: String): Boolean = {
      if (!path.startsWith(parts(0))) return false
      var pos = parts(0).length
      var i = 1
      val last = parts.length - 1
      while (i <= last) {
        val p = parts(i)
        if (i == last && anchored) {
          // final segment must END the path, at or after pos
          return path.length - p.length >= pos && path.endsWith(p)
        }
        val at = path.indexOf(p, pos)
        if (at < 0) return false
        pos = at + p.length
        i += 1
      }
      // un-anchored: the pattern only needs to cover a prefix, and it
      // just did (anchored single-segment handled above; a no-'*'
      // anchored pattern hits the i==last branch with i=0? no — the
      // loop starts at 1, so handle it here)
      if (anchored && last == 0)
        path.length == parts(0).length
      else true
    }
  }

  /** Parse a robots body and select the rule group for `agent`. */
  private final class Group {
    val agents = scala.collection.mutable.ArrayBuffer.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var crawlDelay: Option[Double] = None
  }

  /** The shared group walk: consecutive User-agent lines open a group;
    * the first GROUP-DIRECTIVE line (Allow/Disallow/Crawl-delay)
    * closes the agent list. Unknown and non-group lines (Sitemap,
    * comments) leave inAgents untouched and MUST NOT split
    * consecutive User-agent lines (RFC 9309 §2.2.4). */
  private def groupsOf(robots: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var inAgents = false
    robots.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val at = line.indexOf(':')
      if (at > 0) {
        val key = line.substring(0, at).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(at + 1).trim
        key match {
          case "user-agent" if value.nonEmpty =>
            // an EMPTY agent token would prefix-match every crawler
            // and shadow the '*' fallback — malformed, ignored
            if (!inAgents || groups.isEmpty) {
              val g = new Group; g.agents += value; groups += g
            } else groups.last.agents += value
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last.rules += Rule(key == "allow", value)
          // empty Disallow = allow everything: no rule to add
          case "crawl-delay" =>
            // a GROUP directive, not an "other record": like Allow/
            // Disallow it closes the agent list (the dominant
            // implementations — Bing documents it as a group rule —
            // and without this `User-agent: x` after a '*' group's
            // delay would merge into that group). First value in a
            // group wins; a malformed number is ignored rather than
            // read as zero (zero would disable politeness on a typo)
            inAgents = false
            if (groups.nonEmpty && groups.last.crawlDelay.isEmpty)
              try {
                val d = value.toDouble
                // toDouble accepts "NaN"/"Infinity"/negatives — all of
                // which would defeat the malformed-not-zero guard
                // (NaN*1000 .toLong IS zero) or overflow the schedule
                if (java.lang.Double.isFinite(d) && d >= 0)
                  groups.last.crawlDelay = Some(d)
              } catch { case _: NumberFormatException => () }
          case _ => () // sitemap, unknown: NOT part of a group and
          // MUST NOT split consecutive User-agent lines (RFC 9309
          // §2.2.4) — inAgents is left untouched
        }
      }
    }
    groups.toSeq
  }

  /** The groups the agent selects: longest agent-prefix match wins,
    * '*' is the fallback; all groups carrying the best token
    * contribute (RFC: groups with the same selected agent merge). */
  private def selectGroups(groups: Seq[Group], agent: String): Seq[Group] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val named = groups.filter(_.agents.exists(a =>
      a != "*" && agentLc.startsWith(a.toLowerCase(java.util.Locale.ROOT))))
    if (named.nonEmpty) {
      val bestLen = named.flatMap(_.agents).filter(a =>
        a != "*" && agentLc.startsWith(a.toLowerCase(java.util.Locale.ROOT)))
        .map(_.length).max
      named.filter(_.agents.exists(a => a.length == bestLen &&
        agentLc.startsWith(a.toLowerCase(java.util.Locale.ROOT))))
    } else groups.filter(_.agents.contains("*"))
  }

  def parse(robots: String, agent: String): Seq[Rule] =
    selectGroups(groupsOf(robots), agent).flatMap(_.rules)

  /** Crawl-delay in SECONDS for the agent's selected group(s), if any
    * declares one — the politeness knob a frontier scheduler spaces
    * per-host fetches by. When merged groups disagree, the smallest
    * declared delay wins (deterministic, and the conservative read
    * for the crawler is arguable either way — smallest matches the
    * major crawlers' merge behavior). */
  def crawlDelay(robots: String, agent: String): Option[Double] = {
    val ds = selectGroups(groupsOf(robots), agent).flatMap(_.crawlDelay)
    if (ds.isEmpty) None else Some(ds.min)
  }

  /** Longest-match verdict for one path. */
  def allowed(path: String, rules: Seq[Rule]): Boolean = {
    val hits = rules.filter(_.matches(path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_.pattern.length).max
      // tie at the longest pattern: Allow wins
      hits.filter(_.pattern.length == best).exists(_.allow)
    }
  }

  /** The distributed gate: adds `allowed` per row from the path
    * column. Rules parse once here (driver), matchers ride the
    * closure — per-row work is a few compiled-regex prefix tests,
    * map-only, codegen-adjacent cost. For per-host robots use
    * `filterAllowedByHost` (the crawl-frontier shape — this form is
    * for ONE robots body the caller already holds). */
  def filterAllowed(
      spark: SparkSession, df: DataFrame, idCol: String, pathCol: String,
      robots: String, agent: String): DataFrame = {
    import spark.implicits._
    val rules = parse(robots, agent)
    df.select(col(idCol).cast("long"), col(pathCol))
      .as[(Long, String)]
      .map { case (id, p) => (id, p, allowed(p, rules)) }
      .toDF(idCol, pathCol, "allowed")
  }

  /** Per-host robots gate — the crawl-FRONTIER shape (r17): the
    * frontier (id, host, path) joins the (host, robots body) table on
    * host, and bodies parse EXECUTOR-SIDE with a per-partition
    * (host, agent) → rules cache, so a billion-row frontier against a
    * million-host robots table never collects a body to the driver
    * and parses each host's body once per partition, not once per
    * URL. Catalyst broadcasts the robots side when it is small; at
    * real frontier scale both sides hash-partition on host, which
    * also bounds the cache to the partition's few distinct hosts (a
    * hard cap clears it defensively under a broadcast plan, where a
    * partition can see many hosts). A frontier host with NO robots
    * row is fully allowed (the RFC's missing-robots.txt default).
    * `agents` maps each product token to its output verdict column —
    * one pass evaluates all of them. */
  def filterAllowedByHost(
      frontier: DataFrame, idCol: String, hostCol: String, pathCol: String,
      robotsByHost: DataFrame, robotsHostCol: String, robotsBodyCol: String,
      agents: Seq[(String, String)]): DataFrame = {
    require(agents.nonEmpty, "filterAllowedByHost needs at least one agent")
    val spark = frontier.sparkSession
    import spark.implicits._
    val agentTokens = agents.map(_._1)
    val joined = frontier
      .select(col(idCol).cast("long").as("id"),
        col(hostCol).cast("string").as("host"),
        col(pathCol).cast("string").as("path"))
      .join(
        robotsByHost.select(col(robotsHostCol).cast("string").as("host"),
          col(robotsBodyCol).cast("string").as("robots")),
        Seq("host"), "left")
      .select(col("id"), col("host"), col("path"), col("robots"))
      .as[(Long, String, String, Option[String])]
    val verdictRows = joined.mapPartitions { rows =>
      // (agent, body) -> selected rule group, parsed once per
      // partition. Keyed on the BODY, not the host: a duplicate host
      // row carrying a different body (a re-fetched robots.txt kept
      // beside the old one) must get ITS body's verdicts, and hosts
      // sharing one default body share one parse. String hashCodes
      // are cached, so the KB-sized key costs one hash per row.
      // Co-partitioning on host keeps the cache tiny; the cap only
      // guards the broadcast-join plan where hosts interleave.
      val cache = scala.collection.mutable.HashMap.empty[(String, String), Seq[Rule]]
      val cap = 4096
      rows.map { case (id, host, path, robotsOpt) =>
        val verdicts = robotsOpt match {
          // no robots row, or no path to test: nothing can disallow —
          // a null path must not NPE the matcher (RFC verdicts are
          // about fetchable URLs; a row without one stays admitted)
          case None => agentTokens.map(_ => true)
          case Some(_) if path == null => agentTokens.map(_ => true)
          case Some(body) =>
            agentTokens.map { agent =>
              if (cache.size >= cap && !cache.contains((agent, body))) cache.clear()
              allowed(path, cache.getOrElseUpdate((agent, body), parse(body, agent)))
            }
        }
        (id, host, path, verdicts)
      }
    }.toDF("id", "host", "path", "verdicts")
    verdictRows.select(
      col("id").as(idCol) +: col("host").as(hostCol) +: col("path").as(pathCol) +:
        agents.zipWithIndex.map { case ((_, out), i) =>
          element_at(col("verdicts"), i + 1).as(out)
        }: _*)
  }
}
