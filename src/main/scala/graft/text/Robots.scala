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
    // '*' -> '.*', '$' only anchors at the very end, everything else
    // is a literal (quoted); matching is "pattern matches a PREFIX of
    // the path" unless anchored
    private[Robots] val regex: java.util.regex.Pattern = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val sb = new StringBuilder("^")
      body.foreach {
        case '*' => sb.append(".*")
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      if (anchored) sb.append("$")
      java.util.regex.Pattern.compile(sb.toString)
    }
    private[Robots] def matches(path: String): Boolean =
      regex.matcher(path).lookingAt()
  }

  /** Parse a robots body and select the rule group for `agent`. */
  def parse(robots: String, agent: String): Seq[Rule] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // split into (agent tokens, rules) groups: consecutive User-agent
    // lines open a group; the first rule line closes the agent list
    val groups = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgents = false
    robots.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val at = line.indexOf(':')
      if (at > 0) {
        val key = line.substring(0, at).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(at + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer(value),
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
            } else groups.last._1 += value
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(key == "allow", value)
          // empty Disallow = allow everything: no rule to add
          case _ => inAgents = false // crawl-delay, sitemap, unknown
        }
      }
    }
    // longest agent-prefix match wins; '*' is the fallback
    val named = groups.filter(_._1.exists(a =>
      a != "*" && agentLc.startsWith(a.toLowerCase(java.util.Locale.ROOT))))
    if (named.nonEmpty) {
      val bestLen = named.flatMap(_._1).filter(a =>
        a != "*" && agentLc.startsWith(a.toLowerCase(java.util.Locale.ROOT)))
        .map(_.length).max
      // all groups carrying the best token contribute (RFC: groups
      // with the same selected agent merge)
      named.filter(_._1.exists(a => a.length == bestLen &&
        agentLc.startsWith(a.toLowerCase(java.util.Locale.ROOT))))
        .flatMap(_._2).toSeq
    } else groups.filter(_._1.contains("*")).flatMap(_._2).toSeq
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
    * map-only, codegen-adjacent cost. For per-host robots, group the
    * URL frame by host and apply per group (the rules object is
    * per-host config, not data). */
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
}
