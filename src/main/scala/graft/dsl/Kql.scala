package graft.dsl

import org.apache.spark.sql.Column

/** KQL (the Kibana query language) front end.
  *
  * KQL's grammar — `field:value`, parens, wildcards, quoted phrases —
  * is a subset of the Lucene query-string grammar that UriQuery
  * already compiles, with one semantic difference: KQL's `and` / `or`
  * / `not` keywords are case-INsensitive, whereas in Lucene a
  * lowercase `and` is a search term. The translator uppercases the
  * standalone keywords outside quoted phrases and reuses the UriQuery
  * compiler, so KQL queries land on the same pushdown-friendly
  * Catalyst predicates.
  *
  * Out of (KQL's own) scope: Lucene-only syntax a KQL user can't
  * write — fuzzy `~`, boosts `^` — simply never appears; nested-field
  * `{...}` syntax is unsupported (graft models nested docs as struct
  * arrays queried via the `nested` query).
  */
object Kql {

  private val kw = "(?i)(?<![\\w:])(and|or|not)(?![\\w])".r
  // KQL spells ranges with spaces (`n_chars >= 300`); Lucene wants
  // `n_chars:>=300` — rewrite outside quotes
  private val range = "(\\w+)\\s*(>=|<=|>|<)\\s*".r

  def compile(q: String, defaultField: String = "text"): Column = {
    // quote-aware: even split segments are outside double quotes
    val normalized = q.split("\"", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 0)
        range.replaceAllIn(
          kw.replaceAllIn(seg, m => m.group(1).toUpperCase),
          m => s"${m.group(1)}:${m.group(2)}")
      else seg
    }.mkString("\"")
    UriQuery.compile(normalized, defaultField)
  }
}
