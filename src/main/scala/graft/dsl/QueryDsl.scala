package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Elasticsearch Query-DSL (filter context) re-expressed as Catalyst
  * `Column` predicates.
  *
  * The reference connector (elasticsearch-hadoop) translates Spark
  * filters INTO the ES query DSL so the server can prune; graft runs the
  * same DSL the other direction: each builder yields a plain Catalyst
  * predicate, so Catalyst pushes it into the parquet scan
  * (`PushedFilters`) and prunes row groups — the Spark-native equivalent
  * of ES shard-side filtering. No UDFs: every predicate stays inside
  * whole-stage codegen and remains pushdown-eligible at 100 TB.
  */
object QueryDsl {

  /** `{"term": {field: value}}` — exact match on a keyword field. */
  def term(field: Column, value: Any): Column = field === lit(value)

  /** `{"terms": {field: [v...]}}` — any-of. Compiles to an `In` filter
    * (pushed to parquet as a dictionary/row-group filter). */
  def terms(field: Column, values: Seq[Any]): Column = field.isin(values: _*)

  /** `{"ids": {"values": [...]}}` — doc-id lookup against the index's
    * `_id` column. */
  def ids(idField: Column, values: Seq[Any]): Column = idField.isin(values: _*)

  /** `{"range": {field: {gte/gt/lte/lt}}}`. Bounds are optional; all
    * present bounds are AND-ed. */
  def range(
      field: Column,
      gte: Option[Any] = None,
      gt: Option[Any] = None,
      lte: Option[Any] = None,
      lt: Option[Any] = None): Column = {
    val bounds = Seq(
      gte.map(v => field >= lit(v)),
      gt.map(v => field > lit(v)),
      lte.map(v => field <= lit(v)),
      lt.map(v => field < lit(v))).flatten
    require(bounds.nonEmpty, "range query needs at least one bound")
    bounds.reduce(_ && _)
  }

  /** `{"exists": {"field": f}}`. */
  def exists(field: Column): Column = field.isNotNull

  /** ES `missing` / `bool.must_not.exists`. */
  def missing(field: Column): Column = field.isNull

  /** `{"prefix": {field: p}}` — compiles to `StringStartsWith`, which
    * parquet can evaluate against column min/max statistics. */
  def prefix(field: Column, p: String): Column = field.startsWith(p)

  /** `{"wildcard": {field: pat}}` with ES `*` / `?` wildcards,
    * translated to a SQL LIKE pattern. LIKE specials are escaped so a
    * literal `%`/`_` in the pattern stays literal. */
  def wildcard(field: Column, pattern: String): Column = {
    val like = pattern
      .replace("\\", "\\\\")
      .replace("%", "\\%")
      .replace("_", "\\_")
      .replace('*', '%')
      .replace('?', '_')
    field.like(like)
  }

  /** `{"regexp": {field: re}}` — ES regexps are implicitly anchored at
    * both ends; Spark's `rlike` is substring-match, so anchor. */
  def regexp(field: Column, re: String): Column = field.rlike("^(?:" + re + ")$")

  /** `{"fuzzy": {field: {value, fuzziness}}}` — edit-distance match on a
    * keyword field (ES AUTO fuzziness defaults to <= 2 edits). */
  def fuzzy(field: Column, value: String, maxEdits: Int = 2): Column =
    levenshtein(field, lit(value)) <= maxEdits

  /** fuzzy with `transpositions: true` (the ES default): an adjacent
    * swap counts as ONE edit (Damerau-Levenshtein), so "sprak" is one
    * edit from "spark" instead of two. Compiled kernel —
    * expr.DamerauLevenshtein — since Spark ships only plain
    * levenshtein. */
  def fuzzyTranspositions(field: Column, value: String, maxEdits: Int = 2): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expr.DamerauLevenshtein(
      org.apache.spark.sql.GraftBridge.expression(field),
      org.apache.spark.sql.GraftBridge.expression(lit(value)))) <= maxEdits

  /** `{"bool": {...}}` — must/filter AND, must_not NOT, should OR (or
    * `minimum_should_match`-of-N when must/filter are also present,
    * matching ES semantics where should becomes optional-scoring).
    *
    * The `minimumShouldMatch >= 2` case sums the should-bits — still a
    * single codegen'd predicate, no shuffle.
    */
  def bool(
      must: Seq[Column] = Nil,
      filter: Seq[Column] = Nil,
      should: Seq[Column] = Nil,
      mustNot: Seq[Column] = Nil,
      minimumShouldMatch: Int = 0): Column = {
    val msm =
      if (minimumShouldMatch > 0) minimumShouldMatch
      else if (should.nonEmpty && must.isEmpty && filter.isEmpty) 1
      else 0
    val parts = Seq.newBuilder[Column]
    parts ++= must
    parts ++= filter
    parts ++= mustNot.map(!_)
    if (should.nonEmpty && msm == 1) parts += should.reduce(_ || _)
    else if (should.nonEmpty && msm > 1)
      parts += should.map(c => when(c, 1).otherwise(0)).reduce(_ + _) >= msm
    val all = parts.result()
    if (all.isEmpty) lit(true) else all.reduce(_ && _)
  }
}
