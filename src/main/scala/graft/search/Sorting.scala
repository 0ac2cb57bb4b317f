package graft.search

import graft.dsl.Painless
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ES search-body `sort` compiler — the part of the `_search` surface
  * that orders hits by something other than `_score`.
  *
  * Supported forms (each JSON array entry → one Spark sort Column):
  *   - `"field"` / `{"field": "asc|desc"}` — plain field sort
  *   - `{"field": {"order", "mode", "missing"}}` — multivalued fields
  *     (Spark arrays) fold to a scalar sort key per `mode`
  *     (min/max/sum/avg/median, ES's MultiValueMode); `missing`
  *     places null keys `_first`/`_last` or substitutes a literal
  *   - `{"_geo_distance": {field: {lat, lon}, "order"}}` — haversine
  *     km from the query point; field f reads columns f_lat / f_lon
  *     (the QueryDslJson geo convention)
  *   - `{"_script": {"script": {...}, "order"}}` — a Painless sort
  *     key, compiled (dsl.Painless) to codegen'd column math
  *
  * Everything compiles to deterministic Column expressions: a sort
  * spec costs one TakeOrderedAndProject when paired with a limit, the
  * same plan shape as any top-k — no new operator, no extra exchange.
  * Median of an even-cardinality multivalue averages the two middle
  * values, exactly ES's MultiValueMode.MEDIAN.
  */
object Sorting {

  def compile(json: String): Seq[Column] =
    JsonMethods.parse(json) match {
      case JArray(entries) => entries.map(e => toOrder(entry(e)))
      case single => Seq(toOrder(entry(single)))
    }

  private def toOrder(e: (Column, Boolean, Boolean)): Column =
    ordered(e._1, e._2, e._3)

  private def lits(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  /** (sort key, ascending?, missing-last?) for one spec entry. */
  private def entry(v: JValue): (Column, Boolean, Boolean) = v match {
    case JString(f) => (col(f), true, true)

    case JObject(JField("_geo_distance", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val asc = !m.get("order").map(lits(_).toString).contains("desc")
      // every key that is NOT a known option is the point field — ES
      // accepts order/unit/mode/distance_type/ignore_unmapped options
      // alongside it, which must not be mistaken for the field
      val optionKeys = Set("order", "unit", "mode", "distance_type", "ignore_unmapped")
      val pointFields = parts.filterNot(p => optionKeys.contains(p._1))
      require(pointFields.size == 1,
        s"_geo_distance needs exactly one point field, got: ${pointFields.map(_._1).mkString(", ")}")
      val (f, point) = pointFields.head
      // distance_type plane (fast-but-approximate) is not offered —
      // reject loudly rather than silently sorting by a different metric
      m.get("distance_type").map(lits(_).toString).foreach { dt =>
        require(dt == "arc", s"unsupported distance_type: $dt (only arc)")
      }
      val p = point match {
        case JObject(fs) => fs.toMap
        case other => throw new IllegalArgumentException(s"bad geo point: $other")
      }
      // unit scales the sort VALUE (observable via sort keys); km is
      // the computed base, ES's default is meters
      val unitScale = m.get("unit").map(lits(_).toString).getOrElse("m") match {
        case "m"  => 1000.0
        case "km" => 1.0
        case "mi" => 1.0 / 1.609344
        case "ft" => 3280.839895013123
        case u    => throw new IllegalArgumentException(s"unsupported _geo_distance unit: $u")
      }
      val dist = graft.rel.Relational.haversineKm(
        col(s"${f}_lat"), col(s"${f}_lon"),
        lit(lits(p("lat")).toString.toDouble), lit(lits(p("lon")).toString.toDouble)) * unitScale
      (dist, asc, true)

    case JObject(JField("_script", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      val asc = !m.get("order").map(lits(_).toString).contains("desc")
      val script = m.get("script") match {
        case Some(JObject(sf)) => sf.toMap
        case other => throw new IllegalArgumentException(s"_script sort needs script: $other")
      }
      val src = lits(script.getOrElse("source",
        throw new IllegalArgumentException("_script sort needs source"))).toString
      val params: Map[String, Any] = script.get("params") match {
        case Some(JObject(ps)) => ps.map { case JField(k, pv) => k -> lits(pv) }.toMap
        case _ => Map.empty
      }
      (Painless.compile(src, params), asc, true)

    case JObject(JField(f, JString(order)) :: Nil) =>
      (col(f), order != "desc", true)

    case JObject(JField(f, JObject(parts)) :: Nil) =>
      val m = parts.toMap
      // unknown sort options (unmapped_type, format, typos) must not
      // be silently ignored — a dropped `mode` would sort by a
      // different key than the caller asked for
      val unknownS = m.keySet -- Set("order", "nested", "mode", "missing")
      require(unknownS.isEmpty,
        s"unsupported sort option(s) for '$f': ${unknownS.toSeq.sorted.mkString(", ")}")
      val asc = !m.get("order").map(lits(_).toString).contains("desc")
      // nested sort: `f` is "path.sub" over an array-of-structs
      // column; the optional filter (term/range on struct fields)
      // restricts which inner docs feed the mode fold — evaluated
      // per row on the array, no unnest/join
      val source: Column = m.get("nested") match {
        case Some(JObject(nparts)) =>
          val nm = nparts.toMap
          val path = lits(nm.getOrElse("path",
            throw new IllegalArgumentException("nested sort needs path"))).toString
          require(f.startsWith(path + "."), s"nested sort field $f must sit under $path")
          val sub = f.stripPrefix(path + ".")
          val base = nm.get("filter") match {
            case Some(fq) => filter(col(path), x => nestedPred(x, fq))
            case None => col(path)
          }
          transform(base, x => x.getField(sub))
        case Some(other) => throw new IllegalArgumentException(s"bad nested spec: $other")
        case None => col(f)
      }
      val key = m.get("mode").map(lits(_).toString) match {
        case None => source
        case Some("min") => array_min(source)
        case Some("max") => array_max(source)
        case Some("sum") => aggregate(source, lit(0.0), (a, x) => a + x.cast("double"))
        case Some("avg") =>
          aggregate(source, lit(0.0), (a, x) => a + x.cast("double")) / size(source)
        case Some("median") =>
          // ES MultiValueMode.MEDIAN: even counts average the two
          // middle values; odd counts pick the middle (lo == hi)
          val sorted = sort_array(source)
          val n = size(source)
          val lo = element_at(sorted, ((n + 1) / lit(2)).cast("int"))
          val hi = element_at(sorted, (n / lit(2) + 1).cast("int"))
          (lo.cast("double") + hi.cast("double")) / 2.0
        case Some(other) => throw new IllegalArgumentException(s"unknown sort mode: $other")
      }
      m.get("missing") match {
        case None | Some(JString("_last")) => (key, asc, true)
        case Some(JString("_first")) => (key, asc, false)
        // typed literal: a numeric `missing` must stay numeric, or the
        // coalesce would force the whole key to string ordering
        case Some(v2) => (coalesce(key, lit(lits(v2))), asc, true)
      }

    case other => throw new IllegalArgumentException(s"bad sort entry: $other")
  }

  /** The nested-sort filter against one struct element: term and
    * range clauses on the struct's fields (the common nested-sort
    * filters; full Query-DSL recursion would need per-element column
    * resolution). */
  private def nestedPred(x: Column, q: JValue): Column = q match {
    case JObject(JField("term", JObject(JField(sf, v) :: Nil)) :: Nil) =>
      x.getField(sf) === lit(lits(v))
    case JObject(JField("range", JObject(JField(sf, JObject(bounds)) :: Nil)) :: Nil) =>
      val b = bounds.toMap
      Seq(
        b.get("gte").map(v => x.getField(sf) >= lit(lits(v))),
        b.get("gt").map(v => x.getField(sf) > lit(lits(v))),
        b.get("lte").map(v => x.getField(sf) <= lit(lits(v))),
        b.get("lt").map(v => x.getField(sf) < lit(lits(v)))).flatten
        .reduceOption(_ && _)
        .getOrElse(throw new IllegalArgumentException("nested range filter needs a bound"))
    case JObject(JField("bool", JObject(parts)) :: Nil) =>
      val m = parts.toMap
      def list(key: String): Seq[Column] = m.get(key).toSeq.flatMap {
        case JArray(xs) => xs.map(nestedPred(x, _))
        case single => Seq(nestedPred(x, single))
      }
      (list("must") ++ list("filter")).reduceOption(_ && _).getOrElse(lit(true)) &&
        list("must_not").map(!_).reduceOption(_ && _).getOrElse(lit(true))
    case other => throw new IllegalArgumentException(s"unsupported nested sort filter: $other")
  }

  /** ES places missing values last by default REGARDLESS of order
    * (Spark's default flips with direction), so direction and null
    * placement are always explicit here. */
  private def ordered(c: Column, asc: Boolean, missingLast: Boolean): Column =
    (asc, missingLast) match {
      case (true, true) => c.asc_nulls_last
      case (true, false) => c.asc_nulls_first
      case (false, true) => c.desc_nulls_last
      case (false, false) => c.desc_nulls_first
    }

  /** One spec entry as (sort key, ascending?, missing-last?) — the
    * SearchBody front door dispatches its rich sort entries (mode /
    * nested / _geo_distance / _script / missing) here so the SAME
    * computed key feeds the ordering AND the search_after cursor. */
  def spec(v: JValue): (Column, Boolean, Boolean) = entry(v)

  /** The computed sort key of a single spec entry (no ordering) — for
    * callers that also project the key into the output. */
  def key(json: String): Column =
    entry(JsonMethods.parse(json) match {
      case JArray(e :: _) => e
      case single => single
    })._1
}
