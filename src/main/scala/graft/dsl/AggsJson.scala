package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.util.Num

/** The `_search` request-body `"aggs"` JSON compiler — the aggregation
  * half of the Query DSL surface (QueryDslJson compiles the `query`
  * half). A request's aggregation TREE compiles to ONE flat groupBy:
  * every bucket level contributes a key column (named after its agg),
  * metrics evaluate at the deepest level next to `doc_count`, and the
  * whole tree costs a single partial-aggregated exchange — the Spark
  * shape of ES's per-shard bucket tree + reduce.
  *
  * Supported (the high-frequency subset):
  *  - bucket: `terms` (field, size), `histogram` (field, interval),
  *    `date_histogram` (field, fixed_interval of s/m/h/d over the
  *    ns-long event-time column), `range` (field, ranges with ES's
  *    `*-to` / `from-to` / `from-*` key labels; from-inclusive,
  *    to-exclusive, non-matching rows drop like ES; declared-order
  *    first-match-wins — ES additionally duplicates a doc into every
  *    OVERLAPPING range, so keep ranges disjoint here)
  *  - metric: `avg` `sum` `min` `max` `value_count` `cardinality`
  *    (exact distinct — documented superior to ES's HLL sketch)
  *  - nesting: bucket > bucket > ... > metrics, any depth
  *
  * Flat-table semantics (documented delta vs ES): metric aggs may
  * appear ONLY at the deepest level — a metric declared as a sibling
  * of a bucket agg at a non-leaf level throws (ES re-aggregates per
  * level; silently dropping it would return a result with columns
  * missing). `terms` honors `size` only when the tree is a SINGLE
  * terms level (top-k by doc_count, ES's order, ES default size 10);
  * an explicit `size` on a nested tree throws because the flat
  * groupBy cannot page per level, and an omitted nested size returns
  * all bucket paths ordered by key. */
object AggsJson {

  def compile(df: DataFrame, json: String): DataFrame = {
    val root = JsonMethods.parse(json) match {
      case JObject(fs) => fs.toMap.get("aggs").orElse(fs.toMap.get("aggregations")) match {
        case Some(JObject(aggs)) => aggs
        case _ => throw new IllegalArgumentException("body needs an aggs object")
      }
      case _ => throw new IllegalArgumentException(s"bad aggs body: $json")
    }
    // walk the tree: collect (name, keyColumn) per bucket level and the
    // leaf metric set
    val keys = scala.collection.mutable.ListBuffer.empty[(String, Column)]
    var metrics = Seq.empty[(String, Column)]
    var topSize: Option[Int] = None
    var topSizeExplicit = false
    // ES terms `order`: {"_key"|"_count"|<metric name>: "asc"|"desc"},
    // or the array form [{...},{...}] for multi-criteria ordering
    var topOrder: List[(String, Boolean)] = Nil
    var level = 0

    def walk(aggs: List[JField]): Unit = {
      val (buckets, leafMetrics) = aggs.partition {
        case JField(_, JObject(spec)) =>
          spec.exists { case JField(k, _) =>
            Set("terms", "histogram", "date_histogram", "range").contains(k) }
        case _ => false
      }
      if (buckets.nonEmpty && leafMetrics.nonEmpty)
        throw new IllegalArgumentException(
          "metric aggs must sit at the deepest level; found metric(s) " +
            leafMetrics.map(_._1).mkString(",") +
            " beside bucket agg " + buckets.head._1)
      metrics = leafMetrics.map {
        case JField(name, JObject(spec)) => name -> metricCol(name, spec.toMap)
        case other => throw new IllegalArgumentException(s"bad metric agg: $other")
      }
      buckets match {
        case Nil => ()
        case JField(name, JObject(spec)) :: Nil =>
          val m = spec.toMap
          val sub = m.get("aggs").orElse(m.get("aggregations"))
          keys += name -> bucketKey(name, m - "aggs" - "aggregations")
          val explicitSize = m.get("terms").collect {
            case JObject(s) => s.toMap.get("size") }.flatten.collect {
              case JInt(i) => i.toInt }
          if (level == 0) {
            // ES defaults terms to top 10; honored when this stays the
            // only bucket level (checked after the walk)
            topSize = explicitSize.orElse(
              if (m.contains("terms")) Some(10) else None)
            topSizeExplicit = explicitSize.isDefined
            def oneOrder(v: JValue): (String, Boolean) = v match {
              case JObject(List(JField(by, JString(dir))))
                  if Set("asc", "desc")(dir.toLowerCase) =>
                (by, dir.toLowerCase == "asc")
              case other => throw new IllegalArgumentException(
                "unsupported terms order entry (want a single-entry " +
                  s"""{"target": "asc"|"desc"} object): $other""")
            }
            topOrder = m.get("terms").collect {
              case JObject(s) => s.toMap.get("order") }.flatten match {
                case None => Nil
                case Some(JArray(entries)) => entries.map(oneOrder)
                case Some(v) => List(oneOrder(v))
              }
          } else if (explicitSize.isDefined)
            throw new IllegalArgumentException(
              s"terms size on nested level '$name' is not honored by the " +
                "flat groupBy compile; page per level with composite instead")
          level += 1
          sub match {
            case Some(JObject(inner)) => walk(inner)
            case None => ()
            case other => throw new IllegalArgumentException(s"bad sub-aggs: $other")
          }
        case several => throw new IllegalArgumentException(
          "one bucket agg per level (sibling bucket aggs need separate requests): " +
            several.map(_._1).mkString(","))
      }
    }
    walk(root)
    require(keys.nonEmpty || metrics.nonEmpty, "empty aggs body")

    if (keys.isEmpty) {
      // metric-only body: one global row
      val cols = metrics.map { case (n, c) => c.as(n) }
      df.agg(cols.head, cols.tail: _*)
    } else {
      val aggCols = (count(lit(1)).as("doc_count") +:
        metrics.map { case (n, c) => c.as(n) })
      val grouped = df
        .groupBy(keys.map { case (n, c) => c.as(n) }.toSeq: _*)
        .agg(aggCols.head, aggCols.tail: _*)
        // range buckets: rows outside every range fold to null — drop
        .where(keys.map { case (n, _) => col(n).isNotNull }.reduce(_ && _))
      topSize match {
        case Some(k) if keys.size == 1 =>
          val keyCol = col(keys.head._1)
          // order target: _key / _count / a declared metric name;
          // key-asc tie-break everywhere (ES's determinism rule)
          val ordered = topOrder match {
            case Nil =>
              grouped.orderBy(col("doc_count").desc, keyCol.asc)
            case specs =>
              def target(by: String): Column =
                if (by == "_key") keyCol
                else if (by == "_count") col("doc_count")
                else if (metrics.exists(_._1 == by)) col(by)
                else throw new IllegalArgumentException(
                  s"terms order references unknown target: $by")
              val sortCols = specs.map { case (by, asc) =>
                if (asc) target(by).asc else target(by).desc }
              // key-asc as the final tie-break (ES's determinism rule)
              grouped.orderBy((sortCols :+ keyCol.asc): _*)
          }
          ordered.limit(k)
        case Some(_) if topSizeExplicit =>
          throw new IllegalArgumentException(
            "terms size on a nested tree is not honored by the flat " +
              "groupBy compile; page per level with composite instead")
        case _ =>
          grouped.orderBy(keys.map { case (n, _) => col(n).asc }.toSeq: _*)
      }
    }
  }

  private def str(m: Map[String, JValue], k: String, agg: String): String =
    m.get(k).collect { case JString(s) => s }
      .getOrElse(throw new IllegalArgumentException(s"$agg needs $k"))

  private def num(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"bad number: $other")
  }

  private def bucketKey(name: String, spec: Map[String, JValue]): Column =
    spec.head match {
      case ("terms", JObject(s)) =>
        col(str(s.toMap, "field", "terms"))
      case ("histogram", JObject(s)) =>
        val m = s.toMap
        val f = str(m, "field", "histogram")
        val interval = num(m.getOrElse("interval",
          throw new IllegalArgumentException("histogram needs interval")))
        floor(col(f) / interval) * interval
      case ("date_histogram", JObject(s)) =>
        val m = s.toMap
        val f = str(m, "field", "date_histogram")
        val iv = str(m, "fixed_interval", "date_histogram")
        val IntervalRe = """(\d+)(ms|s|m|h|d)""".r
        val ns = iv match {
          case IntervalRe(n, unit) => n.toLong * (unit match {
            case "ms" => 1000000L
            case "s" => 1000000000L
            case "m" => 60L * 1000000000L
            case "h" => 3600L * 1000000000L
            case "d" => 86400L * 1000000000L
          })
          case other => throw new IllegalArgumentException(
            s"bad fixed_interval '$other' (want <n>ms|s|m|h|d)")
        }
        // bucket START in ns (integer math — the ES epoch-aligned key)
        expr(s"($f div ${ns}L) * ${ns}L")
      case ("range", JArrayOrRanges(ranges)) =>
        ranges.foldRight(lit(null).cast("string")) { case ((from, to, _), acc) =>
          val label =
            s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}"
          val fieldCol = col(ranges.head._3)
          val cond = (from.map(fieldCol >= _), to.map(fieldCol < _)) match {
            case (Some(a), Some(b)) => a && b
            case (Some(a), None) => a
            case (None, Some(b)) => b
            case (None, None) => lit(true)
          }
          when(cond, lit(label)).otherwise(acc)
        }
      case (other, _) => throw new IllegalArgumentException(
        s"unsupported bucket agg under '$name': $other")
    }

  /** range spec extractor: (from, to, field) triples. */
  private object JArrayOrRanges {
    def unapply(v: JValue): Option[Seq[(Option[Double], Option[Double], String)]] =
      v match {
        case JObject(s) =>
          val m = s.toMap
          val f = m.get("field").collect { case JString(x) => x }.getOrElse(return None)
          m.get("ranges") match {
            case Some(JArray(rs)) => Some(rs.map {
              case JObject(r) =>
                val rm = r.toMap
                (rm.get("from").map(num), rm.get("to").map(num), f)
              case other => throw new IllegalArgumentException(s"bad range: $other")
            })
            case _ => None
          }
        case _ => None
      }
  }

  private def metricCol(name: String, spec: Map[String, JValue]): Column = {
    // ES metric aggs accept `missing`: docs without the field count as
    // that substitute value instead of being skipped
    def fld(s: Map[String, JValue], agg: String): Column = {
      val c = col(str(s, "field", agg))
      s.get("missing").map(m => coalesce(c, lit(num(m)))).getOrElse(c)
    }
    spec.head match {
      case ("avg", JObject(s)) =>
        Num.round(avg(fld(s.toMap, "avg")), 4)
      case ("sum", JObject(s)) =>
        // decimal partials keep the sum order-free exact; the FINAL
        // value goes out as double — Spark's sum(decimal(18,4)) would
        // declare decimal(28,4) where DuckDB declares decimal(38,4),
        // and the driver's hash is type-sensitive (r10)
        sum(fld(s.toMap, "sum").cast("decimal(18,4)")).cast("double")
      case ("min", JObject(s)) => min(fld(s.toMap, "min"))
      case ("max", JObject(s)) => max(fld(s.toMap, "max"))
      case ("value_count", JObject(s)) =>
        count(fld(s.toMap, "value_count"))
      case ("cardinality", JObject(s)) =>
        count_distinct(fld(s.toMap, "cardinality"))
      case (other, _) => throw new IllegalArgumentException(
        s"unsupported metric agg under '$name': $other")
    }
  }
}
