package graft.dsl

import org.apache.spark.sql.Column
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Full `_search`-body subset: `runtime_mappings` + `query`.
  *
  * ES runtime fields are computed at query time from a Painless
  * `emit(...)` script and are searchable/aggregatable like mapped
  * fields. Here each runtime field compiles (via `Painless`) to a
  * codegen'd projection added BEFORE the query predicate, so the query
  * can reference runtime fields exactly like ES — and Catalyst
  * collapses the projection into the scan stage, so an un-referenced
  * runtime field costs nothing and a referenced one is computed once.
  *
  * Numeric emits (`long`/`double`) cover the dominant runtime-field
  * use (derived measures); `keyword` passes the value through `cast
  * (string)`.
  */
object SearchBody {

  /** (runtime columns in declaration order, inner query JSON if any).
    * A payload that is NOT a body (a bare query-DSL object) comes back
    * unchanged as the query. */
  def parse(json: String): (Seq[(String, Column)], Option[String]) = {
    val rootFields = JsonMethods.parse(json) match {
      case JObject(fs) => fs
      case _ => return (Nil, Some(json))
    }
    val root = rootFields.toMap
    if (!root.contains("runtime_mappings") && !root.contains("query"))
      return (Nil, Some(json))
    val runtime = root.get("runtime_mappings").toSeq.flatMap {
      case JObject(fields) => fields.map {
        case JField(name, JObject(spec)) =>
          val m = spec.toMap
          val src = m.get("script") match {
            case Some(JObject(s)) => s.toMap.get("source") match {
              case Some(JString(code)) => code
              case _ => throw new IllegalArgumentException(
                s"runtime field '$name' script needs source")
            }
            case _ => throw new IllegalArgumentException(
              s"runtime field '$name' needs a script")
          }
          val inner = src.trim match {
            case e if e.startsWith("emit(") && e.endsWith(")") =>
              e.substring("emit(".length, e.length - 1)
            case e if e.startsWith("emit(") && e.endsWith(");") =>
              e.substring("emit(".length, e.length - 2)
            case _ => throw new IllegalArgumentException(
              s"runtime field '$name' script must be emit(<expr>): $src")
          }
          val c = Painless.compile(inner)
          val typed = m.get("type").collect { case JString(t) => t } match {
            case Some("long") => c.cast("long")
            case Some("double") | None => c
            case Some("keyword") => c.cast("string")
            case Some(other) => throw new IllegalArgumentException(
              s"unsupported runtime field type '$other' for '$name'")
          }
          name -> typed
        case other => throw new IllegalArgumentException(
          s"bad runtime field spec: $other")
      }
      case other => throw new IllegalArgumentException(
        s"runtime_mappings must be an object, got: $other")
    }
    val innerQ = root.get("query")
      .map(q => JsonMethods.compact(JsonMethods.render(q)))
    (runtime, innerQ)
  }

  /** The full `_search` request lifecycle over one frame, in ES's
    * evaluation order: `runtime_mappings` project first (searchable),
    * `query` filters, then EITHER the `aggs` tree (via AggsJson — an
    * aggregation request returns buckets, not hits) or the hit path:
    * `sort` (field/order objects, missing treated as ES's
    * default-last via nulls placement) + `from`/`size` paging
    * (ordered offset+limit — never a global collect). */
  def search(df: org.apache.spark.sql.DataFrame, body: String,
      idField: String = "_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case _ => throw new IllegalArgumentException(s"bad search body: $body")
    }
    val (runtime, innerQ) = parse(body)
    val projected = runtime.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val filtered = innerQ
      // parse() echoes the whole body back as "the query" when it sees
      // neither runtime_mappings nor query — only filter on a real one
      .filter(_ => root.contains("query"))
      .fold(projected)(q => projected.where(EsQuery.compile(q, idField)))
    if (root.contains("aggs") || root.contains("aggregations"))
      return AggsJson.compile(filtered, body)
    val sorted = root.get("sort") match {
      case Some(JArray(specs)) =>
        // `.keyword` multi-field suffix maps to the parent column,
        // same as in the query clauses (QueryDslJson.fieldRef)
        def sortCol(f: String) =
          col(if (f.endsWith(".keyword")) f.dropRight(".keyword".length) else f)
        val orders = specs.map {
          case JObject(JField(f, JObject(o)) :: Nil) =>
            o.toMap.get("order") match {
              case Some(JString("desc")) => sortCol(f).desc_nulls_last
              case _ => sortCol(f).asc_nulls_last // ES: missing defaults last
            }
          case JString(f) => sortCol(f).asc_nulls_last
          case other => throw new IllegalArgumentException(s"bad sort spec: $other")
        }
        filtered.orderBy(orders: _*)
      case None => filtered
      case other => throw new IllegalArgumentException(s"sort must be an array: $other")
    }
    val from = root.get("from").collect { case JInt(i) => i.toInt }.getOrElse(0)
    val size = root.get("size").collect { case JInt(i) => i.toInt }
    val paged = if (from > 0) sorted.offset(from) else sorted
    size.fold(paged)(paged.limit)
  }

  /** `script_fields`: per-HIT computed outputs (unlike runtime fields
    * they are not searchable — they project AFTER the query predicate,
    * exactly ES's evaluation point). Each compiles via Painless to a
    * codegen'd column; params supported. */
  def scriptFields(json: String): Seq[(String, Column)] =
    JsonMethods.parse(json) match {
      case JObject(root) => root.toMap.get("script_fields").toSeq.flatMap {
        case JObject(fields) => fields.map {
          case JField(name, JObject(spec)) =>
            val m = spec.toMap
            val (src, params) = m.get("script") match {
              case Some(JObject(s)) =>
                val sm = s.toMap
                val code = sm.get("source") match {
                  case Some(JString(c)) => c
                  case _ => throw new IllegalArgumentException(
                    s"script_field '$name' needs script.source")
                }
                val ps: Map[String, Any] = sm.get("params") match {
                  case Some(JObject(pp)) => pp.collect {
                    case JField(k, JInt(i)) => k -> i.toLong
                    case JField(k, JDouble(d)) => k -> d
                    case JField(k, JString(v)) => k -> v
                  }.toMap
                  case _ => Map.empty
                }
                (code, ps)
              case _ => throw new IllegalArgumentException(
                s"script_field '$name' needs a script")
            }
            name -> Painless.compile(src, params)
          case other => throw new IllegalArgumentException(
            s"bad script_field spec: $other")
        }
        case other => throw new IllegalArgumentException(
          s"script_fields must be an object, got: $other")
      }
      case _ => Nil
    }

  /** `docvalue_fields` — the columnar-read response shaping (ES reads
    * these from doc values, never from `_source`; graft's scan IS
    * columnar, so this compiles to a pure projection Catalyst pushes
    * into the parquet read — exactly the optimization docvalue_fields
    * exists to buy). Accepts ES's two spellings per entry: a bare
    * field string, or `{"field": f, "format": p}` where `format` is a
    * date pattern (ES date-format syntax is Java's) or
    * `epoch_millis`. Formatted values keep the field's name, like the
    * ES response's `fields` map. */
  def docvalueFields(json: String): Seq[(String, Column)] = {
    import org.apache.spark.sql.functions.{col, date_format, unix_millis}
    JsonMethods.parse(json) match {
      case JArray(specs) => specs.map {
        case JString(f) => f -> col(f)
        case JObject(spec) =>
          val m = spec.toMap
          val f = m.get("field") match {
            case Some(JString(n)) => n
            case _ => throw new IllegalArgumentException(
              s"docvalue_fields entry needs a field: $spec")
          }
          m.get("format") match {
            case Some(JString("epoch_millis")) =>
              f -> unix_millis(col(f).cast("timestamp"))
            case Some(JString(p)) => f -> date_format(col(f), p)
            case None => f -> col(f)
            case other => throw new IllegalArgumentException(
              s"bad docvalue format for '$f': $other")
          }
        case other => throw new IllegalArgumentException(
          s"bad docvalue_fields entry: $other")
      }
      case other => throw new IllegalArgumentException(
        s"docvalue_fields must be an array, got: $other")
    }
  }

  /** `_source` filtering — the response-shaping twin of the
    * connector's es.read.field.include/exclude. Accepts the three ES
    * forms: a bare include array, a single pattern string, or
    * `{"includes": [...], "excludes": [...]}`; `*` wildcards expand
    * against the schema (includes keep pattern-list order with each
    * pattern's matches in schema order; a no-match include fails
    * loudly, a no-match exclude is a no-op). Pure projection —
    * Catalyst prunes the dropped columns out of the scan. */
  def applySourceFilter(df: org.apache.spark.sql.DataFrame, spec: String): org.apache.spark.sql.DataFrame = {
    def expand(pats: Seq[String], requireMatch: Boolean): Seq[String] =
      pats.flatMap { p =>
        if (!p.contains("*")) Seq(p)
        else {
          val re = ("^" + p.split("\\*", -1)
            .map(java.util.regex.Pattern.quote).mkString(".*") + "$").r
          val hits = df.columns.filter(c => re.findFirstIn(c).isDefined).toSeq
          require(!requireMatch || hits.nonEmpty,
            s"_source include pattern '$p' matches no columns")
          hits
        }
      }.distinct
    def strings(v: JValue, what: String): Seq[String] = v match {
      case JArray(xs) => xs.map {
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad $what entry: $other")
      }
      case JString(s) => Seq(s)
      case other => throw new IllegalArgumentException(s"bad $what: $other")
    }
    val (includes, excludes) = JsonMethods.parse(spec) match {
      case JObject(fs) =>
        val m = fs.toMap
        (m.get("includes").map(strings(_, "includes")).getOrElse(Nil),
          m.get("excludes").map(strings(_, "excludes")).getOrElse(Nil))
      case arr @ JArray(_) => (strings(arr, "includes"), Nil)
      case JString(s) => (Seq(s), Nil)
      case other => throw new IllegalArgumentException(s"bad _source spec: $other")
    }
    val included =
      if (includes.isEmpty) df
      else df.select(expand(includes, requireMatch = true)
        .map(org.apache.spark.sql.functions.col): _*)
    expand(excludes, requireMatch = false)
      .filter(included.columns.contains).foldLeft(included)(_ drop _)
  }
}
