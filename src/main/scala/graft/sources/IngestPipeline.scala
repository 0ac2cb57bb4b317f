package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ES ingest-pipeline analog: a JSON `processors` chain applied to
  * every batch at WRITE time (`graft.ingest.pipeline` option on save).
  *
  * In ES the ingest node mutates each document before indexing; here
  * the whole chain compiles once to narrow Column transforms folded
  * into the write job — no per-document interpretation, no extra pass
  * over the data (Catalyst collapses consecutive projections into one).
  *
  * Supported processors (the common document-shaping subset):
  * set, rename, remove, convert, lowercase, uppercase, trim, gsub,
  * dissect, grok (via the ES|QL compilers — one anchored regex
  * each), date, kv, json (flat string maps), script (Painless
  * computed value), csv, split, join, append, urldecode, bytes,
  * fingerprint, drop (Painless `if`), foreach (per-element
  * lowercase/uppercase/trim/gsub over an array field).
  */
object IngestPipeline {

  def compile(json: String): DataFrame => DataFrame = {
    val procs = JsonMethods.parse(json) match {
      case JObject(fields) => fields.toMap.get("processors") match {
        case Some(JArray(xs)) => xs
        case _ => throw new IllegalArgumentException(
          "ingest pipeline needs a processors array")
      }
      case _ => throw new IllegalArgumentException(
        s"bad ingest pipeline: $json")
    }
    val steps: Seq[DataFrame => DataFrame] = procs.map {
      case JObject(JField(op, JObject(spec)) :: Nil) =>
        val m = spec.toMap
        def field = m.get("field").collect { case JString(s) => s }
          .getOrElse(throw new IllegalArgumentException(s"$op needs field"))
        op match {
          case "set" =>
            val v = m.getOrElse("value",
              throw new IllegalArgumentException("set needs value")) match {
              case JString(s) => lit(s)
              case JInt(i) => lit(i.toLong)
              case JLong(l) => lit(l)
              case JDouble(d) => lit(d)
              case JBool(b) => lit(b)
              case other => throw new IllegalArgumentException(
                s"unsupported set value: $other")
            }
            df => df.withColumn(field, v)
          case "rename" =>
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("rename needs target_field"))
            df => df.withColumnRenamed(field, target)
          case "remove" => df => df.drop(field)
          case "convert" =>
            val t = m.get("type").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("convert needs type"))
            val sparkType = t match {
              case "integer" => "int"
              case "long" => "long"
              case "float" => "float"
              case "double" => "double"
              case "string" => "string"
              case "boolean" => "boolean"
              case other => throw new IllegalArgumentException(
                s"unsupported convert type: $other")
            }
            df => df.withColumn(field, col(field).cast(sparkType))
          case "lowercase" => df => df.withColumn(field, lower(col(field)))
          case "uppercase" => df => df.withColumn(field, upper(col(field)))
          case "trim" => df => df.withColumn(field, trim(col(field)))
          case "gsub" =>
            val pattern = m.get("pattern").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("gsub needs pattern"))
            val replacement = m.get("replacement").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("gsub needs replacement"))
            df => df.withColumn(field, regexp_replace(col(field), pattern, replacement))
          // structured extraction: delegate to the SAME compilers the
          // ES|QL DISSECT/GROK commands use — one anchored regex,
          // narrow codegen'd columns
          case "dissect" =>
            val pattern = m.get("pattern").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("dissect needs pattern"))
            df => graft.dsl.Esql.applyCommand(df, s"""dissect $field "$pattern"""")
          case "grok" =>
            val pattern = m.get("patterns") match {
              case Some(JArray(JString(p) :: _)) => p
              case Some(JString(p)) => p
              case _ => throw new IllegalArgumentException("grok needs patterns")
            }
            df => graft.dsl.Esql.applyCommand(df, s"""grok $field "$pattern"""")
          case "date" =>
            val fmt = m.get("formats") match {
              case Some(JArray(JString(f) :: _)) => f
              case Some(JString(f)) => f
              case _ => throw new IllegalArgumentException("date needs formats")
            }
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("@timestamp")
            df => df.withColumn(target, to_timestamp(col(field), fmt))
          case "kv" =>
            val fs = m.get("field_split").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("kv needs field_split"))
            val vs = m.get("value_split").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("kv needs value_split"))
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(field)
            df => df.withColumn(target, str_to_map(col(field), lit(fs), lit(vs)))
          case "json" =>
            // schema-free subset: flat string-valued objects (the
            // common log-enrichment shape) land as map<string,string>
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(field)
            df => df.withColumn(target,
              from_json(col(field), org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType,
                org.apache.spark.sql.types.StringType)))
          case "script" =>
            // Painless subset (incl. statements) computing ONE value
            // into target_field — the dominant script-processor use
            val src = m.get("source").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("script needs source"))
            val target = m.get("target_field").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException(
                "script needs target_field (the computed-value subset)"))
            val params: Map[String, Any] = m.get("params") match {
              case Some(JObject(ps)) => ps.collect {
                case JField(k, JInt(i)) => k -> i.toLong
                case JField(k, JDouble(d)) => k -> d
                case JField(k, JString(s)) => k -> s
              }.toMap
              case _ => Map.empty
            }
            df => df.withColumn(target, graft.dsl.Painless.compile(src, params))
          case "csv" =>
            val targets = m.get("target_fields") match {
              case Some(JArray(xs)) => xs.collect { case JString(s) => s }
              case _ => throw new IllegalArgumentException("csv needs target_fields")
            }
            val sep = m.get("separator").collect { case JString(s) => s }.getOrElse(",")
            df => {
              val parts = split(col(field), java.util.regex.Pattern.quote(sep))
              targets.zipWithIndex.foldLeft(df) { case (d, (t, i)) =>
                d.withColumn(t, element_at(parts, i + 1))
              }
            }
          case "split" =>
            val sep = m.get("separator").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("split needs separator"))
            df => df.withColumn(field, split(col(field), sep)) // regex, like ES
          case "join" =>
            val sep = m.get("separator").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("join needs separator"))
            df => df.withColumn(field, array_join(col(field), sep))
          case "append" =>
            // appends to an array field, creating it from a missing /
            // null value like ES (scalar fields are the caller's bug)
            val v = m.getOrElse("value",
              throw new IllegalArgumentException("append needs value")) match {
              case JString(s) => lit(s)
              case JInt(i) => lit(i.toLong)
              case JDouble(d) => lit(d)
              case other => throw new IllegalArgumentException(
                s"unsupported append value: $other")
            }
            df => df.withColumn(field,
              if (df.columns.contains(field))
                concat(coalesce(col(field), array()), array(v))
              else array(v))
          case "urldecode" =>
            df => df.withColumn(field, url_decode(col(field)))
          case "bytes" =>
            // "1kb" -> 1024; case-insensitive units b..pb, ES semantics
            val t = m.get("target_field").collect { case JString(s) => s }.getOrElse(field)
            df => {
              val s = lower(trim(col(field)))
              val num = regexp_extract(s, "^(\\d+(?:\\.\\d+)?)", 1).cast("double")
              val unit = regexp_extract(s, "([a-z]+)$", 1)
              val mult = when(unit === "b" || unit === "", 1L)
                .when(unit === "kb", 1L << 10).when(unit === "mb", 1L << 20)
                .when(unit === "gb", 1L << 30).when(unit === "tb", 1L << 40)
                .when(unit === "pb", 1L << 50)
              df.withColumn(t, (num * mult).cast("long"))
            }
          case "fingerprint" =>
            val fields = m.get("fields") match {
              case Some(JArray(xs)) => xs.collect { case JString(s) => s }
              case _ => throw new IllegalArgumentException("fingerprint needs fields")
            }
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("fingerprint")
            // ES hashes the ordered (field, value) sequence; the
            // separator keeps ("ab","c") distinct from ("a","bc")
            df => df.withColumn(t,
              md5(concat_ws("|", fields.map(f => col(f).cast("string")): _*)))
          case "drop" =>
            // drop the DOCUMENT when the Painless `if` holds — the only
            // row-removing processor; compiles to one filter predicate
            val cond = m.get("if").collect { case JString(s) => s }
              .getOrElse(throw new IllegalArgumentException("drop needs if"))
            df => df.where(graft.dsl.Painless.compile(cond, Map.empty) === 0.0)
          case "foreach" =>
            // per-element transform over an array field; the inner
            // processor references ES's _ingest._value cursor. The
            // lambda is a Spark HOF (interpreted) — fine on the write
            // path where the array is the unit of work anyway.
            val (subOp, subSpec) = m.get("processor") match {
              case Some(JObject(JField(o, JObject(sp)) :: Nil)) => (o, sp.toMap)
              case _ => throw new IllegalArgumentException("foreach needs processor")
            }
            val elemFn: Column => Column = subOp match {
              case "lowercase" => lower
              case "uppercase" => upper
              case "trim" => trim(_)
              case "gsub" =>
                val p = subSpec.get("pattern").collect { case JString(s) => s }
                  .getOrElse(throw new IllegalArgumentException("gsub needs pattern"))
                val r = subSpec.get("replacement").collect { case JString(s) => s }
                  .getOrElse(throw new IllegalArgumentException("gsub needs replacement"))
                x => regexp_replace(x, p, r)
              case other => throw new IllegalArgumentException(
                s"unsupported foreach sub-processor: $other")
            }
            df => df.withColumn(field, transform(col(field), elemFn))
          case "uri_parts" =>
            // URL decomposition (scheme/host/port/path/query/fragment)
            // as one struct — regexp_extract groups over RFC 3986's
            // own reference regex, all codegen'd
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("url")
            df => {
              val u = col(field)
              df.withColumn(t, struct(
                regexp_extract(u, "^([a-z][a-z0-9+.-]*):", 1).as("scheme"),
                regexp_extract(u, "^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?([^:/?#]+)", 1).as("host"),
                regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^:/?#]+:(\\d+)", 1).as("port"),
                regexp_extract(u, "^(?:[a-z][a-z0-9+.-]*://[^/?#]*)?([^?#]*)", 1).as("path"),
                regexp_extract(u, "\\?([^#]*)", 1).as("query"),
                regexp_extract(u, "#(.*)$", 1).as("fragment")))
            }
          case "user_agent" =>
            // the common-browser heuristic subset of ES's UA parser
            // (the full processor ships a regex database; the fields
            // and shape match, the taxonomy is the big-five browsers)
            val t = m.get("target_field").collect { case JString(s) => s }
              .getOrElse("user_agent")
            df => {
              val ua = col(field)
              val name = when(ua.rlike("(?i)edg(e|a|ios)?/"), "Edge")
                .when(ua.rlike("(?i)opr/|opera"), "Opera")
                .when(ua.rlike("(?i)chrome/"), "Chrome")
                .when(ua.rlike("(?i)firefox/"), "Firefox")
                .when(ua.rlike("(?i)safari/") && !ua.rlike("(?i)chrome/"), "Safari")
                .otherwise("Other")
              val os = when(ua.rlike("(?i)windows"), "Windows")
                .when(ua.rlike("(?i)android"), "Android")
                .when(ua.rlike("(?i)iphone|ipad|ios"), "iOS")
                .when(ua.rlike("(?i)mac os"), "Mac OS X")
                .when(ua.rlike("(?i)linux"), "Linux")
                .otherwise("Other")
              val version = coalesce(
                regexp_extract(ua, "(?i)(?:edg[ea]?|opr|chrome|firefox|version)/(\\d+[\\d.]*)", 1),
                lit(""))
              df.withColumn(t, struct(
                name.as("name"), version.as("version"), os.as("os"),
                when(ua.rlike("(?i)mobile|iphone|android"), "Mobile Device")
                  .otherwise("Other").as("device")))
            }
          case other => throw new IllegalArgumentException(
            s"unsupported ingest processor: $other")
        }
      case other => throw new IllegalArgumentException(
        s"bad processor entry: $other")
    }
    df => steps.foldLeft(df)((d, f) => f(d))
  }
}
