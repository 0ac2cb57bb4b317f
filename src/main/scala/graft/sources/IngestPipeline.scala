package graft.sources

import org.apache.spark.sql.DataFrame
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
  * computed value).
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
          case other => throw new IllegalArgumentException(
            s"unsupported ingest processor: $other")
        }
      case other => throw new IllegalArgumentException(
        s"bad processor entry: $other")
    }
    df => steps.foldLeft(df)((d, f) => f(d))
  }
}
