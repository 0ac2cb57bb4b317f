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
  * set, rename, remove, convert, lowercase, uppercase, trim, gsub.
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
          case other => throw new IllegalArgumentException(
            s"unsupported ingest processor: $other")
        }
      case other => throw new IllegalArgumentException(
        s"bad processor entry: $other")
    }
    df => steps.foldLeft(df)((d, f) => f(d))
  }
}
