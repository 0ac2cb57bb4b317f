package graft.hadoop

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.{MapWritable, Text}
import org.apache.hadoop.mapred
import org.apache.hadoop.mapred.{JobConf, Reporter}
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.util.Progressable
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetRecordReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser

/** The mapred-classic (old-API) twins of GraftInput/OutputFormat —
  * required by the Hive storage-handler contract, whose
  * getInputFormatClass/getOutputFormatClass return
  * `org.apache.hadoop.mapred.*` classes (es-hadoop ships both API
  * generations of EsInputFormat for the same reason; see the public
  * org.elasticsearch.hadoop.mr package). Split planning and the
  * hidden-path filter come from mapred.FileInputFormat; records
  * bridge to the same parquet-mr reader the new-API format drives.
  *
  * Predicate pushdown: `graft.pushdown.filters` in the JobConf — a
  * JSON array of simple conjuncts `{"col","op","val","type"}`
  * (op: eq|noteq|lt|ltEq|gt|gtEq; type: int64|int32|double|float|
  * boolean|binary) — compiles to a parquet FilterPredicate applied at
  * ROW-GROUP (column statistics) and record level inside the reader.
  * GraftStorageHandler.decomposePredicate emits exactly this JSON from
  * the Hive predicate tree (mirroring the Spark side's
  * FilterTranslator scope). Application is best-effort IO reduction:
  * an unknown column or type mismatch falls back to an unfiltered
  * read, which stays CORRECT because the handler always keeps the
  * full predicate in the residual (see decomposePredicate's note). */
class GraftClassicInputFormat extends mapred.FileInputFormat[Text, MapWritable] {

  override def getRecordReader(
      split: mapred.InputSplit, job: JobConf, reporter: Reporter)
      : mapred.RecordReader[Text, MapWritable] = {
    val fs = split.asInstanceOf[mapred.FileSplit]
    val newSplit = new org.apache.hadoop.mapreduce.lib.input.FileSplit(
      fs.getPath, fs.getStart, fs.getLength, fs.getLocations)
    val idField = job.get("graft.mapping.id", "id")
    val filter = GraftClassicFormats.filterFromConf(job, fs.getPath)
    val inner = filter match {
      case Some(p) => new ParquetRecordReader[org.apache.parquet.example.data.Group](
        new GroupReadSupport(), FilterCompat.get(p))
      case None => new ParquetRecordReader[org.apache.parquet.example.data.Group](
        new GroupReadSupport())
    }
    val ctx = new TaskAttemptContextImpl(job, new TaskAttemptID())
    inner.initialize(newSplit, ctx)
    new mapred.RecordReader[Text, MapWritable] {
      private var idIdx = -2
      override def next(key: Text, value: MapWritable): Boolean =
        if (!inner.nextKeyValue()) false
        else {
          val g = inner.getCurrentValue
          if (idIdx == -2) {
            val fields = g.getType.getFields
            var i = 0; idIdx = -1
            while (i < fields.size()) {
              if (fields.get(i).getName == idField && idIdx < 0) idIdx = i
              i += 1
            }
          }
          if (idIdx < 0 || g.getFieldRepetitionCount(idIdx) == 0) key.set("")
          else key.set(g.getValueToString(idIdx, 0))
          value.clear()
          value.putAll(GraftMapredFormats.toMapWritable(g))
          true
        }
      override def createKey(): Text = new Text()
      override def createValue(): MapWritable = new MapWritable()
      override def getPos: Long = 0L
      override def getProgress: Float = inner.getProgress
      override def close(): Unit = inner.close()
    }
  }
}

/** Old-API write twin: (key, MapWritable) pairs land as one parquet
  * file per task under the standard mapred output path. The parquet
  * schema comes from `graft.output.schema` (same contract as the
  * new-API GraftOutputFormat). */
class GraftClassicOutputFormat extends mapred.FileOutputFormat[Text, MapWritable] {

  override def getRecordWriter(
      ignored: FileSystem, job: JobConf, name: String, progress: Progressable)
      : mapred.RecordWriter[Text, MapWritable] = {
    val schemaStr = job.get("graft.output.schema")
    require(schemaStr != null && schemaStr.nonEmpty,
      "graft.output.schema (a parquet MessageType) is required to write")
    val schema = MessageTypeParser.parseMessageType(schemaStr)
    val file = mapred.FileOutputFormat.getTaskOutputPath(job, name + ".parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(file, job))
      .withType(schema)
      .build()
    val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    new mapred.RecordWriter[Text, MapWritable] {
      override def write(key: Text, value: MapWritable): Unit =
        writer.write(GraftMapredFormats.toGroup(factory, schema, value))
      override def close(reporter: Reporter): Unit = writer.close()
    }
  }
}

object GraftClassicFormats {

  val PushdownKey = "graft.pushdown.filters"

  /** Parse the pushdown JSON from the conf into one ANDed parquet
    * FilterPredicate; None on absence or ANY parse/translate problem
    * (fall back to a full read — the residual predicate keeps the
    * query correct, pushdown is only ever an IO saving). Conjuncts
    * are VALIDATED against the file's footer schema first: parquet
    * evaluates a filter on a column the file doesn't carry as
    * all-null (gt(null) = false — it would silently drop every row,
    * which for a best-effort hint is wrong in the dangerous
    * direction), so unknown/type-mismatched columns are skipped and
    * the residual predicate handles them. */
  def filterFromConf(job: JobConf, file: Path): Option[FilterPredicate] = {
    val raw = job.get(PushdownKey)
    if (raw == null || raw.isEmpty) None
    else try {
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, job))
      val schema = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
      def matches(colName: String, typ: String): Boolean =
        schema.containsField(colName) && {
          val f = schema.getType(schema.getFieldIndex(colName))
          f.isPrimitive && (f.asPrimitiveType().getPrimitiveTypeName.toString
            .toLowerCase(java.util.Locale.ROOT) == typ)
        }
      import org.json4s._
      val arr = org.json4s.jackson.JsonMethods.parse(raw) match {
        case JArray(xs) => xs
        case _ => return None
      }
      val preds = arr.flatMap { j =>
        val m = j.asInstanceOf[JObject].obj.toMap
        def s(k: String) = m(k).asInstanceOf[JString].s
        if (matches(s("col"), s("type")))
          Some(onePredicate(s("col"), s("op"), s("val"), s("type")))
        else None
      }
      preds.reduceLeftOption(FilterApi.and)
    } catch { case _: Throwable => None }
  }

  private def onePredicate(
      colName: String, op: String, v: String, typ: String): FilterPredicate = {
    def cmp[C <: java.lang.Comparable[C],
        COL <: org.apache.parquet.filter2.predicate.Operators.Column[C]
          with org.apache.parquet.filter2.predicate.Operators.SupportsLtGt](
        c: COL, value: C): FilterPredicate = op match {
      case "eq" => FilterApi.eq(c, value)
      case "noteq" => FilterApi.notEq(c, value)
      case "lt" => FilterApi.lt(c, value)
      case "ltEq" => FilterApi.ltEq(c, value)
      case "gt" => FilterApi.gt(c, value)
      case "gtEq" => FilterApi.gtEq(c, value)
    }
    typ match {
      case "int64" => cmp(FilterApi.longColumn(colName), java.lang.Long.valueOf(v))
      case "int32" => cmp(FilterApi.intColumn(colName), java.lang.Integer.valueOf(v))
      case "double" => cmp(FilterApi.doubleColumn(colName), java.lang.Double.valueOf(v))
      case "float" => cmp(FilterApi.floatColumn(colName), java.lang.Float.valueOf(v))
      case "binary" => cmp(FilterApi.binaryColumn(colName), Binary.fromString(v))
      case "boolean" =>
        val c = FilterApi.booleanColumn(colName)
        val b = java.lang.Boolean.valueOf(v)
        op match {
          case "eq" => FilterApi.eq(c, b)
          case "noteq" => FilterApi.notEq(c, b)
        }
    }
  }
}
