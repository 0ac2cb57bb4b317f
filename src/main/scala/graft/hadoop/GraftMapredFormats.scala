package graft.hadoop

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{ArrayWritable, BooleanWritable, DoubleWritable,
  FloatWritable, IntWritable, LongWritable, MapWritable, Text, Writable}
import org.apache.hadoop.mapreduce.{InputSplit, RecordReader, RecordWriter,
  TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.FileInputFormat
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetRecordReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** The MapReduce-classic connector surface — the analog of es-hadoop's
  * `EsInputFormat`/`EsOutputFormat` (its original, pre-Spark API: a
  * Hadoop job reads documents as (id Text, source MapWritable) pairs
  * and writes them back the same way; see the public
  * org.elasticsearch.hadoop.mr package). graft's "server" is the index
  * directory, so the formats delegate to parquet-mr directly — no
  * Spark on the classpath, any plain MapReduce/Hive-style runner can
  * drive them.
  *
  * Config:
  *  - `graft.mapping.id` (read): which field becomes the record KEY
  *    (default "id"; missing field -> empty key, like es-hadoop when
  *    metadata is not requested).
  *  - `graft.output.schema` (write): the parquet MessageType the docs
  *    land under (MapReduce carries no schema; es-hadoop infers JSON
  *    field-by-field, a parquet index needs it declared).
  *
  * FileInputFormat's hidden-path filter (_-prefixed) keeps the
  * `_graft_*` artifact dirs out of splits, exactly as Spark reads do.
  */
class GraftInputFormat extends FileInputFormat[Text, MapWritable] {

  override def createRecordReader(
      split: InputSplit, ctx: TaskAttemptContext): RecordReader[Text, MapWritable] = {
    val idField = ctx.getConfiguration.get("graft.mapping.id", "id")
    val inner = new ParquetRecordReader[Group](new GroupReadSupport())
    new RecordReader[Text, MapWritable] {
      // resolved from the first record's schema (constant per file)
      private var idIdx = -2
      override def initialize(s: InputSplit, c: TaskAttemptContext): Unit =
        inner.initialize(s, c)
      override def nextKeyValue(): Boolean = inner.nextKeyValue()
      override def getCurrentKey: Text = {
        val g = inner.getCurrentValue
        if (idIdx == -2) idIdx = g.getType.asInstanceOf[MessageType].getFields.asScala
          .indexWhere(_.getName == idField)
        if (idIdx < 0 || g.getFieldRepetitionCount(idIdx) == 0) new Text()
        else new Text(g.getValueToString(idIdx, 0))
      }
      override def getCurrentValue: MapWritable =
        GraftMapredFormats.toMapWritable(inner.getCurrentValue)
      override def getProgress: Float = inner.getProgress
      override def close(): Unit = inner.close()
    }
  }

  private implicit class ListAsScala[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}

/** Write-side twin: (any key, MapWritable doc) pairs land as parquet
  * part files in the index directory, through the standard
  * FileOutputFormat commit protocol (task work files promoted on
  * commit — the same crash-safety MapReduce gives every output). */
class GraftOutputFormat extends FileOutputFormat[Text, MapWritable] {

  override def getRecordWriter(ctx: TaskAttemptContext): RecordWriter[Text, MapWritable] = {
    val schemaStr = ctx.getConfiguration.get("graft.output.schema")
    require(schemaStr != null && schemaStr.nonEmpty,
      "graft.output.schema (a parquet MessageType) is required to write")
    val schema = MessageTypeParser.parseMessageType(schemaStr)
    val file: Path = getDefaultWorkFile(ctx, ".parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(file, ctx.getConfiguration))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    new RecordWriter[Text, MapWritable] {
      override def write(key: Text, value: MapWritable): Unit =
        writer.write(GraftMapredFormats.toGroup(factory, schema, value))
      override def close(c: TaskAttemptContext): Unit = writer.close()
    }
  }
}

/** Concrete ArrayWritable subclasses, one per element type. TWO
  * requirements force these (both hit only when a job serializes the
  * values, i.e. anything beyond map-only): MapWritable re-creates each
  * value via ReflectionUtils.newInstance, so the value class needs a
  * NO-ARG constructor — raw ArrayWritable has none; and
  * ArrayWritable.readFields re-creates each ELEMENT reflectively, so
  * the element class must be concrete — classOf[Writable] is an
  * interface. es-hadoop ships WritableArrayWritable for the same
  * reason; these are its typed analogs. */
class LongArrayWritable extends ArrayWritable(classOf[LongWritable])
class IntArrayWritable extends ArrayWritable(classOf[IntWritable])
class DoubleArrayWritable extends ArrayWritable(classOf[DoubleWritable])
class FloatArrayWritable extends ArrayWritable(classOf[FloatWritable])
class BooleanArrayWritable extends ArrayWritable(classOf[BooleanWritable])
class TextArrayWritable extends ArrayWritable(classOf[Text])

object GraftMapredFormats {

  /** parquet Group -> MapWritable, primitive fields + LIST-of-primitive
    * (null/absent fields are absent from the map, the es-hadoop
    * convention). Nested groups report loudly — a silent toString
    * would corrupt round trips. */
  def toMapWritable(g: Group): MapWritable = {
    val out = new MapWritable()
    val schema = g.getType.asInstanceOf[MessageType]
    var i = 0
    while (i < schema.getFieldCount) {
      val f = schema.getType(i)
      val n = g.getFieldRepetitionCount(i)
      if (n > 0) {
        val v: Writable =
          if (f.isPrimitive && !f.isRepetition(Type.Repetition.REPEATED)) primitive(g, f, i, 0)
          else if (f.isPrimitive) {
            val arr = Array.tabulate[Writable](n)(j => primitive(g, f, i, j))
            // a typed concrete wrapper, never raw ArrayWritable with
            // classOf[Writable] (the pre-r14 form): see the subclass
            // scaladoc above. Pinned by the round-trip-through-
            // serialization test in HadoopFormatsSpec.
            arrayWritable(f, arr)
          } else sys.error(
            s"GraftInputFormat: nested group field '${f.getName}' is not " +
              "representable as MapWritable — project it out or flatten upstream")
        out.put(new Text(f.getName), v)
      }
      i += 1
    }
    out
  }

  /** The typed concrete wrapper matching the element class `primitive`
    * emits for this field — serialization-safe (see subclass scaladoc). */
  private def arrayWritable(f: Type, arr: Array[Writable]): ArrayWritable = {
    val w = f.asPrimitiveType().getPrimitiveTypeName match {
      case INT64 => new LongArrayWritable
      case INT32 => new IntArrayWritable
      case DOUBLE => new DoubleArrayWritable
      case FLOAT => new FloatArrayWritable
      case BOOLEAN => new BooleanArrayWritable
      case _ => new TextArrayWritable
    }
    w.set(arr)
    w
  }

  private def primitive(g: Group, f: Type, i: Int, j: Int): Writable =
    f.asPrimitiveType().getPrimitiveTypeName match {
      case INT64 => new LongWritable(g.getLong(i, j))
      case INT32 => new IntWritable(g.getInteger(i, j))
      case DOUBLE => new DoubleWritable(g.getDouble(i, j))
      case FLOAT => new FloatWritable(g.getFloat(i, j))
      case BOOLEAN => new BooleanWritable(g.getBoolean(i, j))
      case BINARY | FIXED_LEN_BYTE_ARRAY => new Text(g.getValueToString(i, j))
      case INT96 => new Text(g.getValueToString(i, j))
    }

  /** MapWritable -> parquet Group under the declared schema; fields
    * absent from the map stay unset (parquet optional). BINARY fields
    * are written as UTF8 strings (the document-text shape) — raw
    * byte payloads need a BytesWritable-aware extension. */
  def toGroup(factory: SimpleGroupFactory, schema: MessageType, m: MapWritable): Group = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.getFieldCount) {
      val f = schema.getType(i)
      val w = m.get(new Text(f.getName))
      if (w != null) f.asPrimitiveType().getPrimitiveTypeName match {
        case INT64 => g.add(f.getName, w.asInstanceOf[LongWritable].get())
        case INT32 => g.add(f.getName, w.asInstanceOf[IntWritable].get())
        case DOUBLE => g.add(f.getName, w.asInstanceOf[DoubleWritable].get())
        case FLOAT => g.add(f.getName, w.asInstanceOf[FloatWritable].get())
        case BOOLEAN => g.add(f.getName, w.asInstanceOf[BooleanWritable].get())
        case BINARY => g.add(f.getName, w.toString)
        case other => sys.error(s"GraftOutputFormat: unsupported type $other")
      }
      i += 1
    }
    g
  }
}
