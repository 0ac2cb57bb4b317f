package graft.hadoop

import java.util.Properties

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.hive.ql.metadata.{DefaultStorageHandler, HiveStoragePredicateHandler}
import org.apache.hadoop.hive.ql.plan.{ExprNodeColumnDesc, ExprNodeConstantDesc,
  ExprNodeDesc, ExprNodeGenericFuncDesc, TableDesc}
import org.apache.hadoop.hive.ql.udf.generic.{GenericUDFOPAnd, GenericUDFOPEqual,
  GenericUDFOPEqualOrGreaterThan, GenericUDFOPEqualOrLessThan,
  GenericUDFOPGreaterThan, GenericUDFOPLessThan, GenericUDFOPNotEqual}
import org.apache.hadoop.hive.serde2.typeinfo.TypeInfoFactory
import org.apache.hadoop.hive.serde2.{AbstractSerDe, SerDeStats}
import org.apache.hadoop.hive.serde2.objectinspector.{ObjectInspector,
  ObjectInspectorFactory, PrimitiveObjectInspector, StructObjectInspector}
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory
import org.apache.hadoop.io.{BooleanWritable, DoubleWritable, FloatWritable,
  IntWritable, LongWritable, MapWritable, Text, Writable}
import org.apache.hadoop.mapred.JobConf

/** Hive integration — the analog of es-hadoop's core
  * `org.elasticsearch.hadoop.hive.EsStorageHandler` (the still-published
  * `CREATE EXTERNAL TABLE ... STORED BY` module). The handler sits on
  * the r13 MapReduce-classic surface: reads go through
  * GraftClassicInputFormat (parquet splits + the row-group pushdown
  * below), writes through GraftHiveOutputFormat, and GraftSerDe maps
  * rows between Hive's object-inspector world and the (id, MapWritable)
  * document shape the MR formats speak.
  *
  * Recipe (mirrors the es-hadoop docs' shape):
  * {{{
  * CREATE EXTERNAL TABLE docs (doc_id BIGINT, text STRING, n_chars BIGINT)
  * STORED BY 'graft.hadoop.GraftStorageHandler'
  * LOCATION '/indexes/docs'
  * TBLPROPERTIES ('graft.mapping.id' = 'doc_id');
  * }}}
  *
  * Pushdown: decomposePredicate splits simple comparison conjuncts
  * (=, <>, <, <=, >, >= over column-vs-constant; the scope
  * FilterTranslator pushes on the Spark side) into
  * `graft.pushdown.filters` JSON that GraftClassicInputFormat compiles
  * to a parquet FilterPredicate — row-group statistics pruning plus
  * record-level filtering at the scan. The FULL predicate is always
  * kept as the residual: pushdown is an IO reduction, never a
  * correctness dependency, so a reader that cannot apply a filter
  * (renamed column, type drift) degrades to a full scan instead of
  * returning unfiltered rows as final results. */
class GraftStorageHandler extends DefaultStorageHandler with HiveStoragePredicateHandler {

  override def getInputFormatClass: Class[_ <: org.apache.hadoop.mapred.InputFormat[_, _]] =
    classOf[GraftClassicInputFormat]

  override def getOutputFormatClass: Class[_ <: org.apache.hadoop.mapred.OutputFormat[_, _]] =
    classOf[GraftHiveOutputFormat]

  override def getSerDeClass: Class[_ <: AbstractSerDe] = classOf[GraftSerDe]

  override def configureInputJobProperties(
      tableDesc: TableDesc, jobProperties: java.util.Map[String, String]): Unit =
    copyGraftProps(tableDesc, jobProperties)

  override def configureOutputJobProperties(
      tableDesc: TableDesc, jobProperties: java.util.Map[String, String]): Unit = {
    copyGraftProps(tableDesc, jobProperties)
    // MapReduce carries no schema: derive the parquet MessageType the
    // classic output format needs from the Hive column metadata
    val props = tableDesc.getProperties
    jobProperties.put("graft.output.schema", GraftHiveTypes.parquetSchema(
      props.getProperty("columns", ""), props.getProperty("columns.types", "")))
  }

  private def copyGraftProps(
      tableDesc: TableDesc, jobProperties: java.util.Map[String, String]): Unit = {
    val props = tableDesc.getProperties
    val names = props.propertyNames()
    while (names.hasMoreElements) {
      val k = names.nextElement().asInstanceOf[String]
      if (k.startsWith("graft.")) jobProperties.put(k, props.getProperty(k))
    }
  }

  override def decomposePredicate(
      jobConf: JobConf,
      deserializer: org.apache.hadoop.hive.serde2.Deserializer,
      predicate: ExprNodeDesc): HiveStoragePredicateHandler.DecomposedPredicate = {
    val supported = GraftStorageHandler.supportedConjuncts(predicate)
    if (supported.isEmpty) return null // nothing pushable; Hive keeps the whole predicate
    val d = new HiveStoragePredicateHandler.DecomposedPredicate()
    d.pushedPredicate = GraftStorageHandler.andOf(supported)
    // JSON the input format understands rides along as the serialized
    // object (Hive stores it in the scan conf for the reader)
    d.pushedPredicateObject = GraftStorageHandler.filtersJson(supported)
    // keep EVERYTHING residual — see the class scaladoc: the pushed
    // predicate is an IO hint, Hive re-verifies every row, so a reader
    // that fails to apply a filter can never corrupt results
    d.residualPredicate = predicate match {
      case g: ExprNodeGenericFuncDesc => g
      case _ => null
    }
    d
  }
}

object GraftStorageHandler {

  /** Flatten AND trees and keep the conjuncts the reader can compile:
    * (=, <>, <, <=, >, >=) over one column and one constant of a
    * parquet-comparable type, either operand order. */
  def supportedConjuncts(e: ExprNodeDesc): Seq[ExprNodeGenericFuncDesc] = e match {
    case g: ExprNodeGenericFuncDesc => g.getGenericUDF match {
      case _: GenericUDFOPAnd =>
        (0 until g.getChildren.size())
          .flatMap(i => supportedConjuncts(g.getChildren.get(i)))
      case _ => if (leaf(g).isDefined) Seq(g) else Seq.empty
    }
    case _ => Seq.empty
  }

  /** (col, op, value, parquetType) when this node is a pushable
    * comparison; op is already flipped for constant-first order. */
  def leaf(g: ExprNodeGenericFuncDesc): Option[(String, String, String, String)] = {
    val op0 = g.getGenericUDF match {
      case _: GenericUDFOPEqual => "eq"
      case _: GenericUDFOPNotEqual => "noteq"
      case _: GenericUDFOPLessThan => "lt"
      case _: GenericUDFOPEqualOrLessThan => "ltEq"
      case _: GenericUDFOPGreaterThan => "gt"
      case _: GenericUDFOPEqualOrGreaterThan => "gtEq"
      case _ => return None
    }
    if (g.getChildren.size() != 2) return None
    (g.getChildren.get(0), g.getChildren.get(1)) match {
      case (c: ExprNodeColumnDesc, k: ExprNodeConstantDesc) =>
        pq(c).map(t => (c.getColumn, op0, String.valueOf(k.getValue), t))
      case (k: ExprNodeConstantDesc, c: ExprNodeColumnDesc) =>
        val flip = Map("lt" -> "gt", "ltEq" -> "gtEq", "gt" -> "lt", "gtEq" -> "ltEq")
        pq(c).map(t => (c.getColumn, flip.getOrElse(op0, op0), String.valueOf(k.getValue), t))
      case _ => None
    }
  }

  private def pq(c: ExprNodeColumnDesc): Option[String] =
    GraftHiveTypes.parquetType(c.getTypeInfo.getTypeName)

  def andOf(cs: Seq[ExprNodeGenericFuncDesc]): ExprNodeGenericFuncDesc =
    if (cs.size == 1) cs.head
    else {
      val kids = new java.util.ArrayList[ExprNodeDesc]()
      cs.foreach(kids.add(_))
      new ExprNodeGenericFuncDesc(
        TypeInfoFactory.booleanTypeInfo, new GenericUDFOPAnd(), kids)
    }

  /** The conjuncts as the `graft.pushdown.filters` JSON contract. */
  def filtersJson(cs: Seq[ExprNodeGenericFuncDesc]): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    cs.flatMap(leaf).map { case (col, op, v, t) =>
      s"""{"col":"${esc(col)}","op":"$op","val":"${esc(v)}","type":"$t"}"""
    }.mkString("[", ",", "]")
  }
}

/** Hive type name <-> parquet type mapping shared by the schema
  * derivation and the pushdown translator. */
object GraftHiveTypes {

  def parquetType(hiveType: String): Option[String] = hiveType match {
    case "bigint" => Some("int64")
    case "int" => Some("int32")
    case "double" => Some("double")
    case "float" => Some("float")
    case "boolean" => Some("boolean")
    case "string" => Some("binary")
    case _ => None
  }

  /** columns/columns.types table props -> a parquet MessageType
    * string (optional fields, UTF8-annotated strings). */
  def parquetSchema(columns: String, columnTypes: String): String = {
    val names = columns.split(",").map(_.trim).filter(_.nonEmpty)
    // columns.types is colon-separated (types themselves may carry
    // commas inside decimals/structs — unsupported here anyway)
    val types = columnTypes.split(":").map(_.trim).filter(_.nonEmpty)
    require(names.length == types.length,
      s"column/type arity mismatch: ${names.toSeq} vs ${types.toSeq}")
    val fields = names.zip(types).map { case (n, t) =>
      val pt = parquetType(t).getOrElse(
        sys.error(s"GraftStorageHandler: unsupported Hive column type '$t' for '$n'"))
      if (pt == "binary") s"optional binary $n (UTF8);" else s"optional $pt $n;"
    }
    fields.mkString("message doc { ", " ", " }")
  }
}

/** Row bridge between Hive and the (id, MapWritable) document shape.
  * Columns and types come from the standard SerDe table properties;
  * deserialize hands Hive plain-Java structs (one slot per declared
  * column, absent fields null), serialize walks whatever
  * ObjectInspector Hive supplies and emits the typed Writables the MR
  * formats write. Arrays of primitives ride the typed ArrayWritable
  * wrappers (serialization-safe — see GraftMapredFormats). */
class GraftSerDe extends AbstractSerDe {

  private var names: Array[String] = Array.empty
  private var types: Array[String] = Array.empty
  private var inspector: ObjectInspector = _
  private var row: java.util.ArrayList[AnyRef] = _

  override def initialize(conf: Configuration, tbl: Properties): Unit = {
    names = tbl.getProperty("columns", "").split(",").map(_.trim).filter(_.nonEmpty)
    types = tbl.getProperty("columns.types", "").split(":").map(_.trim).filter(_.nonEmpty)
    require(names.length == types.length,
      s"columns/columns.types arity mismatch: ${names.toSeq} vs ${types.toSeq}")
    val ois = new java.util.ArrayList[ObjectInspector]()
    types.foreach(t => ois.add(oiFor(t)))
    val nameList = new java.util.ArrayList[String]()
    names.foreach(nameList.add(_))
    inspector = ObjectInspectorFactory.getStandardStructObjectInspector(nameList, ois)
    row = new java.util.ArrayList[AnyRef](names.length)
    (0 until names.length).foreach(_ => row.add(null))
  }

  private def oiFor(t: String): ObjectInspector = t match {
    case "bigint" => PrimitiveObjectInspectorFactory.javaLongObjectInspector
    case "int" => PrimitiveObjectInspectorFactory.javaIntObjectInspector
    case "double" => PrimitiveObjectInspectorFactory.javaDoubleObjectInspector
    case "float" => PrimitiveObjectInspectorFactory.javaFloatObjectInspector
    case "boolean" => PrimitiveObjectInspectorFactory.javaBooleanObjectInspector
    case "string" => PrimitiveObjectInspectorFactory.javaStringObjectInspector
    case l if l.startsWith("array<") && l.endsWith(">") =>
      ObjectInspectorFactory.getStandardListObjectInspector(
        oiFor(l.stripPrefix("array<").stripSuffix(">")))
    case other => sys.error(s"GraftSerDe: unsupported column type '$other'")
  }

  override def getObjectInspector: ObjectInspector = inspector

  override def getSerializedClass: Class[_ <: Writable] = classOf[MapWritable]

  override def deserialize(blob: Writable): AnyRef = {
    val m = blob.asInstanceOf[MapWritable]
    var i = 0
    while (i < names.length) {
      row.set(i, fromWritable(m.get(new Text(names(i))), types(i)))
      i += 1
    }
    row
  }

  private def fromWritable(w: Writable, t: String): AnyRef = w match {
    case null => null
    case v: LongWritable => java.lang.Long.valueOf(v.get())
    case v: IntWritable => java.lang.Integer.valueOf(v.get())
    case v: DoubleWritable => java.lang.Double.valueOf(v.get())
    case v: FloatWritable => java.lang.Float.valueOf(v.get())
    case v: BooleanWritable => java.lang.Boolean.valueOf(v.get())
    case v: Text => v.toString
    case v: org.apache.hadoop.io.ArrayWritable =>
      val elemType = t.stripPrefix("array<").stripSuffix(">")
      val out = new java.util.ArrayList[AnyRef]()
      v.get().foreach(e => out.add(fromWritable(e, elemType)))
      out
    case other => other.toString
  }

  override def serialize(obj: AnyRef, oi: ObjectInspector): Writable = {
    val soi = oi.asInstanceOf[StructObjectInspector]
    val out = new MapWritable()
    val refs = soi.getAllStructFieldRefs
    var i = 0
    while (i < refs.size() && i < names.length) {
      val f = refs.get(i)
      val v = soi.getStructFieldData(obj, f)
      if (v != null) {
        val w = toWritable(v, f.getFieldObjectInspector)
        if (w != null) out.put(new Text(names(i)), w)
      }
      i += 1
    }
    out
  }

  private def toWritable(v: AnyRef, oi: ObjectInspector): Writable = oi match {
    case p: PrimitiveObjectInspector => p.getPrimitiveJavaObject(v) match {
      case null => null
      case x: java.lang.Long => new LongWritable(x)
      case x: java.lang.Integer => new IntWritable(x)
      case x: java.lang.Double => new DoubleWritable(x)
      case x: java.lang.Float => new FloatWritable(x)
      case x: java.lang.Boolean => new BooleanWritable(x)
      case x => new Text(x.toString)
    }
    case l: org.apache.hadoop.hive.serde2.objectinspector.ListObjectInspector =>
      val n = l.getListLength(v)
      val arr = Array.tabulate[Writable](n)(j =>
        toWritable(l.getListElement(v, j), l.getListElementObjectInspector))
      val w: org.apache.hadoop.io.ArrayWritable =
        if (arr.nonEmpty) arr.head match {
          case _: LongWritable => new LongArrayWritable
          case _: IntWritable => new IntArrayWritable
          case _: DoubleWritable => new DoubleArrayWritable
          case _: FloatWritable => new FloatArrayWritable
          case _: BooleanWritable => new BooleanArrayWritable
          case _ => new TextArrayWritable
        } else new TextArrayWritable
      w.set(arr)
      w
    case other => sys.error(s"GraftSerDe: unsupported inspector ${other.getCategory}")
  }

  override def getSerDeStats: SerDeStats = new SerDeStats()
}

/** The OutputFormat Hive's FileSinkOperator drives: one parquet file
  * per task at the path Hive hands in, rows already serialized by
  * GraftSerDe into MapWritable. */
class GraftHiveOutputFormat extends GraftClassicOutputFormat
    with org.apache.hadoop.hive.ql.io.HiveOutputFormat[Text, MapWritable] {

  override def getHiveRecordWriter(
      jc: JobConf,
      finalOutPath: org.apache.hadoop.fs.Path,
      valueClass: Class[_ <: Writable],
      isCompressed: Boolean,
      tableProperties: Properties,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.hive.ql.exec.FileSinkOperator.RecordWriter = {
    val schemaStr = Option(jc.get("graft.output.schema")).getOrElse(
      GraftHiveTypes.parquetSchema(
        tableProperties.getProperty("columns", ""),
        tableProperties.getProperty("columns.types", "")))
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(schemaStr)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(finalOutPath, jc))
      .withType(schema)
      .build()
    val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    new org.apache.hadoop.hive.ql.exec.FileSinkOperator.RecordWriter {
      override def write(w: Writable): Unit =
        writer.write(GraftMapredFormats.toGroup(factory, schema, w.asInstanceOf[MapWritable]))
      override def close(abort: Boolean): Unit = writer.close()
    }
  }
}
