package graft.rdd

import graft.sources.Connector
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's ORIGINAL surface: the RDD-level API
  * (`org.elasticsearch.spark`), where documents are
  * `Map[String, Any]` and `sc.esRDD(index)` / `rdd.saveToEs(index)`
  * move them without a schema.
  *
  * graft keeps the same shape — `spark.graftRDD(path)` yields
  * `(id, Map[field -> value])`, `rdd.saveToGraft(path)` bulk-writes
  * maps — but implements it ON TOP of the DataFrame connector: the
  * maps are converted at the boundary, the schema is inferred from the
  * data exactly once (the reference's dynamic mapping), and every
  * write goes through Connector.save's bulk semantics (id resolution,
  * versioning, routing). The conversion is a narrow map stage; no
  * per-document driver round trips.
  */
object GraftRddApi extends Serializable {

  object implicits {
    implicit class GraftRddSessionOps(val spark: SparkSession) {
      /** `sc.esRDD(resource, query)` analog: (id, fields) pairs. */
      def graftRDD(
          path: String,
          query: String = null,
          idField: String = "_id"): RDD[(Any, Map[String, Any])] = {
        import Connector.implicits._
        val df = spark.graftDF(path, query, idField)
        val names = df.schema.fieldNames
        val idIdx = names.indexOf(idField)
        require(idIdx >= 0, s"graftRDD needs id column '$idField' in the index")
        df.rdd.map { row =>
          val m = names.indices.iterator
            .filter(i => !row.isNullAt(i))
            .map(i => names(i) -> row.get(i)).toMap
          (row.get(idIdx), m)
        }
      }
    }

    implicit class GraftJsonSessionOps(val spark: SparkSession) {
      /** `sc.esJsonRDD(resource, query)` analog: (id, rawJson) pairs —
        * the document travels as its JSON source string (the
        * reference's form for consumers that re-parse downstream).
        * Rendering is Spark's toJSON (a narrow projection stage);
        * null fields are omitted, like ES `_source`. */
      def graftJsonRDD(
          path: String,
          query: String = null,
          idField: String = "_id"): RDD[(Any, String)] = {
        import Connector.implicits._
        val df = spark.graftDF(path, query, idField)
        require(df.schema.fieldNames.contains(idField),
          s"graftJsonRDD needs id column '$idField' in the index")
        df.select(org.apache.spark.sql.functions.col(idField).as("__gid"),
            org.apache.spark.sql.functions.to_json(
              org.apache.spark.sql.functions.struct(
                df.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*))
              .as("__gjson"))
          .rdd.map(r => (r.get(0), r.getString(1)))
      }
    }

    implicit class GraftJsonRddOps(val rdd: RDD[String]) {
      /** `rdd.saveJsonToEs(resource, cfg)` analog: each element is one
        * JSON document string. Schema comes from Spark's JSON
        * inference (the dynamic-mapping step for the JSON form),
        * then the write goes through the SAME Connector.save bulk
        * path as the map form — id resolution (`graft.mapping.id`),
        * versioning, routing all apply. Malformed documents fail
        * loudly (FAILFAST), never silently drop. */
      def saveJsonToGraft(path: String, cfg: Map[String, String] = Map.empty): Unit = {
        val spark = SparkSession.active
        import spark.implicits._
        val ds = spark.read
          .option("mode", "FAILFAST")
          .json(spark.createDataset(rdd))
        require(!ds.columns.contains("_corrupt_record"),
          "saveJsonToGraft: malformed JSON document(s) in the input")
        Connector.save(ds, path, cfg)
      }
    }

    implicit class GraftMapRddOps(val rdd: RDD[Map[String, Any]]) {
      /** `rdd.saveToEs(resource, cfg)` analog: infer the mapping from
        * the data (one pass — the union of keys with their first
        * non-null value's type, matching dynamic mapping), then bulk
        * write through the connector. */
      def saveToGraft(path: String, cfg: Map[String, String] = Map.empty): Unit = {
        val spark = SparkSession.active
        // the data is read twice (schema-inference aggregate + the
        // write) — persist so an expensive upstream runs once
        val wasPersisted = rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
        if (!wasPersisted) rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val schema = inferSchema(rdd)
          val names = schema.fieldNames
          val rows = rdd.map(m =>
            Row.fromSeq(names.toIndexedSeq.map(n =>
              m.get(n).map(v => GraftRddApi.coerce(GraftRddApi.widen(v), schema(n).dataType))
                .orNull)))
          Connector.save(spark.createDataFrame(rows, schema), path, cfg)
        } finally if (!wasPersisted) rdd.unpersist()
      }
    }
  }

  /** Dynamic-mapping inference: field -> Spark type from the values
    * seen for it (ints widen to long, floats to double, like the
    * reference's numeric mapping defaults). One aggregate over the
    * data — no collect of the documents themselves. Conflicting types
    * for a field MERGE when compatible (long + double -> double) and
    * raise a descriptive dynamic-mapping error when not — the earlier
    * first-non-null-wins merge made the winner partition-order-
    * dependent and surfaced as an opaque encoder crash at write time. */
  private[rdd] def inferSchema(rdd: RDD[Map[String, Any]]): StructType = {
    def put(acc: Map[String, DataType], k: String, t: DataType): Map[String, DataType] =
      acc.get(k) match {
        case None => acc + (k -> t)
        case Some(prev) if prev == t => acc
        case Some(prev) => acc + (k -> mergeTypes(k, prev, t))
      }
    val fieldTypes = rdd.aggregate(Map.empty[String, DataType])(
      (acc, m) => m.foldLeft(acc) {
        case (a, (k, v)) if v != null => put(a, k, typeOf(v))
        case (a, _) => a
      },
      (a, b) => b.foldLeft(a) { case (acc, (k, t)) => put(acc, k, t) })
    require(fieldTypes.nonEmpty, "saveToGraft: no fields to infer a mapping from")
    StructType(fieldTypes.toSeq.sortBy(_._1).map { case (k, t) =>
      StructField(k, t, nullable = true)
    })
  }

  /** Widen compatible numeric types; refuse incompatible ones with the
    * field name in the message (the dynamic-mapping conflict error). */
  private def mergeTypes(k: String, a: DataType, b: DataType): DataType = (a, b) match {
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case _ => throw new IllegalArgumentException(
      s"saveToGraft: dynamic-mapping conflict for field '$k': " +
        s"${a.simpleString} vs ${b.simpleString}")
  }

  /** Align a (widened) value with the field's MERGED type: a long value
    * under a field that resolved to double must ship as double. */
  private[rdd] def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (l: java.lang.Long, DoubleType) => l.doubleValue
    case _ => v
  }

  /** Value-side counterpart of the numeric widening in typeOf. */
  private[rdd] def widen(v: Any): Any = v match {
    case i: java.lang.Integer => i.longValue
    case s: java.lang.Short => s.longValue
    case b: java.lang.Byte => b.longValue
    case f: java.lang.Float => f.doubleValue
    case x => x
  }

  private def typeOf(v: Any): DataType = v match {
    case _: String => StringType
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte =>
      LongType
    case _: java.lang.Double | _: java.lang.Float => DoubleType
    case _: java.lang.Boolean => BooleanType
    case _: java.sql.Timestamp => TimestampType
    case _: java.sql.Date => DateType
    case _: Array[Byte] => BinaryType
    case other => throw new IllegalArgumentException(
      s"saveToGraft: unsupported field value type ${other.getClass.getName}")
  }
}
