package graft.sources

import graft.dsl.{EsQuery, QueryDsl}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` — the connector architecture of the
  * reference, Spark-native.
  *
  * READS go through DataSource V2 (`FileDataSourceV2` -> `GraftTable`,
  * see GraftTableV2.scala): the native vectorized parquet scan with
  * catalyst filter/column pushdown and no RDD boundary, `graft.query`
  * enforced row-level inside the scan. WRITES stay on the V1
  * `CreatableRelationProvider` path (Spark routes file-source V2
  * writes back to V1), dispatching to `Connector.save`'s bulk
  * semantics. The V1 read relation (`GraftRelation` +
  * `FilterTranslator`) is kept: it documents the reference's own
  * RelationProvider/PrunedFilteredScan architecture and serves any
  * caller constructing the relation directly.
  *
  * Options: `graft.query` (ES Query-DSL JSON applied server-side),
  * `graft.mapping.id` (id column for `ids` queries and upsert writes),
  * `graft.write.operation` / `graft.mapping.version` (see Connector).
  */
class DefaultSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  // NOTE: deliberately TableProvider, NOT FileDataSourceV2 — Spark's
  // v1 DataSource swaps a FileDataSourceV2 for its fallbackFileFormat
  // on EVERY v1 code path, which would silence Connector.save's bulk
  // semantics on writes. A plain TableProvider gets the v2 read path
  // while DataFrameWriter routes non-writable tables back to the v1
  // CreatableRelationProvider below.

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  private def v2Paths(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): Seq[String] = {
    val fromPaths = Option(options.get("paths")).map { json =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      om.readValue(json, classOf[Array[String]]).toSeq
    }.getOrElse(Nil)
    (Option(options.get("path")).toSeq ++ fromPaths).distinct
  }

  private def table(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
      schema: Option[org.apache.spark.sql.types.StructType]): GraftTable = {
    val paths = v2Paths(options)
    require(paths.nonEmpty, "format(\"graft\") requires a path")
    val withoutPaths = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    withoutPaths.remove("path"); withoutPaths.remove("paths")
    GraftTable(s"graft ${paths.mkString(",")}",
      org.apache.spark.sql.SparkSession.active,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(withoutPaths), paths, schema)
  }

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.types.StructType =
    table(options, None).schema()

  override def getTable(
      schema: org.apache.spark.sql.types.StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table =
    table(new org.apache.spark.sql.util.CaseInsensitiveStringMap(properties), Option(schema))

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("format(\"graft\") requires a path"))

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation =
    GraftRelation(
      sqlContext,
      path(parameters),
      parameters.get("graft.query"),
      parameters.getOrElse("graft.mapping.id", "_id"),
      parameters.get("graft.read.field.include").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil),
      parameters.get("graft.read.field.exclude").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil))

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val cfg = mode match {
      // explicit graft.write.operation wins; otherwise map the SaveMode
      case _ if parameters.contains("graft.write.operation") => parameters
      case SaveMode.Append => parameters + ("graft.write.operation" -> "append")
      case SaveMode.Overwrite => parameters + ("graft.write.operation" -> "overwrite")
      case _ => parameters + ("graft.write.operation" -> "index")
    }
    Connector.save(data, path(parameters), cfg)
    createRelation(sqlContext, parameters)
  }
}

case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    query: Option[String],
    idField: String,
    fieldInclude: Seq[String] = Nil,
    fieldExclude: Seq[String] = Nil)
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` over a catalog table
    * (the Hive-surface write half: Hive can INSERT into an ES external
    * table). Routes through the connector's bulk path so id mapping
    * and upsert semantics keep working from plain SQL. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    Connector.save(data, path,
      Map("graft.write.operation" -> (if (overwrite) "overwrite" else "append")) ++
        (if (idField != "_id") Map("graft.mapping.id" -> idField) else Map.empty))

  private def base: DataFrame = {
    val df0 = sqlContext.sparkSession.read.parquet(path)
    val df1 = query.fold(df0)(q => df0.where(EsQuery.compile(q, idField)))
    val df2 = if (fieldInclude.nonEmpty) df1.select(fieldInclude.map(col): _*) else df1
    fieldExclude.foldLeft(df2)(_ drop _)
  }

  override def schema: StructType = base.schema

  /** Filters graft can evaluate exactly are NOT re-applied by Spark. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => FilterTranslator.translate(f).isEmpty)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val pushed = filters.flatMap(FilterTranslator.translate)
    val filtered = pushed.foldLeft(base)(_ where _)
    val projected =
      if (requiredColumns.isEmpty) filtered.select() // count(*)-style scan
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}

/** Spark `Filter` -> graft Query DSL — the same translation table the
  * reference applies for its pushdown (SURVEY.md §1): EqualTo->term,
  * In->terms, ranges, IsNull/IsNotNull->missing/exists,
  * StringStartsWith->prefix, StringEndsWith/Contains->wildcard,
  * And/Or/Not->bool. Unsupported filters return None and are left for
  * Spark to evaluate (correct, just not pushed). */
object FilterTranslator {
  def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(QueryDsl.term(col(a), v))
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case In(a, vs) => Some(QueryDsl.terms(col(a), vs.toSeq))
    case GreaterThan(a, v) => Some(QueryDsl.range(col(a), gt = Some(v)))
    case GreaterThanOrEqual(a, v) => Some(QueryDsl.range(col(a), gte = Some(v)))
    case LessThan(a, v) => Some(QueryDsl.range(col(a), lt = Some(v)))
    case LessThanOrEqual(a, v) => Some(QueryDsl.range(col(a), lte = Some(v)))
    case IsNull(a) => Some(QueryDsl.missing(col(a)))
    case IsNotNull(a) => Some(QueryDsl.exists(col(a)))
    case StringStartsWith(a, p) => Some(QueryDsl.prefix(col(a), p))
    case StringEndsWith(a, s) => Some(QueryDsl.wildcard(col(a), "*" + s))
    case StringContains(a, s) => Some(QueryDsl.wildcard(col(a), "*" + s + "*"))
    case And(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
