package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet-backed "index" loader. In graft, an Elasticsearch index is
  * modeled as a parquet table (see SURVEY.md §3): the mapping is the
  * parquet schema, `_id` is the table's key column, and reads are
  * parallelized by parquet row groups / file splits (the Spark-native
  * analog of the reference's one-partition-per-ES-shard scroll reads).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.ts is a parquet INT64 timestamp; read the raw physical
    * long (bypassing Spark's TIMESTAMP(NANOS) rejection) and expose
    * it as `ts_ns`. All event-time operators work on the ns long
    * (exact integer math — no double rounding at hour boundaries).
    * The generator has shipped both TIMESTAMP(NANOS) and
    * timestamp[us] variants; normalize by magnitude — epoch-ns and
    * epoch-µs are 1000× apart, so 1e17 separates them for every date
    * between 1973 (1e17 ns) and year ~5100 (1e17 µs). Exact long
    * multiply, works identically on batch and file-stream reads. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val NsThreshold = 100000000000000000L // 1e17

  /** Raw INT64 `ts` (ns or µs) → ns, then rename to `ts_ns`. Apply to
    * any frame read with [[eventsSchema]] (incl. readStream sources). */
  def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    df.withColumn("ts", when(col("ts") < NsThreshold, col("ts") * 1000L).otherwise(col("ts")))
      .withColumnRenamed("ts", "ts_ns")
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
