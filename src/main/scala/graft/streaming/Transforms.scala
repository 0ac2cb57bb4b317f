package graft.streaming

import graft.sources.Connector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ES `_transform` analog: a PIVOT (group_by + aggregations) of a
  * source index materialized into a dest index, with a `continuous`
  * mode that keeps the dest up to date as the source grows.
  *
  * Continuous mode mirrors ES's changed-entities design rather than
  * trying to merge partial aggregates: each micro-batch identifies the
  * group keys it touches, re-aggregates ONLY those groups from the
  * source index, and bulk-upserts them into the dest (checkpointed,
  * idempotent by group key). Work per batch is proportional to the
  * CHANGED groups, not the index — the property that lets an ES
  * transform run forever against a growing index.
  */
object Transforms {

  /** The pivot itself (ES transform "preview" / one-shot batch run):
    * one partial-aggregating groupBy. */
  def pivot(src: DataFrame, keyCol: String, valueCol: String): DataFrame =
    src.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("value_sum"),
        max(col(valueCol)).as("value_max"))

  /** ES `latest` transform: the newest document per `uniqueKey`,
    * ordered by `sortCol` (ties broken by `tieCol` — ES breaks them
    * by internal doc order, which is not reproducible; an explicit
    * tiebreaker is). ONE partial-aggregating max_by groupBy — no
    * window, no sort: at 100 TB the map side reduces each partition
    * to one candidate row per key before the shuffle, so the exchange
    * carries |keys| rows, not |docs|. */
  def latest(src: DataFrame, uniqueKey: String, sortCol: String,
      tieCol: String, payload: Seq[String]): DataFrame = {
    val doc = struct(payload.map(col): _*)
    val ord = struct(col(sortCol), col(tieCol))
    src.groupBy(col(uniqueKey))
      .agg(max_by(doc, ord).as("_latest"))
      .select(col(uniqueKey) +: payload.map(f => col(s"_latest.$f").as(f)): _*)
  }

  /** Continuous `latest` (the ES latest transform runs continuously by
    * design): per micro-batch, re-resolve the newest doc for only the
    * TOUCHED keys and upsert them — same changed-entities contract as
    * continuousPivot. */
  def continuousLatest(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      uniqueKey: String,
      sortCol: String,
      tieCol: String,
      payload: Seq[String],
      checkpointDir: String): StreamingQuery = {
    import Connector.implicits._
    val stream = spark.graftStream(srcPath)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // self-heal per batch like every Connector read: a concurrent
        // writer's crashed swap leaves the index at srcPath_graft_old
        // and a raw read would kill the streaming query
        Connector.recoverSwap(spark, srcPath)
        val touched = batch.select(col(uniqueKey).as("_touched_key")).distinct()
        val src = spark.read.parquet(srcPath)
        // no FORCED broadcast: batch 0 of a file-source stream is the
        // ENTIRE existing index, so `touched` can be every key — let
        // AQE broadcast when it fits and shuffle when it doesn't.
        // Null-safe (<=>) join: the batch latest() emits a null-key
        // group, so continuous mode must keep updating it too.
        val updated = latest(
          src.join(touched, src(uniqueKey) <=> touched("_touched_key"), "left_semi"),
          uniqueKey, sortCol, tieCol, payload)
        Connector.save(updated, destPath, Map("graft.mapping.id" -> uniqueKey))
      }
      .start()
  }

  /** Continuous mode: stream the source index, and per micro-batch
    * re-pivot the touched groups against the FULL source, then upsert
    * into `destPath` keyed by the group column. */
  def continuousPivot(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      keyCol: String,
      valueCol: String,
      checkpointDir: String): StreamingQuery = {
    import Connector.implicits._
    val stream = spark.graftStream(srcPath)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // same per-batch self-heal + unforced null-safe join as
        // continuousLatest (see there for the rationale)
        Connector.recoverSwap(spark, srcPath)
        val touched = batch.select(col(keyCol).as("_touched_key")).distinct()
        val src = spark.read.parquet(srcPath)
        val updated = pivot(
          src.join(touched, src(keyCol) <=> touched("_touched_key"), "left_semi"),
          keyCol, valueCol)
        Connector.save(updated, destPath, Map("graft.mapping.id" -> keyCol))
      }
      .start()
  }
}
