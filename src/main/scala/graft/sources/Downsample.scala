package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `_downsample` analog (the 8.x successor of the rollup API):
  * aggregate a time-series index into fixed-interval buckets — one row
  * per (bucket, dims...) carrying count plus min/max/sum of each
  * metric. ONE partial-aggregating groupBy builds it; the result is
  * orders of magnitude smaller than the raw index, which is the whole
  * 100 TB story: historic queries run on the downsampled index while
  * only the recent window stays raw.
  *
  * Event time is graft's ns-long (`ts_ns`); buckets are exact integer
  * math (`ts - ts % interval`), never double division.
  */
object Downsample {

  /** The downsampled frame. Metric sums go through decimal so a later
    * re-aggregation (rollup search) stays order-independent. */
  def downsample(
      events: DataFrame,
      tsCol: String,
      intervalNs: Long,
      dims: Seq[String],
      metric: String): DataFrame = {
    val bucket = (col(tsCol) - (col(tsCol) % lit(intervalNs))).as("bucket_ts")
    events
      .groupBy(bucket +: dims.map(col): _*)
      .agg(
        count(lit(1)).as("doc_count"),
        min(col(metric)).as(s"${metric}_min"),
        max(col(metric)).as(s"${metric}_max"),
        sum(col(metric).cast("decimal(18,4)")).as(s"${metric}_sum"))
  }

  /** Rollup-search analog: one aggregation over downsampled HISTORIC
    * buckets plus RAW recent docs, without double counting. The raw
    * side partial-aggregates into the same bucket shape first, then
    * both sides merge with the associative combiners (sum of counts,
    * min of mins, ...). Both inputs arrive pre-split on `splitNs`
    * (historic < splitNs <= recent), mirroring an ILM setup where the
    * downsample action replaced the old indices. */
  def rollupSearch(
      rolled: DataFrame,
      rawRecent: DataFrame,
      tsCol: String,
      intervalNs: Long,
      dims: Seq[String],
      metric: String): DataFrame = {
    val recentBuckets = downsample(rawRecent, tsCol, intervalNs, dims, metric)
    val keys = Seq("bucket_ts") ++ dims
    rolled.unionByName(recentBuckets)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("doc_count")).as("doc_count"),
        min(col(s"${metric}_min")).as(s"${metric}_min"),
        max(col(s"${metric}_max")).as(s"${metric}_max"),
        sum(col(s"${metric}_sum")).as(s"${metric}_sum"))
  }

  private def nsToMs(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      GraftBridge.expression(c.cast("long")),
      GraftBridge.expression(lit(1000000L))))
  }

  /** TSDS `_tsid`: the deterministic identity ES computes for every
    * time-series document from its dimension tuple — the routing and
    * dedup key of time-series mode. 48-bit md5 of the
    * `|`-joined dimension values (graft's engine-portable hash), so
    * the oracle reproduces it exactly. */
  def tsid(dims: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", dims.map(_.cast("string")): _*)
      .cast("binary")), 1, 12), 16, 10).cast("long")

  /** The TSDS `time_series` aggregation: one bucket per series
    * (dimension tuple), carrying the series' doc count, time span and
    * metric profile. One partial-aggregating groupBy on the
    * dimensions; `_tsid` is projected per row (narrow). At 100 TB the
    * exchange carries one partial row per (series x task) — series
    * cardinality, not event count. */
  def timeSeriesAgg(
      events: DataFrame,
      tsCol: String,
      dims: Seq[String],
      metric: String): DataFrame =
    events
      .withColumn("_tsid", tsid(dims.map(col)))
      .groupBy(col("_tsid") +: dims.map(col): _*)
      .agg(
        count(lit(1)).as("doc_count"),
        // series spans in epoch MILLIS (ES date semantics; also the
        // precision every engine reproduces — ns survives parquet but
        // not every reader). IntegralDivide (SQL `div`): epoch-ns
        // exceeds double's exact-integer range (2^53), so Column./
        // would be off by a unit near representation boundaries
        nsToMs(min(col(tsCol))).as("ts_min"),
        nsToMs(max(col(tsCol))).as("ts_max"),
        graft.util.Num.round(min(col(metric)), 4).as(s"${metric}_min"),
        graft.util.Num.round(max(col(metric)), 4).as(s"${metric}_max"),
        graft.util.Num.round(sum(col(metric).cast("decimal(18,4)")).cast("double"), 4)
          .as(s"${metric}_sum"))
      .orderBy(col("_tsid"))
}
