package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Num

/** Streaming-shaped analytics over the events table (ts_ns = epoch
  * nanos, see Tables.events). Each transform is written against an
  * unresolved DataFrame, so the SAME code runs on a batch frame (for
  * the oracle) and on `spark.readStream` input (the streaming spec
  * exercises that path with a memory sink).
  *
  * Event-time math stays in exact integer nanos (`div`), never doubles —
  * epoch values exceed 2^53, so double division would misplace events
  * at bucket boundaries.
  */
object EventStreams {
  private val HourNs = 3600L * 1000 * 1000 * 1000

  /** Tumbling-window aggregate — ES-style date_histogram over a stream.
    * Group key = exact integer hour bucket; state size O(windows x
    * types) under a watermark. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    // BATCH shape (the q_stream_window oracle): the raw long bucket
    // key and the final orderBy are batch conveniences — a streaming
    // caller wants slidingTypeCounts/alertOnThreshold, whose window()
    // keys accept a watermark and emit in append mode
    events
      .groupBy(
        expr(s"ts_ns div $HourNs").as("hour_bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("hour_bucket").asc, col("event_type").asc)

  /** Gap-based sessionization (batch form): a session break is a gap
    * > `gapMinutes` between consecutive events of a user. One window
    * pass for the lag + running sum, one aggregate for the sessions —
    * both partition by user, so a 100 TB event log shuffles once on
    * user_id. (The streaming form of the same semantics uses
    * flatMapGroupsWithState — see the streaming spec.) */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns").asc, col("event_id").asc)
    val gapNs = gapMinutes * 60L * 1000 * 1000 * 1000
    events
      .withColumn("prev_ts", lag(col("ts_ns"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || (col("ts_ns") - col("prev_ts")) > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.round(((max(col("ts_ns")) - min(col("ts_ns"))) / 1e9), 3).as("duration_sec"))
      .orderBy(col("user_id").asc, col("session_id").asc)
  }

  /** Session windows via Spark's native `session_window` — the
    * streaming-ready form of `sessionize` (same gap semantics, usable
    * under `readStream` + watermark where the manual lag/running-sum
    * windowing isn't). State per (user, open session) only. */
  def sessionWindows(events: DataFrame, gapMinutes: Int,
      watermark: String = ""): DataFrame = {
    // the watermark attaches AFTER the internal ts derivation (the
    // caller cannot pre-watermark a column this function overwrites);
    // streaming append mode REQUIRES it — pass e.g. "30 minutes".
    // Empty = batch mode, no-op.
    val ts = events.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val wm = if (watermark.isEmpty) ts else ts.withWatermark("ts", watermark)
    wm
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
  }

  /** Windowed cardinality — ES's `cardinality` agg under a
    * date_histogram, as ONE streaming-legal aggregation (streaming
    * forbids count(distinct) and chained aggs; collect_set folds
    * per-group state exactly like the batch answer). Exact by design
    * so the DuckDB oracle can check the STREAMING engine's output; at
    * 100 TB swap `size(collect_set(...))` for
    * `approx_count_distinct` — the same HLL trade ES's cardinality
    * agg makes, with O(1) state per group instead of the user set. */
  def hourlyUserCardinality(events: DataFrame): DataFrame =
    events
      .groupBy(
        expr(s"ts_ns div $HourNs").as("hour_bucket"),
        col("event_type"))
      .agg(size(collect_set(col("user_id"))).cast("long").as("n_users"))

  /** Sliding-window aggregate (width/slide) — the overlapping-window
    * date_histogram variant. Streaming-ready: under a watermark the
    * state is O(open windows x types) and closed windows emit in
    * append mode. Runs identically on a batch frame. */
  def slidingTypeCounts(
      events: DataFrame, width: String = "2 hours", slide: String = "1 hour",
      watermark: String = ""): DataFrame = {
    // same watermark-after-derivation contract as sessionWindows:
    // append-mode streaming needs it, batch callers omit it
    val ts = events.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val wm = if (watermark.isEmpty) ts else ts.withWatermark("ts", watermark)
    wm
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Watcher-style alerting: a windowed per-type threshold trigger —
    * alert rows fire when a window's event count reaches the
    * threshold (e.g. error spikes). Just a windowed partial agg +
    * filter; under a watermark the window state is bounded and the
    * alert stream appends as windows close, which is the whole
    * _watcher/transform "alerting on an index" use case expressed as
    * a streaming query. */
  def alertOnThreshold(
      events: DataFrame,
      eventType: String,
      threshold: Long,
      width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .where(col("event_type") === eventType)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .where(col("n_events") >= threshold)
      .select(col("w.start").as("w_start"), col("n_events"))

  /** Watcher REGISTRY — ES's _watcher stored watches evaluated as
    * data, the same stored-queries-as-rows move as the percolator:
    * every watch is a row (watch_id, type filter, its OWN window
    * size, threshold), and the whole registry evaluates in ONE pass
    * over the event log — broadcast the (small) registry, bucket each
    * matching event by the watch's own window, one partial-agged
    * count per (watch, window), fire rows where the count clears the
    * watch's threshold. At 100 TB the events never self-join and the
    * exchange is keyed (watch_id, bucket) — alert-table-sized, not
    * log-sized. The streaming form is the same plan under a window()
    * + watermark per distinct window size. */
  def watchRegistry(events: DataFrame, watches: DataFrame): DataFrame =
    events.join(broadcast(watches), events("event_type") === watches("w_type"))
      .withColumn("bucket", expr("ts_ns div w_window_ns"))
      .groupBy(col("watch_id"), col("bucket"), col("w_window_ns"), col("w_threshold"))
      .agg(count(lit(1)).as("n_events"))
      .where(col("n_events") >= col("w_threshold"))
      .select(col("watch_id"),
        (col("bucket") * col("w_window_ns")).as("window_start_ns"),
        col("n_events"))
      .orderBy(col("watch_id").asc, col("window_start_ns").asc)

  /** Streaming exact dedup: drop events whose content hash was already
    * seen within the watermark horizon — the streaming analog of
    * `Dedup.exactDuplicates` for an ingest pipeline. State is bounded
    * by the watermark (old hashes age out), so it runs forever at a
    * fixed memory budget — the property a naive dropDuplicates (which
    * keeps ALL keys) lacks. */
  def streamingDedupByContent(events: DataFrame, watermark: String = "1 hour",
      extraKeys: Seq[String] = Nil): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      // null content must PASS THROUGH, not be dropped (they are legal
      // non-duplicate events) and must not all collapse onto one null
      // key — give each a unique synthetic key instead
      .withColumn("content_hash",
        coalesce(md5(col("props")), concat(lit("_null_"), col("event_id").cast("string"))))
      .withWatermark("ts", watermark)
      // extraKeys scope the dedup (e.g. per event_type): which extra
      // columns ride along on the surviving row is then key-determined,
      // not arrival-order-determined — what makes the output
      // oracle-checkable
      .dropDuplicatesWithinWatermark("content_hash" +: extraKeys)

  /** Windowed distinct-user cardinality — the streaming form of the
    * `cardinality` agg inside a `date_histogram`. HLL sketch state
    * per open window (approx_count_distinct is a mergeable partial
    * agg, so it streams at fixed per-window memory where exact
    * distinct would buffer every key); watermark bounds the number of
    * open windows. Runs identically on a batch frame (the watermark
    * is a no-op there). */
  def windowedUserCardinality(
      events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("w_start"), col("approx_users"))

  /** Windowed value profile — count / decimal sum / approx p50+p95
    * per tumbling window: the `stats`+`percentiles` agg pair under a
    * date_histogram, streaming-ready (percentile_approx keeps one
    * bounded sketch per window; the decimal sum is order-independent
    * across micro-batches). */
  def windowedValueProfile(
      events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4).as("sum_value"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95"))
      .select(col("w.start").as("w_start"), col("n_events"),
        col("sum_value"), col("p50"), col("p95"))

  /** CONTINUOUS downsampling — ES's downsample/rollup as a streaming
    * transform instead of a batch ILM action: the same per-series
    * bucket shape as `Downsample.downsample` (count/min/max/decimal
    * sum per (bucket, dims)) under an event-time window + watermark,
    * so late data folds in until the watermark closes the bucket and
    * the associative combiners keep every partial mergeable. State
    * per open bucket is a handful of scalars per series — dashboard
    * retention at stream speed, no reprocessing job. */
  def streamingDownsample(
      events: DataFrame, dims: Seq[String], metric: String,
      width: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w") +: dims.map(col): _*)
      .agg(
        count(lit(1)).as("doc_count"),
        min(col(metric)).as(s"${metric}_min"),
        max(col(metric)).as(s"${metric}_max"),
        sum(col(metric).cast("decimal(18,4)")).cast("double").as(s"${metric}_sum"))
      .select(col("w.start").as("bucket_start") +: dims.map(col) :+
        col("doc_count") :+ col(s"${metric}_min") :+
        col(s"${metric}_max") :+ col(s"${metric}_sum"): _*)

  /** Windowed t-digest percentiles on an unbounded stream — the
    * sketch is MERGEABLE (partial buffers combine associatively), so
    * the same Aggregator that serves the batch `percentiles` agg runs
    * unchanged inside a streaming window: per-window state is
    * O(compression) centroids, never the values. The batch/stream
    * agreement spec is rank-epsilon (centroid layout is merge-order
    * dependent), same contract as the batch probe. */
  def windowedPercentiles(
      events: DataFrame, qs: Seq[Double], width: String = "1 hour",
      watermark: String = "2 hours", compression: Double = 100.0): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(graft.agg.TDigest.percentilesCol("value", qs, compression).as("est"),
        count(lit(1)).as("n_events"))
      .select((col("w.start").as("w_start") +: col("n_events") +:
        qs.zipWithIndex.map { case (q, i) =>
          // rounded + fraction-aware label: (0.29*100).toInt is 28
          // (double truncation), and 0.99/0.999 would BOTH label p99
          // — an ambiguous duplicate column downstream
          val scaled = math.round(q * 1000.0) / 10.0
          val name =
            if (scaled == math.rint(scaled)) s"p${scaled.toLong}"
            else s"p${scaled.toString.replace('.', '_')}"
          element_at(col("est"), i + 1).as(name) }): _*)

  /** Stream-stream attribution join: every `view` joined to the same
    * user's `purchase` within `horizonSec` — the canonical two-stream
    * funnel shape. The caller watermarks both inputs (streaming) or
    * passes raw frames (batch; the plan is the same inner join).
    * State is bounded on BOTH sides: the time-range condition plus
    * watermarks lets Spark evict view rows older than horizon+delay
    * and purchase rows behind the watermark — without the range
    * condition the join state would grow forever, which is the
    * classic unbounded-state bug this operator exists to avoid. */
  def attributionJoin(
      views: DataFrame, purchases: DataFrame, horizonSec: Long): DataFrame =
    views.alias("v").join(
      purchases.alias("b"),
      col("v.user_id") === col("b.user_id") &&
        col("b.ts") >= col("v.ts") &&
        col("b.ts") <= col("v.ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(
        col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("b.event_id").as("purchase_id"))

  /** JSON props access — ES documents are JSON; the connector maps
    * fields. Extract a typed field from the raw JSON column. */
  def propsField(events: DataFrame, field: String): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), s"$$.$field").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        Num.round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type").asc)
}
