package graft.streaming

import graft.sources.Connector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's Structured Streaming sink
  * (`df.writeStream.format("es")`) analog: every micro-batch is applied
  * to the index with the connector's bulk semantics (id-upsert by
  * default), via foreachBatch. Checkpointed, so a restarted stream
  * resumes without re-applying acknowledged batches; upsert-by-id makes
  * replayed batches idempotent (the reference's recommended setup).
  */
object GraftSink {
  def startUpsert(
      stream: DataFrame,
      path: String,
      cfg: Map[String, String],
      checkpoint: String): StreamingQuery = {
    // eager contract check: a missing id mapping would otherwise only
    // surface as an ASYNC stream failure at the first micro-batch,
    // after start() returned a live-looking query
    require(cfg.contains("graft.mapping.id") ||
      cfg.get("graft.write.operation").exists(Set("append", "overwrite")),
      "startUpsert needs graft.mapping.id (or an id-less append/overwrite operation)")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Connector.save(batch, path, cfg)
      }
      .start()
  }

  /** Append-mode streaming sink (the time-series shape: every event is
    * a new document, no id resolution). Replays after a crash can
    * duplicate the unacknowledged batch — ES has the same semantics
    * for bulk-append without ids; use startUpsert with an id column
    * for exactly-once-per-id. */
  def startAppend(
      stream: DataFrame,
      path: String,
      cfg: Map[String, String],
      checkpoint: String): StreamingQuery =
    startUpsert(stream, path,
      cfg + ("graft.write.operation" -> "append"), checkpoint)
}
