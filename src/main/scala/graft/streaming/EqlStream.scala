package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING EQL sequence correlation — the live-SIEM shape of
  * `graft.dsl.Eql.sequenceKeys`, detecting `[s1][s2]...[sk]` funnels
  * on an unbounded stream with `flatMapGroupsWithState`.
  *
  * Same semantics as the batch plan (latest-predecessor chains,
  * whole-span `maxspan`, `until` kills — the form property-proven
  * equivalent to ES's any-predecessor matching for final-event
  * existence): per key the state is ONE chain per prefix length —
  * k·(2k) longs, constant per key regardless of stream length — and
  * each event folds the chains forward exactly like the batch
  * window-carry, emitting a match row the moment a final-step event
  * completes a chain.
  *
  * Ordering contract: events are processed in (ts, id) order WITHIN a
  * micro-batch; across batches the fold trusts arrival order per key
  * (the append-log case). Late events need a watermark-sized buffer in
  * front — documented, not implemented here (ES's own EQL runs over
  * already-indexed history and sidesteps the question).
  *
  * The level matching is precomputed as a BITMASK column before
  * `groupByKey`, so the state function is pure long math — no
  * per-event predicate evaluation inside the state store. */
object EqlStream {

  /** (key, sorted-within-batch events) -> emitted matches. State per
    * key: chains(i) = the latest completed prefix of steps 0..i as a
    * flattened Seq(ts0, id0, ts1, id1, ...); empty Seq = none. */
  case class EqlEvent(key: Long, tsUs: Long, id: Long, mask: Int, isUntil: Boolean)
  case class EqlMatch(key: Long, eventIds: Seq[Long], spanMs: Long)
  case class EqlState(chains: Seq[Seq[Long]])

  /** `stepPreds` = per-level (event_type, extra predicate); `until`
    * kills in-flight chains. Input must carry `ts_ns`, `event_id`,
    * `event_type` and the key column. */
  def sequence(
      events: DataFrame,
      keyCol: String,
      steps: Seq[(String, org.apache.spark.sql.Column)],
      maxspanNs: Long,
      until: Option[(String, org.apache.spark.sql.Column)] = None): Dataset[EqlMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.size
    require(k >= 2, "sequence needs >= 2 steps")
    val maxspanUs = if (maxspanNs == Long.MaxValue) Long.MaxValue else maxspanNs / 1000L

    val isUntil = until match {
      case Some((tpe, p)) => col("event_type") === tpe && p
      case None => lit(false)
    }
    val mask = steps.zipWithIndex.map { case ((tpe, p), i) =>
      when(!isUntil && col("event_type") === tpe && p, 1 << i).otherwise(0)
    }.reduce(_ + _)

    val typed = events
      .select(
        col(keyCol).cast("long").as("key"),
        expr("ts_ns div 1000").as("tsUs"),
        col("event_id").as("id"),
        mask.as("mask"),
        isUntil.as("isUntil"))
      .where(col("mask") =!= 0 || col("isUntil"))
      .as[EqlEvent]

    typed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[EqlEvent], state: GroupState[EqlState]) => {
          val chains: Array[Option[Vector[(Long, Long)]]] =
            state.getOption match {
              case Some(s) => s.chains.map(c =>
                if (c.isEmpty) None
                else Some(c.grouped(2).map(p => (p(0), p(1))).toVector)).toArray
              case None => Array.fill(k)(None)
            }
          val out = scala.collection.mutable.ListBuffer.empty[EqlMatch]
          // (ts, id) order within the batch — the batch plan's window
          // order; arrival order across batches
          it.toSeq.sortBy(e => (e.tsUs, e.id)).foreach { e =>
            if (e.isUntil) {
              chains.indices.foreach(chains(_) = None)
            } else {
              // all updates read the PRE-event snapshot (strict row
              // precedence), then apply together — duplicate-type
              // (runs) steps extend a different chain per level
              val upds = (0 until k).flatMap { si =>
                if ((e.mask & (1 << si)) == 0) None
                else {
                  val upd: Option[Vector[(Long, Long)]] =
                    if (si == 0) Some(Vector((e.tsUs, e.id)))
                    else chains(si - 1) match {
                      case Some(prefix)
                          if maxspanUs == Long.MaxValue ||
                            e.tsUs - prefix.head._1 <= maxspanUs =>
                        Some(prefix :+ ((e.tsUs, e.id)))
                      case _ => None
                    }
                  upd.map(si -> _)
                }
              }
              upds.foreach { case (si, chain) =>
                chains(si) = Some(chain)
                if (si == k - 1)
                  out += EqlMatch(key, chain.map(_._2),
                    (chain.last._1 - chain.head._1) / 1000)
              }
            }
          }
          // EVICT empty state instead of re-storing k empty Seqs: a
          // key whose chains were all cleared (until, or never started)
          // would otherwise hold a state-store entry FOREVER — on a
          // live stream keyed by session/process ids the store grows
          // monotonically until checkpoint bloat / executor OOM
          if (chains.forall(_.isEmpty)) state.remove()
          else state.update(EqlState(chains.map(_.fold(Seq.empty[Long])(
            _.flatMap(p => Seq(p._1, p._2)))).toSeq))
          out.iterator
        })
  }
}
