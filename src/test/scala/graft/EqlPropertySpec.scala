package graft

import graft.dsl.Eql
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: Eql.sequence (the windowed chain-carry plan) vs an
  * obviously-correct in-memory reference over randomized event
  * streams. The reference replays each key's ordered events and, per
  * final-step event, walks the latest-predecessor chain exactly as
  * the documented deterministic subset prescribes (until-events kill
  * in-flight chains; the whole span obeys maxspan). Randomization
  * covers duplicate timestamps, interleaved keys, missing steps and
  * kill placement — the corners a handful of fixed fixtures miss. */
class EqlPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(id: Long, key: Long, ts: Long, tpe: String)

  // reference: per key, ordered by (ts, id); maintain latest completed
  // chain per prefix length with the same latest-predecessor rule
  private def reference(
      events: Seq[Ev], steps: Seq[String], maxspanUs: Long,
      until: Option[String]): Seq[(Long, Seq[Long], Long)] = {
    val k = steps.size
    events.groupBy(_.key).toSeq.flatMap { case (key, evs) =>
      val ordered = evs.sortBy(e => (e.ts, e.id))
      // chains(i) = the latest completed chain of steps 0..i, as the
      // list of (ts, id) per step — None when killed / not yet seen
      val chains = Array.fill[Option[Vector[(Long, Long)]]](k)(None)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Seq[Long], Long)]
      ordered.foreach { e =>
        if (until.contains(e.tpe)) {
          chains.indices.foreach(chains(_) = None)
        } else {
          // duplicate step types: the event may match several levels;
          // every carry reads chains as they were BEFORE this event
          // (strict precedence) — compute ALL updates from that
          // snapshot, then apply them together
          val upds = steps.zipWithIndex.collect {
            case (tpe, si) if tpe == e.tpe =>
              val upd: Option[Vector[(Long, Long)]] =
                if (si == 0) Some(Vector((e.ts, e.id)))
                else chains(si - 1) match {
                  case Some(prefix) if e.ts - prefix.head._1 <= maxspanUs =>
                    Some(prefix :+ ((e.ts, e.id)))
                  case _ => None
                }
              (si, upd)
          }
          upds.foreach { case (si, upd) =>
            upd.foreach { chain =>
              chains(si) = Some(chain)
              if (si == k - 1)
                out += ((key, chain.map(_._2), (chain.last._1 - chain.head._1) / 1000))
            }
          }
        }
      }
      out.toSeq
    }.sortBy(r => (r._1, r._2.last))
  }

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 40L)
      tpe <- Gen.oneOf("a", "b", "c", "x", "z") // z = never referenced
    } yield (key, ts, tpe))
  } yield evs.zipWithIndex.map { case ((key, ts, tpe), i) =>
    Ev(i + 1L, key, ts * 1000L, tpe) // µs-scale ts, ns handled below
  }

  /** ES-style ANY-predecessor semantics by brute force: a final-step
    * event matches iff SOME strictly-ordered chain of matching events
    * completes there within maxspan, with no until-kill inside the
    * chain's span. Exponential enumeration — fine at spec scale. */
  private def anyPredecessorFinals(
      events: Seq[Ev], steps: Seq[String], maxspanUs: Long,
      until: Option[String],
      missing: Seq[(Int, String)] = Nil): Set[(Long, Long)] = {
    val k = steps.size
    events.groupBy(_.key).toSeq.flatMap { case (key, evs) =>
      val ordered = evs.sortBy(e => (e.ts, e.id)).toVector
      val untilPos = ordered.zipWithIndex.collect {
        case (e, i) if until.contains(e.tpe) => i
      }.toSet
      // gap L -> positions of its kill events; a chain is valid only
      // if no gap-L kill sits strictly between its level-L and
      // level-L+1 events
      val killPos: Map[Int, Set[Int]] = missing.groupBy(_._1).map {
        case (lvl, specs) =>
          lvl -> ordered.zipWithIndex.collect {
            case (e, i) if specs.exists(_._2 == e.tpe) => i
          }.toSet
      }
      val out = scala.collection.mutable.Set.empty[Long]
      def rec(level: Int, pos: Int, t0: Long): Unit = {
        if (level == k - 1) out += ordered(pos).id
        else for (j <- pos + 1 until ordered.size
                  if ordered(j).tpe == steps(level + 1)
                  && ordered(j).ts - t0 <= maxspanUs
                  && ((pos + 1) until j).forall(p => !untilPos(p))
                  && ((pos + 1) until j).forall(p =>
                    !killPos.getOrElse(level, Set.empty)(p)))
          rec(level + 1, j, t0)
      }
      for (i <- ordered.indices if ordered(i).tpe == steps.head)
        rec(0, i, ordered(i).ts)
      out.toSeq.map(id => (key, id))
    }.toSet
  }

  test("final-event existence: latest-predecessor == any-predecessor enumeration") {
    // The deterministic latest-predecessor plan is NOT a lossy subset
    // for match existence: chain starts are monotone over completion
    // order, so the latest carried chain always has maximal slack —
    // if ANY in-window predecessor chain completes at a final event,
    // the latest-predecessor carry completes one too. This test
    // enforces that argument against brute-force enumeration of ES's
    // any-predecessor semantics, including duplicate-type (runs)
    // steps and until kills.
    val seed0 = Seed(420260813L)
    var seed = seed0
    for (round <- 1 to 30) {
      val evs = evGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val maxspanUs = if (round % 3 == 0) 15000L else Long.MaxValue / 1000
      val until = if (round % 2 == 0) Some("x") else None
      val steps =
        if (round % 7 == 0) Seq("a", "b", "b")
        else if (round % 5 == 0) Seq("a", "b")
        else Seq("a", "b", "c")
      val df = evs.map(e => (e.id, e.key, e.ts * 1000L, e.tpe))
        .toDF("event_id", "user_id", "ts_ns", "event_type")
      val got = Eql.sequence(df, "user_id", "ts_ns", "event_id",
        steps.map(s => (s, lit(true))), maxspanNs = maxspanUs * 1000L,
        until = until.map(u => (u, lit(true))))
        .collect().map(r => (r.getLong(0), r.getLong(steps.size))).toSet
      val want = anyPredecessorFinals(evs, steps, maxspanUs, until)
      assert(got == want,
        s"round $round (steps=$steps maxspanUs=$maxspanUs until=$until): " +
          s"got $got\nwant $want\nevents: $evs")
    }
  }

  test("missing events: latest-predecessor == any-predecessor with gap kills") {
    // the monotone-slack argument extends to missing events: the
    // latest-started carried chain minimizes both the span AND the
    // window in which a gap kill can strike, so if ANY chain survives
    // the kills, the carried one does too
    val seed0 = Seed(720260814L)
    var seed = seed0
    for (round <- 1 to 30) {
      val evs = evGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val maxspanUs = if (round % 3 == 0) 15000L else Long.MaxValue / 1000
      val steps = if (round % 2 == 0) Seq("a", "b") else Seq("a", "b", "c")
      val missing =
        if (steps.size == 2) Seq((0, "x"))
        else if (round % 5 == 0) Seq((0, "x"), (1, "z"))
        else Seq((1, "x"))
      val df = evs.map(e => (e.id, e.key, e.ts * 1000L, e.tpe))
        .toDF("event_id", "user_id", "ts_ns", "event_type")
      val got = Eql.sequence(df, "user_id", "ts_ns", "event_id",
        steps.map(s => (s, lit(true))), maxspanNs = maxspanUs * 1000L,
        missing = missing.map { case (l, t) => (l, t, lit(true)) })
        .collect().map(r => (r.getLong(0), r.getLong(steps.size))).toSet
      val want = anyPredecessorFinals(evs, steps, maxspanUs, None, missing)
      assert(got == want,
        s"round $round (steps=$steps missing=$missing maxspanUs=$maxspanUs): " +
          s"got $got\nwant $want\nevents: $evs")
    }
  }

  test("sequence == reference replay over randomized streams") {
    val seed0 = Seed(20260813L)
    var seed = seed0
    for (round <- 1 to 40) {
      val evs = evGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val maxspanUs = if (round % 3 == 0) 15000L else Long.MaxValue / 1000
      val until = if (round % 2 == 0) Some("x") else None
      val steps =
        if (round % 7 == 0) Seq("a", "b", "b") // `with runs=2` shape
        else if (round % 5 == 0) Seq("a", "b")
        else Seq("a", "b", "c")
      val df = evs.map(e => (e.id, e.key, e.ts * 1000L, e.tpe))
        .toDF("event_id", "user_id", "ts_ns", "event_type")
      val got = Eql.sequence(df, "user_id", "ts_ns", "event_id",
        steps.map(s => (s, lit(true))), maxspanNs = maxspanUs * 1000L,
        until = until.map(u => (u, lit(true))))
        .collect().map { r =>
          (r.getLong(0), (1 to steps.size).map(r.getLong), r.getLong(steps.size + 1))
        }.toSeq
      val want = reference(evs, steps, maxspanUs, until)
      assert(got == want,
        s"round $round (steps=$steps maxspanUs=$maxspanUs until=$until): " +
          s"got $got\nwant $want\nevents: $evs")
    }
  }
}
