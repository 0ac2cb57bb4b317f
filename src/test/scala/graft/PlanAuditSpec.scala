package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Whole-surface plan-shape audit: sweeps EVERY registered oracle key
  * at sf0.001 and pins the global-window invariant — a Window with an
  * EMPTY partition spec funnels its whole input through ONE partition,
  * which is a 100 TB outage unless the input is already bounded. The
  * legitimate bounded shapes are exactly two:
  *
  *   - a rank window above a LIMIT (top-k/rank_window semantics: the
  *     distributed TakeOrderedAndProject does the heavy lifting, the
  *     single-partition window ranks only k rows), and
  *   - a pipeline-agg window above an Aggregate (ES pipeline aggs are
  *     bucket-frame math by definition — O(buckets), not O(corpus)).
  *
  * Anything else fails here with the offending key, BEFORE it can ship
  * as a silent scale cliff. (The r14 sweep found 33 keys with global
  * windows; all were one of the two shapes above.)
  */
class PlanAuditSpec extends SparkSpec {

  test("every global window in every registered plan is limit- or aggregate-bounded") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var sweptKeys = 0
    var globalWindows = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      sweptKeys += 1
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          globalWindows += 1
          val bounded = w.child.exists {
            case _: GlobalLimit | _: LocalLimit | _: Aggregate => true
            case _ => false
          }
          if (!bounded) offenders += name
        case _ =>
      }
    }
    assert(sweptKeys > 500, s"swept only $sweptKeys keys — registry wiring broke")
    assert(globalWindows > 0, "no global windows found — the audit's Window match broke")
    assert(offenders.isEmpty,
      s"UNBOUNDED global windows (single-partition at scale): ${offenders.distinct.mkString(", ")}")
  }

  /** Keys whose cross-join BROADCAST side is not provably bounded in
    * the plan itself, with the out-of-plan bound that makes each one
    * safe. A new key landing here unexplained fails the audit — an
    * unbounded broadcast is an executor OOM at scale, not a slowdown. */
  private val crossJoinJustified: Map[String, String] = Map(
    "q_ann_brute" -> "query frame capped by Ann.MaxQueryRows (loud runtime guard)",
    "q_ann_hnsw" -> "query frame capped by Ann.MaxQueryRows (loud runtime guard)",
    "q_ann_ivf" -> "query frame capped by Ann.MaxQueryRows (loud runtime guard)",
    "q_ann_ivf_persisted" ->
      "broadcast side reads the stored centroid table (nCentroids rows by build contract)",
    "q_bm25_indexed" ->
      "broadcast side reads the persisted 1-row corpus-stats artifact",
    "q_contamination_embed" ->
      "broadcast side is the eval-set frame (id-predicate-bounded eval split)")

  test("every cross-join broadcast side is plan-bounded or explicitly justified") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var crossJoins = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      plan.foreach {
        case j: Join if j.joinType.sql == "CROSS" ||
            (j.joinType.sql == "INNER" && j.condition.isEmpty) =>
          crossJoins += 1
          // the broadcast side is the right by graft convention
          // (crossJoin(broadcast(x))); bounded = a global aggregate
          // (scalar frame), a limit, or a literal/local relation
          val bounded = j.right.exists {
            case a: Aggregate if a.groupingExpressions.isEmpty => true
            case _: GlobalLimit | _: LocalLimit => true
            case _: LocalRelation | _: Range | _: OneRowRelation => true
            case _ => false
          }
          if (!bounded && !crossJoinJustified.contains(name)) offenders += name
        case _ =>
      }
    }
    assert(crossJoins > 50, s"only $crossJoins cross joins — the audit's Join match broke")
    assert(offenders.isEmpty,
      s"cross joins with UNBOUNDED broadcast sides (executor OOM at scale) — " +
        s"bound them or justify in crossJoinJustified: ${offenders.distinct.mkString(", ")}")
  }
}
