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
}
