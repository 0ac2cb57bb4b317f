package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.FileSourceScanExec

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
  *
  * r15 adds three physical-scan sweeps (pruning, heavy columns,
  * pushdown) over ONE shared planning pass: several keys execute
  * side-effect writes at DataFrame-construction time, so each extra
  * whole-registry sweep would re-run those writes — `scanFactsByKey`
  * plans every key exactly once and the three tests assert over the
  * shared facts.
  */
class PlanAuditSpec extends SparkSpec {

  /** Per-scan facts extracted from one FileSourceScanExec. */
  private case class ScanFacts(
      path: String,
      required: Set[String],
      total: Set[String],
      hasPushed: Boolean,
      pushableUnpushed: Boolean)

  /** ONE physical-planning pass over the whole registry (see class
    * doc): key -> facts of every parquet scan in its sparkPlan. */
  private lazy val scanFactsByKey: Seq[(String, Seq[ScanFacts])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.sparkPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      name -> plan.collectWithSubqueries {
        case f: FileSourceScanExec =>
          // pushedDownFilters is protected; the explain metadata
          // carries the same list as a string
          val pushed = f.metadata.getOrElse("PushedFilters", "[]").trim
          val hasPushed = pushed.nonEmpty && pushed != "[]"
          // a comparison of a plain top-level column to a literal is
          // always pushable; one sitting in dataFilters with NOTHING
          // pushed means the pushdown path was defeated upstream
          val pushableLeft = f.dataFilters.exists {
            case c: BinaryComparison =>
              (c.left.isInstanceOf[Attribute] && c.right.isInstanceOf[Literal]) ||
                (c.right.isInstanceOf[Attribute] && c.left.isInstanceOf[Literal])
            case _ => false
          }
          ScanFacts(
            f.relation.location.rootPaths.headOption.map(_.toString).getOrElse(""),
            f.requiredSchema.fieldNames.toSet,
            f.relation.dataSchema.fieldNames.toSet,
            hasPushed,
            pushableLeft && !hasPushed)
      }
    }

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

  /** Keys allowed to scan the FULL width of a wide (>=5 column) table
    * — each with the out-of-plan reason. Anything else reading every
    * column of a wide table fails: at 100 TB an unpruned scan reads
    * the whole table off storage for a projection that needed a
    * fraction of it. */
  private val fullWidthJustified: Map[String, String] = Map(
    "q_search_paging" ->
      "ES _source semantics: the hit IS the whole document (oracle is SELECT *)",
    "q_search_body_collapse" ->
      "ES _source semantics: collapse returns whole top-hit documents",
    "q_percolate" ->
      "percolator queries match on text/lang/source/n_chars and the match row carries doc_id — all 5 columns are predicate or output",
    "q_pipeline_full" ->
      "the composed pipeline consumes every column: text (quality/dedup), lang (gate), n_chars (packing size), source (shard key), doc_id (keep rule)")

  test("scan pruning: no key reads the full width of a wide table unjustified") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var wideScans = 0
    scanFactsByKey.foreach { case (name, scans) =>
      scans.foreach { sc =>
        if (sc.total.size >= 5) {
          wideScans += 1
          if (sc.required == sc.total && !fullWidthJustified.contains(name))
            offenders += s"$name [${sc.path}: all ${sc.total.size} cols]"
        }
      }
    }
    assert(scanFactsByKey.size > 500,
      s"swept only ${scanFactsByKey.size} keys — registry wiring broke")
    assert(wideScans > 100, s"only $wideScans wide scans — the scan match broke")
    assert(offenders.isEmpty,
      s"UNPRUNED wide-table scans (full-width read at scale) — prune or justify in " +
        s"fullWidthJustified: ${offenders.distinct.mkString("; ")}")
  }

  /** The quantized persisted-ANN contract, asserted plan-wide: when a
    * key's plan reads a packed codes/sign-bits artifact, the float
    * vector column may appear in AT MOST ONE scan — the exact-rescore
    * window read. A second float scan means the coarse pass is
    * secretly reading raw vectors, which forfeits the artifact's whole
    * 4-128x IO saving at corpus scale. Same shape for indexed dedup:
    * a minhash-artifact plan may read `text` at most once (the
    * verify/confirm pass), never in the banded screen. */
  test("persisted quantized-ANN and indexed-dedup plans touch heavy columns at most once") {
    var artifactKeys = 0
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    scanFactsByKey.foreach { case (name, scans) =>
      val readsQuantArtifact = scans.exists { sc =>
        sc.path.contains("_graft_pq") || sc.path.contains("_graft_bbq") ||
          sc.path.contains("_graft_int4") || sc.path.contains("_graft_int8") }
      val readsMinhashArtifact = scans.exists(_.path.contains("_graft_minhash"))
      if (readsQuantArtifact) {
        artifactKeys += 1
        val floatScans = scans.count(_.required.contains("embedding"))
        if (floatScans > 1)
          offenders += s"$name [embedding in $floatScans scans]"
      }
      if (readsMinhashArtifact) {
        artifactKeys += 1
        val textScans = scans.count(_.required.contains("text"))
        if (textScans > 1)
          offenders += s"$name [text in $textScans scans]"
      }
    }
    // 5 quantized persisted keys (int4/pq/int8/bbq/ivfadc) + indexed dedup
    assert(artifactKeys >= 6, s"only $artifactKeys artifact-reading keys — path match broke")
    assert(offenders.isEmpty,
      s"coarse passes reading heavy columns the artifact exists to avoid: " +
        s"${offenders.distinct.mkString("; ")}")
  }

  /** Keys whose post-scan filter legitimately cannot push (with the
    * reason); anything else with a pushable-shaped comparison left
    * above an unpushed scan fails. */
  private val unpushedJustified: Map[String, String] = Map.empty

  test("filter pushdown: pushable comparisons reach the parquet scan") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var pushedScans = 0
    scanFactsByKey.foreach { case (name, scans) =>
      scans.foreach { sc =>
        if (sc.hasPushed) pushedScans += 1
        if (sc.pushableUnpushed && !unpushedJustified.contains(name))
          offenders += s"$name [${sc.path}]"
      }
    }
    assert(pushedScans > 100, s"only $pushedScans scans with pushed filters — audit broke")
    assert(offenders.isEmpty,
      s"pushable comparisons NOT reaching the scan (full read then filter at scale): " +
        s"${offenders.distinct.mkString("; ")}")
  }

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
