package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rewrites for count-shaped text expressions.
  *
  * `size(split(s, d, -1))` materializes the full token array — one
  * UTF8String allocation per token per row — only to take its length.
  * For a single-char literal delimiter the same value is
  * `length(s) - length(replace(s, d)) + 1` (split with limit -1 keeps
  * empty fields, so count = delimiter occurrences + 1): three narrow
  * string scans, zero allocation. On the sf0.1 documents corpus this
  * is ~20x for `ES|QL: eval n = mv_count(split(text, " "))` pipelines,
  * and the win compounds because CollapseProject re-inlines the eval'd
  * array into every downstream consumer (filter + aggregate would each
  * re-materialize it).
  *
  * Runs post-resolution (optimizer), so it fires no matter how the
  * expression was composed — direct call, eval'd intermediate column,
  * SQL text — after CollapseProject has inlined the projections.
  */
object SizeOfSplitRewrite extends Rule[LogicalPlan] {

  private def quotedSingleChar(regex: UTF8String): Option[String] = {
    val r = regex.toString
    // Pattern.quote output \Q<delim>\E with a 1-char delim that can't
    // itself contain regex escapes
    if (r.length == 5 && r.startsWith("\\Q") && r.endsWith("\\E")) Some(r.substring(2, 3))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(StringSplit(str,
        Literal(regex: UTF8String, _), Literal(-1, _)), false)
        if quotedSingleChar(regex).isDefined && str.dataType == org.apache.spark.sql.types.StringType =>
      val delim = Literal(UTF8String.fromString(quotedSingleChar(regex).get),
        org.apache.spark.sql.types.StringType)
      val empty = Literal(UTF8String.fromString(""), org.apache.spark.sql.types.StringType)
      val spaces = Subtract(Length(str), Length(StringReplace(str, delim, empty)))
      val rewritten = Add(spaces, Literal(1))
      if (rewritten.resolved && rewritten.dataType == s.dataType) rewritten else s
  }

  /** Idempotently attach to a session that was built without
    * `withExtensions` (Bench/Verify/driver sessions). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
