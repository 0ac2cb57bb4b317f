package graft.dsl

import org.apache.spark.sql.DataFrame

/** `_validate/query` — compile a Query DSL body WITHOUT executing it.
  * The Spark shape: compile the JSON to a predicate Column, then run
  * only Catalyst ANALYSIS on `df.where(...)` (resolves every field
  * reference against the index schema, type-checks the casts); no job
  * is submitted, no file is read. `explain=true`'s rewritten-query
  * text maps to the resolved predicate's SQL rendering — which is
  * exactly what the scan's `PushedFilters` will be fed.
  */
object Validate {

  /** ES's `{"valid": bool, "explanations": [{..., "explanation"}]}`
    * shape, flattened: (valid, explanation). `explanation` holds the
    * resolved predicate SQL when valid, the compiler/analyzer error
    * when not. */
  def validateQuery(df: DataFrame, json: String, idField: String = "_id"): (Boolean, String) =
    try {
      val pred = QueryDslJson.compile(json, idField)
      // analysis only: resolution + type-check, no execution
      val analyzed = df.where(pred).queryExecution.analyzed
      val cond = analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.sql
      }
      (true, cond.getOrElse("true"))
    } catch {
      case e: Exception => (false, String.valueOf(e.getMessage))
    }
}
