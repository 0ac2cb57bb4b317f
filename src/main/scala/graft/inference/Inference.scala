package graft.inference

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The model-inference seam (r10): every operator whose ES counterpart
  * calls an inference endpoint — `semantic` query expansion (ELSER),
  * ES|QL `RERANK`, ES|QL `COMPLETION`, multimodal decode — routes its
  * model call through this ONE trait. The default implementation is
  * the deterministic stub the operators have always shipped (honest
  * about the sandbox: no model endpoint exists here, and the oracle
  * gate needs reproducible outputs); a production deployment drops in
  * a real endpoint by swapping `Inference.service` WITHOUT touching
  * any operator code — the seam spec proves operator results are
  * invariant to the refactor and that a swapped service actually
  * takes effect.
  *
  * Serializable: `decoder()` products ship inside executor closures
  * (mapPartitions), so implementations must survive task
  * serialization. */
trait InferenceService extends Serializable {

  /** `semantic` / semantic_text query expansion: a query string to a
    * sparse (term, weight) vector — ELSER's output shape. Runs on the
    * driver at plan-construction time (one call per query, like ES's
    * one inference call per search request). */
  def expandQuery(query: String): Seq[(String, Double)]

  /** ES|QL `RERANK "query" ON field`: relevance of each row's text
    * against the query, as a Column (a real service maps a batched
    * model call; the stub is pure codegen'd column math). */
  def rerankScore(query: String, text: Column): Column

  /** ES|QL `COMPLETION col = prompt`: LLM completion of a per-row
    * prompt column. */
  def complete(prompt: Column): Column

  /** Multimodal decode: returns a FRESH per-partition decode closure —
    * called once per partition inside mapPartitions, so a real
    * codec/model initializes once and streams rows (the amortized-init
    * shape the typed plumbing exists for). */
  def decoder(): Array[Byte] => String
}

/** The deterministic default: term-overlap rerank (SparseTfDot),
  * unit-weight query expansion, reversed-prefix completion, md5
  * decode — byte-for-byte the pre-seam operator behavior, and
  * DuckDB-mirrorable for the oracle gate. */
object DeterministicStub extends InferenceService {

  def expandQuery(query: String): Seq[(String, Double)] =
    graft.analysis.Analyzer.analyze(query).distinct.map(_ -> 1.0)

  def rerankScore(query: String, text: Column): Column = {
    val terms = graft.analysis.Analyzer.analyze(query).distinct
    org.apache.spark.sql.GraftBridge.column(graft.expr.SparseTfDot(
      org.apache.spark.sql.GraftBridge.expression(
        graft.analysis.Analyzer.tokens(text)),
      terms, terms.map(_ => 1.0)))
  }

  def complete(prompt: Column): Column = {
    val toks = graft.analysis.Analyzer.tokens(prompt.cast("string"))
    concat(lit("stub: "), concat_ws(" ", reverse(slice(toks, 1, 8))))
  }

  def decoder(): Array[Byte] => String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    payload => digest.digest(payload).map("%02x".format(_)).mkString
  }
}

/** The swap point. Operators read `Inference.service` at plan
  * construction (and capture it into closures BEFORE mapPartitions,
  * so the executor sees the service that built the plan). */
object Inference {
  @volatile var service: InferenceService = DeterministicStub
}
