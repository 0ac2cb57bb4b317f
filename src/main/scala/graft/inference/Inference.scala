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

  /** Text -> dense embedding (the `semantic_text` dense path / knn
    * query-vector inference). Runs on the driver at plan-construction
    * time, like expandQuery — one model call per search request; the
    * resulting vector broadcasts into the knn scan as a literal. */
  def embed(text: String): Seq[Double]
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

  /** Deterministic 16-dim pseudo-embedding: each analyzed token
    * hashes to a signed unit contribution per dimension (md5-derived,
    * engine-portable), mean-pooled — the honest sandbox stand-in that
    * keeps embed() exercising the exact plumbing a dense model flows
    * through. */
  def embed(text: String): Seq[Double] = {
    val dim = 16
    val toks = graft.analysis.Analyzer.analyze(text)
    if (toks.isEmpty) return Seq.fill(dim)(0.0)
    val acc = new Array[Double](dim)
    val digest = java.security.MessageDigest.getInstance("MD5")
    toks.foreach { t =>
      val h = digest.digest(t.getBytes("UTF-8"))
      var j = 0
      while (j < dim) { acc(j) += (if ((h(j) & 1) == 0) 1.0 else -1.0); j += 1 }
    }
    acc.map(_ / toks.size).toSeq
  }
}

/** The swap point. Operators read `Inference.service` at plan
  * construction (and capture it into closures BEFORE mapPartitions,
  * so the executor sees the service that built the plan). */
object Inference {
  @volatile var service: InferenceService = DeterministicStub
}
