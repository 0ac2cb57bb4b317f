package graft.inference

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The NEURAL reference model behind the inference seam (r13 verdict
  * #5): Spark MLlib's `ml.feature.Word2Vec` — skip-gram word
  * embeddings, a genuine 2-layer neural network trained by SGD
  * (Mikolov et al. 2013; the MLlib implementation is the public,
  * cluster-scale one) — fit on the corpus with a fixed seed. The
  * sandbox has no network and no ONNX/torch runtime, so instead of
  * LOADING published weights the model LEARNS its dense vectors
  * in-container from the corpus; everything downstream of the fit is
  * exactly what a published word-vector table would flow through, so
  * the seam demonstrably carries dense-model shape and latency:
  *
  *  - `expandQuery` — each query term plus its nearest vocabulary
  *    neighbor by cosine in the LEARNED space (weight = the cosine,
  *    damped): semantic expansion that no term-statistics model can
  *    produce — related words never co-occurring with the query term
  *    in a bigram can still be neighbors in embedding space.
  *  - `rerankScore` — dense relevance: cosine(mean token embedding of
  *    the row, embedded query), one compiled DenseMeanCosine kernel
  *    per row; the model ships into codegen as reference objects
  *    (the DsirScoreSum broadcast contract).
  *  - `complete` — greedy nearest-neighbor chain decoding in the
  *    embedding space (successor = the current token's nearest
  *    neighbor), the same chained map-literal device CorpusFitted's
  *    bigram decoder uses — pure Column ops, no UDF.
  *  - `embed` — mean word vector (the `semantic_text` dense path).
  *
  * Scale shape of the fit: MLlib Word2Vec is itself the distributed
  * published recipe (mini-batch SGD over partitions, vocab broadcast);
  * the learned table is bounded to `maxVocab` rows BEFORE collecting,
  * the bounded-model-collect contract every fitted service follows. */
final case class NeuralWordVecService(
    terms: Array[String],
    flat: Array[Double],
    dim: Int,
    genSteps: Int = 6) extends InferenceService {

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](terms.length * 2)
    var i = 0
    terms.foreach { t => m.put(t, i); i += 1 }
    m
  }

  private def vecAt(i: Int): Array[Double] = {
    val out = new Array[Double](dim)
    System.arraycopy(flat, i * dim, out, 0, dim)
    out
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
    while (j < dim) { dot += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Nearest vocabulary term to `v`, excluding `not` — a linear scan
    * over the BOUNDED vocab table (maxVocab x dim doubles on the
    * driver; one scan per query term, never per row). */
  private def nearest(v: Array[Double], not: Set[String]): Option[(String, Double)] = {
    var best = -2.0
    var bestT: String = null
    var i = 0
    while (i < terms.length) {
      if (!not.contains(terms(i))) {
        val c = cosine(v, vecAt(i))
        if (c > best || (c == best && bestT != null && terms(i) < bestT)) {
          best = c; bestT = terms(i)
        }
      }
      i += 1
    }
    Option(bestT).map(_ -> best)
  }

  def expandQuery(query: String): Seq[(String, Double)] = {
    val qTerms = Analyzer.analyze(query).distinct
    val literal = qTerms.map(_ -> 1.0)
    val related = qTerms.flatMap { t =>
      val off = index.get(t)
      if (off == null) None
      else nearest(vecAt(off), qTerms.toSet)
        .filter(_._2 > 0.0)
        .map { case (n, c) => n -> 0.5 * c }
    }
    (literal ++ related)
      .groupBy(_._1).map { case (t, ws) => t -> ws.map(_._2).max }
      .toSeq.sortBy { case (t, w) => (-w, t) }
  }

  def rerankScore(query: String, text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expr.DenseMeanCosine(
      org.apache.spark.sql.GraftBridge.expression(Analyzer.tokens(text)),
      embed(query), terms.toSeq, flat.toSeq, dim))

  def complete(prompt: Column): Column = {
    if (terms.isEmpty) return lit("")
    // successor table = nearest embedding-space neighbor per vocab
    // term (computed ONCE on the bounded driver-side table), then the
    // CorpusFitted chained map-literal decode — codegen'd per row
    val succ = terms.map(t =>
      t -> nearest(vecAt(index.get(t)), Set(t)).map(_._1).getOrElse(t))
    val m = map_from_arrays(lit(succ.map(_._1)), lit(succ.map(_._2)))
    var cur = element_at(Analyzer.tokens(prompt.cast("string")), -1)
    val out = (1 to genSteps).map { _ => cur = element_at(m, cur); cur }
    concat_ws(" ", out: _*)
  }

  def decoder(): Array[Byte] => String = CorpusFittedService.parseMedia

  def embed(text: String): Seq[Double] = {
    val toks = Analyzer.analyze(text)
    val acc = new Array[Double](dim)
    var known = 0
    toks.foreach { t =>
      val off = index.get(t)
      if (off != null) {
        val base = off.intValue * dim
        var j = 0
        while (j < dim) { acc(j) += flat(base + j); j += 1 }
        known += 1
      }
    }
    if (known == 0) Seq.fill(dim)(0.0) else acc.map(_ / known).toSeq
  }
}

object NeuralWordVecService {

  /** Train the skip-gram model on a corpus. Fixed seed + single fit
    * partition: deterministic vectors for the spec/oracle world (a
    * production fit raises numPartitions and accepts run variance,
    * the documented Word2Vec trade). The vocab table is bounded and
    * ordered BEFORE collect. */
  def fit(
      docs: DataFrame,
      textCol: String,
      dim: Int = 32,
      maxVocab: Int = 4096,
      minCount: Int = 3,
      seed: Long = 42L,
      genSteps: Int = 6): NeuralWordVecService = {
    val toks = docs
      .select(Analyzer.tokens(col(textCol)).as("toks"))
      .where(col("toks").isNotNull && size(col("toks")) > 0)
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("toks").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount)
      .setSeed(seed).setNumPartitions(1).setMaxIter(1)
      .setWindowSize(5)
      .fit(toks)
    val rows = model.getVectors
      .orderBy(col("word").asc).limit(maxVocab)
      .collect()
    val terms = rows.map(_.getString(0))
    val flat = new Array[Double](terms.length * dim)
    var i = 0
    rows.foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector](1)
      var j = 0
      while (j < dim) { flat(i * dim + j) = v(j); j += 1 }
      i += 1
    }
    NeuralWordVecService(terms, flat, dim, genSteps)
  }
}
