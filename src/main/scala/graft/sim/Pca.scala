package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge

import graft.util.Num

/** Distributed PCA / whitening over an embedding column — the
  * dimensionality-reduction step embedding pipelines run before
  * clustering, IVF coarse quantization, or semantic dedup (whitened
  * cosine is the similarity the SemDeDup paper's ablations prefer).
  *
  * Scale shape (the whole point): the FIT is TWO partial-aggregated
  * passes — a d-column mean pass, then the (d, d²) CENTERED moment
  * sums (centering first avoids the catastrophic cancellation of the
  * one-pass E[vvᵀ]−μμᵀ form on offset-heavy data) — each a few KB of
  * state per executor, CONSTANT in corpus size; the d×d
  * eigendecomposition runs on the DRIVER (d ≤ a few thousand —
  * microseconds for embedding dims); the TRANSFORM broadcasts k
  * component vectors as literals into compiled dot-product kernels
  * (expr.DotProductSim), a map-only stage fused into the scan.
  * Nothing about the corpus is ever collected, sorted, or shuffled:
  * 100 TB of embeddings costs two scans for the fit and one for the
  * transform.
  *
  * Determinism: moment sums are double adds (order-dependent at
  * ~1e-15 relative), so scores are stable at the 4-dp rounding every
  * numeric oracle here uses, same as the stddev/avg aggregates.
  */
object Pca {

  /** Partial-agg state: count + Σv (length d) + Σ v·vᵀ (row-major
    * d×d). Arrays mutate in place during reduce — the documented
    * Aggregator performance contract (see TDigest.Buf). */
  case class Moments(n: Long, sums: Array[Double], cross: Array[Double])

  class MomentAgg(d: Int) extends Aggregator[Seq[Double], Moments, Moments] {
    def zero: Moments = Moments(0L, new Array[Double](d), new Array[Double](d * d))
    def reduce(b: Moments, v: Seq[Double]): Moments = {
      require(v != null && v.length == d,
        s"PCA: vector length ${if (v == null) "null" else v.length} != declared dim $d")
      // arrays accumulate in place; the per-row copy() only re-wraps
      // them with the bumped count (the same idiom as TDigest.Agg —
      // the heavy state never reallocates)
      var i = 0
      while (i < d) {
        val vi = v(i)
        b.sums(i) += vi
        var j = 0
        val row = i * d
        while (j < d) { b.cross(row + j) += vi * v(j); j += 1 }
        i += 1
      }
      b.copy(n = b.n + 1)
    }
    def merge(x: Moments, y: Moments): Moments = {
      var i = 0
      while (i < d) { x.sums(i) += y.sums(i); i += 1 }
      i = 0
      while (i < d * d) { x.cross(i) += y.cross(i); i += 1 }
      x.copy(n = x.n + y.n)
    }
    def finish(b: Moments): Moments = b
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Fitted model: population covariance eigenpairs, eigenvalues
    * DESCENDING, each component sign-normalized so its first
    * coordinate with |x| > 1e-12 is positive (the convention a
    * closed-form 2-D oracle can mirror; eigenvector sign is otherwise
    * arbitrary). */
  case class Model(dim: Int, n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  def fit(df: DataFrame, vecCol: String, dim: Int): Model = {
    require(dim >= 2, s"PCA needs dim >= 2 (got $dim)")
    val vecs = df.where(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"))
    // name the common misconfiguration up front (a uniform wrong
    // length would otherwise die inside element_at with an index
    // message); mixed lengths still fail loudly in the moment pass
    vecs.limit(1).select(size(col("__v"))).collect().headOption.foreach { r =>
      require(r.getInt(0) == dim,
        s"PCA: vector length ${r.getInt(0)} != declared dim $dim")
    }
    // TWO passes, deliberately: the one-pass E[vvᵀ]−μμᵀ form
    // catastrophically cancels when the mean magnitude dwarfs the
    // std (offset-heavy embeddings) — centering first keeps every
    // cross-product at the residual scale, same stability class as
    // the oracle's var_pop/covar_pop. Pass 1 is d codegen'd avg
    // columns; pass 2 is the (d+d²)-state moment aggregate over the
    // centered vectors. Both passes are one scan each, state
    // constant in N.
    val meanRow = vecs.select((0 until dim).map(i =>
      avg(element_at(col("__v"), i + 1)).as(s"m$i")): _*).head()
    val mean = Array.tabulate(dim)(meanRow.getDouble)
    val centered = vecs.select(zip_with(
      col("__v"), typedLit(mean.toSeq).cast("array<double>"),
      (a, b) => a - b).as("__c"))
    val row = centered
      .select(udaf(new MomentAgg(dim)).apply(col("__c")).as("m"))
      .select(col("m.n"), col("m.sums"), col("m.cross"))
      .head()
    val n = row.getLong(0)
    require(n >= 2, s"PCA needs >= 2 vectors (got $n)")
    val rsums = row.getSeq[Double](1).toArray
    val cross = row.getSeq[Double](2).toArray
    // the residual mean is ~0 but EXACT subtraction makes the
    // covariance exact regardless
    val rmean = rsums.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      cross(i * dim + j) / n - rmean(i) * rmean(j))
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i))
    val comps = order.map { i =>
      val v = vectors.map(_(i)) // i-th eigenvector = column i
      val pivot = v.indexWhere(x => math.abs(x) > 1e-12)
      if (pivot >= 0 && v(pivot) < 0) v.map(-_) else v
    }.toArray
    // the model's mean is the TRUE mean: the pass-1 estimate plus the
    // (tiny, exactly measured) residual mean of the centered pass
    Model(dim, n, mean.zip(rmean).map { case (a, b) => a + b },
      order.map(values).toArray, comps)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix
    * (driver-side; returns (eigenvalues, eigenvector COLUMNS)). No
    * library dependency — the classic rotation sweep, quadratically
    * convergent; 100 sweeps is far beyond what any PSD covariance
    * needs. */
  private[graft] def jacobiEigen(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    // RELATIVE convergence: an absolute threshold would skip
    // diagonalization entirely on tiny-variance data (silently
    // returning coordinate axes) and never trigger on large-variance
    // data (burning every sweep) — scale by the trace, the invariant
    // total variance
    val tol = {
      val tr = (0 until d).map(i => math.abs(a(i)(i))).sum
      val t = 1e-14 * math.max(tr, java.lang.Double.MIN_NORMAL)
      t * t
    }
    var sweep = 0
    while (sweep < 100 && off() > tol) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          if (math.abs(m(p)(q)) > 1e-300) {
            val tau = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
            val t = math.signum(tau) match {
              case 0.0 => 1.0
              case s0 => s0 / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            }
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }

  /** The j-th principal score of `vecCol` as a compiled column:
    * dot(v, c_j) − dot(mean, c_j) — centering folds into a scalar
    * offset, so the per-row work is ONE compiled dot kernel. */
  def principalCol(model: Model, vecCol: Column, j: Int): Column = {
    val comp = model.components(j)
    val offset = comp.zip(model.mean).map { case (c, mu) => c * mu }.sum
    GraftBridge.column(graft.expr.DotProductSim(
      GraftBridge.expression(vecCol.cast("array<double>")),
      GraftBridge.expression(typedLit(comp.toSeq).cast("array<double>")))) - lit(offset)
  }

  /** PCA-whitened score: principal score scaled to unit variance
    * (score / sqrt(eigenvalue)); components with eigenvalue ≤ eps are
    * rejected loudly rather than dividing by ~0. */
  def whitenedCol(model: Model, vecCol: Column, j: Int,
      eps: Double = 1e-12): Column = {
    val ev = model.eigenvalues(j)
    require(ev > eps,
      s"whitening component $j has eigenvalue $ev <= $eps (a degenerate " +
        "direction cannot be scaled to unit variance)")
    principalCol(model, vecCol, j) / lit(math.sqrt(ev))
  }

  /** Fit + project in one call: id plus the top-k principal scores
    * (`pc0..pc{k-1}`, round-4) — the report form the oracle checks. */
  def fitTransform(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim (k=$k dim=$dim)")
    val model = fit(df, vecCol, dim)
    val cols = col(idCol) +: (0 until k).map(j =>
      Num.round(principalCol(model, col(vecCol), j), 4).as(s"pc$j"))
    df.where(col(vecCol).isNotNull).select(cols: _*).orderBy(col(idCol))
  }
}
