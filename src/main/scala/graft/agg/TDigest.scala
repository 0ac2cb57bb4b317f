package graft.agg

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Merging t-digest — the sketch behind ES's `percentiles` agg
  * (ES wraps the same published algorithm; its `tdigest.compression`
  * knob maps 1:1 to `compression` here). Exact percentiles stay the
  * oracle ground truth (`Aggs.percentilesExactDistributed`); this is
  * the 100 TB path: a fully distributed partial aggregate whose state
  * is at most ~2·compression centroids plus a bounded raw tail (a few
  * KB), so the exchange carries sketches, never values, and no sort
  * of the corpus happens anywhere.
  *
  * Algorithm (public t-digest papers / the "merging digest" variant):
  * buffered values compress into weighted centroids under the size
  * bound `w ≤ 4·n·q(1-q)/compression`, which concentrates resolution
  * at the tails. Quantile reads interpolate centroid means by
  * cumulative-weight midpoints.
  *
  * Error bound (published, and asserted by the oracle probe): the
  * RANK of the estimate for quantile q is within O(q(1-q)/δ) of q;
  * at compression 100 the mid-quantile rank error is well under 1%,
  * and `q_agg_percentiles_tdigest` asserts |rank−q| ≤ 0.015.
  * Centroid layout depends on merge order, so estimates are not
  * bit-stable across partitionings — callers assert rank epsilon,
  * not value equality.
  */
object TDigest {

  /** Sketch state: parallel centroid arrays with spare capacity
    * (`used` marks the valid prefix) + exact min/max/count for tail
    * clamping. Arrays are mutated in place during `reduce` — the
    * documented Aggregator performance contract. */
  case class Buf(
      means: Array[Double], weights: Array[Long], used: Int,
      n: Long, lo: Double, hi: Double)

  /** Merge-compress the first `len` entries of `(means, weights)`
    * (unsorted) down to the compression bound. O(m log m). */
  private[graft] def compress(
      means: Array[Double], weights: Array[Long], len: Int,
      compression: Double): (Array[Double], Array[Long]) = {
    if (len <= 1) return (means.take(len), weights.take(len))
    val order = (0 until len).sortBy(means(_))
    var total = 0.0
    var i = 0
    while (i < len) { total += weights(i); i += 1 }
    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Long]
    // k1 scale function (the published asin form): a centroid may
    // span at most one unit of k(q) = δ/(2π)·asin(2q−1), which caps
    // the sketch at ~δ centroids with tail resolution ∝ 1/√(q(1-q))
    val z = compression / (2.0 * math.Pi)
    def kOf(q: Double): Double = z * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
    var accM = means(order.head)
    var accW = weights(order.head)
    var cum = 0.0 // weight fully emitted so far
    for (idx <- order.tail) {
      val m2 = means(idx)
      val w2 = weights(idx)
      if (kOf((cum + accW + w2) / total) - kOf(cum / total) <= 1.0) {
        // weighted-mean merge keeps the centroid unbiased
        accM = (accM * accW + m2 * w2) / (accW + w2)
        accW += w2
      } else {
        outM += accM; outW += accW; cum += accW
        accM = m2; accW = w2
      }
    }
    outM += accM; outW += accW
    (outM.result(), outW.result())
  }

  /** Interpolated quantile read over a COMPRESSED (sorted) sketch. */
  def quantile(b: Buf, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile out of [0,1]: $q")
    if (b.n == 0) return Double.NaN
    if (q <= 0) return b.lo
    if (q >= 1) return b.hi
    if (b.used == 1) return b.means(0)
    val target = q * b.n
    // cumulative-weight midpoints: centroid i sits at cumBefore + w_i/2
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = b.lo
    var i = 0
    while (i < b.used) {
      val mid = cum + b.weights(i) / 2.0
      if (target < mid) {
        val frac = if (mid > prevMid) (target - prevMid) / (mid - prevMid) else 0.0
        return prevMean + frac * (b.means(i) - prevMean)
      }
      cum += b.weights(i)
      prevMid = mid
      prevMean = b.means(i)
      i += 1
    }
    // past the last midpoint: interpolate toward the exact max
    val frac = if (b.n > prevMid) (target - prevMid) / (b.n - prevMid) else 1.0
    prevMean + math.min(1.0, frac) * (b.hi - prevMean)
  }

  /** Typed Aggregator: Double column in, requested quantile estimates
    * out. The raw tail compresses whenever it exceeds 8·δ values, so
    * partial state stays O(compression) on every executor. */
  class Agg(compression: Double, qs: Seq[Double])
      extends Aggregator[Double, Buf, Seq[Double]] {
    private val bufLimit = math.max(64, (8 * compression).toInt)

    def zero: Buf = Buf(new Array[Double](64), new Array[Long](64), 0, 0L,
      Double.PositiveInfinity, Double.NegativeInfinity)

    def reduce(b: Buf, x: Double): Buf = {
      val cur =
        if (b.used < b.means.length) b
        else if (b.used >= bufLimit) compact(b, spare = 64)
        else Buf(java.util.Arrays.copyOf(b.means, b.means.length * 2),
          java.util.Arrays.copyOf(b.weights, b.weights.length * 2),
          b.used, b.n, b.lo, b.hi)
      cur.means(cur.used) = x
      cur.weights(cur.used) = 1L
      cur.copy(used = cur.used + 1, n = cur.n + 1,
        lo = math.min(cur.lo, x), hi = math.max(cur.hi, x))
    }

    def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0) b else if (b.n == 0) a
      else compact(Buf(
        a.means.take(a.used) ++ b.means.take(b.used),
        a.weights.take(a.used) ++ b.weights.take(b.used),
        a.used + b.used, a.n + b.n,
        math.min(a.lo, b.lo), math.max(a.hi, b.hi)))

    private def compact(b: Buf, spare: Int = 0): Buf = {
      val (m, w) = compress(b.means, b.weights, b.used, compression)
      val cap = m.length + spare
      Buf(java.util.Arrays.copyOf(m, cap), java.util.Arrays.copyOf(w, cap),
        m.length, b.n, b.lo, b.hi)
    }

    def finish(b: Buf): Seq[Double] = {
      val c = compact(b)
      qs.map(quantile(c, _)).toIndexedSeq
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `percentiles` via t-digest as a Column aggregate: an array column
    * of the estimates for `qs`, in order. */
  def percentilesCol(field: String, qs: Seq[Double], compression: Double = 100.0): Column =
    udaf(new Agg(compression, qs)).apply(col(field).cast("double"))

  /** The oracle probe frame: estimates each q with the sketch, then
    * re-ranks each estimate against the REAL data in a second narrow
    * map-only pass, asserting the published rank-error bound. Output
    * is one row of booleans (plus the count) so the exact-oracle
    * comparison is value-stable even though centroid layout is not. */
  def percentilesProbe(
      df: DataFrame, field: String, qs: Seq[(String, Double)],
      compression: Double = 100.0, epsRank: Double = 0.015): DataFrame = {
    val est = df.agg(percentilesCol(field, qs.map(_._2), compression).as("est"))
    val withEst = df.crossJoin(broadcast(
      est.select(qs.indices.map(i => element_at(col("est"), i + 1).as(s"_e$i")): _*)))
    val aggCols = qs.zipWithIndex.map { case ((name, q), i) =>
      (abs(avg(when(col(field).cast("double") <= col(s"_e$i"), 1.0).otherwise(0.0))
        - lit(q)) <= epsRank).as(s"${name}_ok")
    } :+ count(lit(1)).as("n")
    withEst.agg(aggCols.head, aggCols.tail: _*)
  }
}
