package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Num

/** The ES aggregation framework re-expressed as single-pass Spark
  * aggregates. Every helper is one `groupBy().agg()` (partial/map-side
  * combine for free) or one window pass; none collects to the driver.
  *
  * Scale notes (SURVEY.md §4): `terms` with a size-N cut is a full
  * groupBy then a tiny ordered limit (Spark's TakeOrderedAndProject —
  * no global sort materialization). Exact percentile/cardinality
  * variants are the oracle-checkable forms; the 100 TB paths are
  * `approx_percentile` / `approx_count_distinct` (HLL++), exposed as
  * `*Approx` variants.
  */
object Aggs {

  /** `{"terms": {"field": f, "size": n}}` — bucket counts, ES ordering
    * (doc_count desc, key asc). */
  def termsAgg(df: DataFrame, field: String, size: Int): DataFrame =
    // ES terms aggs DROP docs missing the field (the `missing` knob is
    // termsAggMissing); a null-key bucket could win a top-k slot and
    // displace a real term
    df.where(col(field).isNotNull)
      .groupBy(col(field).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** terms agg with `missing` — docs without the field count under a
    * substitute bucket value instead of being dropped (one coalesce,
    * same single pass). */
  def termsAggMissing(
      df: DataFrame, field: String, size: Int, missing: String): DataFrame =
    df.groupBy(coalesce(col(field), lit(missing)).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** `bucket_correlation` pipeline agg (the ES ML module's
    * change-detection helper): Pearson correlation of the sibling
    * buckets' metric against a caller-provided indicator curve.
    * Buckets pair with the curve BY ORDER (row_number over the
    * ordered bucket frame vs the curve index); everything runs on the
    * tiny bucket frame — the heavy work stays in the partial agg
    * that built the buckets. */
  def bucketCorrelation(
      buckets: DataFrame, orderCol: String, metricCol: String,
      series: Seq[Double]): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col(orderCol))
    val indexed = buckets.withColumn("_rn", row_number().over(w))
      .withColumn("_nb", count(lit(1)).over(Window.partitionBy()))
    val curve = series.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("_rn", "_indicator")
    indexed.join(broadcast(curve), Seq("_rn"))
      // LOUD length contract: the inner join would silently truncate
      // to the shorter of (buckets, series) and report a correlation
      // over a partial pairing; ES errors on the mismatch, so do we
      .where(coalesce(
        assert_true(col("_nb") === lit(series.size),
          lit(s"bucket_correlation: bucket count must equal the " +
            s"indicator length ${series.size}")).cast("boolean"),
        lit(true)))
      .agg(Num.round(corr(col(metricCol).cast("double"), col("_indicator")), 4)
        .as("correlation"),
        count(lit(1)).as("n_buckets"))
  }

  /** `bucket_count_ks_test` pipeline agg (ES ML module): a
    * Kolmogorov–Smirnov test of the sibling buckets' doc-count
    * distribution against caller-provided expected `fractions`
    * (paired with the ordered bucket frame BY ORDER, like
    * bucket_correlation). Emits the D statistic for ES's three
    * `alternative`s — `less` (observed CDF below expected),
    * `greater`, `two_sided` — plus the deterministic asymptotic
    * p-value exp(-2·n·D²) (doubled for two_sided, capped at 1; ES
    * samples p by Monte Carlo, which no oracle could replay — the
    * closed form is declared in SURVEY §2). All math runs on the
    * already-aggregated bucket frame: one window cumsum over
    * |fractions| rows, nothing touches the raw data again. */
  def bucketCountKsTest(
      buckets: DataFrame, orderCol: String, countCol: String,
      fractions: Seq[Double]): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    require(fractions.nonEmpty, "bucket_count_ks_test needs fractions")
    require(math.abs(fractions.sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.sum}")
    val w = Window.orderBy(col(orderCol))
    // _n over the PRE-join frame: the oracle computes n across ALL
    // buckets before pairing with fractions, so an out-of-range bucket
    // (more buckets than fractions) must inflate n here too rather
    // than being silently dropped by the inner join on _rn
    val indexed = buckets
      .select(col(orderCol), col(countCol).cast("double").as("_cnt"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", sum(col("_cnt")).over(Window.partitionBy()))
    val expCum = fractions.scanLeft(0.0)(_ + _).drop(1)
      .zipWithIndex.map { case (c, i) => (i + 1, c) }.toDF("_rn", "_ecum")
    val diff = indexed.join(broadcast(expCum), Seq("_rn"))
      .withColumn("_ocum", sum(col("_cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / col("_n"))
      .withColumn("_d", col("_ocum") - col("_ecum"))
    diff.agg(
        max(-col("_d")).as("dl"), max(col("_d")).as("dg"),
        max(abs(col("_d"))).as("dt"), first(col("_n")).as("n"),
        count(lit(1)).as("n_buckets"))
      .select(
        Num.round(greatest(col("dl"), lit(0.0)), 4).as("d_less"),
        Num.round(greatest(col("dg"), lit(0.0)), 4).as("d_greater"),
        Num.round(col("dt"), 4).as("d_two_sided"),
        // p from the CLAMPED statistic: a negative one-sided max means
        // D = 0, whose p must be 1.0 — exp(-2n*dl^2) of a negative dl
        // would smuggle the non-statistic's square into the p-value
        Num.round(least(exp(lit(-2.0) * col("n") *
          greatest(col("dl"), lit(0.0)) * greatest(col("dl"), lit(0.0))), lit(1.0)), 4).as("p_less"),
        Num.round(least(exp(lit(-2.0) * col("n") *
          greatest(col("dg"), lit(0.0)) * greatest(col("dg"), lit(0.0))), lit(1.0)), 4).as("p_greater"),
        Num.round(least(lit(2.0) * exp(lit(-2.0) * col("n") * col("dt") * col("dt")), lit(1.0)), 4).as("p_two_sided"),
        col("n_buckets"))
  }

  /** terms agg keyed by a Painless `script` instead of a field — the
    * script compiles (dsl.Painless) to a codegen'd grouping
    * expression, so a scripted key costs the same as a mapped one
    * (ES evaluates the script per doc per shard). */
  def termsAggScript(
      df: DataFrame, script: String, params: Map[String, Any],
      size: Int): DataFrame =
    df.groupBy(graft.dsl.Painless.compile(script, params).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** terms agg with `order: {<sub-metric>: desc|asc}` — buckets ranked
    * by a sub-aggregation metric instead of doc_count. Same single
    * partial-agg pass (the metric is just another aggregate in the
    * same groupBy); the ordered limit is TakeOrderedAndProject over
    * the bucket frame. */
  def termsAggOrderBy(
      df: DataFrame, field: String, size: Int,
      metric: org.apache.spark.sql.Column, metricName: String,
      asc: Boolean = false): DataFrame = {
    val ranked = df.where(col(field).isNotNull)
      .groupBy(col(field).as("key"))
      .agg(count(lit(1)).as("doc_count"), metric.as(metricName))
    ranked
      .orderBy(if (asc) col(metricName).asc else col(metricName).desc, col("key").asc)
      .limit(size)
  }

  /** terms agg with `include: {partition, num_partitions}` — ES's
    * paging device for high-cardinality term sets: each request sees
    * the deterministic hash-slice of terms with
    * hash(term) % num_partitions == partition. The filter applies
    * AFTER keying but BEFORE the heavy aggregation's exchange, so a
    * 1-of-N partition request aggregates ~1/N of the groups.
    * Hash = first 48 md5 bits of the term (the engine-portable hash
    * used everywhere else in graft). The slice filter applies BEFORE
    * the groupBy, so the exchange carries only the requested 1/N of
    * the groups — the point of the feature at high cardinality. */
  def termsAggPartition(
      df: DataFrame, field: String, size: Int,
      partition: Int, numPartitions: Int): DataFrame =
    df.where(pmod(conv(substring(md5(col(field).cast("binary")), 1, 12), 16, 10)
        .cast("long"), lit(numPartitions)) === partition)
      .groupBy(col(field).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** `{"stats": {"field": f}}` — one pass, one row. The big sum runs in
    * DECIMAL: a double sum over millions of rows is order-dependent
    * (partial-agg order differs run to run and engine to engine);
    * decimal accumulation is exact, so the result is deterministic at
    * any scale and any partitioning. */
  def statsAgg(df: DataFrame, field: String): DataFrame =
    df.agg(
      count(col(field)).as("cnt"),
      Num.round(min(col(field)).cast("double"), 4).as("min_v"),
      Num.round(max(col(field)).cast("double"), 4).as("max_v"),
      Num.round(avg(col(field)), 4).as("avg_v"),
      Num.round(sum(col(field).cast("decimal(18,4)")).cast("double"), 4).as("sum_v"))

  /** `{"extended_stats": {...}}` — adds sum-of-squares / variance /
    * stddev (population, matching ES). */
  def extendedStatsAgg(df: DataFrame, field: String): DataFrame =
    df.agg(
      count(col(field)).as("cnt"),
      Num.round(avg(col(field)), 4).as("avg_v"),
      Num.round(sum(col(field) * col(field)).cast("double"), 4).as("sum_sq"),
      Num.round(var_pop(col(field)), 4).as("variance"),
      Num.round(stddev_pop(col(field)), 4).as("std_dev"))

  /** `{"percentiles": {...}}` — exact interpolated percentiles (the
    * oracle-checkable form; ES itself uses TDigest approximation, and
    * `percentilesApprox` below is the matching 100 TB path). */
  def percentilesAgg(df: DataFrame, field: String): DataFrame = {
    // ONE array-form aggregate: three scalar percentile() calls would
    // each hold their own copy of the value multiset (3x agg state)
    val shared = expr(s"percentile($field, array(0.25D, 0.50D, 0.95D))")
    df.agg(
      Num.round(element_at(shared, 1), 4).as("p25"),
      Num.round(element_at(shared, 2), 4).as("p50"),
      Num.round(element_at(shared, 3), 4).as("p95"))
  }

  /** `percentiles` with the `hdr` method (ES's HDR-histogram option,
    * `number_of_significant_value_digits`): values quantize to
    * `sigDigits` significant decimal digits (the HDR bucket), counts
    * aggregate per bucket, and each percentile reads the first bucket
    * whose cumulative count reaches rank q·n. Unlike t-digest the
    * bucket function is DETERMINISTIC COLUMN MATH (log10/floor with
    * the geotile-style ulp guard), so results are bit-stable across
    * partitionings and the oracle mirrors them hash-exact.
    *
    * Scale shape: one partial-aggregated exchange over at most
    * 9·10^(sigDigits-1)·decades buckets (~thousands), a window cumsum
    * over that tiny bucket frame, one final 1-row aggregate. No sort
    * of the corpus. Positive values only (the HDR domain; ES records
    * negatives in a separate histogram). */
  def percentilesHdr(
      df: DataFrame, field: String, qs: Seq[(String, Double)],
      sigDigits: Int = 3): DataFrame = {
    require(sigDigits >= 1 && sigDigits <= 5, s"bad sigDigits: $sigDigits")
    val v = col(field).cast("double")
    // magnitude via log10 with ulp quantization (log10 may differ by
    // 1 ulp across libm builds; floor would amplify it a full decade)
    val mag = floor(Num.round(log10(v), 9))
    val unit = pow(lit(10.0), mag - (sigDigits - 1))
    val bucket = floor(Num.round(v / unit, 9)) * unit
    val counts = df.where(v > 0)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("c"))
    // the bucket frame is sketch-sized — a single-partition window
    // cumsum over it is deliberate, not a scale hazard
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val aggCols = qs.map { case (name, q) =>
      min(when(col("cum") >= col("n") * q, col("bucket"))).as(name)
    }
    cum.agg(aggCols.head, aggCols.tail: _*)
  }

  def percentilesApprox(df: DataFrame, field: String): DataFrame =
    df.agg(
      percentile_approx(col(field), lit(0.5), lit(10000)).as("p50_approx"))

  /** Per-partition sample cap for percentilesExactDistributed, scaled
    * so the pass-1 driver collect stays bounded regardless of the
    * input's partition count: total sample budget 64 Mi doubles
    * (~0.5 GB), i.e. C = clamp(1024, requested, 64Mi / P). At local
    * partition counts this is the requested cap unchanged; at 100 TB
    * scan widths (~1e5-1e6 partitions) it shrinks toward the 1 Ki
    * floor — wider brackets (more pass-2 work per partition, still
    * provably exact) in exchange for a driver that cannot OOM on
    * samples. An explicitly SMALLER requested cap (tests forcing the
    * bracket path) always wins. */
  private[graft] def effectiveSampleCap(requested: Int, numPartitions: Int): Int =
    math.min(requested,
      math.max(1024, ((64 << 20) / math.max(1, numPartitions))))

  /** Bounded PRIMITIVE max-heap keeping the `cap` smallest doubles
    * offered — pass 2's per-interval retain buffer. The r17 form was a
    * `PriorityQueue[java.lang.Double]`: ~16 B box + pointer per element
    * means a 1.5e7-element bracket cap (100 TB widths) costs ~360 MB
    * of boxed heap per task where this array costs ~120 MB flat (§5).
    * Backing array grows geometrically to the cap, so sparse intervals
    * never pre-allocate the worst case. */
  private[graft] final class DoubleMaxHeap(cap: Int) {
    private var a = new Array[Double](math.max(1, math.min(cap, 16)))
    private var n = 0
    def size: Int = n
    def offer(v: Double): Unit = {
      if (n < cap) {
        if (n == a.length)
          a = java.util.Arrays.copyOf(a, math.min(cap.toLong, a.length * 2L).toInt)
        a(n) = v; n += 1
        // sift up
        var i = n - 1
        var going = true
        while (going && i > 0) {
          val p = (i - 1) >>> 1
          if (a(p) < a(i)) { val t = a(p); a(p) = a(i); a(i) = t; i = p }
          else going = false
        }
      } else if (v < a(0)) {
        a(0) = v
        // sift down
        var i = 0
        var going = true
        while (going) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < n && a(l) > a(m)) m = l
          if (r < n && a(r) > a(m)) m = r
          if (m == i) going = false
          else { val t = a(m); a(m) = a(i); a(i) = t; i = m }
        }
      }
    }
    /** retained values, unsorted (callers sort the merged result) */
    def values: Array[Double] = java.util.Arrays.copyOf(a, n)
  }

  /** Exact interpolated percentiles WITHOUT a global sort (r17): the
    * r16 form range-partition-sorted the whole column (a full-column
    * Exchange) and ran ~4 jobs (sample, count, zipWithIndex, pick);
    * this form is two MAP-ONLY passes and zero shuffles.
    *
    *   Pass 1 — per partition: sort the projected column locally and
    *   emit (count, nanCount, stride, every stride-th sorted value).
    *   A sample value at local sample index j has EXACT local rank
    *   j*stride, so for any x the global-rank error of the merged
    *   sample is bounded by Σ_p stride_p — a deterministic guarantee,
    *   not a probabilistic one.
    *   Pass 2 — per partition: for the (merged, disjoint) candidate
    *   intervals derived from that bound, count values strictly below
    *   each interval and collect the values inside it. The true k-th
    *   order statistic is provably inside its interval, so the driver
    *   resolves exact positions from interval offsets + a local sort
    *   of the collected values.
    *
    * Same values as `percentile(...)` / the oracle's quantile_cont
    * (lower + (upper-lower)*frac on exact order statistics). Driver
    * data stays bounded: P*C sample doubles + ~2*n/C in-bracket
    * doubles (C = per-partition sample cap, scaled down with the
    * partition count — see effectiveSampleCap); columns that are
    * massive runs of one value short-circuit (lo == hi needs no
    * collection). The brackets are PROVABLY correct (the Gs/G bounds
    * below are deterministic, not probabilistic), so the pass-2
    * `require`s on bracket hit and cap range are assertions of that
    * proof, not a fallback path: a violation means a broken invariant
    * and must fail loudly rather than refine-and-retry.
    */
  def percentilesExactDistributed(
      df: DataFrame, field: String, qs: Seq[(String, Double)],
      sampleCap: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(col(field).cast("double").as("v")).where(col("v").isNotNull)
    val rdd = vals.queryExecution.toRdd.map(_.getDouble(0))
    // per-partition sample cap: balances the sample collect (P*C
    // doubles) against the bracket width (~n/C ranks); 64k doubles
    // gives stride 1 (exact) up to 64k-row partitions and ~1.5e7-rank
    // brackets at n = 1e12. Scaled down with the partition count so
    // the pass-1 driver collect stays bounded (~0.5 GB of sample
    // doubles) at 100 TB partition counts. Parameterized so tests can
    // force wide brackets through the count/collect path.
    val C = effectiveSampleCap(sampleCap, rdd.getNumPartitions)
    // ---- pass 1: local sort + stride sample (positions 0, s, 2s, ...,
    // and always the last element, so the global max is representable) ----
    case class PartStat(n: Long, nan: Long, stride: Long,
        sample: Array[Double], gaps: Array[Long])
    val stats = rdd.mapPartitions { it =>
      var nan = 0L
      var buf = new Array[Double](1024)
      var n = 0
      while (it.hasNext) {
        val v = it.next()
        if (java.lang.Double.isNaN(v)) nan += 1
        else {
          if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
          buf(n) = v; n += 1
        }
      }
      java.util.Arrays.sort(buf, 0, n) // IEEE order; NaN already split out
      val stride = math.max(1L, math.ceil(n.toDouble / C).toLong)
      val pos = (Iterator.range(0, n, stride.toInt) ++
        (if (n > 0 && (n - 1) % stride != 0) Iterator.single(n - 1) else Iterator.empty)).toArray
      val sample = pos.map(buf(_))
      // gap(j) = pos(j) - pos(j-1) (first gap = pos(0)+1 = 1): summing
      // gaps of samples with value <= v gives an exact LOWER bound of
      // countBelowOrEq(v), and gaps of samples < v a LOWER bound of
      // countBelow(v) — the two sides of the bracket guarantee
      val gaps = pos.indices.map(j =>
        if (j == 0) 1L else (pos(j) - pos(j - 1)).toLong).toArray
      Iterator.single(PartStat(n.toLong, nan, stride, sample, gaps))
    }.collect()
    val nNon = stats.map(_.n).sum
    val nNan = stats.map(_.nan).sum
    val n = nNon + nNan
    require(n > 0, s"percentiles over empty column $field")
    // merged samples grouped by value with cumulative gap weights:
    //   cumBefore(g) = Σ gaps of samples with value <  g  (=: Gs)
    //   cumThrough(g) = Σ gaps of samples with value <= g (=: G)
    // Provable bounds (per partition, A sorted, sample j at index p_j):
    //   A[p_j] < v  ⟹ countBelow >= p_j + 1  ⟹ countBelow(v)  >= Gs(v)
    //   A[p_j] <= v ⟹ countBelowOrEq >= p_j+1 ⟹ countBelowOrEq(v) >= G(v)
    //   first sample >= v at p_j' ⟹ countBelow <= p_j' ⟹
    //     countBelow(v) <= Gs(v) + E  with E = Σ_p stride_p
    val entries = stats.flatMap(s => s.sample.zip(s.gaps)).sortBy(_._1)
    val (grpVals, grpCumBefore, grpCumThrough) = {
      val vsB = Array.newBuilder[Double]
      val cbB = Array.newBuilder[Long]
      val ctB = Array.newBuilder[Long]
      var acc = 0L; var i = 0
      while (i < entries.length) {
        val v = entries(i)._1
        val before = acc
        while (i < entries.length && entries(i)._1 == v) { acc += entries(i)._2; i += 1 }
        vsB += v; cbB += before; ctB += acc
      }
      (vsB.result(), cbB.result(), ctB.result())
    }
    val eBound = stats.filter(_.n > 0).map(_.stride).sum
    // bracket lo for rank k: largest sample value with Gs(v) <= k
    // (then countBelow(lo) could still exceed... no: lo <= val_k iff
    // countBelow(lo) <= k; countBelow(lo) <= Gs(lo) + E, so demand
    // Gs(v) <= k - E; fall back to the global min sample, whose
    // countBelow is exactly 0)
    def bracketLo(k: Long): Double = {
      val target = k - eBound
      // largest index with cumBefore <= target
      var lo = 0; var hi = grpVals.length - 1; var ans = 0
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (grpCumBefore(mid) <= target) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      grpVals(ans)
    }
    // bracket hi for rank k: smallest sample value with G(v) >= k+1
    // (countBelowOrEq(hi) >= G(hi) >= k+1 ⟹ val_k <= hi); the global
    // max sample has G = nNon, so it always qualifies
    def bracketHi(k: Long): Double = {
      val target = k + 1
      var lo = 0; var hi = grpVals.length - 1; var ans = grpVals.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (grpCumThrough(mid) >= target) { ans = mid; hi = mid - 1 } else lo = mid + 1
      }
      grpVals(ans)
    }
    def cumBeforeOf(v: Double): Long = {
      val i = java.util.Arrays.binarySearch(grpVals, v)
      if (i >= 0) grpCumBefore(i) else 0L
    }
    val positions = qs.map { case (_, q) =>
      val pos = (n - 1) * q
      (math.floor(pos).toLong, math.ceil(pos).toLong, pos)
    }
    val neededNonNan = positions.flatMap(p => Seq(p._1, p._2))
      .filter(_ < nNon).distinct.sorted
    // ---- pass 2: count-below + bounded collect inside the intervals ----
    var resolved = Map.empty[Long, Double]
    if (neededNonNan.nonEmpty && nNon > 0) {
      val intervals = neededNonNan.map(k => (k, bracketLo(k), bracketHi(k)))
      // exact shortcut: a collapsed interval IS the order statistic
      // (massive-duplicate columns never collect anything)
      val (flat, open) = intervals.partition { case (_, lo, hi) => lo == hi }
      resolved ++= flat.map { case (k, lo, _) => k -> lo }
      if (open.nonEmpty) {
        // merge overlapping intervals so the pass scans values once;
        // each keeps the max needed rank for its retain cap
        val sortedIv = open.map { case (k, lo, hi) => (lo, hi, k) }.sortBy(_._1)
        val mergedIv = sortedIv.foldLeft(List.empty[(Double, Double, Long)]) {
          case (acc, (lo, hi, k)) => acc match {
            case (alo, ahi, ak) :: rest if lo <= ahi =>
              (alo, math.max(ahi, hi), math.max(ak, k)) :: rest
            case _ => (lo, hi, k) :: acc
          }
        }.reverse.toArray
        // per-partition retain cap: the needed in-interval index is
        // k - countBelow(ivLo) <= k - Gs(ivLo), so the cap-smallest
        // values per partition are a superset of every needed rank
        val caps = mergedIv.map { case (lo, _, kMax) =>
          val cap = kMax - cumBeforeOf(lo) + 1
          require(cap > 0 && cap <= Int.MaxValue, s"percentile cap out of range: $cap")
          cap.toInt
        }
        val ivB = spark.sparkContext.broadcast((mergedIv.map(iv => (iv._1, iv._2)), caps))
        val perIv = rdd.mapPartitions { it =>
          val (iv, cp) = ivB.value
          val below = new Array[Long](iv.length)
          // bounded primitive max-heap per interval: keep the cap
          // smallest without boxing (offer handles the cap)
          val heaps = cp.map(c => new DoubleMaxHeap(c))
          while (it.hasNext) {
            val v = it.next()
            if (!java.lang.Double.isNaN(v)) {
              var j = 0
              while (j < iv.length) {
                if (v < iv(j)._1) below(j) += 1
                else if (v <= iv(j)._2) heaps(j).offer(v)
                j += 1
              }
            }
          }
          Iterator.single((below, heaps.map(_.values)))
        }.collect()
        ivB.destroy()
        for (j <- mergedIv.indices) {
          val below = perIv.map(_._1(j)).sum
          val vsArr = perIv.flatMap(_._2(j))
          java.util.Arrays.sort(vsArr)
          for ((k, lo, hi) <- open if lo >= mergedIv(j)._1 && hi <= mergedIv(j)._2) {
            val idx = k - below
            require(idx >= 0 && idx < vsArr.length,
              s"percentile bracket missed rank $k (below=$below, in=${vsArr.length})")
            resolved += k -> vsArr(idx.toInt)
          }
        }
      }
    }
    def at(k: Long): Double = if (k >= nNon) Double.NaN else resolved(k)
    val row = org.apache.spark.sql.Row.fromSeq(positions.map {
      case (lo, hi, pos) =>
        val l = at(lo); val h = at(hi)
        Num.roundDouble(l + (h - l) * (pos - lo), 4)
    })
    spark.createDataFrame(
      java.util.List.of(row),
      org.apache.spark.sql.types.StructType(qs.map { case (name, _) =>
        org.apache.spark.sql.types.StructField(name, org.apache.spark.sql.types.DoubleType)
      }))
  }

  /** `{"cardinality": {"field": f}}` — exact for the oracle; the ES
    * semantic (HLL) is `cardinalityApprox`. */
  def cardinalityAgg(df: DataFrame, field: String): DataFrame =
    df.agg(countDistinct(col(field)).as("cardinality"))

  def cardinalityApprox(df: DataFrame, field: String): DataFrame =
    df.agg(approx_count_distinct(col(field)).as("cardinality_approx"))

  /** `{"histogram": {"field": f, "interval": i}}`. */
  def histogramAgg(df: DataFrame, field: String, interval: Double): DataFrame =
    df.where(col(field).isNotNull)
      .groupBy((floor(col(field) / interval) * interval).cast("double").as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("bucket").asc)

  /** histogram with `offset` and `min_doc_count`: bucket boundaries
    * shift by the offset; buckets under the count floor drop (the
    * ES sparse-bucket control). Same single pass. */
  def histogramOffsetAgg(
      df: DataFrame, field: String, interval: Double,
      offset: Double, minDocCount: Long = 1L): DataFrame =
    df.groupBy((floor((col(field) - offset) / interval) * interval + offset)
        .cast("double").as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .where(col("doc_count") >= minDocCount)
      .orderBy(col("bucket").asc)

  /** `{"date_histogram": {"calendar_interval": "month"}}`. */
  def dateHistogramAgg(df: DataFrame, tsField: String, interval: String): DataFrame =
    df.groupBy(to_date(date_trunc(interval, col(tsField))).as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("bucket").asc)

  /** date_histogram with `offset` — bucket boundaries shifted by a
    * fixed amount (ES's "+6h"-style offset): shift, truncate, shift
    * back. Still one truncation per row, one partial-agg pass. */
  def dateHistogramOffsetAgg(
      df: DataFrame, tsField: String, interval: String, offset: String): DataFrame =
    df.groupBy((date_trunc(interval,
        col(tsField) - expr(s"interval $offset")) + expr(s"interval $offset"))
        .as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("bucket").asc)

  /** `{"range": {"field": f, "ranges": [...]}}` — half-open [from, to)
    * buckets like ES; one pass via a CASE bucket key. */
  def rangeAgg(df: DataFrame, field: String, edges: Seq[Double]): DataFrame = {
    val f = col(field)
    val bucket = edges.sliding(2).foldLeft(
      when(f < edges.head, lit(s"*-${edges.head}"))) {
      case (acc, Seq(lo, hi)) =>
        acc.when(f >= lo && f < hi, lit(s"$lo-$hi"))
      case (acc, _) => acc
    }.otherwise(lit(s"${edges.last}-*"))
    // order by the numeric FROM edge (request order), not the label
    // string — lexically, "20000.0-*" sorts before "5000.0-20000.0"
    val fromEdge = edges.sliding(2).foldLeft(
      when(f < edges.head, lit(Double.NegativeInfinity))) {
      case (acc, Seq(lo, hi)) => acc.when(f >= lo && f < hi, lit(lo))
      case (acc, _) => acc
    }.otherwise(lit(edges.last))
    df.groupBy(bucket.as("bucket"), fromEdge.as("_from"))
      .agg(
        count(lit(1)).as("doc_count"),
        // decimal sum: deterministic under any aggregation order
        Num.round(sum(f.cast("decimal(18,4)")).cast("double"), 4).as("sum_v"))
      .orderBy(col("_from").asc)
      .drop("_from")
  }

  /** `{"filters": {"filters": {name: query...}}}` — N named predicate
    * buckets counted in ONE scan (count_if per bucket), not N scans. */
  def filtersAgg(df: DataFrame, buckets: Seq[(String, Column)]): DataFrame = {
    val aggs = buckets.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** filters agg with `other_bucket: true` — an extra count of the
    * docs no named filter matched (NULL predicates count as
    * non-matching, like ES). Still the same single pass. */
  def filtersAggOther(
      df: DataFrame, buckets: Seq[(String, Column)],
      otherName: String = "_other_"): DataFrame = {
    val matchedAny = buckets.map(b => coalesce(b._2, lit(false)))
      .reduce(_ || _)
    val aggs = buckets.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    } :+ sum(when(!matchedAny, 1L).otherwise(0L)).as(otherName)
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** `{"terms": {...}, "aggs": {"top": {"top_hits": {...}}}}` — per-
    * bucket top-k rows by sort column: one window pass, no per-bucket
    * queries. */
  def topHitsAgg(
      df: DataFrame, bucketField: String, sortField: String, idField: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(bucketField))
      .orderBy(col(sortField).desc, col(idField).asc)
    df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
  }

  /** `{"composite": {...}}` — multi-source bucket pagination: key-ordered
    * buckets strictly after `afterKey`, `size` per page. The after-key
    * predicate is a lexicographic tuple comparison, pushable below the
    * aggregation by Catalyst since it only references grouping keys. */
  def compositeAgg(
      df: DataFrame,
      keys: Seq[String],
      afterKey: Option[Seq[String]],
      size: Int,
      missingBucket: Boolean = false): DataFrame = {
    // ES composite default DROPS docs with a missing source key;
    // missing_bucket: true gives them a null-key bucket that sorts
    // FIRST (Spark's asc is nulls-first, matching ES here)
    val base =
      if (missingBucket) df
      else df.where(keys.map(col(_).isNotNull).reduce(_ && _))
    val grouped = base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("doc_count"))
    val paged = afterKey match {
      case Some(after) =>
        require(after.length == keys.length)
        // (k1,k2) > (a1,a2) lexicographically
        val gt = keys.zip(after).zipWithIndex.map { case ((k, a), i) =>
          val eqPrefix = keys.take(i).zip(after.take(i))
            .map { case (pk, pa) => col(pk) === lit(pa) }
            .foldLeft(lit(true))(_ && _)
          eqPrefix && col(k) > lit(a)
        }.reduce(_ || _)
        grouped.where(gt)
      case None => grouped
    }
    paged.orderBy(keys.map(col(_).asc): _*).limit(size)
  }

  /** Composite agg over COMPUTED sources — the `geotile_grid` /
    * `geohash_grid` composite sources (TSDB dashboards page the map
    * grid this way). Each source is (name, key expression); the key
    * columns materialize once, then the same lexicographic after-key
    * paging as `compositeAgg` applies. The after predicate still
    * references only grouping keys, so Catalyst pushes it below the
    * aggregation — a page deep in the grid doesn't aggregate the
    * whole grid. */
  def compositeAggSources(
      df: DataFrame,
      sources: Seq[(String, Column)],
      afterKey: Option[Seq[String]],
      size: Int): DataFrame = {
    val keyed = sources.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    compositeAgg(keyed.select(sources.map { case (n, _) => col(n) }: _*),
      sources.map(_._1), afterKey, size)
  }

  /** The `geotile_grid` "z/x/y" cell key as a reusable Column (same
    * math + ulp guard as geotileGridAgg). */
  def geotileKey(latField: String, lonField: String, zoom: Int): Column = {
    val n = (1 << zoom).toDouble
    val latC = greatest(least(col(latField).cast("double"), lit(85.05112878)), lit(-85.05112878))
    val r = radians(latC)
    val x = least(floor((col(lonField).cast("double") + 180.0) / 360.0 * n), lit(n - 1.0))
      .cast("long")
    val yRaw = (lit(1.0) - log(tan(r) + lit(1.0) / cos(r)) / math.Pi) / 2.0 * n
    val y = greatest(least(floor(Num.round(yRaw, 9)), lit(n - 1.0)), lit(0.0)).cast("long")
    concat_ws("/", lit(zoom), x, y)
  }

  /** Nested sub-aggregation: outer terms bucket with an inner metric —
    * a single two-key groupBy (ONE shuffle), not a per-bucket re-agg. */
  def nestedAgg(df: DataFrame, outer: String, inner: String, metric: String): DataFrame =
    df.groupBy(col(outer), col(inner))
      .agg(count(lit(1)).as("doc_count"), Num.round(avg(col(metric)), 4).as("avg_metric"))
      .orderBy(col(outer).asc, col(inner).asc)

  /** `reverse_nested` agg: bucket by a NESTED field, then count PARENT
    * documents per bucket (not nested docs) — "how many orders contain
    * a line item with this flag", the join-back-to-root step of a
    * nested agg tree. One partial-aggregating pass; the distinct-parent
    * count shuffles (key, parent) pairs, never the parent rows. */
  def reverseNestedAgg(nested: DataFrame, parentKey: String, bucketField: String): DataFrame =
    nested.groupBy(col(bucketField).as("key"))
      .agg(
        count(lit(1)).as("doc_count"),
        countDistinct(col(parentKey)).as("parent_count"))
      .orderBy(col("key").asc)

  /** `{"global": {}}` + filtered bucket: whole-index metrics next to a
    * filtered subset's metrics in one scan (conditional aggregation). */
  def globalWithFilter(df: DataFrame, pred: Column, field: String): DataFrame =
    df.agg(
      count(lit(1)).as("global_count"),
      Num.round(avg(col(field)), 4).as("global_avg"),
      sum(when(pred, 1L).otherwise(0L)).as("filtered_count"),
      Num.round(avg(when(pred, col(field))), 4).as("filtered_avg"))

  /** `adjacency_matrix`: counts for every named filter and pairwise
    * intersection — one scan, conditional sums (no N^2 scans). */
  def adjacencyMatrix(df: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    val singles = filters.map { case (n, p) => sum(when(p, 1L).otherwise(0L)).as(n) }
    val pairs = for {
      (i, idx) <- filters.zipWithIndex
      j <- filters.drop(idx + 1)
    } yield sum(when(i._2 && j._2, 1L).otherwise(0L)).as(s"${i._1}&${j._1}")
    val all = singles ++ pairs
    df.agg(all.head, all.tail: _*)
  }

  /** `rare_terms`: the long tail — buckets by ASCENDING doc count. */
  def rareTermsAgg(df: DataFrame, field: String, maxDocCount: Long, k: Int): DataFrame =
    df.groupBy(col(field).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .where(col("doc_count") <= maxDocCount)
      .orderBy(col("doc_count").asc, col("key").asc)
      .limit(k)

  /** `weighted_avg`: sum(w*v)/sum(w), single pass, decimal-stable. */
  def weightedAvg(df: DataFrame, valueField: String, weightField: String): DataFrame =
    df.agg(
      Num.round(
        sum((col(valueField) * col(weightField)).cast("decimal(28,8)")).cast("double") /
          // a doc missing the VALUE contributes to neither side (ES
          // ignores it); an unconditional sum(w) would keep its weight
          // in the denominator and deflate the average
          sum(when(col(valueField).isNotNull, col(weightField))
            .cast("decimal(28,8)")).cast("double"),
        4).as("weighted_avg"))

  /** `matrix_stats`: correlation/covariance between two numeric fields
    * (population forms, matching ES). */
  def matrixStats(df: DataFrame, f1: String, f2: String): DataFrame =
    df.agg(
      count(lit(1)).as("cnt"),
      Num.round(covar_pop(col(f1), col(f2)), 4).as("covariance"),
      Num.round(corr(col(f1), col(f2)), 4).as("correlation"))

  /** `date_histogram` with `min_doc_count: 0`: empty buckets between
    * the corpus min and max are materialized (the form chart consumers
    * rely on). The bucket spine is generated from the 1-row min/max
    * agg via sequence() — #buckets rows, broadcast to the left join —
    * so gap filling costs one extra broadcast join, never a shuffle of
    * the data. Month granularity. */
  def dateHistogramEmptyBuckets(df: DataFrame, tsField: String): DataFrame = {
    val counted = df
      .groupBy(date_trunc("month", col(tsField)).cast("date").as("bucket"))
      .agg(count(lit(1)).as("n"))
    // spine bounds come from the tiny counted frame, not another pass
    // over df: month-truncation is monotone, so min/max of the buckets
    // equal the truncated raw min/max — and because both branches
    // share the identical groupBy subtree, exchange reuse makes the
    // whole thing ONE scan of the data.
    val spine = counted
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("bucket"))
    spine.join(counted, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("doc_count"))
      .orderBy(col("bucket"))
  }

  /** `percentile_ranks`: for each probe value, the share of documents
    * with field <= value, as a percentage. One single-row aggregate —
    * map-side combined, no sort (the inverse of `percentiles`, which
    * needs the quantile). */
  def percentileRanksAgg(df: DataFrame, field: String, values: Seq[Double]): DataFrame = {
    def rank(v: Double) =
      // denominator = docs that HAVE the field (ES metric aggs ignore
      // missing docs); count(*) would deflate every rank under nulls
      Num.round(count(when(col(field) <= v, 1)).cast("double") /
        count(col(field)).cast("double") * 100.0, 4)
        .as(s"rank_$v".replace('.', '_'))
    df.agg(rank(values.head), values.tail.map(rank): _*)
  }

  /** `multi_terms`: terms agg over a composite key — top-k (field
    * tuple) buckets by count. Same one-exchange shape as terms. */
  def multiTermsAgg(df: DataFrame, fields: Seq[String], k: Int): DataFrame =
    // ES multi_terms drops docs missing ANY of the key fields
    df.where(fields.map(f => col(f).isNotNull).reduce(_ && _))
      .groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc +: fields.map(f => col(f).asc): _*)
      .limit(k)

  /** `auto_date_histogram`: pick the calendar interval (hour/day/
    * month/year) so the bucket count stays <= targetBuckets, then
    * bucket by it. The interval choice is a 1-row min/max aggregate
    * COLLECTED as a scalar (like any fitted parameter) — the r2
    * broadcast-join formulation made every row evaluate a 4-branch
    * date_trunc CASE under a BroadcastNestedLoopJoin; with the
    * interval fixed on the driver the main pass is one single-branch
    * partial-agg groupBy. Buckets are formatted strings so sub-day
    * intervals keep a uniform schema. */
  def autoDateHistogramAgg(df: DataFrame, tsField: String, targetBuckets: Int): DataFrame = {
    val row = df.agg(min(col(tsField)).as("mn"), max(col(tsField)).as("mx")).head()
    require(!row.isNullAt(0), s"auto_date_histogram over empty/all-null $tsField")
    // EXACT bucket counts per candidate interval (truncated boundary
    // diff + 1, both endpoints inclusive) — the old truncated-day
    // arithmetic could overshoot targetBuckets by up to a day's worth
    // of hours, breaking the <= targetBuckets contract ES keeps
    def ldt(v: Any): java.time.LocalDateTime = v match {
      case t: java.sql.Timestamp => t.toLocalDateTime
      case d: java.time.LocalDateTime => d
      case i: java.time.Instant => java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
      case d: java.sql.Date => d.toLocalDate.atStartOfDay
      case other => throw new IllegalArgumentException(s"not a timestamp: $other")
    }
    val (mn, mx) = (ldt(row.get(0)), ldt(row.get(1)))
    val zo = java.time.ZoneOffset.UTC
    val hourBuckets =
      mx.truncatedTo(java.time.temporal.ChronoUnit.HOURS).toEpochSecond(zo) / 3600 -
        mn.truncatedTo(java.time.temporal.ChronoUnit.HOURS).toEpochSecond(zo) / 3600 + 1
    val dayBuckets = mx.toLocalDate.toEpochDay - mn.toLocalDate.toEpochDay + 1
    val monthBuckets =
      (mx.getYear - mn.getYear) * 12L + (mx.getMonthValue - mn.getMonthValue) + 1
    val interval =
      if (hourBuckets <= targetBuckets) "hour"
      else if (dayBuckets <= targetBuckets) "day"
      else if (monthBuckets <= targetBuckets) "month"
      else "year"
    val fmt = "yyyy-MM-dd HH:mm:ss"
    df.groupBy(
      lit(interval).as("interval"),
      date_format(date_trunc(interval, col(tsField)), fmt).as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("bucket"))
  }

  /** `diversified_sampler`: cap the sample at `maxPerKey` documents
    * per diversity-field value (deterministic md5 order), then compute
    * the metrics over the de-biased sample. One window shuffle on the
    * diversity key; the capped sample is what flows to the final
    * single-row agg. */
  /** The diversified_sampler draw, shared by the Scala agg and the
    * aggs-JSON wrapper (ONE definition — the JSON node's reused
    * oracle depends on the two draws staying bit-identical): at most
    * `maxPerKey` docs per diversity-field value, picked in the
    * deterministic md5 order on the id. The row_number window
    * partitions by the diversity field — a per-value-bounded local
    * pass, never a global sort. Parameter order matches
    * [[diversifiedSamplerAgg]] (id first) — two String params in
    * swapped order would compile and silently sample the wrong way. */
  def diversifiedSampleFrame(
      df: DataFrame, idCol: String, diversityField: String,
      maxPerKey: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(diversityField))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("_graft_dsamp_rn", row_number().over(w))
      .where(col("_graft_dsamp_rn") <= maxPerKey)
      .drop("_graft_dsamp_rn")
  }

  /** diversified_sampler agg form: the de-duplicated sample's size and
    * mean metric (the Scala operator's one-row report). */
  def diversifiedSamplerAgg(
      df: DataFrame, idCol: String, diversityField: String,
      metricField: String, maxPerKey: Int): DataFrame =
    diversifiedSampleFrame(df, idCol, diversityField, maxPerKey)
      .agg(
        count(lit(1)).as("sample_size"),
        Num.round(avg(col(metricField)), 4).as("avg_metric"))

  /** ES `histogram` mapped FIELD type: each doc stores a
    * PRE-AGGREGATED histogram as parallel (values[], counts[]) arrays
    * — the TSDB/rollup storage shape, where raw observations never
    * reach the index. Stats aggregate over histogram fields by
    * weighting each value by its count. Per-row partial sums
    * accumulate in DECIMAL (order-free exact addition — array order
    * inside a row and row order across the shuffle both stop
    * mattering), then ONE global aggregate; the exchange carries a
    * decimal + three scalars per row, never the arrays. */
  def histogramFieldStats(
      df: DataFrame, valuesCol: String, countsCol: String): DataFrame = {
    val rowSum = aggregate(
      zip_with(col(valuesCol), col(countsCol), (v, c) => v * c),
      lit(0).cast("decimal(18,4)"),
      // re-cast per step: decimal + widens to (19,4), and the HOF
      // accumulator type must stay fixed
      (acc, x) => (acc + x.cast("decimal(18,4)")).cast("decimal(18,4)"))
    val rowN = aggregate(col(countsCol), lit(0L), (acc, c) => acc + c)
    df.select(
        rowSum.as("_s"), rowN.as("_n"),
        array_min(col(valuesCol)).as("_lo"), array_max(col(valuesCol)).as("_hi"))
      .agg(
        sum(col("_n")).as("value_count"),
        // decimal partials, double out: Spark's sum(decimal) widens to
        // decimal(28,4) vs DuckDB's (38,4) — same digits, different
        // declared type, and the correctness hash is type-sensitive
        sum(col("_s")).cast("double").as("total"),
        min(col("_lo")).as("lo"),
        max(col("_hi")).as("hi"))
  }

  /** `geo_centroid`: mean point of a geo field (column-pair model). */
  def geoCentroid(df: DataFrame, latField: String, lonField: String): DataFrame =
    df.agg(
      Num.round(avg(col(latField)), 4).as("centroid_lat"),
      Num.round(avg(col(lonField)), 4).as("centroid_lon"),
      count(lit(1)).as("doc_count"))

  /** The `geohash_grid` cell key as a reusable Column (the compiled
    * graft.expr.GeoHash kernel) — shared by the grid agg and the
    * composite geohash source. */
  def geohashKey(latField: String, lonField: String, precision: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.GeoHash(
        org.apache.spark.sql.GraftBridge.expression(col(latField).cast("double")),
        org.apache.spark.sql.GraftBridge.expression(col(lonField).cast("double")),
        precision))

  /** `geohash_grid`: bucket points by geohash cell at `precision`,
    * top-k cells by count (the map-visualization workhorse). The key
    * is a compiled kernel (graft.expr.GeoHash); one groupBy shuffle of
    * (cell, partial count) — the same shape as terms agg, so 100 TB
    * cost is one map-combined exchange over at most 32^precision
    * cells. */
  def geohashGridAgg(
      df: DataFrame, latField: String, lonField: String,
      precision: Int, k: Int): DataFrame =
    df.groupBy(geohashKey(latField, lonField, precision).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(k)

  /** `geotile_grid`: web-mercator slippy-tile buckets ("z/x/y") at
    * `zoom`. Same single-exchange shape as geohash_grid. The y formula
    * is the standard OSM tile math; latitude is clamped to the
    * mercator domain first, exactly as ES does.
    *
    * Cross-engine determinism: the y formula goes through tan/cos/ln,
    * which JVM Math and C libm may disagree on by 1 ulp — amplified by
    * floor() into a whole-tile flip at a boundary. Quantizing the
    * pre-floor value to 1e-9 (Num.round mirrors DuckDB's round
    * bit-for-bit) absorbs ulp noise; geohash needs no such guard (pure
    * +,-,*,/ arithmetic). */
  def geotileGridAgg(
      df: DataFrame, latField: String, lonField: String,
      zoom: Int, k: Int): DataFrame =
    df.groupBy(geotileKey(latField, lonField, zoom).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(k)

  /** `_mvt` (vector tile search API): per (zoom, x, y) web-mercator
    * tile — hit count, point centroid, and the tile's WGS84 envelope
    * recomputed from the tile coordinates in closed form. Same tile
    * math (and ulp guard) as geotile_grid; ONE grid groupBy is the
    * only exchange. Output is the per-tile FEATURE data the MVT
    * encoder serializes — the protobuf wrapper is presentation, not
    * analytics. The inverse-mercator north/south edges spell sinh via
    * exp (DuckDB has no sinh) so both engines run the identical
    * formula; 6-decimal rounding absorbs libm ulp drift. */
  def mvtTiles(
      df: DataFrame, latField: String, lonField: String,
      zoom: Int, k: Int): DataFrame = {
    val n = (1 << zoom).toDouble
    val latC = greatest(least(col(latField).cast("double"), lit(85.05112878)), lit(-85.05112878))
    val r = radians(latC)
    val x = least(floor((col(lonField).cast("double") + 180.0) / 360.0 * n), lit(n - 1.0))
      .cast("long")
    val yRaw = (lit(1.0) - log(tan(r) + lit(1.0) / cos(r)) / math.Pi) / 2.0 * n
    val y = greatest(least(floor(Num.round(yRaw, 9)), lit(n - 1.0)), lit(0.0)).cast("long")
    def mercLat(yEdge: Column): Column = {
      val z = lit(math.Pi) * (lit(1.0) - lit(2.0) * yEdge / n)
      Num.round(degrees(atan((exp(z) - exp(-z)) / 2.0)), 6)
    }
    df.groupBy(x.as("x"), y.as("y"))
      .agg(
        count(lit(1)).as("doc_count"),
        Num.round(avg(col(latField)), 4).as("centroid_lat"),
        Num.round(avg(col(lonField)), 4).as("centroid_lon"))
      .select(
        concat_ws("/", lit(zoom), col("x"), col("y")).as("key"),
        col("doc_count"), col("centroid_lat"), col("centroid_lon"),
        Num.round(col("x") / n * 360.0 - 180.0, 6).as("west"),
        Num.round((col("x") + 1) / n * 360.0 - 180.0, 6).as("east"),
        mercLat(col("y").cast("double")).as("north"),
        mercLat((col("y") + 1).cast("double")).as("south"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(k)
  }

  /** ES PIPELINE aggregations over a date_histogram parent:
    * cumulative_sum, derivative, moving_avg — one window pass over the
    * bucket frame. The frame is #buckets rows (tiny at any corpus
    * size), so the single-partition global-order window is free; the
    * heavy lifting stays in the partial-aggregated groupBy below it. */
  /** Shared date-histogram bucket frame (bucket, doc_count, sum_v) —
    * ONE definition of the decimal-sum parity convention for every
    * pipeline agg built on it. */
  private def bucketFrame(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame =
    df.groupBy(to_date(date_trunc(interval, col(tsField))).as("bucket"))
      .agg(
        count(lit(1)).as("doc_count"),
        Num.round(sum(col(metric).cast("decimal(18,4)")).cast("double"), 4).as("sum_v"))

  /** The remaining `moving_fn` whitelist models over a date_histogram
    * parent: `unweightedAvg`, `linearWeightedAvg` (weights 1..n),
    * `stdDev` (population, around the window's unweighted avg — ES's
    * MovingFunctions.stdDev contract) and `holt` (double exponential
    * smoothing; declared recursion: level starts at the window's
    * first value with trend 0, then s' = α·x + (1-α)(s+b),
    * b' = β(s'-s) + (1-β)b, the window's final level is emitted).
    * Every model folds LEFT-TO-RIGHT over the ordered window array so
    * the DuckDB oracle's list_reduce replays the identical FP op
    * order. Window math runs on the tiny bucket frame; the heavy
    * partial agg below it is the only real exchange. */
  def dateHistogramMovingModels(
      df: DataFrame, tsField: String, interval: String, metric: String,
      window: Int, alpha: Double, beta: Double): DataFrame = {
    val buckets = bucketFrame(df, tsField, interval, metric)
    val w = Window.orderBy(col("bucket")).rowsBetween(-(window - 1), 0)
    def foldSum(arr: Column) = aggregate(arr, lit(0.0), (a, x) => a + x)
    val vals = col("_vals")
    val n = size(vals).cast("double")
    val mean = foldSum(vals) / n
    val linW = foldSum(transform(vals, (x, i) => x * (i + 1).cast("double"))) /
      (n * (n + lit(1.0)) / lit(2.0))
    val sd = sqrt(foldSum(transform(vals, x => (x - mean) * (x - mean))) / n)
    val holtState = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      struct(element_at(vals, 1).as("s"), lit(0.0).as("b")),
      (acc, x) => {
        val sN = lit(alpha) * x + lit(1 - alpha) * (acc.getField("s") + acc.getField("b"))
        struct(sN.as("s"),
          (lit(beta) * (sN - acc.getField("s")) + lit(1 - beta) * acc.getField("b")).as("b"))
      })
    buckets
      .withColumn("_vals", collect_list(col("sum_v")).over(w))
      .withColumn("unweighted_avg", Num.round(mean, 4))
      .withColumn("linear_wavg", Num.round(linW, 4))
      .withColumn("moving_stddev", Num.round(sd, 4))
      .withColumn("holt", Num.round(holtState.getField("s"), 4))
      .drop("_vals")
      .orderBy(col("bucket"))
  }

  /** moving_fn `holtWinters` (additive triple exponential smoothing)
    * — the seasonal member of the whitelist. Declared recursion
    * (ES's padding/multiplicative options are not replicated): state
    * starts at (level = first window value, trend 0, seasonal[period]
    * all 0); each further value x at step t updates
    *   s' = α(x − seas[t mod p]) + (1−α)(s + b)
    *   b' = β(s' − s) + (1−β)b
    *   seas[t mod p] = γ(x − s') + (1−γ)seas[t mod p]
    * and the bucket emits the one-step-ahead seasonal forecast
    * s + b + seas[t mod p]. Left-to-right fold over the ordered
    * window array, mirrored by the oracle's struct-state list_reduce
    * — identical FP op order. Tiny bucket frame, heavy work below. */
  def dateHistogramHoltWinters(
      df: DataFrame, tsField: String, interval: String, metric: String,
      window: Int, alpha: Double, beta: Double, gamma: Double,
      period: Int): DataFrame = {
    require(period >= 2 && window >= period,
      s"holt_winters needs period >= 2 and window >= period: $window/$period")
    val buckets = bucketFrame(df, tsField, interval, metric)
    val w = Window.orderBy(col("bucket")).rowsBetween(-(window - 1), 0)
    val vals = col("_vals")
    val zero = struct(element_at(vals, 1).as("s"), lit(0.0).as("b"),
      array_repeat(lit(0.0), period).as("seas"), lit(1).as("t"))
    val st = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))), zero,
      (a, x) => {
        val idx = pmod(a.getField("t"), lit(period))
        val seasAt = element_at(a.getField("seas"), idx + 1)
        val sN = lit(alpha) * (x - seasAt) +
          lit(1 - alpha) * (a.getField("s") + a.getField("b"))
        val bN = lit(beta) * (sN - a.getField("s")) + lit(1 - beta) * a.getField("b")
        val seasN = transform(a.getField("seas"), (v, j) =>
          when(j === idx, lit(gamma) * (x - sN) + lit(1 - gamma) * v).otherwise(v))
        struct(sN.as("s"), bN.as("b"), seasN.as("seas"),
          (a.getField("t") + 1).as("t"))
      })
    val fc = st.getField("s") + st.getField("b") +
      element_at(st.getField("seas"), pmod(st.getField("t"), lit(period)) + 1)
    buckets
      .withColumn("_vals", collect_list(col("sum_v")).over(w))
      .withColumn("holt_winters", Num.round(fc, 4))
      .drop("_vals")
      .orderBy(col("bucket"))
  }

  def dateHistogramPipeline(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame = {
    val buckets = bucketFrame(df, tsField, interval, metric)
    val w = Window.orderBy(col("bucket"))
    buckets
      .withColumn("cum_sum",
        Num.round(sum(col("sum_v")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4))
      .withColumn("deriv",
        Num.round(col("sum_v") - lag(col("sum_v"), 1).over(w), 4))
      .withColumn("moving_avg",
        Num.round(avg(col("sum_v")).over(w.rowsBetween(-2, 0)), 4))
      .orderBy(col("bucket"))
  }

  /** `serial_diff` (lag-n differencing) + `bucket_script` (per-bucket
    * computed metric) + `bucket_selector` (HAVING over a bucket
    * expression) over a date_histogram parent — the remaining pipeline
    * aggs. Same shape as dateHistogramPipeline: all the window math
    * runs on the tiny bucket frame. */
  def pipelineBucketOps(
      df: DataFrame, tsField: String, interval: String, metric: String,
      lagN: Int, minAvg: Double): DataFrame = {
    val buckets = bucketFrame(df, tsField, interval, metric)
    val w = Window.orderBy(col("bucket"))
    buckets
      // bucket_script: avg value per doc, computed from sibling metrics
      .withColumn("avg_per_doc",
        Num.round(col("sum_v") / col("doc_count").cast("double"), 4))
      // serial_diff: value minus the value lagN buckets earlier
      .withColumn("serial_diff",
        Num.round(col("sum_v") - lag(col("sum_v"), lagN).over(w), 4))
      // bucket_selector: drop buckets failing the script predicate
      .where(col("avg_per_doc") >= minAvg)
      .orderBy(col("bucket"))
  }

  /** `boxplot` agg: min / q1 / median / q3 / max through the SAME
    * distributed sort-selection as percentilesExactDistributed (q=0
    * and q=1 select positions 0 and n-1) — one range-partitioned sort,
    * five boundary values to the driver. */
  def boxplotAgg(df: DataFrame, field: String): DataFrame =
    percentilesExactDistributed(df, field, Seq(
      "min_v" -> 0.0, "q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75, "max_v" -> 1.0))

  /** `rate` agg inside a date_histogram: the bucket metric normalized
    * to a per-day rate (sum / days in the calendar bucket) — the
    * "revenue per day by month" widget. Same single-pass bucket frame;
    * the day count is calendar math on the bucket key. */
  def rateAgg(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame = {
    require(interval == "month", "rateAgg: per-day rate implemented for month buckets")
    bucketFrame(df, tsField, interval, metric)
      .withColumn("days", dayofmonth(last_day(col("bucket"))).cast("double"))
      .withColumn("per_day", Num.round(col("sum_v") / col("days"), 4))
      .select(col("bucket"), col("doc_count"), col("sum_v"), col("per_day"))
      .orderBy(col("bucket"))
  }

  /** `geo_distance` agg: documents bucketed into distance RINGS around
    * an origin ([0,e1), [e1,e2), ... [en,*)) — the "how far are my
    * users" map widget. One pass: codegen'd haversine + CASE ring key,
    * partial-aggregating count. */
  def geoDistanceAgg(
      df: DataFrame, latCol: String, lonCol: String,
      originLat: Double, originLon: Double, edgesKm: Seq[Double]): DataFrame = {
    val d = graft.rel.Relational.haversineKm(
      col(latCol), col(lonCol), lit(originLat), lit(originLon))
    val ring = edgesKm.sliding(2).foldLeft(
      when(d < edgesKm.head, lit(s"*-${edgesKm.head}"))) {
      case (acc, Seq(lo, hi)) => acc.when(d >= lo && d < hi, lit(s"$lo-$hi"))
      case (acc, _) => acc
    }.otherwise(lit(s"${edgesKm.last}-*"))
    val fromEdge = edgesKm.sliding(2).foldLeft(
      when(d < edgesKm.head, lit(Double.NegativeInfinity))) {
      case (acc, Seq(lo, hi)) => acc.when(d >= lo && d < hi, lit(lo))
      case (acc, _) => acc
    }.otherwise(lit(edgesKm.last))
    df.groupBy(ring.as("ring"), fromEdge.as("_from"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("_from").asc)
      .drop("_from")
  }

  /** `normalize` pipeline agg (percent_of_sum): each bucket's share of
    * the total metric. The total is a window sum OVER the tiny bucket
    * frame (decimal — exact, order-independent); the corpus-sized work
    * stays in the partial-aggregating groupBy underneath. */
  /** ONE definition of every `normalize` method's column math, shared
    * by the Scala pipeline kernels and the aggs-JSON `normalize`
    * parent pipe (whose reused oracles depend on the formulas staying
    * bit-identical): window math over the tiny bucket frame, decimal
    * sums for order independence, round-4 like the kernels. */
  def normalizeMethodCol(p: Column, method: String): Column = {
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val total = sum(p.cast("decimal(18,4)")).over(w).cast("double")
    val mean = total / count(lit(1)).over(w).cast("double")
    method match {
      case "percent_of_sum" => Num.round(p / total * 100.0, 4)
      case "rescale_0_1" =>
        Num.round((p - min(p).over(w)) / (max(p).over(w) - min(p).over(w)), 4)
      case "rescale_0_100" =>
        Num.round((p - min(p).over(w)) / (max(p).over(w) - min(p).over(w)) * 100.0, 4)
      case "mean" => Num.round(p - mean, 4)
      case "z-score" => Num.round((p - mean) / stddev_pop(p).over(w), 4)
      case "softmax" => softmaxCol(p)
      case other => throw new IllegalArgumentException(
        s"unsupported normalize method: $other")
    }
  }

  /** `moving_percentiles`' sliding exact median (include-current
    * window = ES shift 1, the kernels' shared convention) — shared by
    * the Scala kernel and the aggs-JSON parent pipe. */
  def movingMedianCol(p: Column, keyCol: Column, window: Int): Column = {
    require(window >= 1, s"bad moving_percentiles window: $window")
    val w = Window.orderBy(keyCol).rowsBetween(-(window - 1), 0)
    Num.round(percentile(p, lit(0.5)).over(w), 4)
  }

  def normalizeAgg(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame =
    bucketFrame(df, tsField, interval, metric)
      .withColumn("pct_of_sum", normalizeMethodCol(col("sum_v"), "percent_of_sum"))
      .orderBy(col("bucket"))

  /** The remaining `normalize` pipeline-agg methods beside
    * percent_of_sum ([[normalizeAgg]]): `rescale_0_1` /
    * `rescale_0_100` (min-max), `mean` (deviation from the bucket
    * mean) and `z-score`. Same shape: window math OVER the tiny
    * bucket frame (the mean from a decimal sum — order-independent;
    * stddev_pop at round-4 like extended_stats), heavy work in the
    * partial agg underneath. `softmax` is supported for bounded
    * inputs via [[softmaxCol]] (exp overflows at |x| ≳ 709 — ES
    * inherits the same hazard). */
  def normalizeAggMethods(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame =
    bucketFrame(df, tsField, interval, metric)
      .withColumn("rescale_0_1", normalizeMethodCol(col("sum_v"), "rescale_0_1"))
      .withColumn("rescale_0_100", normalizeMethodCol(col("sum_v"), "rescale_0_100"))
      .withColumn("dev_from_mean", normalizeMethodCol(col("sum_v"), "mean"))
      .withColumn("zscore", normalizeMethodCol(col("sum_v"), "z-score"))
      .orderBy(col("bucket"))

  /** normalize `softmax` over a bucket column: exp(x) / Σexp(x), the
    * exps summed in decimal for order independence. Caller guarantees
    * bounded magnitudes (exp overflow, as in ES). */
  def softmaxCol(x: Column): Column = {
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Num.round(exp(x) / sum(exp(x).cast("decimal(30,10)")).over(w).cast("double"), 4)
  }

  /** `avg_bucket` / `max_bucket` / `min_bucket` / `sum_bucket` /
    * `stats_bucket` sibling pipeline aggs: one scalar row summarizing
    * the parent date_histogram's per-bucket metric. Two partial
    * aggregates back to back — the bucket frame never leaves the
    * executors and the final row is a single-value rollup. */
  def bucketStatsAgg(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame =
    bucketFrame(df, tsField, interval, metric)
      .agg(
        count(lit(1)).as("n_buckets"),
        // decimal-sum / count, not avg(): a double avg's summation
        // order differs between engines at 1e7 magnitudes (ulp-level,
        // visible through round-4 at the .xxxx5 boundary)
        Num.round(
          sum(col("sum_v").cast("decimal(18,4)")).cast("double") / count(lit(1)),
          4).as("avg_bucket"),
        Num.round(max(col("sum_v")), 4).as("max_bucket"),
        Num.round(min(col("sum_v")), 4).as("min_bucket"),
        Num.round(sum(col("sum_v").cast("decimal(18,4)")).cast("double"), 4).as("sum_bucket"))

  /** `{"significant_terms": {"field": f}}` over an analyzed text field:
    * terms over-represented in the foreground (`pred`) vs the whole
    * index. Score: fgRate * ln(fgRate / bgRate) (the "relative entropy"
    * core of ES's JLH/mutual-information heuristics). Single explode +
    * one conditional groupBy — fg and bg counts in the same pass.
    */
  /** ES's pluggable significance heuristics — pure column math over
    * the shared (fg_rate, bg_rate, fg_count, bg_count) columns. */
  private def sigScore(heuristic: String): Column = heuristic match {
    case "default" =>
      Num.round(col("fg_rate") * log(col("fg_rate") / col("bg_rate")), 4)
    case "chi_square" =>
      Num.round(pow(col("fg_rate") - col("bg_rate"), 2) /
        (col("fg_rate") + col("bg_rate")), 6)
    case "percentage" =>
      Num.round(col("fg_count") / col("bg_count"), 6)
    case "jlh" =>
      // JLH: absolute uplift x relative uplift — balances common and
      // rare terms
      Num.round((col("fg_rate") - col("bg_rate")) *
        (col("fg_rate") / col("bg_rate")), 6)
    case "mutual_information" =>
      // textbook 2x2 mutual information (Manning & Schuetze 13.5.1)
      // over term-presence x fg-membership DOC counts, log base 2,
      // background as superset; empty cells contribute 0 (0*log0=0)
      val n = col("bg_total")
      val n11 = col("fg_count").cast("double")
      val n10 = col("bg_count") - col("fg_count")
      val n01 = col("fg_total") - col("fg_count")
      val n00 = n - col("bg_count") - col("fg_total") + col("fg_count")
      val r1 = col("bg_count").cast("double") // term-present row total
      val r0 = n - col("bg_count")
      val c1 = col("fg_total")
      val c0 = n - col("fg_total")
      def mi(nij: Column, ni: Column, nj: Column): Column =
        when(nij > 0, (nij / n) * log(2.0, n * nij / (ni * nj)))
          .otherwise(lit(0.0))
      Num.round(mi(n11, r1, c1) + mi(n10, r1, c0) +
        mi(n01, r0, c1) + mi(n00, r0, c0), 6)
    case "gnd" =>
      // Google Normalized Distance (Cilibrasi & Vitanyi 2007) between
      // the term and the foreground set, reported as 1 - NGD so larger
      // = more significant: fx = term docs, fy = fg docs, fxy = co-occ
      val fx = col("bg_count").cast("double")
      val fy = col("fg_total")
      val fxy = col("fg_count").cast("double")
      val n = col("bg_total")
      Num.round(lit(1.0) -
        (greatest(log(fx), log(fy)) - log(fxy)) /
          (log(n) - least(log(fx), log(fy))), 6)
    case other => throw new IllegalArgumentException(
      s"unknown significance heuristic: $other")
  }

  def significantTerms(
      df: DataFrame,
      textField: String,
      pred: Column,
      minFgCount: Long = 5,
      k: Int = 10,
      backgroundFilter: Column = lit(true),
      heuristic: String = "default"): DataFrame = {
    import graft.analysis.Analyzer
    val terms = df
      .select(pred.as("fg"), backgroundFilter.as("bg"),
        explode(Analyzer.termSet(col(textField))).as("term"))
    // ES rates are over DOC counts (fg docs / all docs), not term
    // totals. `background_filter` restricts the comparison set the
    // uplift is measured against (default: the whole index).
    val totals = df.agg(
      sum(when(pred, 1L).otherwise(0L)).cast("double").as("fg_total"),
      sum(when(backgroundFilter, 1L).otherwise(0L)).cast("double").as("bg_total"))
    terms
      .groupBy(col("term"))
      .agg(
        sum(when(col("fg"), 1L).otherwise(0L)).as("fg_count"),
        sum(when(col("bg"), 1L).otherwise(0L)).as("bg_count"))
      .where(col("fg_count") >= minFgCount)
      .crossJoin(broadcast(totals))
      .withColumn("fg_rate", col("fg_count") / col("fg_total"))
      .withColumn("bg_rate", col("bg_count") / col("bg_total"))
      .select(
        col("term"),
        col("fg_count"),
        col("bg_count"),
        // ES offers pluggable significance heuristics; all are pure
        // column math over the same (fg_rate, bg_rate) pair
        sigScore(heuristic).as("score"))
      .orderBy(col("score").desc, col("term").asc)
      .limit(k)
  }

  /** `significant_terms` over a KEYWORD field: the same uplift math
    * as the text form with field VALUES as the terms — one partial-
    * aggregating groupBy, no token explode at all. */
  def significantTermsKeyword(
      df: DataFrame,
      field: String,
      pred: Column,
      minFgCount: Long = 5,
      k: Int = 10,
      heuristic: String = "default"): DataFrame = {
    val totals = df.agg(
      sum(when(pred, 1L).otherwise(0L)).cast("double").as("fg_total"),
      count(lit(1)).cast("double").as("bg_total"))
    df.groupBy(col(field).as("term"))
      .agg(
        sum(when(pred, 1L).otherwise(0L)).as("fg_count"),
        count(lit(1)).as("bg_count"))
      .where(col("fg_count") >= minFgCount)
      .crossJoin(broadcast(totals))
      .withColumn("fg_rate", col("fg_count") / col("fg_total"))
      .withColumn("bg_rate", col("bg_count") / col("bg_total"))
      .select(col("term"), col("fg_count"), col("bg_count"),
        sigScore(heuristic).as("score"))
      .orderBy(col("score").desc, col("term").asc)
      .limit(k)
  }

  /** `terms` agg DISTRIBUTED accounting: `shards` simulated shards
    * (uniform doc-hash routing) each report their local top
    * `shardSize` terms; the merged top `size` carries ES's
    * `doc_count_error_upper_bound` — for each term, the sum of the
    * LAST reported count of every shard that did NOT report it (the
    * worst case that shard could have hidden). A shard holding fewer
    * than `shardSize` terms reported everything, so it contributes 0.
    * This is the coordinator/shard protocol a 1000-executor terms agg
    * actually runs: one (shard, term) partial agg, a rank window over
    * \|shards\|·\|terms\| rows (never the docs), a \|shards\|-row
    * threshold frame broadcast back, one merge groupBy. */
  def termsAggShardError(df: DataFrame, field: String, idCol: String,
      size: Int, shards: Int, shardSize: Int): DataFrame = {
    val shard = pmod(
      conv(substring(md5(concat(lit("shard:"), col(idCol).cast("string"))), 1, 12), 16, 10)
        .cast("long"), lit(shards.toLong))
    val perShard = df.withColumn("_shard", shard)
      .groupBy(col("_shard"), col(field).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(col("cnt").desc, col("key").asc)
    val kept = perShard.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= shardSize)
    val thresh = kept.groupBy(col("_shard"))
      .agg(min(col("cnt")).as("_mn"), count(lit(1)).as("_nkept"))
      .select(col("_shard"),
        when(col("_nkept") < shardSize, lit(0L)).otherwise(col("_mn")).as("_th"))
    val total = thresh.agg(sum(col("_th")).as("_total"))
    kept.join(broadcast(thresh), "_shard")
      .groupBy(col("key"))
      .agg(sum(col("cnt")).as("doc_count"), sum(col("_th")).as("_rep"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("doc_count"),
        (col("_total") - col("_rep")).as("doc_count_error_upper_bound"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)
  }

  /** `{"missing": {"field": f}}` — count of documents missing the
    * field. One partial-aggregating pass. */
  def missingAgg(df: DataFrame, field: String): DataFrame =
    df.agg(sum(when(col(field).isNull, 1L).otherwise(0L)).as("missing_count"))

  /** `moving_fn` pipeline agg over a date_histogram parent: max / min /
    * sum over a sliding window of the last `window` buckets. Same shape
    * as dateHistogramPipeline — the global-order window runs on the
    * tiny bucket frame, the heavy partial-agg groupBy below it. */
  def dateHistogramMovingFn(
      df: DataFrame, tsField: String, interval: String, metric: String,
      window: Int): DataFrame = {
    val buckets = bucketFrame(df, tsField, interval, metric)
    val w = Window.orderBy(col("bucket")).rowsBetween(-(window - 1), 0)
    buckets
      .withColumn("moving_max", Num.round(max(col("sum_v")).over(w), 4))
      .withColumn("moving_min", Num.round(min(col("sum_v")).over(w), 4))
      // decimal window sum: engines differ in how they incrementalize
      // a moving double sum (recompute vs subtract), so only an exact
      // type guarantees bit parity
      .withColumn("moving_sum",
        Num.round(sum(col("sum_v").cast("decimal(18,4)")).over(w).cast("double"), 4))
      .orderBy(col("bucket"))
  }

  /** `bucket_sort` pipeline agg: reorder the parent's buckets by a
    * sibling metric and truncate with from/size — the "top N buckets
    * by revenue" idiom. Global row_number is fine: the frame is bucket
    * -count rows, never the corpus. */
  def bucketSortAgg(
      df: DataFrame, tsField: String, interval: String, metric: String,
      from: Int, sz: Int): DataFrame = {
    val buckets = bucketFrame(df, tsField, interval, metric)
    val w = Window.orderBy(col("sum_v").desc, col("bucket").asc)
    buckets
      .withColumn("rank", row_number().over(w))
      .where(col("rank") > from && col("rank") <= from + sz)
      .select(col("rank"), col("bucket"), col("doc_count"), col("sum_v"))
      .orderBy(col("rank"))
  }

  /** `children` agg (join-field): per parent bucket, metrics computed
    * over the parents' CHILDREN. The child side pre-aggregates per
    * parent key BEFORE the join (partial-agg shrinks the shuffle to
    * one row per parent), then the bucket rollup is a second tiny
    * aggregate — two exchanges, both combine-shrunk, vs the naive
    * join-then-group that shuffles every child row. */
  /** `parent` agg: bucket CHILD docs by a PARENT-side field (the
    * inverse of `children`). Children partial-aggregate on the join
    * key FIRST, so the join shuffles one row per parent key, never the
    * raw child rows; the bucket field then re-aggregates those compact
    * rows. Same two-exchange shape as childrenAgg at any scale. */
  def parentAgg(
      parents: DataFrame, children: DataFrame,
      parentKey: String, childFk: String,
      bucketField: String, childMetric: String): DataFrame = {
    val perParent = children
      .groupBy(col(childFk).as(parentKey))
      .agg(
        count(lit(1)).as("n_children"),
        sum(col(childMetric).cast("decimal(18,4)")).as("m_sum"))
    parents.select(col(parentKey), col(bucketField))
      .join(perParent, Seq(parentKey), "inner")
      .groupBy(col(bucketField).as("key"))
      .agg(
        sum(col("n_children")).as("child_count"),
        Num.round(sum(col("m_sum")).cast("double"), 4).as("metric_sum"))
      .orderBy(col("key").asc)
  }

  /** `geohex_grid`: hexagonal cell bucketing. ES bins into Uber H3
    * cells; H3's icosahedral projection isn't reproducible in a SQL
    * oracle, so graft bins into a flat axial hex lattice over lat/lon
    * (pointy-top, cell size in degrees) — the same operator semantics
    * (equal-area-ish hex buckets, top-k by count) with public hex
    * cube-rounding math. All rounding is floor(x + 0.5): `round()`
    * half-even/half-up behavior differs across engines, floor does
    * not. One partial-aggregating exchange, like the other grids. */
  def geohexGridAgg(
      df: DataFrame, latField: String, lonField: String,
      size: Double, k: Int): DataFrame = {
    val x = col(lonField).cast("double")
    val y = col(latField).cast("double")
    val q = (lit(Sqrt3Over3) * x - y / 3.0) / size
    val r = y * lit(2.0 / 3.0) / size
    val s = -q - r
    val (rq0, rr0, rs0) = (floor(q + 0.5), floor(r + 0.5), floor(s + 0.5))
    val (dq, dr, ds) = (abs(rq0 - q), abs(rr0 - r), abs(rs0 - s))
    val qFix = dq > dr && dq > ds
    val rq = when(qFix, -rr0 - rs0).otherwise(rq0)
    val rr = when(!qFix && dr > ds, -rq0 - rs0).otherwise(rr0)
    val key = concat_ws(",", rq.cast("long"), rr.cast("long"))
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(k)
  }

  /** sqrt(3)/3 as ONE shared double so the Spark plan and any oracle
    * SQL generated from it carry bit-identical constants. */
  val Sqrt3Over3: Double = math.sqrt(3.0) / 3.0

  def childrenAgg(
      parents: DataFrame, children: DataFrame,
      parentKey: String, childFk: String,
      bucketField: String, childMetric: String): DataFrame = {
    val perParent = children
      .groupBy(col(childFk).as(parentKey))
      .agg(
        count(lit(1)).as("n_children"),
        sum(col(childMetric).cast("decimal(18,4)")).as("m_sum"))
    parents
      .join(perParent, Seq(parentKey), "inner")
      .groupBy(col(bucketField).as("key"))
      .agg(
        count(lit(1)).as("parent_count"),
        sum(col("n_children")).as("child_count"),
        Num.round(sum(col("m_sum")).cast("double"), 4).as("metric_sum"))
      .orderBy(col("key").asc)
  }

  /** `random_sampler` agg: deterministic hash sample at `probability`,
    * metrics computed on the sample and scaled back by 1/p — the
    * cheap-estimate agg for interactive dashboards over huge indices.
    * The sampling predicate is the same portable 48-bit md5 uniform
    * used by stratifiedSample, so the oracle reproduces the exact
    * sample (rand() would not be checkable). Map-only filter + one
    * partial agg. */
  def randomSamplerAgg(
      df: DataFrame, idCol: String, probability: Double, metric: String): DataFrame = {
    df.where(Num.uniformHash48(col(idCol)) < probability)
      .agg(
        count(lit(1)).as("sampled_count"),
        floor(count(lit(1)).cast("double") / probability).cast("long").as("est_total"),
        Num.round(avg(col(metric)), 4).as("sample_avg"))
  }

  /** `significant_text` — significant_terms' free-text sibling, with
    * the two behaviors that make it a DIFFERENT agg in ES: the
    * foreground is a SAMPLE of the matching docs (shard_size analog —
    * here a deterministic md5 sample, oracle-reproducible), and
    * duplicate text is filtered before counting
    * (filter_duplicate_text, the near-dup/boilerplate guard). Which
    * row of a duplicate-text group survives is irrelevant: identical
    * text has identical term sets, so the fg counts are deterministic.
    * Background stats come from the FULL corpus, undeduped, like ES. */
  def significantText(
      df: DataFrame,
      idCol: String,
      textField: String,
      pred: Column,
      sampleProb: Double,
      minFgCount: Long,
      k: Int): DataFrame = {
    import graft.analysis.Analyzer
    val fg = df
      .where(pred && Num.uniformHash48(col(idCol)) < sampleProb)
      .withColumn("__dup_key", md5(col(textField)))
      .dropDuplicates("__dup_key")
    val fgTerms = fg.select(explode(Analyzer.termSet(col(textField))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("fg_count"))
    val bgTerms = df.select(explode(Analyzer.termSet(col(textField))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("bg_count"))
    val totals = fg.agg(count(lit(1)).cast("double").as("fg_total"))
      .crossJoin(df.agg(count(lit(1)).cast("double").as("bg_total")))
    fgTerms
      .join(bgTerms, Seq("term"))
      .where(col("fg_count") >= minFgCount)
      .crossJoin(broadcast(totals))
      .select(
        col("term"), col("fg_count"), col("bg_count"),
        Num.round((col("fg_count") / col("fg_total")) *
          log((col("fg_count") / col("fg_total")) /
            (col("bg_count") / col("bg_total"))), 4).as("score"))
      .orderBy(col("score").desc, col("term").asc)
      .limit(k)
  }

  /** `median_absolute_deviation` agg — median(|x - median(x)|), the
    * robust dispersion metric. Two distributed sort-selections (each a
    * range-partitioned sort + boundary pick, no single-reducer
    * percentile); the inner median comes back as ONE driver scalar
    * between the passes. ES itself approximates with TDigest — this is
    * the exact oracle-checkable form, same trade as percentilesAgg. */
  def medianAbsoluteDeviation(df: DataFrame, field: String): DataFrame = {
    val m = percentilesExactDistributed(df, field, Seq("m" -> 0.5))
      .head().getDouble(0)
    val dev = df.select(abs(col(field).cast("double") - lit(m)).as("dev"))
    percentilesExactDistributed(dev, "dev", Seq("mad" -> 0.5))
  }

  /** `t_test` agg (unpaired, Welch) between two filter-defined groups:
    * t = (m1 - m2) / sqrt(s1²/n1 + s2²/n2). One partial-aggregating
    * pass computes both groups' (n, Σx, Σx²) as conditional decimal
    * sums — order-independent across engines — and the scalar t-math
    * happens on the 1-row frame. */
  def tTestAgg(df: DataFrame, field: String, groupA: Column, groupB: Column): DataFrame = {
    val x = col(field).cast("decimal(28,8)")
    // linear sums through decimal (order-independent); squares stay
    // double (decimal*decimal forces a precision-loss rescale that
    // differs between engines) — the t ratio is insensitive to the
    // double-sum's last bits and the output is rounded to 4
    def side(p: Column, tag: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).cast("double").as(s"n$tag"),
      sum(when(p, x).otherwise(lit(0).cast("decimal(28,8)"))).cast("double").as(s"s$tag"),
      sum(when(p, col(field) * col(field)).otherwise(lit(0.0))).as(s"q$tag"))
    val aggs = side(groupA, "1") ++ side(groupB, "2")
    val raw = df.agg(aggs.head, aggs.tail: _*)
    def mean(tag: String) = col(s"s$tag") / col(s"n$tag")
    // sample variance from the moment sums: (Σx² - (Σx)²/n) / (n-1)
    def varS(tag: String) =
      (col(s"q$tag") - col(s"s$tag") * col(s"s$tag") / col(s"n$tag")) / (col(s"n$tag") - 1)
    raw.select(
      col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      Num.round(mean("1"), 4).as("mean1"),
      Num.round(mean("2"), 4).as("mean2"),
      Num.round(
        (mean("1") - mean("2")) / sqrt(varS("1") / col("n1") + varS("2") / col("n2")),
        4).as("t_stat"))
  }

  /** `change_point` pipeline agg (ES ML, 8.x): step-change detection
    * over the parent date_histogram's metric — the same k=2 CUSUM
    * kernel the ES|QL CHANGE_POINT command compiles, run over the
    * tiny bucket frame (heavy work in the partial agg below). */
  def changePointAgg(
      df: DataFrame, tsField: String, interval: String, metric: String): DataFrame =
    graft.dsl.Esql.applyCommand(
      // per-bucket AVG, not the raw sum: cp_stat is n * deviation^2 of
      // the series, and a summed metric at 1e7 magnitudes pushes that
      // past Num.round's long range (the esql command's daily-avg
      // series has the same shape)
      // kilounit scale keeps cp_stat = n * deviation^2 at O(1e4),
      // where round-4 is far inside cross-engine double agreement
      // (the argmax is invariant under uniform scaling)
      bucketFrame(df, tsField, interval, metric)
        .select(col("bucket"),
          Num.round(col("sum_v") / col("doc_count") / 1000.0, 4).as("avg_k")),
      "change_point avg_k on bucket")

  /** t_test `type: homoscedastic` (Student, pooled variance): same
    * one-pass conditional moment sums as [[tTestAgg]], but
    * t = (m1 − m2) / sqrt(sp²(1/n1 + 1/n2)) with the pooled
    * sp² = ((n1−1)v1 + (n2−1)v2) / (n1+n2−2). */
  def tTestHomoAgg(
      df: DataFrame, field: String, groupA: Column, groupB: Column): DataFrame = {
    val x = col(field).cast("decimal(28,8)")
    def side(p: Column, tag: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).cast("double").as(s"n$tag"),
      sum(when(p, x).otherwise(lit(0).cast("decimal(28,8)"))).cast("double").as(s"s$tag"),
      sum(when(p, col(field) * col(field)).otherwise(lit(0.0))).as(s"q$tag"))
    val aggs = side(groupA, "1") ++ side(groupB, "2")
    val raw = df.agg(aggs.head, aggs.tail: _*)
    def mean(tag: String) = col(s"s$tag") / col(s"n$tag")
    def ss(tag: String) =
      col(s"q$tag") - col(s"s$tag") * col(s"s$tag") / col(s"n$tag")
    val sp2 = (ss("1") + ss("2")) / (col("n1") + col("n2") - 2)
    raw.select(
      col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      Num.round(mean("1"), 4).as("mean1"),
      Num.round(mean("2"), 4).as("mean2"),
      Num.round((mean("1") - mean("2")) /
        sqrt(sp2 * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 4).as("t_stat"))
  }

  /** t_test `type: paired` — ES pairs the two fields within one
    * document; the relational analog pairs per `keyField` (each key's
    * deterministic min value per side), keys missing either side
    * drop. One groupBy(key) exchange builds the difference column,
    * then the one-sample t over d: t = mean(d)/(sd(d)/√n), linear
    * sums in decimal / squares in double like the unpaired form. */
  def tTestPairedAgg(
      df: DataFrame, keyField: String, field: String,
      groupA: Column, groupB: Column): DataFrame = {
    val pairs = df
      .groupBy(col(keyField))
      .agg(
        min(when(groupA, col(field))).as("va"),
        min(when(groupB, col(field))).as("vb"))
      .where(col("va").isNotNull && col("vb").isNotNull)
      .withColumn("d", col("va") - col("vb"))
    val raw = pairs.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("d").cast("decimal(28,8)")).cast("double").as("sd_sum"),
      sum(col("d") * col("d")).as("qd"))
    raw.select(
      col("n").cast("long").as("n_pairs"),
      Num.round(col("sd_sum") / col("n"), 4).as("mean_diff"),
      Num.round((col("sd_sum") / col("n")) /
        sqrt(((col("qd") - col("sd_sum") * col("sd_sum") / col("n")) / (col("n") - 1)) / col("n")),
        4).as("t_stat"))
  }

  /** `cumulative_cardinality` pipeline agg: distinct users seen UP TO
    * each date_histogram bucket. Not a windowed count-distinct (that
    * re-scans every prefix): each user contributes once at their
    * FIRST-SEEN bucket (one shuffle on user), then a running sum over
    * the tiny bucket frame — the incremental-cardinality trick that
    * scales to 100 TB of events. `tsBucket` must be a day-granularity
    * date column already derived from event time. */
  def cumulativeCardinality(
      df: DataFrame, userField: String, tsBucket: Column): DataFrame = {
    val firstSeen = df
      .groupBy(col(userField).as("u"))
      .agg(min(tsBucket).as("bucket"))
    val perBucket = firstSeen.groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("bucket"))
  }

  /** `variable_width_histogram` — ES clusters values into `buckets`
    * variable-width buckets; the deterministic (oracle-checkable)
    * analog is equal-depth bucketing on exact quantile edges. Edges
    * come from ONE distributed sort-selection (driver gets
    * buckets-1 scalars), then a map-only CASE bucket key + partial
    * agg — no second sort. Works best over discrete-valued fields
    * where edges are exact (no FP boundary ambiguity). */
  def variableWidthHistogram(df: DataFrame, field: String, buckets: Int): DataFrame = {
    require(buckets >= 2, "variableWidthHistogram needs >= 2 buckets")
    val qs = (1 until buckets).map(i => s"e$i" -> i.toDouble / buckets)
    val edges = percentilesExactDistributed(df, field, qs).head()
    val v = col(field).cast("double")
    val key = (0 until buckets - 1)
      .map(i => when(v >= edges.getDouble(i), 1).otherwise(0))
      .reduce(_ + _)
    df.where(v.isNotNull)
      .groupBy(key.as("bucket"))
      .agg(
        Num.round(min(v), 4).as("min_v"),
        Num.round(max(v), 4).as("max_v"),
        count(lit(1)).as("doc_count"),
        // decimal sum (order-independent) then DOUBLE division — both
        // engines' decimal avg() rounds at different scales
        Num.round(sum(col(field).cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("avg_v"))
      .orderBy(col("bucket"))
  }

  /** `geo_line` agg: per-group polyline of (lat, lon) points ordered
    * by a sort field, truncated to `maxPoints` — the "vessel track"
    * agg. collect_list order is nondeterministic under parallel merge,
    * so points carry their sort key and the array is sorted PER GROUP
    * after collection (group-local, no extra shuffle; arrays are
    * maxPoints-bounded only after slice, so cap group size upstream
    * at true scale). */
  def geoLineAgg(
      df: DataFrame, groupField: String, sortField: String,
      latCol: Column, lonCol: Column, maxPoints: Int): DataFrame = {
    df
      .groupBy(col(groupField).as("key"))
      .agg(collect_list(struct(col(sortField).as("s"),
        format_string("%.4f,%.4f", latCol, lonCol).as("p"))).as("pts"))
      .select(
        col("key"),
        // WKT-ish string, not an array: LINESTRING-style pipe join
        // (array outputs don't survive every downstream compare layer)
        concat_ws("|", slice(transform(array_sort(col("pts")), x => x.getField("p")),
          1, maxPoints)).as("line"),
        least(size(col("pts")), lit(maxPoints)).as("n_points"))
      .orderBy(col("key"))
  }

  /** `percentiles_bucket` pipeline agg: exact percentiles of a sibling
    * aggregation's bucket values. The bucket frame is one row per
    * bucket — tiny at any SF — so the exact interpolated percentile
    * (same math as the oracle's quantile_cont) runs on it directly;
    * the heavy lifting happened in the partial-aggregating groupBy
    * that built the buckets. */
  def percentilesBucket(buckets: DataFrame, valueCol: String): DataFrame =
    buckets.agg(
      Num.round(expr(s"percentile($valueCol, 0.25)"), 4).as("p25"),
      Num.round(expr(s"percentile($valueCol, 0.50)"), 4).as("p50"),
      Num.round(expr(s"percentile($valueCol, 0.75)"), 4).as("p75"))

  /** `moving_percentiles` pipeline agg: rolling exact median over the
    * trailing `window` buckets — again bucket-frame-sized work. */
  def movingPercentiles(
      buckets: DataFrame, keyCol: String, valueCol: String, window: Int): DataFrame =
    buckets
      .withColumn("mov_p50", movingMedianCol(col(valueCol), col(keyCol), window))
      .withColumn(valueCol, Num.round(col(valueCol), 4))
      .orderBy(col(keyCol))

  /** `frequent_item_sets` (ES 8 basket analysis), pairs flavor: for
    * baskets of items, the size-2 itemsets above a support threshold.
    *
    * A-Priori screen FIRST (exact, no result change): a pair with
    * support >= minSupport requires BOTH items to individually appear
    * in >= minSupport baskets, so items below that bar are pruned
    * before pair generation ever sees them — the same downward-closure
    * prune every A-Priori/FP-growth implementation opens with. Then
    * the pruned per-basket sorted sets stream i < j pairs through two
    * nested Generates and one partial-agg count. `maxBasketItems`
    * bounds the quadratic hazard by DROPPING baskets whose post-prune
    * size exceeds the cap (a 10^5-item "basket" is degenerate input,
    * and dropping it whole is deterministic where truncation would
    * need an arbitrary keep-rule); the r18 CollectSetBounded collector
    * enforces the same drop INSIDE the aggregation buffer, so no array
    * over the cap ever materializes (§5). At 100 TB the shuffles carry
    * distinct (basket, item) pairs and AQE handles hot baskets. */
  def frequentItemSets(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketItems: Int = 10000): DataFrame = {
    val items = baskets.select(col(basketCol).as("b"), col(itemCol).as("item"))
    // r18: ONE distinct-pair exchange replaces the r17 basket-keyed
    // collect_set exchange. The r17 form materialized EVERY basket's
    // full item array inside an aggregation buffer before any guard
    // could fire — one degenerate basket (10^7 distinct items) is a
    // 10^7-element array in a single buffer (§5), and its raw rows all
    // funneled through one reducer (§2.5). Distinct (b, item) rows
    // partial-aggregate map-side to the same deduped bytes, spread a
    // hot basket across reducers, and keep every buffer row-sized.
    // Both consumers below share this exchange via ReusedExchange.
    val dist = items.distinct()
    // A-Priori screen: dist has exactly one row per DISTINCT
    // (basket, item), so item_freq is the distinct-basket count
    val freq = dist.groupBy(col("item")).agg(count(lit(1)).as("item_freq"))
      .where(col("item_freq") >= minSupport)
    // prune each basket to frequent items (the post-filter freq frame
    // is tiny — AQE broadcasts the semi join), re-group with the
    // BOUNDED collector: a basket over the cap stops retaining at
    // cap+1 elements and evaluates to NULL — exactly the drop the r17
    // `size(its) <= cap` guard expressed, but the buffer now stays
    // bounded by the cap REGARDLESS of input (§5). Baskets under 2
    // items cannot produce a pair and exit here.
    val pruned = dist
      .join(freq.select(col("item")), Seq("item"), "left_semi")
      .groupBy(col("b"))
      .agg(sort_array(org.apache.spark.sql.GraftBridge.column(
        graft.expr.CollectSetBounded(
          org.apache.spark.sql.GraftBridge.expression(col("item")),
          maxBasketItems).toAggregateExpression())).as("its"))
      .where(col("its").isNotNull && size(col("its")) >= 2)
    // i < j pairs stream out of two nested Generates over the sorted
    // set (item1 < item2 holds because the array is sorted + distinct),
    // then ONE partial-aggregating groupBy counts support — the r16
    // self-join on the basket key (and the window-based size guard) are
    // gone, and pair rows partial-aggregate map-side before the only
    // pair-keyed exchange. The quadratic hazard stays bounded by the
    // same cap that bounded the join.
    pruned
      .select(col("its"), posexplode(col("its")).as(Seq("i", "item1")))
      .select(col("item1"),
        explode(expr("slice(its, i + 2, size(its))")).as("item2"))
      .groupBy("item1", "item2")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .orderBy(col("support").desc, col("item1").asc, col("item2").asc)
  }

  /** `categorize_text` (ES ML agg): cluster semi-structured messages by
    * token pattern — variable tokens (pure numbers) are dropped, the
    * first `maxTokens` surviving tokens form the category key, and
    * categories aggregate doc counts. One tokenize + partial-agg
    * groupBy pass; the category key is bounded (maxTokens tokens), so
    * shuffle rows stay tiny regardless of message length. */
  def categorizeText(
      df: DataFrame,
      text: Column,
      maxTokens: Int = 4,
      minDocCount: Long = 1): DataFrame = {
    import graft.analysis.Analyzer
    df.select(Analyzer.tokens(text).as("toks"))
      .select(array_join(slice(
        filter(col("toks"), t => !t.rlike("^[0-9]+$")), 1, maxTokens), " ")
        .as("category"))
      .where(length(col("category")) > 0)
      .groupBy("category")
      .agg(count(lit(1)).as("doc_count"))
      .where(col("doc_count") >= minDocCount)
      .orderBy(col("doc_count").desc, col("category").asc)
  }

  /** `geo_bounds`: the tightest lat/lon envelope per bucket — one
    * partial-agg pass (min/max combine associatively, so the 100 TB
    * cost is one map-combined exchange of 4 doubles per group). */
  def geoBounds(df: DataFrame, groupField: String,
      latField: String, lonField: String): DataFrame =
    df.groupBy(col(groupField).as("key"))
      .agg(
        Num.round(max(col(latField)), 4).as("top"),
        Num.round(min(col(lonField)), 4).as("left"),
        Num.round(min(col(latField)), 4).as("bottom"),
        Num.round(max(col(lonField)), 4).as("right"),
        count(lit(1)).as("doc_count"))
      .orderBy(col("key").asc)

  /** `cartesian_bounds` + `cartesian_centroid` (ES 8.6): the planar
    * twins of geo_bounds/geo_centroid over `point`/`shape` x/y
    * fields — pure min/max/avg per group, ONE partial-aggregated
    * exchange (graft's geo casts never used spherical math for
    * bounds either, so this is the same shape on unprojected
    * coordinates). */
  def cartesianBoundsCentroid(df: DataFrame, groupField: String,
      xField: String, yField: String): DataFrame =
    df.groupBy(col(groupField).as("key"))
      .agg(
        Num.round(min(col(xField)), 4).as("min_x"),
        Num.round(max(col(xField)), 4).as("max_x"),
        Num.round(min(col(yField)), 4).as("min_y"),
        Num.round(max(col(yField)), 4).as("max_y"),
        Num.round(avg(col(xField)), 4).as("centroid_x"),
        Num.round(avg(col(yField)), 4).as("centroid_y"),
        count(lit(1)).as("doc_count"))
      .orderBy(col("key").asc)

  /** `scripted_metric`: the map script is a Painless expression
    * compiled ONCE on the driver to codegen'd Column math
    * (graft.dsl.Painless); combine/reduce is an associative sum, so
    * the whole agg is one partial-aggregating groupBy — a scripted
    * metric costs the same as a built-in sum at any scale (no
    * interpreter runs per row, unlike ES's per-shard script loop).
    * Decimal accumulation for order-independent determinism. */
  def scriptedMetric(df: DataFrame, groupField: String,
      mapScript: String, params: Map[String, Any] = Map.empty): DataFrame =
    df.groupBy(col(groupField).as("key"))
      .agg(
        Num.round(sum(graft.dsl.Painless.compile(mapScript, params)
          .cast("decimal(28,8)")).cast("double"), 4).as("value"),
        count(lit(1)).as("doc_count"))
      .orderBy(col("key").asc)

  /** Dotted-quad IPv4 -> numeric value — ES's `ip` field stores and
    * compares IPs numerically; split + element_at casts stay inside
    * whole-stage codegen (no HOF). */
  def ipValue(ip: Column): Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** `ip_range` agg: ES bucket rule is from-inclusive / to-EXCLUSIVE
    * (same as its numeric `range`), unbounded sides open. One scan, N
    * conditional counts — no per-range passes and no shuffle beyond
    * the single 1-row aggregate, like the `filters` agg. */
  def ipRange(df: DataFrame, ipCol: String,
      ranges: Seq[(String, Option[String], Option[String])]): DataFrame = {
    def ipLit(s: String): Long = {
      val o = s.split('.')
      require(o.length == 4, s"bad ipv4 literal: $s")
      o(0).toLong * 16777216L + o(1).toLong * 65536L + o(2).toLong * 256L + o(3).toLong
    }
    val v = ipValue(col(ipCol))
    val counts = ranges.map { case (key, from, to) =>
      val pred = (from.map(f => v >= ipLit(f)) ++ to.map(t => v < ipLit(t)))
        .reduceOption(_ && _).getOrElse(lit(true))
      sum(when(pred, 1L).otherwise(0L)).as(key)
    }
    val row = df.agg(counts.head, counts.tail: _*)
    // unpivot the 1-row frame to ES's (key, doc_count) bucket list —
    // stack on one already-aggregated row, zero extra scans
    row.select(expr(
      s"stack(${ranges.size}, " +
        ranges.map { case (k, _, _) => s"'$k', `$k`" }.mkString(", ") +
        ") as (key, doc_count)"))
  }

  /** `ip_prefix` agg (ES 8.2): buckets keyed by the /n network of each
    * address. The mask is integer math on the numeric value; the key
    * renders back to dotted-quad + "/n". One hash aggregation. */
  def ipPrefix(df: DataFrame, ipCol: String, prefixLength: Int): DataFrame = {
    require(prefixLength >= 0 && prefixLength <= 32, s"bad prefix_length: $prefixLength")
    val block = 1L << (32 - prefixLength)
    val net = (ipValue(col(ipCol)) / block).cast("long") * block
    // ES orders ip_prefix buckets by NUMERIC network value — the
    // dotted-quad string is only the rendered key (10.2/16 sorts
    // before 10.10/16, the lexical order would not)
    df.groupBy(net.as("net"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("net").asc)
      .select(
        concat(
          concat_ws(".",
            (col("net") / 16777216L % 256L).cast("long"),
            (col("net") / 65536L % 256L).cast("long"),
            (col("net") / 256L % 256L).cast("long"),
            (col("net") % 256L).cast("long")),
          lit(s"/$prefixLength")).as("key"),
        col("doc_count"))
  }
}
