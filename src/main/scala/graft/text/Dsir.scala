package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.expr.DsirScoreSum
import graft.util.Num

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169), the published recipe for picking raw-corpus
  * documents whose hashed n-gram distribution matches a small TARGET
  * corpus (the GPT-3/The Pile "looks like Wikipedia+books" filter,
  * generalized).
  *
  * Shape at scale: features are unigram+bigram hashes bucketed to
  * `buckets` (the paper's hashed feature map), so the fitted model is
  * ≤ `buckets` rows — ONE partial-aggregated exchange over the
  * exploded feature stream builds it, and the ≤4096-long dense
  * log-ratio table collects to the driver (`fitBucketModel`, a
  * bounded collect like the IVF centroids). Scoring is then MAP-ONLY:
  * the table rides into a compiled DsirScoreSum kernel as a codegen
  * reference object, so the per-doc weight is one narrow pass — no
  * explode, no join, no exchange (the fit-and-score-in-one-call form
  * used to pay a second full corpus explode for scoring). A fitted
  * model reuses across scoring and resampling calls for free
  * (`weightsWithModel`), the fix for the fit-per-query cost when
  * several keys share one target.
  *
  * Determinism: bucket hashing and the resampling Gumbel draw use
  * the shared md5-48 construction (Num.uniformHash48), and the
  * per-doc sum folds 4-dp-scaled longs (the decimal(18,4) unscaled
  * values — exact integer math), so the DuckDB oracle replays the
  * whole pipeline bit-for-bit. */
object Dsir {

  /** A raw n-gram hashed into [0, buckets) — the integer form of the
    * md5-48 draw every sampling operator shares. */
  def featureBucket(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g), 1, 12), 16, 10).cast("long"), lit(buckets.toLong))

  /** The paper's feature stream: analyzer unigrams + space-joined
    * bigrams (counts, not presence — multiplicity matters to the
    * bag-of-ngrams model). */
  def ngrams(textCol: Column): Column = {
    val toks = Analyzer.tokens(textCol)
    val bis = transform(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      (t, i) => concat(t, lit(" "), element_at(toks, i + 2)))
    concat(toks, bis)
  }

  /** Fit the hashed-ngram bucket model for the in-corpus form (the
    * target IS a predicate over the raw corpus): BOTH Laplace models
    * in ONE explode pass — a conditional count beside the raw count in
    * the same partial aggregation — then the dense 4-dp-SCALED
    * log-ratio table
    *   logr(b) = log((tc_b+1)/(tt+B)) - log((rc_b+1)/(tr+B))
    * as `buckets` longs (decimal(18,4) unscaled values; unseen buckets
    * get the both-zero smoothed ratio, which in-corpus scoring never
    * probes). The collect is bounded by `buckets` (≤4096 rows) — the
    * IVF-centroid pattern, not a corpus materialization — and the
    * driver math mirrors the column expressions exactly
    * (Num.roundDouble = Num.round; BigDecimal.valueOf = the
    * double->decimal(18,4) cast). */
  def fitBucketModel(raw: DataFrame, targetPred: Column,
      idCol: String, textCol: String, buckets: Int): Array[Long] = {
    val counts = graft.util.Stages.fanOut(raw)
      .select(targetPred.as("__tgt"), explode(ngrams(col(textCol))).as("g"))
      .select(col("__tgt"), featureBucket(col("g"), buckets).as("b"))
      .groupBy("b").agg(
        count(lit(1)).as("rc"),
        count(when(col("__tgt"), lit(1))).as("tc"))
      .collect()
    modelFromCounts(counts.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))), buckets)
  }

  /** The two-corpus form of the fit: separate raw/target frames, each
    * one explode + one bounded collect. */
  def fitBucketModel(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int): Array[Long] = {
    def counts(df: DataFrame) = df
      .select(explode(ngrams(col(textCol))).as("g"))
      .select(featureBucket(col("g"), buckets).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rc = counts(raw)
    val tc = counts(target)
    val merged = (rc.keySet ++ tc.keySet).toArray.map(b =>
      (b, rc.getOrElse(b, 0L), tc.getOrElse(b, 0L)))
    modelFromCounts(merged, buckets)
  }

  private def modelFromCounts(
      counts: Array[(Long, Long, Long)], buckets: Int): Array[Long] = {
    val tr = counts.iterator.map(_._2).sum
    val tt = counts.iterator.map(_._3).sum
    // exact mirror of the column pipeline the model replaces:
    // Num.round(log(..) - log(..), 4).cast("decimal(18,4)") — the cast
    // is BigDecimal.valueOf(double).setScale(4, HALF_UP)
    def scaled(rc: Long, tc: Long): Long = java.math.BigDecimal
      .valueOf(Num.roundDouble(
        math.log((tc + 1).toDouble / (tt + buckets).toDouble) -
          math.log((rc + 1).toDouble / (tr + buckets).toDouble), 4))
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
    val model = Array.fill(buckets)(scaled(0L, 0L))
    counts.foreach { case (b, rc, tc) => model(b.toInt) = scaled(rc, tc) }
    model
  }

  /** Score against a fitted model: per-doc
    * λ(x) = Σ_features logr(bucket(g)) via the compiled DsirScoreSum
    * kernel — one narrow pass, no exchange. Docs with an empty feature
    * stream produce no row (the explode form's semantics). Output:
    * (idCol, log_weight). */
  def weightsWithModel(raw: DataFrame, model: Seq[Long],
      idCol: String, textCol: String): DataFrame = {
    val ng = ngrams(col(textCol))
    val sumScaled = GraftBridge.column(
      DsirScoreSum(GraftBridge.expression(ng), model))
    // the scoring pass hashes every feature n-gram of every doc — fan
    // the tiny-input case out so the kernel isn't pinned to the 1-2
    // splits a single-row-group corpus file scans as
    graft.util.Stages.fanOut(raw)
      .where(size(ng) > 0)
      .select(col(idCol),
        (sumScaled.cast("double") / 10000.0).as("log_weight"))
  }

  /** Per-doc log importance weight, two-corpus form: fit on target +
    * raw, then the map-only scoring pass. Output: (idCol, log_weight). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame =
    weightsWithModel(
      raw, fitBucketModel(raw, target, idCol, textCol, buckets),
      idCol, textCol)

  /** The common in-corpus form: the target IS a predicate over the
    * raw corpus (docs.where(looksLikeWikipedia)). One fit explode +
    * one map-only scoring pass; identical math to the two-frame
    * overload. */
  def importanceWeights(raw: DataFrame, targetPred: Column,
      idCol: String, textCol: String, buckets: Int): DataFrame =
    weightsWithModel(
      raw, fitBucketModel(raw, targetPred, idCol, textCol, buckets),
      idCol, textCol)

  /** Gumbel top-k — the paper's sampling-without-replacement trick:
    * key = λ(x) + Gumbel(u), keep the k largest. The uniform u is the
    * DETERMINISTIC seeded md5-48 draw (rand() would be irreproducible
    * across retries and engines). One TakeOrderedAndProject. */
  def resampleTopK(weights: DataFrame, idCol: String, k: Int,
      seed: String = "dsir"): DataFrame = {
    val u = greatest(
      Num.uniformHash48(concat(lit(seed + ":"), col(idCol).cast("string"))),
      lit(1e-12))
    weights
      .withColumn("g_key", Num.round(col("log_weight") - log(-log(u)), 4))
      .orderBy(col("g_key").desc, col(idCol).asc)
      .limit(k)
  }
}
