package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.util.Num

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169), the published recipe for picking raw-corpus
  * documents whose hashed n-gram distribution matches a small TARGET
  * corpus (the GPT-3/The Pile "looks like Wikipedia+books" filter,
  * generalized).
  *
  * Shape at scale: features are unigram+bigram hashes bucketed to
  * `buckets` (the paper's hashed feature map), so the two model
  * frames are ≤ `buckets` rows each — one partial-aggregated
  * exchange over the exploded feature stream builds them, the
  * log-ratio table BROADCASTS to the per-doc scoring join, and the
  * per-doc sum partial-aggregates to an exchange of ~N rows. Nothing
  * ever shuffles the raw N×features stream unaggregated, and there
  * is no driver-side model state at all — both "fit" and "score"
  * stay declarative.
  *
  * Determinism: bucket hashing and the resampling Gumbel draw use
  * the shared md5-48 construction (Num.uniformHash48), and the
  * per-doc sum folds 4-dp decimals, so the DuckDB oracle replays the
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

  /** Per-doc log importance weight
    * λ(x) = Σ_features log(p̂_target(b)/p̂_raw(b)) with Laplace-smoothed
    * bucket unigram models fit on the target and raw corpora.
    * Output: (idCol, log_weight). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame = {
    def features(df: DataFrame) =
      df.select(col(idCol).as("id"), explode(ngrams(col(textCol))).as("g"))
        .select(col("id"), featureBucket(col("g"), buckets).as("b"))
    val rawF = features(raw)
    val tgtC = features(target).groupBy("b").agg(count(lit(1)).as("tc"))
    val rawC = rawF.groupBy("b").agg(count(lit(1)).as("rc"))
    weightsFrom(rawF, rawC, tgtC, idCol, buckets)
  }

  /** The common in-corpus form: the target IS a predicate over the
    * raw corpus (docs.where(looksLikeWikipedia)). Both models then fit
    * in ONE explode pass — a conditional count beside the raw count in
    * the same partial aggregation — instead of a second scan+explode
    * of the target slice. Identical math to the two-frame overload. */
  def importanceWeights(raw: DataFrame, targetPred: Column,
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    val rawF = raw
      .select(col(idCol).as("id"), targetPred.as("__tgt"),
        explode(ngrams(col(textCol))).as("g"))
      .select(col("id"), col("__tgt"), featureBucket(col("g"), buckets).as("b"))
    // BOTH models in one partial-aggregated pass; persist the
    // ≤`buckets`-row result so totals + log-ratios derive from the
    // cached model instead of re-exploding the corpus per reference
    // (each un-cached reference would be another full explode pass)
    val both = rawF.groupBy("b").agg(
      count(lit(1)).as("rc"),
      count(when(col("__tgt"), lit(1))).as("tc")).persist()
    val totals = both.agg(sum("rc").as("tr"), sum("tc").as("tt"))
    val ratio = both.crossJoin(broadcast(totals))
      .select(col("b"),
        Num.round(
          log((col("tc") + 1).cast("double") / (col("tt") + buckets).cast("double")) -
            log((col("rc") + 1).cast("double") / (col("tr") + buckets).cast("double")), 4)
          .cast("decimal(18,4)").as("logr"))
    rawF.drop("__tgt").join(broadcast(ratio), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("logr")).cast("double").as("log_weight"))
      .withColumnRenamed("id", idCol)
  }

  private def weightsFrom(rawF: DataFrame, rawC: DataFrame, tgtC: DataFrame,
      idCol: String, buckets: Int): DataFrame = {
    // feature-count totals as a 1-row frame (plan-only — no collect)
    val totals = tgtC.agg(sum("tc").as("tt")).crossJoin(rawC.agg(sum("rc").as("tr")))
    // 4-dp-decimal log-ratios keep the per-doc sum order-free exact
    val ratio = rawC.join(tgtC, Seq("b"), "full_outer")
      .na.fill(0L, Seq("tc", "rc"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        Num.round(
          log((col("tc") + 1).cast("double") / (col("tt") + buckets).cast("double")) -
            log((col("rc") + 1).cast("double") / (col("tr") + buckets).cast("double")), 4)
          .cast("decimal(18,4)").as("logr"))
    rawF.join(broadcast(ratio), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("logr")).cast("double").as("log_weight"))
      .withColumnRenamed("id", idCol)
  }

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
