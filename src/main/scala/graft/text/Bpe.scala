package graft.text

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token counting — real-trainer token budgets for
  * §F's fertility / packing / mixing operators (the `q_tokens` regex
  * heuristic approximates them; this counts with an actual BPE merge
  * table, the GPT-2 tokenizer family's mechanism).
  *
  * TRAINING (`fit`) is the public greedy algorithm (Sennrich et al.
  * 2016): iterate — count adjacent symbol pairs over the word-
  * frequency dictionary, merge the most frequent (count desc, pair
  * asc tie-break), repeat. Like every real BPE trainer (subword-nmt,
  * GPT-2), training runs over the WORD-COUNT dictionary, not the
  * corpus: the only cluster work is one token-frequency aggregation,
  * truncated to the top `maxWords` words BEFORE the bounded collect
  * (same contract as the DSIR/kmeans fits); the merge loop is
  * driver-side over that dictionary and deterministic.
  *
  * APPLY (`tokenCount`) is pure codegen'd Column ops — no UDF: each
  * word becomes a comma-delimited symbol string (",h,e,l,l,o,"), and
  * the ranked merges fold as a chain of LITERAL `replace` calls
  * (",a,b," -> ",ab,"). Literal replace is left-to-right and
  * non-overlapping with IDENTICAL semantics in Spark and DuckDB, so
  * the oracle mirrors the chain exactly. Two documented deltas vs
  * canonical lowest-rank-first BPE apply: merges apply in rank order
  * sequentially (the common fast path; results differ only when a
  * later merge could pre-empt an earlier one mid-word), and a run of
  * the same pair ("a a a a") merges alternately because the shared
  * delimiter is consumed — both deterministic and engine-identical,
  * which is what an oracle-checked token BUDGET needs. */
object Bpe {

  /** A PRE-COMPUTED merge table: the output of `fit(documents, "text",
    * 32)` over the synthetic corpus, frozen as the default so token
    * budgets are stable config rather than per-run fits (exactly how
    * a real pipeline ships its tokenizer's merges file — GPT-2's
    * `merges.txt` is this artifact at 50k entries). Regenerate with
    * `Bpe.fit` if the vocabulary domain changes; the oracle SQL is
    * BUILT from this constant, so both engines always count under the
    * same table. */
  val PretrainedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"))

  /** Greedy BPE fit over the corpus token dictionary. Returns ranked
    * merges (highest-count first). Symbols stay within the analyzer's
    * [a-z0-9] alphabet — asserted, since they are spliced into
    * replace literals and SQL. */
  def fit(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    val wordFreq: Seq[(String, Long)] = docs
      .select(explode(Analyzer.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(wordFreq.forall(_._1.matches("[a-z0-9]+")),
      "BPE symbols must stay in the analyzer alphabet")
    var vocab: Seq[(Array[String], Long)] =
      wordFreq.map { case (w, n) => (w.split("").filter(_.nonEmpty), n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, n) => (applyMerge(syms, best), n) }
      }
    }
    merges.toSeq
  }

  /** DISTRIBUTED BPE trainer — the `pqFitCodebooksDist` of
    * tokenizers: when the word dictionary itself is too large to
    * collect (byte-level vocabularies, no-whitespace scripts, or a
    * maxWords budget past driver memory), the greedy fit becomes one
    * Spark job per merge. The vocabulary frame (symbol array, count)
    * stays on the cluster; each round explodes adjacent symbol pairs,
    * partial-aggregates the weighted pair counts, and collects
    * exactly ONE row — the argmax pair under the same count-desc /
    * pair-asc tie-break as `fit`, so both trainers emit the SAME
    * merge sequence on the same corpus (spec-pinned). The merge then
    * applies cluster-side with `applyMerge`'s left-to-right
    * non-overlap, and each round's vocabulary goes through
    * `Stages.truncate` (reliable checkpoint on a cluster, eager
    * localCheckpoint in local mode) so round N never recomputes
    * rounds 1..N-1 and superseded rounds' blocks are ContextCleaner-
    * collected as the binding goes out of scope. Only the merge
    * table ever reaches the driver. */
  def fitDist(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Stage-truncate per round (Stages.truncate — reliable checkpoint
    // on a cluster, eager localCheckpoint locally), not persist: the
    // fit is iterative, and a lineage that accretes one map per merge
    // makes round N's plan O(N) deep — Catalyst re-analysis across 32
    // rounds is what blows up (driver time and heap), not the data.
    // Truncating to a leaf each round keeps every round the same
    // cost, and on a cluster the reliable blocks survive executor
    // loss mid-fit. (Dedup's CC loop, same recipe.)
    def truncate(ds: org.apache.spark.sql.Dataset[(Array[String], Long)]) =
      graft.util.Stages.truncate(ds.toDF("syms", "n"))
        .select(col("syms").as[Array[String]], col("n").as[Long])
    var vocab = truncate(docs
      .select(explode(Analyzer.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)]
      .map { case (w, n) => (w.split("").filter(_.nonEmpty), n) })
    require(vocab.filter(v => !v._1.forall(_.matches("[a-z0-9]"))).isEmpty,
      "BPE symbols must stay in the analyzer alphabet")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // r18 iteration diet (the PageRank treatment): the r17 loop ran
    // TWO jobs per merge — the argmax collect plus an eager truncate
    // that re-materialized the whole vocabulary every round. Pending
    // merges now ride INTO the argmax job as one driver-side fold
    // (one map node regardless of how many are pending, so lineage
    // depth never grows), and the vocabulary re-materializes only
    // every `truncateEvery` rounds to bound the re-applied work.
    // Jobs/merge: 2 -> ~1.13; identical merge sequence (applyMerge is
    // per-word deterministic, fold order = merge order).
    val truncateEvery = 8
    var pending = List.empty[(String, String)]
    def current = {
      val ms = pending
      if (ms.isEmpty) vocab
      else vocab.map { case (syms, n) => (ms.foldLeft(syms)(applyMerge), n) }
    }
    var continue = true
    while (merges.size < nMerges && continue) {
      val best = current.flatMap { case (syms, n) =>
        (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), n))
      }.toDF("a", "b", "n")
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) continue = false
      else {
        val m = (best(0).getString(0), best(0).getString(1))
        merges += m
        pending = pending :+ m
        if (pending.size >= truncateEvery) {
          vocab = truncate(current)
          pending = Nil
        }
      }
    }
    merges.toSeq
  }

  /** One merge pass, left-to-right non-overlapping — the same
    * semantics as the literal replace chain the Column path uses. */
  private def applyMerge(syms: Array[String], m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** BPE token count of a text column under `merges` — the compiled
    * BpeTokenCount kernel: one pass per row, merge table shipped as a
    * codegen reference, so trainer-sized tables (hundreds/thousands
    * of merges) cost a loop, not a 2·|merges|-deep expression tree.
    * Bit-identical to `tokenCountChain` (spec-pinned), which is what
    * the DuckDB oracle mirrors. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expr.BpeTokenCount(
      org.apache.spark.sql.GraftBridge.expression(text),
      merges.map(_._1), merges.map(_._2)))

  /** The declarative form of `tokenCount`: analyzed words to
    * comma-delimited symbol strings, the ranked literal-replace chain,
    * symbols-per-word summed. Kept as the kernel's reference
    * semantics (and the shape the oracle SQL mirrors); the kernel
    * must stay bit-equal to it. */
  private[graft] def tokenCountChain(text: Column, merges: Seq[(String, String)]): Column = {
    def rep(s: Column, find: String, to: String): Column =
      call_function("replace", s, lit(find), lit(to))
    val counts = transform(Analyzer.tokens(text), w => {
      val sym0 = concat(lit(","), regexp_replace(w, "(.)", "$1,"))
      val folded = merges.foldLeft(sym0) { case (s, (a, b)) =>
        rep(s, s",$a,$b,", s",$a$b,")
      }
      (length(folded) - length(rep(folded, ",", "")) - 1).cast("long")
    })
    aggregate(counts, lit(0L), (acc, c) => acc + c)
  }

  /** The DuckDB mirror of `tokenCount` for oracle SQL: the same chain
    * over a word expression, as a SQL string. */
  def tokenCountSql(wordExpr: String, merges: Seq[(String, String)]): String = {
    val sym0 = s"',' || regexp_replace($wordExpr, '(.)', '\\1,', 'g')"
    val folded = merges.foldLeft(sym0) { case (s, (a, b)) =>
      s"replace($s, ',$a,$b,', ',$a$b,')"
    }
    s"(len($folded) - len(replace($folded, ',', '')) - 1)"
  }
}
