package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ES "standard analyzer" re-expressed as Catalyst columns:
  * lowercase + split on non-alphanumeric runs. Tokenization happens
  * per-row (narrow, no shuffle) and is shared by match queries, BM25,
  * dedup shingling and the text-analysis operators, so Spark computes it
  * once per plan subtree via subexpression elimination.
  *
  * The exact pattern is mirrored verbatim by the DuckDB oracle SQL
  * (`regexp_split_to_array(lower(x), '[^a-z0-9]+')`) — keep them in sync.
  */
object Analyzer {
  val TokenSplit = "[^a-z0-9]+"

  /** Ordered token array of an analyzed text field. Native compiled
    * kernel (graft.expr.Tokenize): identical values to
    * `filter(split(lower(x), TokenSplit), len > 0)`, but the filter
    * HOF is CodegenFallback — interpreted under every text operator —
    * while this is one compiled byte scan. */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.Tokenize(org.apache.spark.sql.GraftBridge.expression(text)))

  /** Distinct terms of a document (set semantics, order unspecified —
    * only ever used under set ops / aggregation). */
  def termSet(text: Column): Column = array_distinct(tokens(text))

  /** Tokenize a query string at plan time (driver side, it's a literal). */
  def analyze(query: String): Seq[String] =
    query.toLowerCase.split(TokenSplit).filter(_.nonEmpty).toSeq

  /** `_analyze` API analog: the token stream of one text with
    * positions and character offsets — ES's analysis-debugging
    * endpoint. Single-string diagnostic, computed driver-side. */
  def analyzeApi(spark: org.apache.spark.sql.SparkSession, text: String)
      : org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.Row]
    val lower = text.toLowerCase
    // the SAME character class as TokenSplit ([a-z0-9]) — non-ascii
    // letters are separators here exactly as in the column tokenizer
    def tokenChar(c: Char) = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    var i = 0
    var pos = 0
    while (i < lower.length) {
      if (tokenChar(lower.charAt(i))) {
        val start = i
        while (i < lower.length && tokenChar(lower.charAt(i))) i += 1
        rows += org.apache.spark.sql.Row(
          lower.substring(start, i), pos, start, i)
        pos += 1
      } else i += 1
    }
    spark.createDataFrame(rows.toList.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("position",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("start_offset",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("end_offset",
          org.apache.spark.sql.types.IntegerType))))
  }

  /** The classic English stopword set (the 33-word list shipped as the
    * default of Lucene/ES `stop` filter — public knowledge). */
  val EnglishStop: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Configurable analysis chain over an already-tokenized column:
    * stop filter -> stemmer -> edge_ngram, each optional, one compiled
    * pass (AnalyzeChain kernel). `stemmer` is "" (none),
    * "minimal_english" or "porter". */
  def chain(
      toks: Column,
      stop: Seq[String] = Nil,
      stemmer: String = "",
      edge: Option[(Int, Int)] = None): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.AnalyzeChain(
        org.apache.spark.sql.GraftBridge.expression(toks),
        stop, stemmer, edge.map(_._1).getOrElse(0), edge.map(_._2).getOrElse(0)))

  /** Full chain from a raw text column: tokenize + chain. */
  def chainText(
      text: Column,
      stop: Seq[String] = Nil,
      stemmer: String = "",
      edge: Option[(Int, Int)] = None): Column =
    chain(tokens(text), stop, stemmer, edge)

  /** Driver-side query analysis through the same chain (no edge_ngram:
    * query terms match against the expanded index, ES
    * search_analyzer-style). */
  def analyzeChain(
      query: String,
      stop: Seq[String] = Nil,
      stemmer: String = ""): Seq[String] = {
    val stopSet = stop.toSet
    val stem: String => String =
      if (stemmer.isEmpty) identity else Stemmers(stemmer)
    analyze(query).filterNot(stopSet).map(stem)
  }

  /** `asciifolding` filter (the high-frequency Latin-1 accent subset):
    * one translate pass, applied BEFORE tokenization — the standard
    * tokenizer treats accented letters as separators, so folding must
    * come first to keep 'mérgé' one token. The map is data; ES's full
    * filter covers more planes, extend in place. */
  val FoldFrom = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
  val FoldTo = "aaaaaaceeeeiiiinooooouuuuyy"
  def asciiFold(text: Column): Column = translate(text, FoldFrom, FoldTo)

  /** The html_strip entity table, ORDER-SENSITIVE: `&amp;` LAST so
    * `&amp;lt;` ends as the literal `&lt;`, not a spurious `<` (the
    * double-unescape bug). ONE definition — the Column filter below,
    * the executor-side WET extraction (Warc.stripHtml) and the
    * q_warc / q_wet oracle SQL must all agree, so extending the
    * set here is the single edit point. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** `html_strip` char filter: tags become spaces, then the entity
    * table decodes in order. */
  def htmlStrip(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    HtmlEntities.foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
  }

  /** ES `shingle` token filter: unigrams (when `outputUnigrams`) plus
    * word n-grams for every n in `minN..maxN`, space-joined. Uses the
    * compiled TokenShingles kernel per n — static n keeps the loop in
    * whole-stage codegen. Delta vs ES (documented): shingles emit
    * DISTINCT per n and grouped by size, not interleaved in position
    * order — downstream term/overlap semantics are unaffected. */
  def shingleFilter(
      toks: Column, minN: Int = 2, maxN: Int = 2,
      outputUnigrams: Boolean = true): Column = {
    require(minN >= 2 && maxN >= minN, s"bad shingle bounds: $minN..$maxN")
    val grams = (minN to maxN).map(n => shingles(toks, n))
    val all = if (outputUnigrams) toks +: grams else grams
    concat(all: _*)
  }

  /** ES `length` token filter: keep tokens with `min <= len <= max`. */
  def lengthFilter(toks: Column, min: Int, max: Int): Column =
    filter(toks, t => length(t) >= min && length(t) <= max)

  /** ES `truncate` token filter: cap every token at `len` chars. */
  def truncateFilter(toks: Column, len: Int): Column =
    transform(toks, t => substring(t, 1, len))

  /** ES `unique` token filter: order-preserving dedup of the stream. */
  def uniqueFilter(toks: Column): Column = array_distinct(toks)

  /** ES `pattern_replace` CHAR filter: regex rewrite of the raw text
    * before tokenization (Java regex on both engines' [a-z0-9]
    * streams). */
  def patternReplace(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** Token 3-gram shingles over an ordered token array: the unit used by
    * MinHash / n-gram-Jaccard dedup. Narrow per-row transform. */
  def shingles(toks: Column, n: Int = 3): Column = {
    require(n >= 1)
    // native Catalyst expression (graft.expr.TokenShingles): the HOF
    // formulation (array_distinct over transform/concat_ws) is
    // interpreted per node and ~50x slower on long documents.
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.TokenShingles(org.apache.spark.sql.GraftBridge.expression(toks), n))
  }
}
