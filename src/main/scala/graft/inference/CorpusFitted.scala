package graft.inference

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A REAL (non-stub) reference implementation of the inference seam,
  * FIT from a corpus — proof that `Inference.service`'s swap contract
  * holds with an actual model, not only with the deterministic stub.
  * This container ships no neural runtime (no ONNX/torch and no
  * network), so the reference model is classical-statistical, which
  * is honest and still a genuine model: every output derives from
  * parameters LEARNED in a fit pass over data, not from hardcoded
  * behavior.
  *
  *  - `expandQuery` — IDF-weighted sparse expansion (the (term,
  *    weight) shape ELSER emits), augmented with each query term's
  *    most likely successor from a fitted bigram table (related-term
  *    expansion, damped weight).
  *  - `rerankScore` — TF-IDF relevance: Σ idf(t)·tf(t, doc) over the
  *    expanded query, computed by the compiled SparseTfDot kernel.
  *  - `complete` — greedy decoding from the fitted bigram language
  *    model, expressed as pure Column ops (a map literal chains
  *    argmax-successor lookups), so generation runs codegen'd per row
  *    with no UDF.
  *  - `decoder` — a real container-format parser: PNG/GIF/JPEG
  *    headers to "fmt WxH" metadata (actual byte decoding, unlike the
  *    stub's md5).
  *
  * Scale shape of the fit: df and bigram counts are partial-agged
  * exchanges over (token) / (w1, w2) rows, both truncated to bounded
  * tops (`maxVocab` / `maxTransitions` rows) BEFORE the collect —
  * the same bounded-model-collect contract as the DSIR fit. The
  * fitted maps ship inside task closures like any broadcast model
  * file.
  */
final case class CorpusFittedService(
    idf: Map[String, Double],
    defaultIdf: Double,
    nextTok: Map[String, String],
    genSteps: Int) extends InferenceService {

  def expandQuery(query: String): Seq[(String, Double)] = {
    val terms = Analyzer.analyze(query).distinct
    val literal = terms.map(t => t -> idf.getOrElse(t, defaultIdf))
    // related-term expansion: the fitted bigram argmax successor of
    // each query term, damped — ELSER's "semantically adjacent tokens
    // at lower weight" shape
    val related = terms.flatMap(t =>
      nextTok.get(t).filterNot(terms.contains)
        .map(n => n -> 0.3 * idf.getOrElse(n, defaultIdf)))
    (literal ++ related)
      .groupBy(_._1).map { case (t, ws) => t -> ws.map(_._2).max }
      .toSeq.sortBy { case (t, w) => (-w, t) }
  }

  def rerankScore(query: String, text: Column): Column = {
    val exp = expandQuery(query)
    org.apache.spark.sql.GraftBridge.column(graft.expr.SparseTfDot(
      org.apache.spark.sql.GraftBridge.expression(Analyzer.tokens(text)),
      exp.map(_._1), exp.map(_._2)))
  }

  def complete(prompt: Column): Column = {
    if (nextTok.isEmpty) return lit("")
    val m = map_from_arrays(
      lit(nextTok.keys.toArray), lit(nextTok.values.toArray))
    // greedy decode: seed = the prompt's last token, then genSteps
    // argmax-successor lookups; a token with no fitted successor maps
    // to null and concat_ws drops the tail (natural end-of-sequence)
    var cur = element_at(Analyzer.tokens(prompt.cast("string")), -1)
    val out = (1 to genSteps).map { _ =>
      cur = element_at(m, cur); cur
    }
    concat_ws(" ", out: _*)
  }

  def decoder(): Array[Byte] => String = CorpusFittedService.parseMedia

  /** Classical dense embedding: feature-hashed TF-IDF (the hashing
    * trick) — each token lands in a signed md5 bucket weighted by its
    * FITTED idf, mean-pooled to 32 dims. Fully learned weights, no
    * neural runtime; the neural sibling is NeuralWordVecService. */
  def embed(text: String): Seq[Double] = {
    val dim = 32
    val toks = Analyzer.analyze(text)
    if (toks.isEmpty) return Seq.fill(dim)(0.0)
    val acc = new Array[Double](dim)
    val digest = java.security.MessageDigest.getInstance("MD5")
    toks.foreach { t =>
      val h = digest.digest(t.getBytes("UTF-8"))
      val bucket = ((h(0) & 0x7f) << 8 | (h(1) & 0xff)) % dim
      val sign = if ((h(2) & 1) == 0) 1.0 else -1.0
      acc(bucket) += sign * idf.getOrElse(t, defaultIdf)
    }
    acc.map(_ / toks.size).toSeq
  }
}

object CorpusFittedService {

  /** Fit the model from a corpus: document frequencies (top `maxVocab`
    * terms) for IDF weighting, and the argmax bigram successor table
    * (top `maxTransitions` heads by frequency) for expansion and
    * generation. Both collects are truncated BEFORE leaving the
    * cluster — the model is bounded by construction. */
  def fit(
      docs: DataFrame,
      textCol: String,
      maxVocab: Int = 4096,
      maxTransitions: Int = 4096,
      genSteps: Int = 6): CorpusFittedService = {
    val toks = docs.select(Analyzer.tokens(col(textCol)).as("toks"))
      .where(col("toks").isNotNull)
    val nDocs = toks.count().toDouble
    def idfOf(df: Double): Double =
      math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val idf = toks
      .select(explode(array_distinct(col("toks"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("t").asc).limit(maxVocab)
      .collect().map(r => r.getString(0) -> idfOf(r.getLong(1).toDouble))
      .toMap
    // in-document bigrams: pair every token with its successor, count,
    // keep each head's argmax successor, rank heads by total mass
    val trans = toks
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (w, i) -> " +
          "struct(w AS w1, toks[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .groupBy(col("w1"))
      .agg(max_by(col("w2"), struct(col("n"), col("w2"))).as("w2"),
        sum(col("n")).as("tot"))
      .orderBy(col("tot").desc, col("w1").asc).limit(maxTransitions)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // unseen terms are rarer than anything fitted: score them like an
    // unobserved df of 0.5 docs
    CorpusFittedService(idf, idfOf(0.5), trans, genSteps)
  }

  /** Real media-container metadata decode: PNG / GIF / JPEG header
    * parse to "fmt WxH"; anything else reports its byte length.
    * Public — Multimodal.decodeContainerMeta runs it as the honest
    * (non-stub) half of multimodal decode. */
  def parseMedia(bytes: Array[Byte]): String = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (bytes == null) "bin 0B"
    else if (bytes.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a)
      s"png ${be32(16)}x${be32(20)}"
    else if (bytes.length >= 10 &&
      u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8')
      s"gif ${le16(6)}x${le16(8)}"
    else if (bytes.length >= 12 &&
      u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
      u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' && u8(11) == 'P') {
      // WebP (RFC 9649): RIFF container, dims read from the first
      // chunk's header — "VP8 " lossy (sync code + 14-bit dims),
      // "VP8L" lossless (signature byte + packed width-1/height-1),
      // "VP8X" extended (24-bit canvas-1 dims + the ANIM frame flag).
      // Metadata ONLY: pixel decode of webp is out of codec scope and
      // rejects loudly at the decoders' own format gates.
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      if (bytes.length >= 30 &&
          u8(12) == 'V' && u8(13) == 'P' && u8(14) == '8' && u8(15) == ' ' &&
          u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a)
        s"webp ${le16(26) & 0x3fff}x${le16(28) & 0x3fff}"
      else if (bytes.length >= 25 &&
          u8(12) == 'V' && u8(13) == 'P' && u8(14) == '8' && u8(15) == 'L' &&
          u8(20) == 0x2f) {
        val v = u8(21).toLong | (u8(22).toLong << 8) |
          (u8(23).toLong << 16) | (u8(24).toLong << 24)
        s"webp ${(v & 0x3fff) + 1}x${((v >> 14) & 0x3fff) + 1}"
      } else if (bytes.length >= 30 &&
          u8(12) == 'V' && u8(13) == 'P' && u8(14) == '8' && u8(15) == 'X') {
        val anim = if ((u8(20) & 0x02) != 0) " anim" else ""
        s"webp ${le24(24) + 1}x${le24(27) + 1}$anim"
      } else s"webp ${bytes.length}B"
    }
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG segments to the first SOFn frame header; the spec
      // allows 0xFF fill bytes between segments, and standalone
      // markers (TEM, RSTn) carry NO length field — treating either
      // as a length-prefixed segment reads payload bytes as a length
      // and jumps to garbage
      var i = 2
      while (i + 1 < bytes.length && u8(i) == 0xff) {
        if (u8(i + 1) == 0xff) i += 1 // fill byte
        else {
          val marker = u8(i + 1)
          if (marker == 0xd9 || marker == 0xda) {
            // EOI / start-of-scan without a prior SOF: no dims to read
            return s"jpeg ${bytes.length}B"
          } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
            i += 2 // standalone marker, no length field
          } else if (i + 9 < bytes.length) {
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) return s"jpeg ${be16(i + 7)}x${be16(i + 5)}"
            i += 2 + be16(i + 2)
          } else return s"jpeg ${bytes.length}B"
        }
      }
      s"jpeg ${bytes.length}B"
    } else s"bin ${bytes.length}B"
  }
}
