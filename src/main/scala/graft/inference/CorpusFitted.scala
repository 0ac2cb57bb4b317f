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

  /** Coded dims from an H.264 sequence parameter set (ISO 14496-10
    * §7.3.2.1, r17): RBSP de-emulation (strip the 00 00 03 bytes),
    * exp-Golomb reader, the high-profile chroma/scaling-list branch,
    * and the frame-cropping arithmetic (4:2:0 crop units — the
    * baseline/main case; monochrome crop would halve, out of the
    * generated corpus's scope). `off` points at the first byte AFTER
    * the NAL header, `len` is the RBSP byte count. (0, 0) on any
    * torn/over-running read — the container walk reports the box
    * dims alone then. */
  private def spsDims(bytes: Array[Byte], off: Int, len: Int): (Long, Long) = {
    val rbspBuf = new java.io.ByteArrayOutputStream(len)
    var i = off
    val end = math.min(off + len, bytes.length)
    var zrun = 0
    while (i < end) {
      val b = bytes(i) & 0xff
      if (zrun >= 2 && b == 3) zrun = 0 // emulation-prevention byte
      else { rbspBuf.write(b); zrun = if (b == 0) zrun + 1 else 0 }
      i += 1
    }
    val r = rbspBuf.toByteArray
    var bit = 0
    def b1(): Int = { val v = (r(bit >> 3) >> (7 - (bit & 7))) & 1; bit += 1; v }
    def u(n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v = (v << 1) | b1(); k += 1 }
      v
    }
    def ue(): Long = {
      var z = 0
      while (z < 32 && b1() == 0) z += 1
      (1L << z) - 1 + u(z)
    }
    def se(): Long = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
    try {
      val profile = u(8)
      u(16) // constraint flags + level_idc
      ue() // seq_parameter_set_id
      if (Set(100L, 110L, 122L, 244L, 44L, 83L, 86L, 118L, 128L,
        138L, 139L, 134L, 135L).contains(profile)) {
        val chroma = ue()
        if (chroma == 3) b1() // separate_colour_plane
        ue(); ue(); b1() // bit depths, qpprime
        if (b1() == 1) { // seq_scaling_matrix_present
          val nLists = if (chroma == 3) 12 else 8
          var li = 0
          while (li < nLists) {
            if (b1() == 1) {
              val size = if (li < 6) 16 else 64
              var lastScale = 8L; var nextScale = 8L
              var j = 0
              while (j < size) {
                if (nextScale != 0) nextScale = (lastScale + se() + 256) % 256
                lastScale = if (nextScale == 0) lastScale else nextScale
                j += 1
              }
            }
            li += 1
          }
        }
      }
      ue() // log2_max_frame_num_minus4
      val poc = ue()
      if (poc == 0) ue()
      else if (poc == 1) {
        b1(); se(); se()
        val n = ue()
        var j = 0L
        while (j < n) { se(); j += 1 }
      }
      ue() // max_num_ref_frames
      b1() // gaps_in_frame_num_value_allowed
      val wMb = ue() + 1
      val hUnits = ue() + 1
      val frameMbsOnly = b1()
      if (frameMbsOnly == 0) b1() // mb_adaptive_frame_field
      b1() // direct_8x8_inference
      var w = wMb * 16
      var h = (2 - frameMbsOnly) * hUnits * 16
      if (b1() == 1) { // frame_cropping
        val cl = ue(); val cr = ue(); val ct = ue(); val cb = ue()
        w -= (cl + cr) * 2
        h -= (ct + cb) * 2 * (2 - frameMbsOnly)
      }
      if (w > 0 && h > 0) (w, h) else (0L, 0L)
    } catch { case _: ArrayIndexOutOfBoundsException => (0L, 0L) }
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
    else if (bytes.length >= 12 &&
      u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
      u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E') {
      // RIFF/WAVE: chunk walk to fmt (rate, channels, block align) and
      // data (sample count = len / align) — the metadata twin of the
      // full Wav.decodePcm16 sample decoder
      def le32(i: Int): Long =
        u8(i).toLong | (u8(i + 1).toLong << 8) |
          (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      var pos = 12
      var sr = 0L; var ch = 0; var align = 0; var n = -1L
      while (pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val len = le32(pos + 4)
        if (len < 0 || pos + 8 + len > bytes.length) pos = bytes.length
        else {
          if (id == "fmt " && len >= 16) {
            ch = le16(pos + 10); sr = le32(pos + 12); align = le16(pos + 20)
          } else if (id == "data") n = len
          pos += (8 + len + (len & 1)).toInt
        }
      }
      if (sr > 0 && align > 0 && n >= 0) s"wav ${sr}Hz ${ch}ch ${n / align}"
      else s"wav ${bytes.length}B"
    }
    else if (bytes.length >= 12 &&
      u8(4) == 'f' && u8(5) == 't' && u8(6) == 'y' && u8(7) == 'p') {
      // MP4 / ISO-BMFF (ISO 14496-12): a sequence of length-prefixed
      // boxes. Dims come from moov > trak > tkhd (16.16 fixed-point
      // width/height, the video track is the one with nonzero dims);
      // duration from moov > mvhd (duration/timescale). size == 1
      // means a 64-bit largesize follows the type; size == 0 means
      // "to end of file". Metadata ONLY — sample decode (H.264/AAC)
      // is out of codec scope and stays behind the inference seam.
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      // returns (payloadStart, boxEnd) or null when the header is torn
      def boxBounds(at: Int, limit: Int): (Int, Int) = {
        if (at + 8 > limit) null
        else be32(at) match {
          case 0 => (at + 8, limit)
          case 1 =>
            if (at + 16 > limit) null
            else {
              val sz = be64(at + 8)
              if (sz < 16 || at + sz > limit) null else (at + 16, (at + sz).toInt)
            }
          case sz =>
            if (sz < 8 || at + sz > limit) null else (at + 8, (at + sz).toInt)
        }
      }
      def typeAt(at: Int): String =
        new String(bytes, at + 4, 4, "US-ASCII")
      def findChild(from: Int, limit: Int, name: String): Int = {
        var at = from
        var b = boxBounds(at, limit)
        while (at < limit && b != null) {
          if (typeAt(at) == name) return at
          at = b._2
          b = boxBounds(at, limit)
        }
        -1
      }
      // HEIF family (AVIF/HEIC — ISO-BMFF too, but an IMAGE: dims live
      // in meta > iprp > ipco > ispe, not in a movie header; 'meta'
      // and 'ispe' are FULLBOXES, so 4 version/flags bytes precede
      // their payloads). AV1/HEVC tile decode stays out of scope.
      val brand =
        if (bytes.length >= 12) new String(bytes, 8, 4, "US-ASCII") else ""
      val heifFmt = brand match {
        case "avif" | "avis" => "avif"
        case "heic" | "heix" | "mif1" | "msf1" => "heic"
        case _ => null
      }
      if (heifFmt != null) {
        var w = 0L; var h = 0L
        val meta = findChild(0, bytes.length, "meta")
        if (meta >= 0) {
          val (mp, mend) = boxBounds(meta, bytes.length)
          val iprp = findChild(mp + 4, mend, "iprp") // +4: fullbox verflags
          if (iprp >= 0) {
            val (pp, pend) = boxBounds(iprp, mend)
            val ipco = findChild(pp, pend, "ipco")
            if (ipco >= 0) {
              val (cp, cend) = boxBounds(ipco, pend)
              val ispe = findChild(cp, cend, "ispe")
              if (ispe >= 0) {
                val (sp, send) = boxBounds(ispe, cend)
                if (send - sp >= 12) { w = be32(sp + 4); h = be32(sp + 8) }
              }
            }
          }
        }
        return if (w > 0 && h > 0) s"$heifFmt ${w}x$h"
        else s"$heifFmt ${bytes.length}B"
      }
      var durMs = -1L
      var w = 0L; var h = 0L
      var cw = 0L; var ch = 0L // CODED dims from the avcC SPS (r17)
      var i = 0
      var iB = boxBounds(i, bytes.length)
      while (i < bytes.length && iB != null) {
        val (pay, end) = iB
        if (typeAt(i) == "moov") {
          var j = pay
          var jB = boxBounds(j, end)
          while (j < end && jB != null) {
            val (jp, jend) = jB
            typeAt(j) match {
              case "mvhd" if jend - jp >= 20 =>
                val v = u8(jp)
                val (ts, dur) =
                  if (v == 1) {
                    if (jend - jp >= 32) (be32(jp + 20), be64(jp + 24))
                    else (0L, 0L) // torn v1: never misread as v0
                  } else (be32(jp + 12), be32(jp + 16))
                if (ts > 0) durMs = dur * 1000L / ts
              case "trak" =>
                var k = jp
                var kB = boxBounds(k, jend)
                while (k < jend && kB != null) {
                  val (kp, kend) = kB
                  if (typeAt(k) == "tkhd" && kend - kp >= 84) {
                    val off = if (u8(kp) == 1) kp + 88 else kp + 76
                    if (off + 8 <= kend) {
                      val tw = be32(off) >> 16; val th = be32(off + 4) >> 16
                      if (tw > 0 && th > 0) { w = tw; h = th }
                    }
                  } else if (typeAt(k) == "mdia") {
                    // trak > mdia > minf > stbl > stsd > avc1 > avcC:
                    // the CODED H.264 dims live in the SPS inside the
                    // decoder config, not in the container's tkhd —
                    // the tkhd can lie (track matrix scaling, crop)
                    val minf = findChild(kp, kend, "minf")
                    val stbl = if (minf < 0) -1 else {
                      val (mp2, me2) = boxBounds(minf, kend)
                      findChild(mp2, me2, "stbl")
                    }
                    val stsd = if (stbl < 0) -1 else {
                      val (sp2, se2) = boxBounds(stbl, kend)
                      findChild(sp2, se2, "stsd")
                    }
                    if (stsd >= 0) {
                      val (dp, dend) = boxBounds(stsd, kend)
                      // stsd is a fullbox: verflags(4) + entry_count(4)
                      val avc1 = findChild(dp + 8, dend, "avc1") match {
                        case -1 => findChild(dp + 8, dend, "avc3")
                        case a => a
                      }
                      if (avc1 >= 0) {
                        val (ap, aend) = boxBounds(avc1, dend)
                        // VisualSampleEntry: 8 (reserved+dri) + 70
                        val avcC = findChild(ap + 78, aend, "avcC")
                        if (avcC >= 0) {
                          val (cp, cend) = boxBounds(avcC, aend)
                          // avcC: ver, profile, compat, level,
                          // 0xFC|lenSize, 0xE0|numSPS, then be16
                          // length + the SPS NAL per set
                          if (cend - cp >= 9 && (u8(cp + 5) & 0x1f) >= 1) {
                            val spsLen = be16(cp + 6).toInt
                            if (cp + 8 + spsLen <= cend && spsLen >= 2) {
                              val (sw, sh) = spsDims(bytes, cp + 9, spsLen - 1)
                              if (sw > 0) { cw = sw; ch = sh }
                            }
                          }
                        }
                      }
                    }
                  }
                  k = kend
                  kB = boxBounds(k, jend)
                }
              case _ => ()
            }
            j = jend
            jB = boxBounds(j, end)
          }
        }
        i = end
        iB = boxBounds(i, bytes.length)
      }
      val codec = if (cw > 0) s" h264 ${cw}x$ch" else ""
      if (durMs < 0) s"mp4 ${bytes.length}B"
      else if (w > 0) s"mp4 ${w}x$h ${durMs}ms$codec"
      else s"mp4 audio ${durMs}ms$codec"
    }
    else if (bytes.length >= 5 &&
      u8(0) == 'O' && u8(1) == 'g' && u8(2) == 'g' && u8(3) == 'S') {
      // OGG (RFC 3533): page header = magic + version + type +
      // granule(8) + serial(4) + seq(4) + crc(4) + nsegs + lacing
      // table; the FIRST page's packet is the codec identification
      // header — Vorbis `\x01vorbis` (channels u8 @11, rate le32
      // @12) or `OpusHead` (channels u8 @9, input rate le32 @12).
      // A torn page still classifies as the ogg FAMILY.
      def le32o(i: Int): Long =
        u8(i).toLong | (u8(i + 1).toLong << 8) |
          (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      if (bytes.length < 28) s"ogg ${bytes.length}B"
      else {
        val nseg = u8(26)
        val p = 27 + nseg
        if (nseg >= 1 && bytes.length >= p + 16 &&
          u8(p) == 1 && u8(p + 1) == 'v' && u8(p + 2) == 'o' &&
          u8(p + 3) == 'r' && u8(p + 4) == 'b' && u8(p + 5) == 'i' &&
          u8(p + 6) == 's')
          s"ogg vorbis ${le32o(p + 12)}Hz ${u8(p + 11)}ch"
        else if (nseg >= 1 && bytes.length >= p + 16 &&
          u8(p) == 'O' && u8(p + 1) == 'p' && u8(p + 2) == 'u' &&
          u8(p + 3) == 's' && u8(p + 4) == 'H' && u8(p + 5) == 'e' &&
          u8(p + 6) == 'a' && u8(p + 7) == 'd')
          s"ogg opus ${le32o(p + 12)}Hz ${u8(p + 9)}ch"
        else s"ogg ${bytes.length}B"
      }
    }
    else if (bytes.length >= 4 && (
      (u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3') ||
      (u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0 && ((u8(1) >> 1) & 3) != 0))) {
      // MP3 (ISO 11172-3 / 13818-3): optional ID3v2 envelope (synchsafe
      // 28-bit size, +10 when the footer flag is set), then the first
      // frame header: 11-bit sync, 2-bit version, 2-bit layer, 4-bit
      // bitrate index, 2-bit samplerate index. Layer III of MPEG-1 and
      // MPEG-2 resolve to real kbps/Hz; anything else falls back to a
      // byte-length report rather than guessing a table.
      var i = 0
      if (u8(0) == 'I' && bytes.length >= 10) {
        val sz = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
          ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
        i = 10 + sz + (if ((u8(5) & 0x10) != 0) 10 else 0)
      }
      while (i + 3 < bytes.length &&
        !(u8(i) == 0xff && (u8(i + 1) & 0xe0) == 0xe0)) i += 1
      if (i + 3 >= bytes.length) s"mp3 ${bytes.length}B"
      else {
        val ver = (u8(i + 1) >> 3) & 3   // 3 = MPEG-1, 2 = MPEG-2
        val layer = (u8(i + 1) >> 1) & 3 // 1 = Layer III
        val brIdx = u8(i + 2) >> 4
        val srIdx = (u8(i + 2) >> 2) & 3
        val br =
          if (layer != 1 || brIdx == 0 || brIdx == 15) 0
          else if (ver == 3) Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
            128, 160, 192, 224, 256, 320)(brIdx)
          else if (ver == 2) Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
            80, 96, 112, 128, 144, 160)(brIdx)
          else 0
        val sr =
          if (srIdx == 3) 0
          else if (ver == 3) Array(44100, 48000, 32000)(srIdx)
          else if (ver == 2) Array(22050, 24000, 16000)(srIdx)
          else 0
        if (br > 0 && sr > 0) s"mp3 ${sr}Hz ${br}kbps"
        else s"mp3 ${bytes.length}B"
      }
    }
    else if (bytes.length >= 26 &&
      u8(0) == 'f' && u8(1) == 'L' && u8(2) == 'a' && u8(3) == 'C' &&
      (u8(4) & 0x7f) == 0) {
      // FLAC (RFC 9639): "fLaC" then the mandatory STREAMINFO block.
      // The last 8 bytes before the MD5 pack sample rate (20 bits),
      // channels-1 (3), bits-per-sample-1 (5) and total samples (36)
      // big-endian — one shifted read recovers all four.
      var v = 0L
      var k = 18
      while (k < 26) { v = (v << 8) | u8(k); k += 1 }
      val sr = v >>> 44
      val ch = ((v >>> 41) & 7) + 1
      val total = v & ((1L << 36) - 1)
      s"flac ${sr}Hz ${ch}ch $total"
    }
    else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      // BMP: dims are 32-bit only under BITMAPINFOHEADER and later
      // (DIB size >= 40); the OS/2 BITMAPCOREHEADER (size 12) packs
      // 16-bit dims at the same offsets, so reading LE32 there would
      // fuse width and height into garbage — gate on the DIB size
      // first. A negative height is the legal top-down orientation.
      def le32s(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (le32s(14) >= 40) {
        val w = le32s(18); val h = le32s(22)
        if (w > 0 && h != 0) s"bmp ${w}x${math.abs(h)}"
        else s"bmp ${bytes.length}B"
      } else if (le32s(14) == 12 && bytes.length >= 22)
        s"bmp ${le16(18)}x${le16(20)}" // core header: 16-bit dims
      else s"bmp ${bytes.length}B"
    }
    else if (bytes.length >= 8 &&
      u8(0) == 0 && u8(1) == 0 && u8(2) == 1 && u8(3) == 0 && le16(4) > 0) {
      // ICO: directory entries of 1-byte dims where 0 means 256
      val n = le16(4)
      val w = if (u8(6) == 0) 256 else u8(6)
      val h = if (u8(7) == 0) 256 else u8(7)
      s"ico ${w}x$h ${n}img"
    }
    else if (bytes.length >= 8 &&
      ((u8(0) == 'I' && u8(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
       (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 42))) {
      // TIFF: endian-tagged IFD walk for ImageWidth (256) and
      // ImageLength (257); SHORT values sit in the value field's
      // leading bytes per the byte order, LONG fills it
      val le = u8(0) == 'I'
      def r16(i: Int): Int = if (le) le16(i) else be16(i)
      def r32(i: Int): Long =
        if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
          (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
        else be32(i)
      val ifd = r32(4)
      var w = 0L; var h = 0L
      if (ifd > 0 && ifd + 2 <= bytes.length) {
        val n = r16(ifd.toInt)
        var e = 0
        while (e < n && ifd + 2 + (e + 1) * 12 <= bytes.length) {
          val at = (ifd + 2 + e * 12).toInt
          val tag = r16(at); val typ = r16(at + 2)
          val value =
            if (typ == 3) r16(at + 8).toLong // SHORT
            else if (typ == 4) r32(at + 8)   // LONG
            else -1L
          if (tag == 256 && value > 0) w = value
          if (tag == 257 && value > 0) h = value
          e += 1
        }
      }
      if (w > 0 && h > 0) s"tiff ${w}x$h" else s"tiff ${bytes.length}B"
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
