package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL image/audio codecs in pure JDK — no media library required:
  * PNG's pixel data is zlib (java.util.zip) plus per-row filters, and
  * WAV PCM is plain little-endian integers. These close the "pixel
  * decode is a stub" gap honestly: `Png.decode` inflates and unfilters
  * genuine IDAT bytes (all five PNG filter types), `Wav.decodePcm16`
  * parses a genuine RIFF chunk walk — the exact byte formats published
  * in the PNG (RFC 2083) and RIFF/WAVE specs.
  *
  * Scope: PNG grayscale (color type 0), truecolor RGB (color type 2)
  * and paletted (color type 3, PLTE expanded to RGB — r16) at bit
  * depth 8 — the shapes a training pipeline normalizes to — and
  * 16-bit mono PCM. Anything else raises, loudly: a silent partial
  * decode would corrupt downstream features.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Decoded image: `pixels` is row-major, `channels` interleaved
    * (1 = gray, 3 = RGB), values 0-255 as unsigned bytes. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private def crcOf(type4: Array[Byte], data: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32()
    c.update(type4)
    c.update(data, off, len)
    c.getValue
  }

  private def chunk(typeName: String, data: Array[Byte]): Array[Byte] = {
    val t = typeName.getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length).put(t).put(data).putInt(crcOf(t, data, 0, data.length).toInt)
    out.array()
  }

  /** Encode an 8-bit grayscale image (filter type 0 on every row —
    * decoders must handle all five, and ours does; an encoder may pick
    * any). The IDAT stream is real zlib deflate. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte) // bit depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    // scanlines: one filter byte (0 = None) + the row
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      val base = y * (1 + width)
      raw(base) = 0
      System.arraycopy(pixels, y * width, raw, base + 1, width)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", buf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Encode an 8-bit RGB image (color type 2), interleaved pixels. */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"rgb buffer ${rgb.length} != ${width}x${height}x3")
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val stride = width * 3
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val base = y * (1 + stride)
      raw(base) = 0
      System.arraycopy(rgb, y * stride, raw, base + 1, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", buf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Paeth predictor (PNG spec §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG: chunk walk (CRC-verified), zlib inflate of the
    * concatenated IDATs, and per-row unfiltering of all five filter
    * types. Bit depth 8; color types 0 (gray), 2 (RGB) and 3
    * (paletted — indices filter as 1-byte pixels, then expand through
    * the PLTE to interleaved RGB). */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes != null && bytes.length > 8 &&
      Signature.indices.forall(i => bytes(i) == Signature(i)), "not a PNG")
    var pos = 8
    var width = 0; var height = 0; var channels = 0
    var paletted = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= bytes.length) {
      val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated chunk at $pos")
      val typeName = new String(bytes, pos + 4, 4, "US-ASCII")
      val t4 = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 8)
      val crc = java.nio.ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt
      require(crc == crcOf(t4, bytes, pos + 8, len).toInt, s"bad CRC in $typeName")
      typeName match {
        case "IHDR" =>
          val b = java.nio.ByteBuffer.wrap(bytes, pos + 8, len)
          width = b.getInt; height = b.getInt
          val bitDepth = b.get() & 0xff
          val colorType = b.get() & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => paletted = true; 1 // indices filter as 1-byte px
            case other => sys.error(s"unsupported color type $other")
          }
        case "PLTE" =>
          require(len > 0 && len % 3 == 0 && len <= 768, s"bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0 && channels > 0, "missing IHDR")
    val stride = width * channels
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](height * (1 + stride))
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      require(n > 0 || !inflater.needsInput(), "truncated IDAT stream")
      got += n
    }
    inflater.end()
    require(got == raw.length, s"IDAT inflated to $got, expected ${raw.length}")
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val filter = raw(y * (1 + stride)) & 0xff
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= channels) px(rowOut + x - channels) & 0xff else 0
        val up = if (y > 0) px(rowOut - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= channels) px(rowOut - stride + x - channels) & 0xff else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case other => sys.error(s"bad filter type $other in row $y")
        }
        px(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    if (!paletted) Image(width, height, channels, px)
    else {
      // color type 3: indices expand through PLTE to interleaved RGB;
      // an index past the palette is data corruption, not a default
      require(palette != null, "paletted PNG without a PLTE chunk")
      val nEntries = palette.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < px.length) {
        val idx = px(i) & 0xff
        require(idx < nEntries, s"palette index $idx out of $nEntries entries")
        rgb(i * 3) = palette(idx * 3)
        rgb(i * 3 + 1) = palette(idx * 3 + 1)
        rgb(i * 3 + 2) = palette(idx * 3 + 2)
        i += 1
      }
      Image(width, height, 3, rgb)
    }
  }

  /** Encode a paletted image (color type 3): PLTE holds up to 256 RGB
    * triples, IDAT carries 8-bit palette indices (filtered rows like
    * any other scanline stream). */
  def encodePalette(width: Int, height: Int,
      palette: Array[Byte], indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(palette.length > 0 && palette.length % 3 == 0 && palette.length <= 768,
      s"palette must be 1..256 RGB triples, got ${palette.length} bytes")
    require(indices.length == width * height,
      s"need ${width * height} indices, got ${indices.length}")
    val nEntries = palette.length / 3
    indices.foreach(i => require((i & 0xff) < nEntries,
      s"palette index ${i & 0xff} out of $nEntries entries"))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(3.toByte) // bit depth 8, color type 3 (palette)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      raw(y * (1 + width)) = 0 // filter type 0 (None) per row
      System.arraycopy(indices, y * width, raw, y * (1 + width) + 1, width)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    Signature ++ chunk("IHDR", ihdr) ++ chunk("PLTE", palette) ++
      chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Nearest-neighbor resample — the real pixel-space resize (the
    * training-pipeline normalize-to-fixed-dims stage). out(x,y) =
    * in(x*W/w2, y*H/h2) with integer source indices. */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0, s"bad target dims ${w2}x$h2")
    val out = new Array[Byte](w2 * h2 * img.channels)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        var c = 0
        while (c < img.channels) {
          out((y * w2 + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(w2, h2, img.channels, out)
  }
}

/** RIFF/WAVE PCM — the audio half. 16-bit mono little-endian. */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode 16-bit mono PCM as a canonical RIFF/WAVE file. */
  def encodePcm16(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode: real chunk walk (fmt validated, odd-length chunks padded
    * per the RIFF spec), 16-bit mono PCM only. */
  def decodePcm16(bytes: Array[Byte]): Audio = {
    require(bytes != null && bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAVE file")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0
    var sawFmt = false
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || !sawFmt)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          val fmt = bb.getShort(pos + 8) & 0xffff
          val ch = bb.getShort(pos + 10) & 0xffff
          val bits = bb.getShort(pos + 22) & 0xffff
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAVE: format=$fmt channels=$ch bits=$bits")
          sampleRate = bb.getInt(pos + 12)
          sawFmt = true
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // other chunks (LIST, fact, ...) skipped
      }
      pos += 8 + len + (len & 1) // odd chunk lengths carry a pad byte
    }
    require(sawFmt && samples != null, "missing fmt or data chunk")
    Audio(sampleRate, samples)
  }

  final case class StereoAudio(sampleRate: Int,
      left: Array[Short], right: Array[Short])

  /** Encode 16-bit STEREO PCM (interleaved L,R — block align 4), the
    * channel layout real audio assets actually ship in. */
  def encodePcm16Stereo(left: Array[Short], right: Array[Short],
      sampleRate: Int = 16000): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    require(left.length == right.length,
      s"channel length mismatch: ${left.length} vs ${right.length}")
    val dataLen = left.length * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(2) // stereo
      .putInt(sampleRate)
      .putInt(sampleRate * 4) // byte rate
      .putShort(4) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < left.length) { buf.putShort(left(i)); buf.putShort(right(i)); i += 1 }
    buf.array()
  }

  /** Decode 16-bit stereo PCM: the same chunk walk as the mono path,
    * de-interleaving the frames back into separate channels. */
  def decodePcm16Stereo(bytes: Array[Byte]): StereoAudio = {
    require(bytes != null && bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAVE file")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0
    var sawFmt = false
    var left: Array[Short] = null
    var right: Array[Short] = null
    while (pos + 8 <= bytes.length && (left == null || !sawFmt)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          val fmt = bb.getShort(pos + 8) & 0xffff
          val ch = bb.getShort(pos + 10) & 0xffff
          val bits = bb.getShort(pos + 22) & 0xffff
          require(fmt == 1 && ch == 2 && bits == 16,
            s"unsupported WAVE: format=$fmt channels=$ch bits=$bits (stereo path)")
          sampleRate = bb.getInt(pos + 12)
          sawFmt = true
        case "data" =>
          val n = len / 4
          left = new Array[Short](n); right = new Array[Short](n)
          var i = 0
          while (i < n) {
            left(i) = bb.getShort(pos + 8 + i * 4)
            right(i) = bb.getShort(pos + 8 + i * 4 + 2)
            i += 1
          }
        case _ => () // other chunks (LIST, fact, ...) skipped
      }
      pos += 8 + len + (len & 1)
    }
    require(sawFmt && left != null, "missing fmt or data chunk")
    StereoAudio(sampleRate, left, right)
  }
}

/** Spectral analysis over decoded PCM — the audio feature-extraction
  * half a training pipeline runs after decode (language/music gates,
  * tone detection, silence trimming all start from a spectrum). Pure
  * JDK: an iterative radix-2 Cooley–Tukey FFT, O(N log N), no library.
  * Executor-side per-row work on bounded windows (the window length is
  * a power of two <= the decoded sample count), so the pass scales
  * exactly like the pixel decode: data-parallel, nothing shuffled. */
object Dsp {

  /** In-place iterative radix-2 FFT. `re`/`im` length must be a power
    * of two. Standard bit-reversal permutation + butterfly passes. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0 && n > 0,
      s"FFT needs a power-of-two window, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k; val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Dominant frequency bin of a PCM window: argmax |X[k]| over
    * k in 1..N/2 (DC excluded — quantization offsets land there).
    * Ties break to the lowest bin; an all-silent window returns 0. */
  def dominantBin(samples: Array[Short], n: Int): Int = {
    require((n & (n - 1)) == 0 && n > 0, s"window must be a power of two, got $n")
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val m = math.min(n, samples.length)
    var i = 0
    while (i < m) { re(i) = samples(i).toDouble; i += 1 }
    fft(re, im)
    var best = 0; var bestMag = 0.0
    var k = 1
    while (k <= n / 2) {
      val mag = re(k) * re(k) + im(k) * im(k)
      if (mag > bestMag) { bestMag = mag; best = k }
      k += 1
    }
    best
  }
}

/** REAL animated-GIF codec in pure JDK — the frame-sampling ("video")
  * analog of `Png`/`Wav`: a GIF89a file is a logical screen plus a
  * SEQUENCE of LZW-compressed frames, so decoding one end-to-end
  * exercises exactly what a video frame-sampler does (container walk →
  * per-frame entropy decode → per-frame pixel fold). Everything here
  * is the published GIF89a spec: variable-width LSB-first LZW codes
  * (9→12 bits, clear/EOI, 4096-entry dictionary reset), 255-byte
  * sub-block framing, grayscale global color table so a palette index
  * IS its gray value.
  *
  * Scope: non-interlaced, full-frame images over a 256-entry global
  * palette — the shape our encoder writes. Interlace, local color
  * tables and partial-frame composition raise loudly (a silent
  * misparse would corrupt every downstream frame feature).
  */
object Gif {

  /** One decoded frame: row-major palette indexes = gray values. */
  final case class Frame(index: Int, width: Int, height: Int, pixels: Array[Byte])

  // ---- LZW bitstream ----------------------------------------------

  /** GIF LZW compress (min code size 8): real variable-width codes,
    * dictionary growth to 4096 then an explicit CLEAR reset. */
  private[graft] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode        // 256
    val eoi = clear + 1             // 257
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    var cur = -1
    data.foreach { b =>
      val k = b & 0xff
      if (cur < 0) cur = k
      else {
        val key: Integer = (cur << 8) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit
        else {
          emit(cur)
          dict.put(key, next)
          next += 1
          // width grows once `next` no longer fits; at 4096 reset
          if (next > (1 << width) && width < 12) width += 1
          if (next == 4096) {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            width = minCode + 1
          }
          cur = k
        }
      }
    }
    if (cur >= 0) emit(cur)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF LZW decompress; `n` = expected pixel count, extra codes after
    * EOI (or short streams) raise. */
  private[graft] def lzwDecompress(data: Array[Byte], minCode: Int, n: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](n)
    var outAt = 0
    // dictionary as prefix links: entry c = (prefix(c), lastByte(c))
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    val firstByte = new Array[Byte](4096) // memoized first byte per code
    var next = eoi + 1
    var width = minCode + 1
    var bitBuf = 0L
    var bitCnt = 0
    var at = 0
    var prev = -1
    def writeCode(c: Int): Byte = {
      // expand into out right-to-left
      var len = 0
      var x = c
      while (x >= clear) { len += 1; x = prefix(x) } // walk to a literal
      len += 1
      require(outAt + len <= n, s"LZW overrun: frame declares $n px")
      var w = outAt + len - 1
      x = c
      while (x >= clear) { out(w) = last(x); w -= 1; x = prefix(x) }
      out(w) = x.toByte
      outAt += len
      x.toByte
    }
    while (at < data.length || bitCnt >= width) {
      while (bitCnt < width && at < data.length) {
        bitBuf |= (data(at) & 0xffL) << bitCnt; bitCnt += 8; at += 1
      }
      if (bitCnt < width) {
        require(outAt == n, s"LZW stream ended at $outAt/$n px without EOI")
        return out
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
      else if (code == eoi) {
        require(outAt == n, s"EOI at $outAt/$n px")
        return out
      } else {
        require(code < next || (code == next && prev >= 0), s"bad LZW code $code (next=$next)")
        if (prev < 0) {
          require(code < clear, s"first code after clear must be a literal, got $code")
          out(outAt) = code.toByte; outAt += 1
          firstByte(code & 0xff) = code.toByte
        } else {
          val fb =
            if (code < next) writeCode(code)
            else { // code == next: string(prev) + firstByte(string(prev))
              require(next < 4096, s"code $code references the reset slot")
              val pf = if (prev < clear) prev.toByte else firstByte(prev)
              // register slot `next` first so writeCode can expand it;
              // the uniform add below re-writes the same slot untouched
              prefix(next) = prev; last(next) = pf
              writeCode(code)
            }
          if (next < 4096) {
            prefix(next) = prev; last(next) = fb
            firstByte(next) = if (prev < clear) prev.toByte else firstByte(prev)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
        }
        prev = code
      }
    }
    require(outAt == n, s"LZW stream exhausted at $outAt/$n px")
    out
  }

  // ---- container --------------------------------------------------

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode an animated grayscale GIF89a: 256-entry gray global
    * palette, one GCE + image descriptor + real LZW stream per frame. */
  def encodeGrayAnimated(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && width < 65536 && height < 65536, s"bad dims ${width}x$height")
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == width * height,
      s"frame has ${f.length} px, expected ${width * height}"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 } // gray GCT
    frames.foreach { px =>
      // graphic control extension (delay 10cs, no transparency)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(le16(10)); out.write(0); out.write(0)
      // image descriptor: full frame, no LCT, not interlaced
      out.write(0x2c)
      out.write(le16(0)); out.write(le16(0))
      out.write(le16(width)); out.write(le16(height))
      out.write(0)
      out.write(8) // LZW min code size
      val lzw = lzwCompress(px)
      var at = 0
      while (at < lzw.length) {
        val len = math.min(255, lzw.length - at)
        out.write(len); out.write(lzw, at, len); at += len
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Fold one palette (3n RGB bytes at `off`) to gray values: exact
    * when r==g==b (our encoder's tables), integer ITU-R BT.601
    * luminance otherwise — deterministic either way. */
  private def grayPalette(bytes: Array[Byte], off: Int, n: Int): Array[Int] = {
    val t = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = bytes(off + 3 * i) & 0xff
      val g = bytes(off + 3 * i + 1) & 0xff
      val b = bytes(off + 3 * i + 2) & 0xff
      t(i) = if (r == g && g == b) r else (r * 299 + g * 587 + b * 114 + 500) / 1000
      i += 1
    }
    t
  }

  /** Undo GIF's 4-pass Adam interlace: stored rows come in passes
    * (0,8,16.. / 4,12.. / 2,6.. / 1,3,5..), sequential in `px`. */
  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var src = 0
    Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
      var row = start
      while (row < h) {
        System.arraycopy(px, src * w, out, row * w, w)
        src += 1
        row += step
      }
    }
    out
  }

  /** Decode every frame of a full-frame GIF: global OR local color
    * tables (folded to gray — exact for gray palettes, BT.601 for
    * color), interlaced or sequential row order. Real container walk:
    * skips extension blocks by their declared sub-block lengths,
    * collects each image's sub-blocks, LZW-decodes, maps indices
    * through the frame's ACTIVE palette. Partial-frame composition
    * (left/top offsets) stays a loud reject. */
  def decode(bytes: Array[Byte]): Seq[Frame] = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").startsWith("GIF"), "not a GIF")
    def u16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    var at = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val t = grayPalette(bytes, at, n)
        at += 3 * n
        t
      } else null
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var done = false
    while (!done) {
      require(at < bytes.length, "GIF truncated before trailer")
      (bytes(at) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          at += 2
          while ((bytes(at) & 0xff) != 0) at += 1 + (bytes(at) & 0xff)
          at += 1
        case 0x2c =>
          val left = u16(at + 1); val top = u16(at + 3)
          val w = u16(at + 5); val h = u16(at + 7)
          val ipacked = bytes(at + 9) & 0xff
          require(left == 0 && top == 0, "partial-frame composition out of scope")
          at += 10
          val table: Array[Int] =
            if ((ipacked & 0x80) != 0) { // local color table wins for this frame
              val n = 2 << (ipacked & 7)
              val t = grayPalette(bytes, at, n)
              at += 3 * n
              t
            } else {
              require(gct != null, "frame without a local OR global color table")
              gct
            }
          val minCode = bytes(at) & 0xff; at += 1
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(at) & 0xff) != 0) {
            val len = bytes(at) & 0xff
            data.write(bytes, at + 1, len)
            at += 1 + len
          }
          at += 1
          val idx = lzwDecompress(data.toByteArray, minCode, w * h)
          val px = new Array[Byte](idx.length)
          var i = 0
          while (i < idx.length) {
            val ix = idx(i) & 0xff
            require(ix < table.length,
              s"pixel index $ix outside the ${table.length}-entry color table")
            px(i) = table(ix).toByte
            i += 1
          }
          frames += Frame(frames.length, w, h,
            if ((ipacked & 0x40) != 0) deinterlace(px, w, h) else px)
        case other => throw new IllegalArgumentException(
          f"unexpected GIF block 0x$other%02x at $at")
      }
    }
    frames.toSeq
  }
}

/** JFIF decode/encode through the IN-JDK imaging stack
  * (`javax.imageio` + `java.awt.image` — part of the JDK, no external
  * media library). The container walk here is ours: SOI check, marker
  * scan (0xFF fill-byte runs tolerated per B.1.1.2), SOF
  * classification. In scope: Huffman SEQUENTIAL (SOF0/SOF1) and —
  * r16, a double-digit share of real crawled JPEGs — Huffman
  * PROGRESSIVE (SOF2), which ImageIO decodes natively. Lossless,
  * hierarchical and arithmetic-coded SOFs reject loudly BEFORE any
  * decode is attempted, so an out-of-scope stream can never
  * half-decode. The entropy decode + IDCT are ImageIO's.
  *
  * EXIF ORIENTATION (documented decision, r16): decode is
  * RASTER-ORDER. The EXIF orientation tag is metadata-only — ImageIO
  * does not rotate, and neither do we, so decoded dims always equal
  * the SOF dims (the cross-check below depends on that) and a
  * training pipeline sees the stored pixel grid. Callers that need
  * display orientation must rotate downstream off the metadata pass.
  *
  * JPEG is LOSSY: no pixel formula can replay decoded values, so
  * expected stats are computed at GENERATION time from a decode of
  * the actual bytes and persisted beside the payload (the oracle
  * reads the persisted stats; the query re-decodes and must agree —
  * pinning byte round-trip + decoder determinism).
  */
object Jpeg {

  /** Marker walk to the first SOF: returns (sofMarker, width, height,
    * nComponents). Validates SOI and marker framing on the way. */
  private[graft] def sofInfo(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length > 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI marker)")
    var at = 2
    while (at + 3 < bytes.length) {
      require((bytes(at) & 0xff) == 0xff,
        f"expected a JPEG marker at offset $at, got 0x${bytes(at) & 0xff}%02x")
      // the spec (B.1.1.2) allows any run of 0xFF FILL bytes before a
      // marker id, and some encoders emit them: a fill byte parsed as
      // marker 0xFF would read a garbage length and derail the walk —
      // skip the run; the marker id is the first non-0xFF byte
      while (at + 3 < bytes.length && (bytes(at + 1) & 0xff) == 0xff) at += 1
      require(at + 3 < bytes.length, "JPEG truncated inside a fill-byte run")
      val marker = bytes(at + 1) & 0xff
      require(marker != 0xd9 && marker != 0xda, "JPEG stream without a SOF header")
      val len = ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
      // SOFn = 0xC0-0xCF minus DHT (C4), JPG (C8), DAC (CC)
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val h = ((bytes(at + 5) & 0xff) << 8) | (bytes(at + 6) & 0xff)
        val w = ((bytes(at + 7) & 0xff) << 8) | (bytes(at + 8) & 0xff)
        return (marker, w, h, bytes(at + 9) & 0xff)
      }
      at += 2 + len
    }
    throw new IllegalArgumentException("JPEG truncated before a SOF marker")
  }

  /** Decode a Huffman JPEG (SOF0/SOF1 sequential, SOF2 progressive —
    * in scope since r16) to grayscale. Lossless, hierarchical and
    * arithmetic-coded SOFs reject loudly. Color inputs fold to
    * luminance via the JDK's gray color space. */
  // Per-thread cached JPEG reader/writer (r17): ImageIO.read and
  // getImageWritersByFormatName walk the synchronized IIORegistry per
  // call, and the InputStream overload additionally spools through a
  // DISK-cache temp file — under a 32-task decode stage the registry
  // lock and temp-file churn serialize the whole stage. One
  // reader/writer per task thread, memory-cache streams, same JDK
  // plugin, bit-identical pixels.
  private val jpegReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next())
  private val jpegWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next())
  private def readJpegCached(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = jpegReaderTL.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try { reader.setInput(iis, true, true); reader.read(0) }
    finally { reader.setInput(null); iis.close() }
  }

  def decodeGray(bytes: Array[Byte]): Png.Image = {
    val (sof, w, h, _) = sofInfo(bytes)
    require(sof == 0xc0 || sof == 0xc1 || sof == 0xc2,
      s"only Huffman sequential/progressive JPEG in scope (SOF0/SOF1/SOF2), " +
        s"got SOF${sof - 0xc0} (lossless/hierarchical/arithmetic)")
    val img = readJpegCached(bytes)
    require(img != null, "ImageIO could not decode the JPEG stream")
    require(img.getWidth == w && img.getHeight == h,
      s"SOF dims ${w}x$h disagree with decoded raster ${img.getWidth}x${img.getHeight}")
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g2 = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = g2.createGraphics()
        g.drawImage(img, 0, 0, null)
        g.dispose()
        g2
      }
    val px = gray.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    Png.Image(w, h, 1, java.util.Arrays.copyOf(px, px.length))
  }

  /** Decode a Huffman JPEG (sequential or progressive) to interleaved
    * RGB (channels = 3). Same container contract as decodeGray:
    * lossless/hierarchical/arithmetic SOFs reject loudly before any
    * decode; gray inputs expand to equal channels through the JDK
    * color model. */
  def decodeRgb(bytes: Array[Byte]): Png.Image = {
    val (sof, w, h, _) = sofInfo(bytes)
    require(sof == 0xc0 || sof == 0xc1 || sof == 0xc2,
      s"only Huffman sequential/progressive JPEG in scope (SOF0/SOF1/SOF2), " +
        s"got SOF${sof - 0xc0} (lossless/hierarchical/arithmetic)")
    val img = readJpegCached(bytes)
    require(img != null, "ImageIO could not decode the JPEG stream")
    require(img.getWidth == w && img.getHeight == h,
      s"SOF dims ${w}x$h disagree with decoded raster ${img.getWidth}x${img.getHeight}")
    val bgr =
      if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val c = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = c.createGraphics()
        g.drawImage(img, 0, 0, null)
        g.dispose()
        c
      }
    val data = bgr.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) { // BGR raster order -> RGB interleaved
      rgb(3 * i) = data(3 * i + 2)
      rgb(3 * i + 1) = data(3 * i + 1)
      rgb(3 * i + 2) = data(3 * i)
      i += 1
    }
    Png.Image(w, h, 3, rgb)
  }

  /** Encode interleaved RGB pixels as real color JFIF bytes (YCbCr
    * through the JDK writer — the container real-world color assets
    * ship in). */
  def encodeRgb(
      width: Int, height: Int, rgb: Array[Byte],
      quality: Float = 0.9f): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"${rgb.length} bytes for ${width}x$height RGB")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < width * height) {
      data(3 * i) = rgb(3 * i + 2)
      data(3 * i + 1) = rgb(3 * i + 1)
      data(3 * i + 2) = rgb(3 * i)
      i += 1
    }
    writeJfif(img, quality)
  }

  private def writeJfif(
      img: java.awt.image.BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = jpegWriterTL.get()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    // progressive = SOF2 multi-scan output (the JDK writer's default
    // scan script) — the r16 in-scope extension; the SOF marker in
    // the produced stream is the decode gate's own evidence
    if (progressive)
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream(
      img.getWidth * img.getHeight / 2 + 1024)
    // memory-cache output stream: createImageOutputStream defaults to a
    // disk-backed cache file per encode
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.setOutput(null); ios.close() }
    bos.toByteArray
  }

  /** Encode grayscale pixels as real JFIF bytes (the JDK's baseline
    * Huffman writer at an explicit quality — deterministic for a
    * fixed JDK, which the generation-time-stats contract requires). */
  def encodeGray(
      width: Int, height: Int, pixels: Array[Byte],
      quality: Float = 0.9f, progressive: Boolean = false): Array[Byte] = {
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    System.arraycopy(pixels, 0,
      img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData,
      0, pixels.length)
    writeJfif(img, quality, progressive)
  }
}
