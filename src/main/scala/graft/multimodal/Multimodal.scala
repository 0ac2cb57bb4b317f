package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded-media record: what a real decoder (image/audio lib) would
  * emit per asset. The decode itself is STUBBED (no media libs in this
  * environment) with a deterministic fake; everything around it —
  * schema, encoders, batched per-partition iteration, partitioning —
  * is the real Spark plumbing a production decoder plugs into. */
case class MediaFeature(
    media_id: Long,
    mime: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    feat_hash: String)

/** Multimodal columns: media as opaque `binary` with typed metadata.
  *
  * Design for 100 TB: the binary payload never shuffles — metadata
  * extraction and decode are map-only stages; `decodeFeatures` uses
  * typed `mapPartitions` so a real decoder amortizes model/codec init
  * once per partition (the JVM analog of `mapInPandas` batching).
  */
object Multimodal {

  /** Build a media table from the documents table: payload = utf8 bytes
    * of the text (a stand-in for image/audio bytes), metadata derived
    * deterministically from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"))

  /** Column-only metadata pass (no decode): pure codegen'd expressions,
    * oracle-checkable. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("mime"),
      length(col("payload")).cast("long").as("n_bytes"),
      col("width"), col("height"),
      (col("width").cast("long") * col("height")).as("pixels"),
      md5(col("payload")).as("content_hash"))
    // no embedded sort: metadata is the advertised MAP-ONLY pass —
    // presentation order belongs to the call site

  /** "Decode" each asset per partition. The decode routes through the
    * Inference seam (default: deterministic md5 stub) — swap
    * `Inference.service` for a real codec; the iterator shape (the
    * seam's `decoder()` initializes once per partition, then streams
    * rows) is what a GPU/codec-backed decoder needs. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    // capture the service BEFORE the closure: the executor must decode
    // with the service that built this plan, not whatever is installed
    // when the task happens to run
    val svc = graft.inference.Inference.service
    media
      // null payloads are tolerated DATA on the column-side metadata
      // path (null hash); the typed decode path must skip them, not
      // NPE the whole job inside a task
      .where(col("payload").isNotNull)
      .select("media_id", "mime", "payload", "width", "height")
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        val decode = svc.decoder() // codec init, once per partition
        rows.map { case (id, mime, payload, w, h) =>
          MediaFeature(id, mime, payload.length.toLong, w, h, decode(payload))
        }
      }
  }

  /** Frame sampling: `n` evenly-spaced frames per video asset — the
    * map-only stage a video pipeline runs before per-frame featurizing.
    * Decode is STUBBED (frame hash = md5(payload ++ frameIdx)); the
    * fan-out shape (one input row -> n frame rows, iterator-based, no
    * shuffle) is the real plumbing. */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): Dataset[FrameSample] = {
    import spark.implicits._
    // n <= 0 is a caller bug (a miscomputed frames-per-second), not
    // "no videos" — an empty result would be indistinguishable
    require(n > 0, s"sampleFrames needs n > 0 frames, got $n")
    val svc = graft.inference.Inference.service
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode = svc.decoder() // codec init, once per partition
        rows.flatMap { case (id, payload) =>
          (0 until n).iterator.map { i =>
            // full decimal-string salt (all digits of i, not one byte):
            // the declared fake decode stays oracle-mirrorable as
            // md5(text || i) for ANY n, including frame index >= 10
            FrameSample(id, i, decode(payload ++ i.toString.getBytes("UTF-8")))
          }
        }
      }
  }

  /** Resize: target-dim recompute over the payload (STUB decode; real
    * schema/batching). Output metadata carries the new dims and a
    * deterministic content hash of (payload, dims). */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[MediaFeature] = {
    import spark.implicits._
    require(w > 0 && h > 0, s"resize needs positive target dims, got ${w}x$h")
    val svc = graft.inference.Inference.service
    media.select("media_id", "mime", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val decode = svc.decoder() // codec init, once per partition
        rows.map { case (id, mime, payload) =>
          val hash = decode(payload ++ s":$w:$h".getBytes("UTF-8"))
          MediaFeature(id, mime, payload.length.toLong, w, h, hash)
        }
      }
  }

  /** Build a media table whose payloads are REAL container bytes:
    * PNG and GIF headers assembled in-plan (signature + IHDR /
    * logical-screen descriptor with the row's dimensions encoded
    * big-/little-endian as the formats specify) — codegen'd binary
    * concat, no UDF. This is the honest counterpart of `mediaTable`'s
    * stand-in payloads: what the decoder reads back is genuinely
    * parsed from bytes. */
  // in-plan byte-assembly helpers shared by ALL the container
  // generators (image, AV, HEIF): codegen'd hex/lpad/unhex column
  // math — ONE definition so an encoding fix can't miss a copy.
  // Values must fit the stated width (the generators' dims/rates do
  // by construction; hex() of a wider value would over-length lpad).
  private def be8(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 2, "0"))
  private def be16(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 4, "0"))
  private def be32(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 8, "0"))
  private def be64(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 16, "0"))
  private def le16(c: org.apache.spark.sql.Column) =
    unhex(concat(lpad(hex(c.bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(c, 8)), 2, "0")))
  private def le24(c: org.apache.spark.sql.Column) =
    unhex(concat(lpad(hex(c.bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(c, 8).bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(c, 16).bitwiseAND(lit(255))), 2, "0")))
  private def le32(c: org.apache.spark.sql.Column) =
    unhex(concat(lpad(hex(c.bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(c, 8).bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(c, 16).bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(c, 24).bitwiseAND(lit(255))), 2, "0")))
  private def zeros(n: Int) = lit(Array.fill[Byte](n)(0))
  private def asciiLit(s: String) = lit(s.getBytes("US-ASCII"))

  def containerMediaTable(docs: DataFrame): DataFrame = {
    val w = (col("n_chars") % 100 + 1).cast("int")
    val h = (col("doc_id") % 50 + 1).cast("int")
    val pngHead = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R'))
    val gifHead = lit("GIF89a".getBytes("US-ASCII"))
    // WebP (r16): real RIFF/WEBP header bytes, two chunk shapes —
    // VP8L's packed 14-bit (width-1 | height-1 << 14) after the 0x2F
    // signature, and VP8X's 24-bit canvas-1 dims behind the ANIM
    // frame flag — the layouts modern crawls carry heavily
    val vp8lHead = concat(lit("RIFF".getBytes("US-ASCII")), le32(lit(17)),
      lit("WEBPVP8L".getBytes("US-ASCII")), le32(lit(5)), lit(Array[Byte](0x2f)))
    val vp8xHead = concat(lit("RIFF".getBytes("US-ASCII")), le32(lit(22)),
      lit("WEBPVP8X".getBytes("US-ASCII")), le32(lit(10)),
      lit(Array[Byte](0x02, 0, 0, 0))) // flags: ANIM set
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0,
        concat(pngHead, be32(w), be32(h)))
        .when(col("doc_id") % 3 === 1,
          concat(gifHead, le16(w), le16(h), lit(Array[Byte](0, 0))))
        .when(col("doc_id") % 6 === 2,
          concat(vp8lHead, le32((w - 1).bitwiseOR(shiftleft(h - 1, 14)))))
        .otherwise(concat(vp8xHead, le24(w - 1), le24(h - 1)))
        .as("payload"),
      w.as("width"), h.as("height"))
  }

  /** Audio/video sibling of `containerMediaTable`: payloads are REAL
    * MP4 (ISO-BMFF ftyp + moov > mvhd/tkhd), MP3 (ID3v2 envelope +
    * MPEG-1 Layer III frame header) and FLAC (STREAMINFO bitfields)
    * bytes assembled in-plan — codegen'd binary concat, no UDF. The
    * decoder walks them back: box sizes, synchsafe ID3 skip, 20/3/5/36
    * bit unpack; every field the walk recovers is mirrored column
    * arithmetic the oracle replays. */
  def avMediaTable(docs: DataFrame): DataFrame = {
    def ascii(s: String) = asciiLit(s)
    val w = (col("n_chars") % 100 + 1).cast("long")
    val h = (col("doc_id") % 50 + 1).cast("long")
    val durMs = ((col("n_chars") % 1000 + 1) * 10).cast("long")
    // mvhd v0: timescale 1000, duration in ms; rate 1.0; next track 2
    val mvhd = concat(
      be32(lit(108)), ascii("mvhd"), zeros(12),
      be32(lit(1000)), be32(durMs),
      lit(Array[Byte](0, 1, 0, 0)), zeros(72), be32(lit(2)))
    // tkhd v0: flags 7 (enabled), track 1, 16.16 fixed-point dims
    val tkhd = concat(
      be32(lit(92)), ascii("tkhd"), be32(lit(7)), zeros(8),
      be32(lit(1)), zeros(4), be32(durMs), zeros(16), zeros(36),
      be32(shiftleft(w, 16)), be32(shiftleft(h, 16)))
    val ftypVideo = concat(be32(lit(16)), ascii("ftypisom"), zeros(4))
    val ftypAudio = concat(be32(lit(16)), ascii("ftypM4A "), zeros(4))
    val mp4Video = concat(ftypVideo, be32(lit(216)), ascii("moov"),
      mvhd, be32(lit(100)), ascii("trak"), tkhd)
    val mp4Audio = concat(ftypAudio, be32(lit(116)), ascii("moov"), mvhd)
    // ID3v2.3 envelope (synchsafe size 32, zero padding) + frame sync:
    // 0xFFFB = MPEG-1 Layer III no-CRC; byte 2 packs bitrate index
    // (1..14) and samplerate index (0..2)
    val brIdx = (col("doc_id") % 14 + 1).cast("long")
    val srIdx = (col("doc_id") % 3).cast("long")
    val mp3 = concat(
      ascii("ID3"), lit(Array[Byte](3, 0, 0)), be32(lit(32)), zeros(32),
      lit(Array[Byte](0xff.toByte, 0xfb.toByte)),
      be8(brIdx * 16 + srIdx * 4), zeros(1))
    // FLAC STREAMINFO: last-block flag + type 0, length 34; the 8-byte
    // packed word = rate(20) | channels-1(3) | bps-1(5) | samples(36)
    val flacSr = element_at(
      array(Seq(8000, 16000, 32000, 44100, 48000).map(v => lit(v.toLong)): _*),
      (col("doc_id") % 5 + 1).cast("int"))
    val flacCh = (col("doc_id") % 2 + 1).cast("long")
    val flacTotal = (col("n_chars") * 50).cast("long")
    val flacPacked = shiftleft(flacSr, 44)
      .bitwiseOR(shiftleft(flacCh - 1, 41))
      .bitwiseOR(lit(15L << 36)).bitwiseOR(flacTotal)
    val flac = concat(
      ascii("fLaC"), lit(Array[Byte](0x80.toByte, 0, 0, 34)),
      be16(lit(4096)), be16(lit(4096)), zeros(6), be64(flacPacked), zeros(16))
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 4 === 0, mp4Video)
        .when(col("doc_id") % 4 === 1, mp4Audio)
        .when(col("doc_id") % 4 === 2, mp3)
        .otherwise(flac).as("payload"))
  }

  /** Bit-writer for the REAL baseline-profile H.264 SPS the codecs
    * table embeds (ISO 14496-10 §7.3.2.1): exp-Golomb fields, POC
    * type 0, frame_mbs_only, no cropping, emulation-prevention bytes
    * inserted. Driver-side constant — the dims are class constants,
    * so each whole NAL is ONE literal in the plan; the decoder's
    * spsDims must walk the real bitstream back. */
  private[multimodal] def spsNal(wMb: Int, hMb: Int): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bits += ((v >> k) & 1L).toInt; k -= 1 }
    }
    def ue(v: Long): Unit = {
      val vv = v + 1
      val nb = 64 - java.lang.Long.numberOfLeadingZeros(vv)
      u(0L, nb - 1); u(vv, nb)
    }
    u(0x67, 8) // NAL header: ref_idc 3, type 7 (SPS)
    u(66, 8)   // profile_idc: baseline
    u(0, 8)    // constraint flags
    u(30, 8)   // level_idc 3.0
    ue(0)      // seq_parameter_set_id
    ue(0)      // log2_max_frame_num_minus4
    ue(0)      // pic_order_cnt_type = 0
    ue(0)      // log2_max_pic_order_cnt_lsb_minus4
    ue(1)      // max_num_ref_frames
    u(0, 1)    // gaps_in_frame_num_value_allowed
    ue(wMb - 1L)
    ue(hMb - 1L)
    u(1, 1)    // frame_mbs_only
    u(0, 1)    // direct_8x8_inference
    u(0, 1)    // frame_cropping
    u(0, 1)    // vui_parameters_present
    u(1, 1)    // rbsp_stop_one_bit
    while (bits.length % 8 != 0) bits += 0
    val raw = bits.grouped(8)
      .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    // emulation prevention AFTER the NAL header byte: 00 00 <=03
    // sequences get a 03 interposed so a decoder's de-emulation
    // reverses exactly
    val out = scala.collection.mutable.ArrayBuffer[Byte](raw(0))
    var zrun = 0
    var i = 1
    while (i < raw.length) {
      val b = raw(i) & 0xff
      if (zrun >= 2 && b <= 3) { out += 3; zrun = 0 }
      out += raw(i)
      zrun = if (b == 0) zrun + 1 else 0
      i += 1
    }
    out.toArray
  }

  /** The constant trak tail carrying a genuine decoder config:
    * mdia > minf > stbl > stsd > avc1 (VisualSampleEntry) > avcC
    * with ONE real SPS — the chain `parseMedia`'s coded-dims walk
    * descends. Box sizes computed here once; the whole subtree is a
    * class-constant literal in the generated plan. */
  private[multimodal] def avcTrackTailBytes(wMb: Int, hMb: Int): Array[Byte] = {
    def be32b(v: Long) = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16b(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, payload: Array[Byte]*): Array[Byte] = {
      val p = payload.toArray.flatten
      be32b(p.length + 8L) ++ name.getBytes("US-ASCII") ++ p
    }
    val sps = spsNal(wMb, hMb)
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
      be16b(sps.length), sps, Array[Byte](0)) // 0 PPS (config-only)
    val avc1 = box("avc1",
      new Array[Byte](6), be16b(1), // reserved + data_reference_index
      new Array[Byte](16), // pre_defined/reserved
      be16b(wMb * 16), be16b(hMb * 16), // sample-entry dims
      new Array[Byte](50), // resolution/frame_count/name/depth tail
      avcC)
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32b(1), avc1)
    box("mdia", box("minf", box("stbl", stsd)))
  }

  /** Codec-realism sibling of `avMediaTable` (r17): OGG pages whose
    * first packet is a REAL Vorbis/Opus identification header, and
    * MP4 video whose trak carries a genuine avcC decoder config — the
    * CODED H.264 dims come from exp-Golomb SPS fields, not the
    * container's tkhd (which can lie: matrix scaling, crop). Page
    * checksums are zero (the walk does not verify CRCs, like every
    * metadata-only sniffer). */
  def codecsMediaTable(docs: DataFrame): DataFrame = {
    def ascii(s: String) = asciiLit(s)
    val ch = (col("doc_id") % 2 + 1).cast("long")
    // ogg BOS page: magic, version 0, type 0x02, granule/serial/seq/
    // crc zeroed, ONE lacing segment = the id packet
    def oggPage(bodyLen: Int, body: org.apache.spark.sql.Column) = concat(
      ascii("OggS"), zeros(1), lit(Array[Byte](2)), zeros(20),
      lit(Array[Byte](1, bodyLen.toByte)), body)
    val vorbisRate = element_at(
      array(Seq(8000, 16000, 22050, 44100, 48000).map(v => lit(v.toLong)): _*),
      (col("doc_id") % 5 + 1).cast("int"))
    val vorbis = oggPage(30, concat(
      lit(Array[Byte](1)), ascii("vorbis"), zeros(4),
      be8(ch), le32(vorbisRate), zeros(12),
      lit(Array[Byte](0xb8.toByte, 1))))
    val opusRate = element_at(
      array(Seq(48000, 44100, 16000).map(v => lit(v.toLong)): _*),
      (col("doc_id") % 3 + 1).cast("int"))
    val opus = oggPage(19, concat(
      ascii("OpusHead"), lit(Array[Byte](1)), be8(ch),
      zeros(2), le32(opusRate), zeros(3)))
    // the avMediaTable mvhd/tkhd contract (same oracle arithmetic)
    val w = (col("n_chars") % 100 + 1).cast("long")
    val h = (col("doc_id") % 50 + 1).cast("long")
    val durMs = ((col("n_chars") % 1000 + 1) * 10).cast("long")
    val mvhd = concat(
      be32(lit(108)), ascii("mvhd"), zeros(12),
      be32(lit(1000)), be32(durMs),
      lit(Array[Byte](0, 1, 0, 0)), zeros(72), be32(lit(2)))
    val tkhd = concat(
      be32(lit(92)), ascii("tkhd"), be32(lit(7)), zeros(8),
      be32(lit(1)), zeros(4), be32(durMs), zeros(16), zeros(36),
      be32(shiftleft(w, 16)), be32(shiftleft(h, 16)))
    val ftypVideo = concat(be32(lit(16)), ascii("ftypisom"), zeros(4))
    def avcMp4(wMb: Int, hMb: Int) = {
      val tail = avcTrackTailBytes(wMb, hMb)
      val trakSize = 8 + 92 + tail.length
      concat(ftypVideo, be32(lit(8 + 108 + trakSize)), ascii("moov"), mvhd,
        be32(lit(trakSize)), ascii("trak"), tkhd, lit(tail))
    }
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 4 === 0, vorbis)
        .when(col("doc_id") % 4 === 1, opus)
        .when(col("doc_id") % 4 === 2, avcMp4(20, 15)) // coded 320x240
        .otherwise(avcMp4(80, 45)).as("payload"))      // coded 1280x720
  }

  /** HEIF media table (r16): real AVIF/HEIC structures — ISO-BMFF
    * like MP4, but an IMAGE format whose dims live in the
    * meta > iprp > ipco > ispe property chain (meta and ispe are
    * fullboxes, so 4 version/flags bytes precede their payloads).
    * AVIF is the fastest-growing crawled image format; the walker
    * must route on the ftyp BRAND, not just the box signature. */
  def heifMediaTable(docs: DataFrame): DataFrame = {
    def ascii(s: String) = asciiLit(s)
    val w = (col("n_chars") % 512 + 1).cast("long")
    val h = (col("doc_id") % 512 + 1).cast("long")
    val ispe = concat(be32(lit(20)), ascii("ispe"), zeros(4), be32(w), be32(h))
    val meta = concat(be32(lit(48)), ascii("meta"), zeros(4),
      be32(lit(36)), ascii("iprp"), be32(lit(28)), ascii("ipco"), ispe)
    def ftyp(brand: String) =
      concat(be32(lit(16)), ascii("ftyp" + brand), zeros(4))
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, concat(ftyp("avif"), meta))
        .otherwise(concat(ftyp("heic"), meta)).as("payload"))
  }

  /** Census corpus: every container family the walkers understand —
    * the image half (`containerMediaTable`) unioned with the AV half
    * (`avMediaTable`) — plus a torn-asset class (every doc_id % 9 == 0
    * payload truncated to 5 bytes), which is what a real crawl's media
    * column looks like: mixed formats with a corrupt tail. */
  def censusMediaTable(docs: DataFrame): DataFrame = {
    val all = containerMediaTable(docs).select("media_id", "payload")
      .unionByName(avMediaTable(docs).select("media_id", "payload"))
      .unionByName(codecsMediaTable(docs).select("media_id", "payload"))
    all.select(col("media_id"),
      when(col("media_id") % 9 === 0, expr("substring(payload, 1, 5)"))
        .otherwise(col("payload")).as("payload"))
  }

  /** Media census — the top-of-funnel triage a 100 TB crawl pipeline
    * runs before any decode: header-walk every payload, count by
    * recovered format (torn assets land in their fallback class). The
    * heavy binary column is consumed map-side; the exchange carries
    * one row per FORMAT, not per asset — a partial-agged groupBy over
    * a single-digit key space. */
  def mediaCensus(spark: SparkSession, media: DataFrame): DataFrame =
    decodeContainerMeta(spark, media).toDF()
      .groupBy(split(col("meta"), " ").getItem(0).as("format"))
      .agg(count(lit(1)).as("n"))

  /** REAL container decode: per-partition header parsing of the binary
    * payload (PNG/GIF/JPEG via CorpusFittedService.parseMedia) — this
    * half of multimodal decode is honest byte decoding, no media lib
    * required; only pixel decode remains a declared stub behind the
    * inference seam. Same mapPartitions shape as decodeFeatures, so a
    * full codec swaps into identical plumbing. */
  def decodeContainerMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaMeta(id, graft.inference.CorpusFittedService.parseMedia(payload))
      })
  }

  // ---- REAL pixel/sample decode (r13: no stub anywhere in this path) --

  /** The deterministic pixel function both the encoder and the DuckDB
    * oracle evaluate: what makes decoded-stats oracle-checkable without
    * a media library on the oracle side. */
  private[multimodal] def pxOf(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x.toLong * 7 + y.toLong * 13) % 256).toInt
  private[multimodal] def sampleOf(id: Long, i: Int): Short =
    ((id * 17 + i.toLong * 29) % 4096 - 2048).toShort

  /** Media table whose payloads are COMPLETE media files: even doc_ids
    * become real PNGs (zlib-deflated, filtered scanlines), odd ones
    * real 16-bit PCM WAVs — generated per partition, never on the
    * driver. Dims/lengths derive from doc_id; pixel values from
    * `pxOf`/`sampleOf`, so the decode side is verifiable end-to-end. */
  def pixelMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      if (id % 2 == 0) {
        val w = (id % 48 + 8).toInt; val h = (id % 32 + 8).toInt
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = pxOf(id, x, y).toByte; x += 1 }
          y += 1
        }
        (id, "image/png", Png.encodeGray(w, h, px))
      } else {
        val n = (id % 256 + 16).toInt
        (id, "audio/wav", Wav.encodePcm16(Array.tabulate(n)(i => sampleOf(id, i))))
      }
    }).toDF("media_id", "mime", "payload")
  }

  /** Decode REAL payload bytes (PNG inflate+unfilter, or WAV PCM chunk
    * walk) and fold pixel/sample statistics — the honest successor of
    * `decodeFeatures`' hash stub. Map-only; the binary never shuffles;
    * stats are integer-exact so the oracle can re-derive them. */
  def decodePixelStats(spark: SparkSession, media: DataFrame): Dataset[PixelStats] = {
    import spark.implicits._
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        if (payload.length > 0 && (payload(0) & 0xff) == 0x89)
          statsOf(id, Png.decode(payload))
        else {
          val a = Wav.decodePcm16(payload)
          var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          a.samples.foreach { v => s += v; if (v < mn) mn = v; if (v > mx) mx = v }
          PixelStats(id, "wav", 1, a.samples.length, a.samples.length.toLong, s, mn, mx)
        }
      })
  }

  /** Tone-corpus media table: every payload is a REAL 16-bit PCM WAV
    * carrying one quantized sinusoid at an integer FFT bin — 256
    * samples of round(1000 * sin(2*pi*b*i/256)) at 25600 Hz, so bin b
    * sits at exactly b*100 Hz. Generated per partition like
    * `pixelMediaTable`; the tone bin derives from doc_id, which is
    * what lets the oracle state the expected spectrum analytically. */
  def toneMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val b = (id % 100 + 1).toInt
      val s = Array.tabulate(256)(i =>
        math.round(1000.0 * math.sin(2.0 * math.Pi * b * i / 256.0)).toShort)
      (id, "audio/wav", Wav.encodePcm16(s, sampleRate = 25600))
    }).toDF("media_id", "mime", "payload")
  }

  /** REAL spectral feature extraction: WAV chunk-walk decode, then a
    * radix-2 FFT over the leading power-of-two window and the dominant
    * bin read off the magnitude spectrum (`Dsp.dominantBin`). Map-only
    * executor work — the payload never shuffles, the output is a few
    * integers per row; at 100 TB this pass has the same shape as the
    * pixel decode: embarrassingly parallel, bounded memory (one window
    * per row at a time). */
  def spectralFeatures(spark: SparkSession, media: DataFrame, window: Int = 256): Dataset[SpectralFeature] = {
    import spark.implicits._
    require(window > 0 && (window & (window - 1)) == 0,
      s"FFT window must be a power of two, got $window")
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val a = Wav.decodePcm16(payload)
        val bin = Dsp.dominantBin(a.samples, window)
        SpectralFeature(id, a.sampleRate, a.samples.length, bin,
          bin.toLong * a.sampleRate / window)
      })
  }

  /** Two-segment chirp corpus for the STFT path: 512 real PCM samples,
    * the first 256 a sine at bin b, the second 256 at bin b+40 — a
    * frequency STEP the single-window FFT cannot see but per-frame
    * analysis must. Same generation contract as `toneMediaTable`. */
  def chirpMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val b1 = (id % 60 + 1).toInt; val b2 = b1 + 40
      val s = Array.tabulate(512) { i =>
        val b = if (i < 256) b1 else b2
        math.round(1000.0 * math.sin(2.0 * math.Pi * b * (i % 256) / 256.0)).toShort
      }
      (id, "audio/wav", Wav.encodePcm16(s, sampleRate = 25600))
    }).toDF("media_id", "mime", "payload")
  }

  /** Short-time Fourier transform features: decode, slice the PCM into
    * hop-aligned frames, FFT each, emit one row per frame with its
    * dominant bin — the temporal sibling of `spectralFeatures` (what a
    * pipeline runs for VAD, music/speech gates, audio chunking). The
    * 1->n flatMap mirrors `sampleFrames`' video frame fan-out; frames
    * of one row never leave the task, so the pass stays map-only. */
  def stftFrames(spark: SparkSession, media: DataFrame,
      window: Int = 256, hop: Int = 256): Dataset[AudioFrame] = {
    import spark.implicits._
    require(window > 0 && (window & (window - 1)) == 0,
      s"FFT window must be a power of two, got $window")
    require(hop > 0, s"hop must be positive, got $hop")
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val a = Wav.decodePcm16(payload)
        val nFrames = math.max(0, (a.samples.length - window) / hop + 1)
        (0 until nFrames).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(
            a.samples, f * hop, f * hop + window)
          val bin = Dsp.dominantBin(frame, window)
          AudioFrame(id, f, bin, bin.toLong * a.sampleRate / window)
        }
      })
  }

  private def statsOf(id: Long, img: Png.Image): PixelStats = {
    var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
    img.pixels.foreach { b => val v = (b & 0xff).toLong; s += v; if (v < mn) mn = v; if (v > mx) mx = v }
    PixelStats(id, "png", img.width, img.height, img.pixels.length.toLong, s, mn, mx)
  }

  /** RGB media table + per-channel decode stats: real 3-channel PNGs
    * (color type 2, interleaved) generated in-task with a per-channel
    * deterministic formula; decode folds channel-separated sums so the
    * oracle can re-derive each channel independently — a channel-order
    * or interleave bug anywhere breaks exactly one channel's hash. */
  def rgbMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val w = (id % 24 + 4).toInt; val h = (id % 16 + 4).toInt
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (y * w + x) * 3
          px(base) = pxOf(id, x, y).toByte                    // R: the gray formula
          px(base + 1) = ((id * 17 + x * 11 + y * 5) % 256).toByte  // G
          px(base + 2) = ((id * 23 + x * 3 + y * 19) % 256).toByte  // B
          x += 1
        }
        y += 1
      }
      (id, Png.encodeRgb(w, h, px))
    }).toDF("media_id", "payload")
  }

  /** Decode RGB payloads and fold PER-CHANNEL sums. */
  def decodeRgbStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = Png.decode(payload)
        require(img.channels == 3, s"expected RGB, got ${img.channels} channel(s)")
        var r = 0L; var g = 0L; var b = 0L
        var i = 0
        while (i < img.pixels.length) {
          r += img.pixels(i) & 0xff
          g += img.pixels(i + 1) & 0xff
          b += img.pixels(i + 2) & 0xff
          i += 3
        }
        (id, img.width, img.height, r, g, b)
      }).toDF("media_id", "width", "height", "r_sum", "g_sum", "b_sum")
  }

  /** Paletted media table: COMPLETE color-type-3 PNGs generated
    * in-task — a 64-entry palette and an index plane both from
    * deterministic formulas, so the oracle can state every expanded
    * channel value as composed arithmetic. Paletted PNGs are the
    * icon/graphic share of a real crawl; the decode path must expand
    * PLTE indices, not just pass raster bytes through. */
  def paletteMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val w = (id % 24 + 4).toInt; val h = (id % 16 + 4).toInt
      val pal = new Array[Byte](64 * 3)
      var j = 0
      while (j < 64) {
        pal(j * 3) = ((j * 5 + 7) % 256).toByte
        pal(j * 3 + 1) = ((j * 11 + 3) % 256).toByte
        pal(j * 3 + 2) = ((j * 17 + 1) % 256).toByte
        j += 1
      }
      val idx = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          idx(y * w + x) = ((id * 7 + x * 3 + y * 5) % 64).toByte
          x += 1
        }
        y += 1
      }
      (id, Png.encodePalette(w, h, pal, idx))
    }).toDF("media_id", "payload")
  }

  /** Stereo media table: real 2-channel interleaved PCM WAVs (block
    * align 4), each channel from its own deterministic formula — a
    * de-interleave bug breaks exactly one channel's sums, the same
    * single-fault isolation the RGB channel key gives images. */
  def stereoMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val n = (id % 200 + 32).toInt
      val l = Array.tabulate(n)(i => ((id * 13 + i.toLong * 7) % 4096 - 2048).toShort)
      val r = Array.tabulate(n)(i => ((id * 19 + i.toLong * 11) % 4096 - 2048).toShort)
      (id, Wav.encodePcm16Stereo(l, r))
    }).toDF("media_id", "payload")
  }

  /** Decode stereo payloads and fold PER-CHANNEL sums — the audio twin
    * of `decodeRgbStats`. */
  def decodeStereoStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val a = Wav.decodePcm16Stereo(payload)
        var ls = 0L; var rs = 0L
        a.left.foreach(ls += _); a.right.foreach(rs += _)
        (id, a.left.length, ls, rs)
      }).toDF("media_id", "n_samples", "l_sum", "r_sum")
  }

  /** Real resize: decode -> nearest-neighbor resample -> RE-ENCODE ->
    * RE-DECODE -> stats. The second encode/decode round trip is
    * deliberate: the stats prove the codec reproduces the resampled
    * pixels bit-exactly, not just that the resampler ran. PNG
    * payloads only (resampling PCM is a different op) — feed it the
    * image half of `pixelMediaTable`. */
  def resizePixelStats(
      spark: SparkSession, media: DataFrame, w2: Int, h2: Int): Dataset[PixelStats] = {
    import spark.implicits._
    require(w2 > 0 && h2 > 0, s"bad target dims ${w2}x$h2")
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val resized = Png.resizeNearest(Png.decode(payload), w2, h2)
        statsOf(id, Png.decode(Png.encodeGray(resized.width, resized.height, resized.pixels)))
      })
  }

  private[graft] def pxFrame(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f.toLong * 41 + x.toLong * 7 + y.toLong * 13) % 256).toInt

  /** Media table whose payloads are COMPLETE animated GIF89a files —
    * the frame-sequence ("video") analog of `pixelMediaTable`: each
    * doc becomes a real multi-frame GIF (gray global palette, real
    * variable-width LZW streams per frame), generated per partition.
    * Frame count and dims derive from doc_id; pixel values from
    * `pxFrame`, so frame sampling downstream is verifiable per frame. */
  def gifMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val w = (id % 24 + 4).toInt; val h = (id % 16 + 4).toInt
      val n = (id % 5 + 2).toInt
      val frames = (0 until n).map { f =>
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = pxFrame(id, f, x, y).toByte; x += 1 }
          y += 1
        }
        px
      }
      (id, n, Gif.encodeGrayAnimated(w, h, frames))
    }).toDF("media_id", "n_frames", "payload")
  }

  /** Media table whose payloads are COMPLETE baseline JFIF files —
    * real JPEGs from the in-JDK encoder over a deterministic gray
    * pattern. JPEG is LOSSY, so the expected pixel stats ride along
    * in the same row, computed at GENERATION time by decoding the
    * actual bytes: the downstream re-decode must reproduce them
    * exactly (byte round-trip + decoder determinism), which is the
    * published way to oracle-check a lossy codec. Dims are mostly
    * NOT multiples of 8, so the MCU edge-padding path is exercised. */
  def jpegMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val w = (id % 21 + 12).toInt
      val h = (id % 13 + 10).toInt
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = ((id * 7 + x * 3 + y * 5) % 256).toByte; x += 1
        }
        y += 1
      }
      // a third of the corpus encodes PROGRESSIVE (SOF2, r16) — the
      // double-digit share real crawls carry; the generation-time
      // decode computes stats from whatever bytes were produced, so
      // the persisted-stats oracle contract is mode-agnostic
      val payload = Jpeg.encodeGray(w, h, px, progressive = id % 3 == 0)
      val img = Jpeg.decodeGray(payload)
      var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      img.pixels.foreach { b =>
        val v = (b & 0xff).toLong
        s += v; if (v < mn) mn = v; if (v > mx) mx = v
      }
      (id, payload, img.width, img.height, img.pixels.length.toLong, s, mn, mx)
    }).toDF("media_id", "payload", "width", "height", "n_px", "px_sum", "px_min", "px_max")
  }

  /** Color sibling of `jpegMediaTable`: real COLOR JFIF payloads
    * (YCbCr through the JDK writer — subsampled chroma, the shape
    * web assets actually ship) with generation-time per-channel sums
    * persisted beside the bytes, same lossy-codec contract. */
  def jpegRgbMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.util.Stages.fanOut(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val w = (id % 19 + 10).toInt
      val h = (id % 11 + 9).toInt
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          rgb(i) = ((id * 31 + x * 7 + y * 13) % 256).toByte
          rgb(i + 1) = ((id * 17 + x * 11 + y * 5) % 256).toByte
          rgb(i + 2) = ((id * 23 + x * 3 + y * 19) % 256).toByte
          x += 1
        }
        y += 1
      }
      val payload = Jpeg.encodeRgb(w, h, rgb)
      val img = Jpeg.decodeRgb(payload)
      var rs = 0L; var gs = 0L; var bs = 0L
      var i = 0
      while (i < w * h) {
        rs += img.pixels(3 * i) & 0xff
        gs += img.pixels(3 * i + 1) & 0xff
        bs += img.pixels(3 * i + 2) & 0xff
        i += 1
      }
      (id, payload, img.width, img.height, (w.toLong * h), rs, gs, bs)
    }).toDF("media_id", "payload", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** Per-channel sums recomputed by DECODING each color payload. */
  def jpegRgbPixelStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = Jpeg.decodeRgb(payload)
        var rs = 0L; var gs = 0L; var bs = 0L
        var i = 0
        while (i < img.width * img.height) {
          rs += img.pixels(3 * i) & 0xff
          gs += img.pixels(3 * i + 1) & 0xff
          bs += img.pixels(3 * i + 2) & 0xff
          i += 1
        }
        (id, img.width, img.height, img.width.toLong * img.height, rs, gs, bs)
      }).toDF("media_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** Integer-exact gray stats recomputed by DECODING each JPEG
    * payload — map-only, payloads never shuffle. */
  def jpegPixelStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = Jpeg.decodeGray(payload)
        var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        img.pixels.foreach { b =>
          val v = (b & 0xff).toLong
          s += v; if (v < mn) mn = v; if (v > mx) mx = v
        }
        (id, img.width, img.height, img.pixels.length.toLong, s, mn, mx)
      }).toDF("media_id", "width", "height", "n_px", "px_sum", "px_min", "px_max")
  }

  /** REAL frame sampling: walk each GIF container, LZW-decode every
    * frame ONCE, keep frames at the requested stride (the fps-halving
    * shape at stride 2) and fold integer-exact per-frame pixel stats.
    * Map-only with an iterator fan-out (1 asset -> kept frames) — the
    * payload never shuffles; only the tiny stats rows do. */
  def gifFrameStats(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    require(stride > 0, s"bad stride $stride")
    media.select("media_id", "payload")
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Gif.decode(payload).iterator
          .filter(_.index % stride == 0)
          .map { fr =>
            var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
            fr.pixels.foreach { b =>
              val v = (b & 0xff).toLong
              s += v; if (v < mn) mn = v; if (v > mx) mx = v
            }
            (id, fr.index, fr.width, fr.height, fr.pixels.length.toLong, s, mn, mx)
          }
      }).toDF("media_id", "frame_idx", "width", "height", "n_px", "px_sum", "px_min", "px_max")
  }
}

/** Parsed container metadata of one media asset. */
case class MediaMeta(media_id: Long, meta: String)

/** Integer-exact decoded pixel/sample statistics of one media asset
  * (width/height = 1/n_samples for audio). */
case class PixelStats(
    media_id: Long, kind: String, width: Int, height: Int,
    n_values: Long, v_sum: Long, v_min: Long, v_max: Long)

/** One sampled frame of a media asset. */
case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: String)
case class SpectralFeature(media_id: Long, sample_rate: Int, n_samples: Int,
    dominant_bin: Int, dominant_freq_hz: Long)
case class AudioFrame(media_id: Long, frame_idx: Int,
    dominant_bin: Int, dominant_freq_hz: Long)
