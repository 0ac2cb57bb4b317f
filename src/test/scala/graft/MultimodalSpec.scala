package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: opaque binary + typed metadata, mime partition-able") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sfDir))
    val mimes = media.select("mime").distinct().as[String].collect().toSet
    assert(mimes == Set("image/png", "audio/wav", "video/mp4"))
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("metadata pass: byte length and content hash match the payload") {
    val docs = Tables.documents(spark, sfDir).limit(10)
    val meta = Multimodal.metadata(Multimodal.mediaTable(docs))
      .select("media_id", "n_bytes", "content_hash").as[(Long, Long, String)].collect()
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    meta.foreach { case (id, nBytes, hash) =>
      assert(nBytes == texts(id).getBytes("UTF-8").length.toLong)
      assert(hash.length == 32)
    }
  }

  test("decodeFeatures: typed mapPartitions decode path (stubbed codec)") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val feats = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(docs)).collect()
    assert(feats.length == 50)
    // stub decode = md5(payload): must agree with the column-side hash
    val metaHash = Multimodal.metadata(Multimodal.mediaTable(docs))
      .select("media_id", "content_hash").as[(Long, String)].collect().toMap
    feats.foreach(f => assert(f.feat_hash == metaHash(f.media_id)))
    assert(feats.forall(f => f.width >= 32 && f.height >= 32))
  }

  test("frame sampling fans out n frames per asset, deterministic hashes") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sfDir).limit(10))
    val frames = Multimodal.sampleFrames(spark, media, 4).collect()
    assert(frames.length == 40)
    assert(frames.map(f => (f.media_id, f.frame_idx)).distinct.length == 40)
    val again = Multimodal.sampleFrames(spark, media, 4).collect()
    assert(frames.map(_.frame_hash).sorted.toSeq == again.map(_.frame_hash).sorted.toSeq)
  }

  test("resize rewrites dims and changes the content hash deterministically") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sfDir).limit(5))
    val r = Multimodal.resize(spark, media, 224, 224).collect()
    assert(r.forall(f => f.width == 224 && f.height == 224))
    val r2 = Multimodal.resize(spark, media, 64, 64).collect()
    assert(r.map(_.feat_hash).toSet.intersect(r2.map(_.feat_hash).toSet).isEmpty)
  }

  test("routing write partitions the index directory by the routing column") {
    import graft.sources.Connector.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toString + "/idx"
    Tables.documents(spark, sfDir).limit(50)
      .saveToGraft(dir, Map("graft.mapping.id" -> "doc_id", "graft.mapping.routing" -> "lang"))
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(parts.exists(_.startsWith("lang=")))
    // multi-index read: "idx1,idx2" unions two indices
    val dir2 = java.nio.file.Files.createTempDirectory("graft_route2").toString + "/idx"
    Tables.documents(spark, sfDir).where(col("doc_id") >= 50).limit(25)
      .saveToGraft(dir2, Map("graft.mapping.id" -> "doc_id", "graft.mapping.routing" -> "lang"))
    assert(spark.graftDF(s"$dir,$dir2").count() == 75)
  }

  test("WebP header metadata: VP8/VP8L/VP8X dims + ANIM flag; malformed stays opaque (r16)") {
    import graft.inference.CorpusFittedService.parseMedia
    def riff(chunk: String, data: Array[Byte]): Array[Byte] = {
      val size = 4 + 8 + data.length
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte]((size & 255).toByte, ((size >> 8) & 255).toByte,
          ((size >> 16) & 255).toByte, ((size >> 24) & 255).toByte) ++
        ("WEBP" + chunk).getBytes("US-ASCII") ++
        Array[Byte]((data.length & 255).toByte, ((data.length >> 8) & 255).toByte,
          ((data.length >> 16) & 255).toByte, ((data.length >> 24) & 255).toByte) ++
        data
    }
    // VP8 lossy: 3 frame-tag bytes, sync 9D 01 2A, 14-bit LE dims
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 255).toByte, (320 >> 8).toByte, (240 & 255).toByte, (240 >> 8).toByte))
    assert(parseMedia(vp8) == "webp 320x240")
    // VP8L lossless: 0x2F signature, width-1 | height-1 << 14 packed LE32
    val bits = (99L) | (49L << 14)
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (bits & 255).toByte, ((bits >> 8) & 255).toByte,
      ((bits >> 16) & 255).toByte, ((bits >> 24) & 255).toByte))
    assert(parseMedia(vp8l) == "webp 100x50")
    // VP8X extended: ANIM flag + 24-bit canvas-1 dims
    val vp8x = riff("VP8X", Array[Byte](0x02, 0, 0, 0,
      (1279 & 255).toByte, ((1279 >> 8) & 255).toByte, 0,
      (719 & 255).toByte, ((719 >> 8) & 255).toByte, 0))
    assert(parseMedia(vp8x) == "webp 1280x720 anim")
    // no ANIM flag -> no frame marker
    val still = riff("VP8X", Array[Byte](0x00, 0, 0, 0,
      (15 & 255).toByte, 0, 0, (7 & 255).toByte, 0, 0))
    assert(parseMedia(still) == "webp 16x8")
    // truncated / unknown chunk: stays a sized webp, never garbage dims
    assert(parseMedia(riff("ALPH", Array[Byte](1, 2, 3))).startsWith("webp ") &&
      parseMedia(riff("ALPH", Array[Byte](1, 2, 3))).endsWith("B"))
    // bad VP8 sync code falls through to the opaque form
    val badSync = riff("VP8 ", Array[Byte](0, 0, 0, 1, 2, 3, 4, 5, 6, 7))
    assert(parseMedia(badSync).endsWith("B"))
    // pixel decode of webp is OUT of codec scope: loud reject at the
    // decoders' own format gates
    intercept[IllegalArgumentException](graft.multimodal.Png.decode(vp8l))
    intercept[IllegalArgumentException](graft.multimodal.Jpeg.decodeGray(vp8))
  }

  test("entry + every registered query is runnable at sf0.001 (smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
