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

  test("entry + every registered query is runnable at sf0.001 (smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
