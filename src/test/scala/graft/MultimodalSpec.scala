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

  test("entry + every registered query is runnable at sf0.001 (smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
