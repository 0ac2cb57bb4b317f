package graft

import graft.sim.Ann
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class AnnTextSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")

  test("brute-force ANN: nearest first, self excluded, rank dense") {
    val r = Ann.bruteForceTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding", 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(r.map(_._2).toSeq == Seq(2L, 3L, 4L) || r.head._2 == 2L)
    assert(!r.map(_._2).contains(1L))
    assert(r.map(_._4).toSeq == Seq(1, 2, 3))
  }

  test("LSH ANN returns a subset of brute-force candidates with exact cosines") {
    val brute = Ann.bruteForceTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding", 3)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._2, r._3)).toMap
    val lsh = Ann.lshTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding", 4, 3)
      .as[(Long, Long, Double, Int)].collect()
    lsh.foreach { r => assert(brute(r._2) == r._3) }
  }

  test("k-means fit: balanced-ish IVF lists, fitted probe works end-to-end") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      .as[(Long, Seq[Double])].collect()
    assert(cents.length == 8)
    assert(cents.forall(_._2.length == cents.head._2.length))
    // fitted centroids drive the same IVF probe path
    val r = Ann.ivfTopKWith(emb, emb.where(col("vec_id") < 3), "vec_id", "embedding",
      Ann.kmeansCentroids(emb, "vec_id", "embedding", 8, 2), nprobe = 3, k = 5)
      .as[(Long, Long, Double, Int)].collect()
    val byQuery = r.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq)
      assert(rows.sortBy(_._4).map(_._3).toSeq.reverse.sorted.reverse ==
        rows.sortBy(_._4).map(_._3).toSeq) // cosine descending by rank
    }
  }

  test("language id: stopword-heavy english text detected") {
    val df = Seq((1L, "the cat and the dog is in the house for a while")).toDF("id", "text")
    val (pl, ps) = TextAnalysis.languageId(col("text"))
    val r = df.select(pl, ps).as[(String, Double)].collect().head
    assert(r._1 == "en" && r._2 > 0.3)
  }

  test("quality: clean prose scores above junk") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away to the hills"),
      (2L, "@@@@ #### !!!! %%%% aa aa aa aa aa aa")).toDF("id", "text")
    val q = TextAnalysis.qualityScore(col("text"))(df)
      .select(col("id"), col("quality")).as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L))
  }

  test("token counts: ws vs bpe-ish") {
    val df = Seq((1L, "hello world42, ok!")).toDF("id", "text")
    val cs = TextAnalysis.tokenCounts(col("text"))
    val r = df.select(cs.map { case (n, c) => c.as(n) }: _*).as[(Long, Long)].collect().head
    assert(r._1 == 3L) // hello | world42, | ok!
    assert(r._2 == 7L) // hello, world, 4, 2, ',', ok, '!'
  }

  test("fingerprint: order-sensitive, deterministic") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("id", "text")
    val f = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(f(1L) == f(3L))
    assert(f(1L) != f(2L))
  }
}
