package graft

import java.security.MessageDigest

import graft.analysis.Analyzer
import graft.expr.HashKernels
import org.apache.spark.sql.functions._

/** Native Catalyst expressions vs independently-computed expected
  * values (the same definitions the DuckDB oracle implements). */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("TokenShingles: distinct ordered 3-grams, short docs empty") {
    val df = Seq(
      (1L, "a b c d c d e"), // includes a repeat window region
      (2L, "a b"), // too short
      (3L, "x y z x y z x y z") // heavy repeats
    ).toDF("id", "text")
    val r = df.select(col("id"), Analyzer.shingles(Analyzer.tokens(col("text"))).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(r(1L) == Seq("a b c", "b c d", "c d c", "d c d", "c d e"))
    assert(r(2L).isEmpty)
    assert(r(3L).toSet == Set("x y z", "y z x", "z x y"))
  }

  test("MinHashSig matches the reference definition") {
    val shingles = Seq("a b c", "b c d", "c d e")
    val md = MessageDigest.getInstance("MD5")
    val (as, bs) = HashKernels.coeffs(32)
    val expected = Array.fill(32)(HashKernels.P)
    shingles.foreach { s =>
      // reference: conv(substr(md5_hex,1,12),16,10)
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      (0 until 32).foreach { k =>
        val v = (h * as(k) + bs(k)) % HashKernels.P
        if (v < expected(k)) expected(k) = v
      }
    }
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val got = df.select(
      graft.dedup.Dedup.simhash32(col("text")).as("sim"), // smoke alongside
      org.apache.spark.sql.GraftBridge.column(graft.expr.MinHashSig(
        org.apache.spark.sql.GraftBridge.expression(
          Analyzer.shingles(Analyzer.tokens(col("text")))), 32)).as("sig"))
      .select(col("sig")).as[Seq[Long]].collect().head
    assert(got.toSeq == expected.toSeq)
  }

  test("Num.round matches binary half-away-from-zero (DuckDB semantics)") {
    import graft.util.Num
    val df = Seq(0.57405, 2.5, 3.5, -2.5, 0.00005, 1.23449999).toDF("x")
    val got = df.select(Num.round(col("x"), 4).as("r")).as[Double].collect().toSeq
    // 0.57405 stores as 0.574049..9 -> rounds DOWN on the binary value
    assert(got == Seq(0.574, 2.5, 3.5, -2.5, 1.0E-4, 1.2345))
    val g0 = Seq(2.5, 3.5, -2.5).toDF("x")
      .select(Num.round(col("x"), 0).as("r")).as[Double].collect().toSeq
    assert(g0 == Seq(3.0, 4.0, -3.0))
  }

  test("matchPhraseSlop: n-term in-order matching with bounded gaps") {
    import graft.search.Search
    val df = Seq(
      (1L, "a quick brown fox"),
      (2L, "quick x brown y fox"),
      (3L, "quick x y brown fox"),
      (4L, "fox brown quick")).toDF("id", "text")
    def ids(slop: Int) = df.where(Search.matchPhraseSlop(col("text"), "quick brown fox", slop))
      .select("id").as[Long].collect().toSet
    assert(ids(0) == Set(1L))
    assert(ids(1) == Set(1L, 2L))
    assert(ids(2) == Set(1L, 2L, 3L))
  }

  test("SimHash32: identical token sets -> identical sig; sig < 2^32") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "delta eps zeta"))
      .toDF("id", "text")
    val sigs = df.select(col("id"), graft.dedup.Dedup.simhash32(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L)) // order-insensitive (bag of distinct tokens)
    assert(sigs(1L) != sigs(3L))
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 32)))
  }

  test("Tokenize matches the HOF analyzer on mixed content") {
    val df = Seq("Fast Hash-Join! 42x", "  ", "ALL-CAPS..and...dots", "naïve café 3.14")
      .toDF("text")
    val both = df.select(
      graft.analysis.Analyzer.tokens(col("text")).as("native"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("GeoHash matches the public reference encoding") {
    // canonical example: Råbjerg Mile, Denmark
    val df = Seq((57.64911, 10.40744), (0.0, 0.0), (-25.382708, -49.265506))
      .toDF("lat", "lon")
    def gh(p: Int) = df.select(org.apache.spark.sql.GraftBridge.column(
      graft.expr.GeoHash(
        org.apache.spark.sql.GraftBridge.expression(col("lat")),
        org.apache.spark.sql.GraftBridge.expression(col("lon")), p)))
      .as[String].collect().toSeq
    assert(gh(11) == Seq("u4pruydqqvj", "s0000000000", "6gkzwgjzn82"))
    assert(gh(5) == Seq("u4pru", "s0000", "6gkzw"))
    // grid agg buckets and orders deterministically
    val g = graft.agg.Aggs.geohashGridAgg(
      Seq((1.0, 1.0), (1.01, 1.01), (50.0, 50.0)).toDF("lat", "lon"), "lat", "lon", 3, 10)
      .as[(String, Long)].collect()
    assert(g.head._2 == 2) // the two nearby points share a cell at p=3
  }

  test("declared inputTypes: wrong-typed args fail at analysis, numerics implicit-cast") {
    import org.apache.spark.sql.{Row, SparkSession}
    import org.apache.spark.sql.types._
    // getOrCreate ignores withExtensions when a session exists — build
    // a fresh one on the same SparkContext (cf. ConnectorSpec)
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val df = s2.createDataFrame(
        java.util.List.of(Row(1L, "ab", 12, 34)),
        StructType(Seq(StructField("n", LongType), StructField("s", StringType),
          StructField("la", IntegerType), StructField("lo", IntegerType))))
      df.createOrReplaceTempView("typed_probe")
      // analysis-time error (not an executor ClassCastException) for
      // un-castable argument types (a scalar where an array is needed)
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT simhash32(n) FROM typed_probe").schema
      }
      assert(err.getMessage.toLowerCase.contains("type"))
      intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT cosine_sim(s, s) FROM typed_probe").schema
      }
      // int lat/lon implicitly cast to double instead of erroring
      val gh = s2.sql("SELECT geohash(la, lo, 4) AS g FROM typed_probe")
        .collect().head.getString(0)
      assert(gh.length == 4)
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("DamerauLevenshtein kernel: unrestricted DL, DuckDB-verified values") {
    // expected values computed with DuckDB's damerau_levenshtein (the
    // oracle function); 'ca'->'abc' = 2 is the case separating the
    // unrestricted algorithm from optimal string alignment (OSA = 3)
    val cases = Seq(
      ("ca", "abc", 2), ("ab", "ba", 1), ("spark", "sprak", 1),
      ("kitten", "sitting", 3), ("", "abc", 3), ("abc", "", 3),
      ("same", "same", 0), ("abcdef", "abcfed", 2))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(
      org.apache.spark.sql.GraftBridge.column(graft.expr.DamerauLevenshtein(
        org.apache.spark.sql.GraftBridge.expression(col("a")),
        org.apache.spark.sql.GraftBridge.expression(col("b")))).as("d"))
      .as[Int].collect().toSeq
    assert(got == cases.map(_._3))
    // the DSL predicate: one transposition counts as one edit
    val docs = Seq(("src3", 1L), ("xyz9", 2L)).toDF("source", "id")
    assert(docs.where(graft.dsl.QueryDsl.fuzzyTranspositions(col("source"), "rsc3", 1))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(docs.where(graft.dsl.QueryDsl.fuzzy(col("source"), "rsc3", 1)).count() == 0)
  }

  test("JaccardSim kernel matches the array_intersect column math") {
    val df = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("b c d", "c d e", "d e f")),
      (Seq("x"), Seq("y")),
      (Seq("p", "q"), Seq("p", "q"))).toDF("s1", "s2")
    val r = df.select(
      org.apache.spark.sql.GraftBridge.column(graft.expr.JaccardSim(
        org.apache.spark.sql.GraftBridge.expression(col("s1")),
        org.apache.spark.sql.GraftBridge.expression(col("s2")))).as("k"),
      (size(array_intersect(col("s1"), col("s2"))).cast("double") /
        (size(col("s1")) + size(col("s2")) -
          size(array_intersect(col("s1"), col("s2"))).cast("double"))).as("h"))
      .as[(Double, Double)].collect()
    r.foreach { case (k, h) => assert(k == h) } // bit-identical
    assert(r.map(_._1).toSeq == Seq(0.5, 0.0, 1.0))
  }

  test("BestCentroid matches the literal struct-max argmax, incl. ties") {
    import graft.util.Num
    // 5 centroids in 3 dims, one exact duplicate pair (ids 1 and 3) so
    // the lowest-id tie-break is exercised; vectors include a zero
    // vector (cosine 0.0 by convention everywhere)
    val cents: Seq[Seq[Double]] = Seq(
      Seq(1.0, 0.0, 0.0), Seq(0.5, 0.5, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.5, 0.5, 0.0), Seq(0.3, -0.2, 0.9))
    val df = Seq(
      (1L, Seq(0.9, 0.1, 0.0)), (2L, Seq(0.5, 0.5, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0)), (4L, Seq(-0.2, 0.4, 0.8))).toDF("id", "v")
    val kernel = org.apache.spark.sql.GraftBridge.column(graft.expr.BestCentroid(
      org.apache.spark.sql.GraftBridge.expression(col("v")),
      cents.flatten, 3))
    // the r17 literal formulation this kernel replaced
    val literal = array_max(array(cents.zipWithIndex.map { case (cv, i) =>
      struct(
        Num.round(graft.dedup.Vectors.cosine(col("v"), array(cv.map(lit): _*)), 4).as("c"),
        lit(-i.toLong).as("n"))
    }: _*))
    val rows = df.select(col("id"),
      kernel.getField("c"), kernel.getField("cent"),
      literal.getField("c"), negate(literal.getField("n")))
      .as[(Long, Double, Long, Double, Long)].collect()
    rows.foreach { case (id, kc, kid, lc, lid) =>
      assert(kc == lc, s"id=$id cosine $kc != $lc")
      assert(kid == lid, s"id=$id centroid $kid != $lid")
    }
    // duplicate-centroid tie resolves to the LOWEST id
    assert(rows.find(_._1 == 2L).get._3 == 1L)
  }

  test("BestCentroid scales past the literal-tree ceiling") {
    // 2000 centroids x 64 dims = 128k doubles: as the r17 literal tree
    // this is ~1M Catalyst nodes (analysis/codegen crawl or fall over);
    // as a reference object it must plan and run in normal time
    val k = 2000
    val dim = 64
    val rnd = new scala.util.Random(11)
    val flat = Array.fill(k * dim)(rnd.nextDouble() * 2 - 1)
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Seq.tabulate(dim)(j => flat((i % k) * dim + j)))).toDF("id", "v")
    val kernel = org.apache.spark.sql.GraftBridge.column(graft.expr.BestCentroid(
      org.apache.spark.sql.GraftBridge.expression(col("v")),
      flat.toSeq, dim))
    val t0 = System.nanoTime()
    val out = df.select(col("id"), kernel.getField("cent").as("cent"))
      .as[(Long, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // row i's vector IS centroid i % k -> cosine 1.0; a duplicate
    // centroid elsewhere can only tie, and ties go to the lowest index,
    // which with a seeded continuous draw is the row's own centroid
    out.foreach { case (id, cent) => assert(cent == id % k, s"row $id -> $cent") }
    assert(secs < 30.0, s"argmax over $k x $dim centroids took ${secs}s")
  }
}
