package graft

import graft.agg.Aggs
import org.apache.spark.sql.functions._

class AggsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0), ("b", 6.0), ("c", 10.0))
    .toDF("k", "v")

  test("terms agg: ES ordering (count desc, key asc) + size") {
    val r = Aggs.termsAgg(df, "k", 2).as[(String, Long)].collect().toSeq
    assert(r == Seq(("b", 3L), ("a", 2L)))
  }

  test("frequent_item_sets: A-Priori prune exact, basket cap bounds pairs") {
    val baskets = Seq(
      (1L, "milk"), (1L, "bread"), (1L, "rare"),
      (2L, "milk"), (2L, "bread"),
      (3L, "milk"), (3L, "bread"), (3L, "eggs"),
      (4L, "milk"), (4L, "eggs")).toDF("basket", "item")
    val r = Aggs.frequentItemSets(baskets, "basket", "item", minSupport = 2L)
      .as[(String, String, Long)].collect().toSeq
    // prune drops "rare" (freq 1) pre-join; pair results are EXACT
    assert(r == Seq(("bread", "milk", 3L), ("eggs", "milk", 2L)))
    // cap=1 keeps one item per basket: no pairs at all
    assert(Aggs.frequentItemSets(baskets, "basket", "item", 2L,
      maxBasketItems = 1).count() == 0L)
    // cap=2 keeps the lexicographically first two frequent items per
    // basket: basket 3 keeps (bread, eggs), so (eggs, milk) drops
    // below support and only (bread, milk) survives
    val capped = Aggs.frequentItemSets(baskets, "basket", "item", 2L,
      maxBasketItems = 2).as[(String, String, Long)].collect().toSeq
    assert(capped == Seq(("bread", "milk", 2L)))
  }

  test("frequent_item_sets: degenerate basket drops without materializing") {
    // r18 CollectSetBounded: a basket whose POST-PRUNE size passes the
    // cap stops retaining at cap+1 buffer elements and evaluates to
    // NULL (= dropped whole, the r17 size-guard semantics). The
    // degenerate items appear in TWO baskets so A-Priori keeps them
    // frequent — the cap, not the prune, must do the dropping.
    val sane = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y")).toDF("basket", "item")
    val degenerate = Seq.tabulate(60)(i => (98L, f"it$i%02d"))
      .++(Seq.tabulate(60)(i => (99L, f"it$i%02d"))).toDF("basket", "item")
    val r = Aggs.frequentItemSets(
      sane.unionByName(degenerate), "basket", "item",
      minSupport = 2L, maxBasketItems = 50)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("x", "y", 2L)))
    // same input, cap raised past 60: the degenerate baskets survive
    // and their C(60,2) pairs (support 2) flood in — proof the cap,
    // not the prune, was the dropper above
    val r2 = Aggs.frequentItemSets(
      sane.unionByName(degenerate), "basket", "item",
      minSupport = 2L, maxBasketItems = 100).count()
    assert(r2 == 60L * 59 / 2 + 1)
    // a dropped basket's items still count toward A-Priori item
    // frequencies: x rides in degenerate basket 99, so (q, x) from
    // basket 1 sees x at freq 2 — but its pair support stays 1 and
    // nothing survives (identical to the r17 post-materialize guard)
    val shared = Seq((1L, "x"), (1L, "q"), (2L, "q"), (2L, "z")).toDF("basket", "item")
    val deg2 = (Seq.tabulate(60)(i => (98L, f"it$i%02d"))
      ++ Seq.tabulate(60)(i => (99L, f"it$i%02d")) :+ ((99L, "x")))
      .toDF("basket", "item")
    val r3 = Aggs.frequentItemSets(
      shared.unionByName(deg2), "basket", "item",
      minSupport = 2L, maxBasketItems = 50)
      .as[(String, String, Long)].collect().toSeq
    assert(r3.isEmpty)
  }

  test("aggs JSON compiler: terms size top-k, nesting, range labels, metric-only") {
    import graft.dsl.AggsJson
    // terms with size: top-k by doc_count desc, key asc
    val topk = AggsJson.compile(df,
      """{"aggs": {"byk": {"terms": {"field": "k", "size": 2}}}}""")
      .select("byk", "doc_count").as[(String, Long)].collect().toSeq
    assert(topk == Seq(("b", 3L), ("a", 2L)))
    // bucket > metrics: single terms level keeps ES's default size 10
    // and ordering (doc_count desc, key asc)
    val nested = AggsJson.compile(df,
      """{"aggs": {"byk": {"terms": {"field": "k"},
           "aggs": {"hi": {"max": {"field": "v"}}}}}}""")
      .select("byk", "doc_count", "hi").as[(String, Long, Double)].collect().toSeq
    assert(nested == Seq(("b", 3L, 6.0), ("a", 2L, 3.0), ("c", 1L, 10.0)))
    // ES default size=10 cuts an 11-key single-level terms to 10
    val wide = (1 to 11).flatMap(i => Seq.fill(i)((s"k$i", 1.0))).toDF("k", "v")
    assert(AggsJson.compile(wide,
      """{"aggs": {"byk": {"terms": {"field": "k"}}}}""").count() == 10L)
    // metric beside a bucket at a non-leaf level: loud error, not a
    // silently-dropped column
    intercept[IllegalArgumentException] {
      AggsJson.compile(df, """{"aggs": {"byk": {"terms": {"field": "k"},
        "aggs": {"inner": {"terms": {"field": "v"}},
                 "hi": {"max": {"field": "v"}}}}}}""")
    }
    // explicit size on a nested tree: loud error (flat groupBy cannot
    // page per level)
    intercept[IllegalArgumentException] {
      AggsJson.compile(df, """{"aggs": {"byk": {"terms": {"field": "k", "size": 5},
        "aggs": {"inner": {"terms": {"field": "v"}}}}}}""")
    }
    // terms `order`: by _key, by _count asc, by a declared metric
    val byKey = AggsJson.compile(df,
      """{"aggs": {"byk": {"terms": {"field": "k", "order": {"_key": "desc"}}}}}""")
      .select("byk").as[String].collect().toSeq
    assert(byKey == Seq("c", "b", "a"))
    val byMetric = AggsJson.compile(df,
      """{"aggs": {"byk": {"terms": {"field": "k", "order": {"hi": "desc"}},
           "aggs": {"hi": {"max": {"field": "v"}}}}}}""")
      .select("byk").as[String].collect().toSeq
    assert(byMetric == Seq("c", "b", "a")) // max v: 10, 6, 3
    intercept[IllegalArgumentException] {
      AggsJson.compile(df,
        """{"aggs": {"byk": {"terms": {"field": "k", "order": {"nope": "desc"}}}}}""")
    }
    // array order form: multi-criteria, later entries break earlier ties
    val tied = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("c", 4.0)).toDF("k", "v")
    val multi = AggsJson.compile(tied,
      """{"aggs": {"byk": {"terms": {"field": "k",
           "order": [{"_count": "desc"}, {"_key": "desc"}]}}}}""")
      .select("byk").as[String].collect().toSeq
    assert(multi == Seq("c", "b", "a"))
    // order present but not a supported shape: loud error, not a
    // silent fall-back to the default doc_count ordering
    intercept[IllegalArgumentException] {
      AggsJson.compile(df,
        """{"aggs": {"byk": {"terms": {"field": "k",
             "order": {"_key": "desc", "_count": "asc"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      AggsJson.compile(df,
        """{"aggs": {"byk": {"terms": {"field": "k", "order": "desc"}}}}""")
    }
    // metric `missing`: null field values count as the substitute
    val withNulls = Seq(("a", Some(2.0)), ("a", None), ("b", Some(4.0)))
      .toDF("k", "v")
    val miss = AggsJson.compile(withNulls,
      """{"aggs": {"byk": {"terms": {"field": "k"},
           "aggs": {"m": {"avg": {"field": "v", "missing": 10}}}}}}""")
      .select("byk", "m").as[(String, Double)].collect().toMap
    assert(miss("a") == 6.0 && miss("b") == 4.0)
    // ms fixed_interval parses via the unit regex (the '100m' trap)
    val tsDf = Seq((0L, 1L), (150000000L, 2L)).toDF("t", "x")
    assert(AggsJson.compile(tsDf,
      """{"aggs": {"b": {"date_histogram": {"field": "t", "fixed_interval": "100ms"}}}}""")
      .count() == 2L)
    // range buckets: ES key labels, out-of-range drops
    val ranges = AggsJson.compile(df,
      """{"aggs": {"vr": {"range": {"field": "v", "ranges": [
           {"to": 3}, {"from": 3, "to": 100}]}}}}""")
      .select("vr", "doc_count").as[(String, Long)].collect().toSeq
    assert(ranges == Seq(("*-3.0", 2L), ("3.0-100.0", 4L)))
    // metric-only body: one global row
    val m = AggsJson.compile(df,
      """{"aggs": {"n": {"value_count": {"field": "v"}},
                   "u": {"cardinality": {"field": "k"}}}}""")
      .select("n", "u").as[(Long, Long)].collect().head
    assert(m == ((6L, 3L)))
    intercept[IllegalArgumentException] {
      AggsJson.compile(df, """{"aggs": {"a": {"terms": {"field": "k"}},
        "b": {"terms": {"field": "v"}}}}""")
    }
  }

  test("stats / extended_stats") {
    val s = Aggs.statsAgg(df, "v").collect().head
    assert(s.getAs[Long]("cnt") == 6L)
    assert(s.getAs[Double]("min_v") == 1.0 && s.getAs[Double]("max_v") == 10.0)
    assert(s.getAs[Double]("sum_v") == 26.0)
    val e = Aggs.extendedStatsAgg(df, "v").collect().head
    assert(e.getAs[Double]("sum_sq") == 166.0)
  }

  test("percentiles exact") {
    val p = Aggs.percentilesAgg(df, "v").collect().head
    assert(p.getAs[Double]("p50") == 3.5)
  }

  test("distributed exact percentiles: bracket selection matches percentile()") {
    // r17 shuffle-free rewrite: per-partition sorted sampling + one
    // count/collect pass. Deterministic synthetic column with heavy
    // duplicates and a skewed tail, spread over several partitions.
    val big = spark.range(0, 20001, 1, 7)
      .selectExpr("CAST(CASE WHEN id % 5 = 0 THEN 42 ELSE (id * 37) % 1999 END AS DOUBLE) AS v")
    val qs = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5,
      "p90" -> 0.9, "p999" -> 0.999, "min" -> 0.0, "max" -> 1.0)
    val expect = big.selectExpr(
      qs.map { case (n, q) => s"round(percentile(v, $q), 4) AS $n" }: _*)
      .collect().head
    // tiny sampleCap forces wide brackets => the heap-capped
    // count/collect path (not just the collapsed-interval shortcut)
    for (cap <- Seq(8, 64, 65536)) {
      val got = Aggs.percentilesExactDistributed(big, "v", qs, sampleCap = cap)
        .collect().head
      qs.indices.foreach { i =>
        assert(got.getDouble(i) == expect.getDouble(i),
          s"cap=$cap q=${qs(i)._1}: got ${got.getDouble(i)} want ${expect.getDouble(i)}")
      }
    }
    // massive-duplicate column: collapsed intervals short-circuit
    val const = spark.range(0, 5000, 1, 4).selectExpr("CAST(7 AS DOUBLE) AS v")
    val c = Aggs.percentilesExactDistributed(const, "v",
      Seq("p50" -> 0.5), sampleCap = 4).collect().head
    assert(c.getDouble(0) == 7.0)
    // two-value interpolation at an off-grid quantile
    val two = Seq(1.0, 2.0).toDF("v")
    val t = Aggs.percentilesExactDistributed(two, "v", Seq("p75" -> 0.75))
      .collect().head
    assert(t.getDouble(0) == 1.75)
  }

  test("distributed exact percentiles: sample cap scales with partition count") {
    // r18: pass-1's driver collect is P*C doubles, so C must shrink as
    // P grows — total sample budget 64 Mi doubles, floor 1 Ki
    assert(Aggs.effectiveSampleCap(65536, 1) == 65536)
    assert(Aggs.effectiveSampleCap(65536, 1024) == 65536)      // budget edge
    assert(Aggs.effectiveSampleCap(65536, 2048) == 32768)      // halves
    assert(Aggs.effectiveSampleCap(65536, 100000) == 1024)     // floor
    assert(Aggs.effectiveSampleCap(Int.MaxValue, 800000) == 1024) // 100 TB widths
    assert(Aggs.effectiveSampleCap(8, 100000) == 8)            // explicit cap wins
    // end-to-end at a partition count past the budget edge: the
    // shrunken cap must leave results identical to percentile()
    val many = spark.range(0, 30000, 1, 1500)
      .selectExpr("CAST((id * 131) % 997 AS DOUBLE) AS v")
    val expect = many.selectExpr(
      "round(percentile(v, 0.5), 4) AS p50",
      "round(percentile(v, 0.99), 4) AS p99").collect().head
    val got = Aggs.percentilesExactDistributed(
      many, "v", Seq("p50" -> 0.5, "p99" -> 0.99)).collect().head
    assert(got.getDouble(0) == expect.getDouble(0))
    assert(got.getDouble(1) == expect.getDouble(1))
  }

  test("bounded primitive max-heap keeps the cap smallest") {
    val h = new Aggs.DoubleMaxHeap(5)
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(200)(rnd.nextDouble() * 1000)
    vals.foreach(h.offer)
    assert(h.size == 5)
    assert(h.values.sorted.sameElements(vals.sorted.take(5)))
    // cap larger than the stream: everything retained
    val h2 = new Aggs.DoubleMaxHeap(500)
    vals.foreach(h2.offer)
    assert(h2.size == 200)
    assert(h2.values.sorted.sameElements(vals.sorted))
  }

  test("t-digest percentiles: rank-error bound + small-n exactness") {
    import graft.agg.TDigest
    // small n (< one centroid buffer): digest is exact-interpolated,
    // so mid quantiles land within one value gap
    val small = df.agg(TDigest.percentilesCol("v", Seq(0.5)).as("e"))
      .select(element_at(col("e"), 1)).as[Double].collect().head
    assert(small >= 3.0 && small <= 4.0, s"p50 estimate $small out of [3,4]")
    // 10k skewed values (x^2 over a uniform grid): every estimated
    // quantile must sit within the published rank epsilon
    val big = (1 to 10000).map(i => (i.toDouble / 100) * (i.toDouble / 100))
      .toDF("x").repartition(16)
    val probe = TDigest.percentilesProbe(big, "x",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p95" -> 0.95),
      compression = 100.0, epsRank = 0.015).collect().head
    assert(probe.getAs[Boolean]("p25_ok") && probe.getAs[Boolean]("p50_ok") &&
      probe.getAs[Boolean]("p95_ok"), s"rank epsilon violated: $probe")
    assert(probe.getAs[Long]("n") == 10000L)
    // compress honors the size bound: 100k raw points -> O(compression)
    // centroids
    val (m, _) = TDigest.compress(
      Array.tabulate(4096)(i => i.toDouble), Array.fill(4096)(25L), 4096, 100.0)
    assert(m.length < 200, s"${m.length} centroids for compression=100")
    assert(m.sorted.sameElements(m), "centroids must come out sorted")
  }

  test("hdr percentiles: significant-digit buckets, rank read") {
    // values spanning decades; 3 sig digits keeps each value its own
    // bucket here, so percentiles land on exact bucket lower bounds
    val big = (1 to 1000).map(i => i * 7.0).toDF("x").repartition(8)
    val p = Aggs.percentilesHdr(big, "x",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p95" -> 0.95)).collect().head
    // rank 250 -> 250*7=1750; 3 sig digits -> bucket 1750
    assert(p.getAs[Double]("p25") == 1750.0)
    assert(p.getAs[Double]("p50") == 3500.0)
    assert(p.getAs[Double]("p95") == 6650.0)
    // quantization: 4-digit values collapse to 3 significant digits
    val q = Aggs.percentilesHdr(Seq(1234.0, 1234.0, 5678.0).toDF("x"), "x",
      Seq("p50" -> 0.5)).collect().head
    assert(q.getAs[Double]("p50") == 1230.0)
  }

  test("histogram buckets") {
    val h = Aggs.histogramAgg(df, "v", 5.0).as[(Double, Long)].collect().toSeq
    assert(h == Seq((0.0, 4L), (5.0, 1L), (10.0, 1L)))
  }

  test("date_histogram min_doc_count=0 materializes the gap months") {
    val ts = Seq("2020-01-15", "2020-02-10", "2020-05-01")
      .map(d => Tuple1(java.sql.Timestamp.valueOf(d + " 00:00:00"))).toDF("ts")
    val r = Aggs.dateHistogramEmptyBuckets(ts, "ts")
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(r.map(_._1.toString) ==
      Seq("2020-01-01", "2020-02-01", "2020-03-01", "2020-04-01", "2020-05-01"))
    assert(r.map(_._2) == Seq(1L, 1L, 0L, 0L, 1L)) // March+April filled with 0
  }

  test("range agg half-open buckets") {
    val r = Aggs.rangeAgg(df, "v", Seq(2.0, 6.0)).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r.toSet == Set(("*-2.0", 1L), ("2.0-6.0", 3L), ("6.0-*", 2L)))
  }

  test("filters agg counts in one pass") {
    val f = Aggs.filtersAgg(df, Seq("big" -> (col("v") > 3), "as" -> (col("k") === "a")))
      .as[(Long, Long)].collect().head
    assert(f == ((3L, 2L)))
  }

  test("top_hits per bucket with deterministic ties") {
    val t = Aggs.topHitsAgg(df.withColumn("id", monotonically_increasing_id()), "k", "v", "id", 1)
    assert(t.count() == 3)
  }

  test("composite paging after-key") {
    val c = Aggs.compositeAgg(df, Seq("k"), Some(Seq("a")), 10).as[(String, Long)].collect()
    assert(c.map(_._1).toSeq == Seq("b", "c"))
  }

  test("global + filtered bucket") {
    val g = Aggs.globalWithFilter(df, col("k") === "b", "v").collect().head
    assert(g.getAs[Long]("global_count") == 6L)
    assert(g.getAs[Long]("filtered_count") == 3L)
    assert(g.getAs[Double]("filtered_avg") == 4.0)
  }

  test("significant terms surfaces fg-skewed term") {
    val docs = (1 to 20).map(i =>
      (i.toLong, if (i <= 10) "en" else "de",
        if (i <= 10) "common special" else "common other"))
      .toDF("doc_id", "lang", "text")
    val st = Aggs.significantTerms(docs, "text", col("lang") === "en", minFgCount = 2, k = 3)
      .as[(String, Long, Long, Double)].collect()
    assert(st.head._1 == "special")
  }

  test("mutual_information and gnd heuristics match the reference formulas") {
    // synthetic keyword field with controlled contingency counts:
    // 60 docs, 20 fg; term 'a' in 15 docs (10 fg), 'b' in 30 (10 fg),
    // 'c' in 15 (0 fg)
    val docs = (
      (1 to 10).map(i => (i.toLong, true, "a")) ++
      (11 to 15).map(i => (i.toLong, false, "a")) ++
      (16 to 25).map(i => (i.toLong, true, "b")) ++
      (26 to 45).map(i => (i.toLong, false, "b")) ++
      (46 to 60).map(i => (i.toLong, false, "c"))).toDF("id", "fg", "k")
    def refMi(n11: Double, termTot: Double, fgTot: Double, n: Double): Double = {
      val (n10, n01) = (termTot - n11, fgTot - n11)
      val n00 = n - termTot - n01
      def t(nij: Double, ni: Double, nj: Double) =
        if (nij > 0) (nij / n) * (math.log(n * nij / (ni * nj)) / math.log(2)) else 0.0
      t(n11, termTot, fgTot) + t(n10, termTot, n - fgTot) +
        t(n01, n - termTot, fgTot) + t(n00, n - termTot, n - fgTot)
    }
    def refGnd(fxy: Double, fx: Double, fy: Double, n: Double): Double =
      1.0 - (math.max(math.log(fx), math.log(fy)) - math.log(fxy)) /
        (math.log(n) - math.min(math.log(fx), math.log(fy)))
    val mi = Aggs.significantTermsKeyword(docs, "k", col("fg"),
      minFgCount = 1, k = 10, heuristic = "mutual_information")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(mi("a")._4 - refMi(10, 15, 20, 60)) < 1e-6 + 1e-9)
    assert(math.abs(mi("b")._4 - refMi(10, 30, 20, 60)) < 1e-6 + 1e-9)
    // 'a' is the most fg-skewed: highest MI among terms with fg presence
    assert(mi("a")._4 > mi("b")._4)
    val gnd = Aggs.significantTermsKeyword(docs, "k", col("fg"),
      minFgCount = 1, k = 10, heuristic = "gnd")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(math.abs(gnd("a") - refGnd(10, 15, 20, 60)) < 1e-6 + 1e-9)
    assert(math.abs(gnd("b") - refGnd(10, 30, 20, 60)) < 1e-6 + 1e-9)
    assert(gnd("a") > gnd("b"))
  }

  test("contamination screen: counts shared distinct n-grams only") {
    import graft.dedup.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),      // shares "alpha beta gamma" path
      (2L, "zeta eta theta iota"),         // no overlap
      (3L, "beta gamma delta beta gamma delta")) // repeated shingle counts once
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val r = Dedup.contaminationScreen(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: shingles {abg, bgd} both in bench -> 2/2; doc 3: distinct
    // shingles {bgd, gdb, dbg} -> only bgd matches -> 1/3; doc 2 absent
    assert(r.map(x => (x._1, x._2, x._3)).toSet == Set((1L, 2L, 2L), (3L, 1L, 3L)))
    assert(r.find(_._1 == 1L).get._4 == 1.0)
  }

  test("significant_text: duplicate text counted once in the foreground") {
    // 5 fg docs share identical text; without filter_duplicate_text
    // the dup boosts "special" 5x — with it, the fg term count is 1+1
    val docs = (
      (1 to 5).map(i => (i.toLong, "en", "common special boiler plate")) ++
      Seq((6L, "en", "common special unique")) ++
      (7 to 20).map(i => (i.toLong, "de", "common other text"))).toDF("doc_id", "lang", "text")
    val st = Aggs.significantText(docs, "doc_id", "text", col("lang") === "en",
      sampleProb = 1.0, minFgCount = 1, k = 5)
      .as[(String, Long, Long, Double)].collect()
    val special = st.find(_._1 == "special").get
    assert(special._2 == 2L) // deduped: the 5 clones collapse to 1, plus doc 6
  }

  test("median_absolute_deviation: robust to the outlier") {
    // values 1..9 plus outlier 1000: median 5.5 -> |x-5.5| median stays small
    val d = ((1 to 9).map(_.toDouble) :+ 1000.0).map(Tuple1(_)).toDF("v")
    val mad = Aggs.medianAbsoluteDeviation(d, "v").collect().head.getDouble(0)
    assert(mad == 2.5) // deviations 4.5,3.5,...,0.5,...,994.5 -> median 2.5
  }

  test("t_test: equal samples give t=0; shifted samples give known t") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 1.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val r0 = Aggs.tTestAgg(d, "v", col("g") === "a", col("g") === "b").collect().head
    assert(r0.getAs[Double]("t_stat") == 0.0)
    val d2 = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 3.0), ("b", 4.0), ("b", 5.0))
      .toDF("g", "v")
    val r2 = Aggs.tTestAgg(d2, "v", col("g") === "a", col("g") === "b").collect().head
    // diff -2, se = sqrt(1/3 + 1/3) -> t = -2.4495
    assert(math.abs(r2.getAs[Double]("t_stat") + 2.4495) < 1e-9)
  }

  test("cumulative_cardinality counts users at first-seen bucket only") {
    val ev = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 20L), (3L, 30L))
      .toDF("user_id", "b")
    val r = Aggs.cumulativeCardinality(ev, "user_id", col("b"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((10L, 2L, 2L), (20L, 1L, 3L)))
  }

  test("variable_width_histogram: equal-depth buckets partition the data") {
    val d = (1 to 100).map(_.toDouble).map(Tuple1(_)).toDF("v")
    val r = Aggs.variableWidthHistogram(d, "v", 4)
      .collect().map(x => (x.getAs[Int]("bucket"), x.getAs[Long]("doc_count"),
        x.getAs[Double]("min_v"), x.getAs[Double]("max_v")))
    assert(r.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(r.map(_._2).sum == 100L)
    // buckets are contiguous, ordered, non-overlapping
    r.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3) }
  }

  test("geo_line: per-group ordered truncated polyline") {
    val d = Seq(
      ("x", 3L, 1.0, 3.0), ("x", 1L, 1.0, 1.0), ("x", 2L, 1.0, 2.0),
      ("y", 1L, 2.0, 1.0)).toDF("g", "seq", "la", "lo")
    val r = Aggs.geoLineAgg(d, "g", "seq", col("la"), col("lo"), 2)
      .as[(String, String, Int)].collect().toSeq
    assert(r == Seq(
      ("x", "1.0000,1.0000|1.0000,2.0000", 2),
      ("y", "2.0000,1.0000", 1)))
  }

  test("categorizeText: numeric tokens drop, patterns aggregate") {
    val logs = Seq(
      "error code 500 at node 7",
      "error code 404 at node 12",
      "user 88 logged in",
      "user 91 logged in",
      "user 14 logged in",
      "12345").toDF("msg")
    val out = Aggs.categorizeText(logs, col("msg"), maxTokens = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "12345" analyzes to only numeric tokens -> empty category, dropped
    assert(out == Seq(("user logged in", 3L), ("error code at", 2L)))
  }

  test("geo_bounds: tightest envelope per bucket") {
    val pts = Seq(
      ("a", 10.0, -5.0), ("a", -2.0, 7.0), ("b", 0.0, 0.0)).toDF("g", "lat", "lon")
    val out = Aggs.geoBounds(pts, "g", "lat", "lon")
      .as[(String, Double, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 10.0, -5.0, -2.0, 7.0, 2L),
      ("b", 0.0, 0.0, 0.0, 0.0, 1L)))
  }

  test("scripted_metric: Painless map script, associative reduce") {
    val rows = Seq(
      ("x", 10.0, 0.1), ("x", 20.0, 0.5), ("y", 5.0, 0.0)).toDF("g", "price", "disc")
    val out = Aggs.scriptedMetric(rows, "g",
      "doc['price'].value * (1 - doc['disc'].value)")
      .as[(String, Double, Long)].collect().toSeq
    assert(out == Seq(("x", 19.0, 2L), ("y", 5.0, 1L)))
  }

  test("ip_range: from-inclusive / to-exclusive, open sides; ip_prefix masks") {
    val ips = Seq("10.0.0.1", "10.64.0.0", "10.64.0.1", "10.200.3.4", "192.168.0.1")
      .toDF("ip")
    val r = Aggs.ipRange(ips, "ip", Seq(
      ("a", None, Some("10.64.0.0")),       // strictly below the boundary
      ("b", Some("10.64.0.0"), Some("10.192.0.0")), // boundary lands here
      ("c", Some("10.192.0.0"), None)))
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("a", 1L), ("b", 2L), ("c", 2L)))
    val p = Aggs.ipPrefix(ips, "ip", 12)
      .as[(String, Long)].collect()
    // /12 keeps the top 4 bits of octet 2: 64->64, 200->192, 168->160
    assert(p.toMap == Map("10.0.0.0/12" -> 1L, "10.64.0.0/12" -> 2L,
      "10.192.0.0/12" -> 1L, "192.160.0.0/12" -> 1L))
    // buckets come back in NUMERIC network order (ES ip_prefix),
    // not lexical key order — 10.64 before 10.192 before 192.160
    assert(p.map(_._1).toSeq == Seq(
      "10.0.0.0/12", "10.64.0.0/12", "10.192.0.0/12", "192.160.0.0/12"))
  }

  test("terms shard error: unreporting shards bound the missed count") {
    import spark.implicits._
    // shards forced via the same md5 routing the impl uses — instead
    // of pinning hashes, check the INVARIANTS on real-ish data: the
    // bound is nonnegative, zero when every shard reports the term,
    // and <= shards * max-last-reported-count
    val df = (1L to 400L).map(i => (i, s"k${i % 7}")).toDF("id", "key")
    val r = Aggs.termsAggShardError(df, "key", "id", size = 7, shards = 3, shardSize = 2)
      .as[(String, Long, Long)].collect()
    assert(r.nonEmpty && r.forall(_._3 >= 0))
    // only 2 of 7 keys reported per shard -> some bound must be > 0
    assert(r.exists(_._3 > 0))
    // with shardSize >= distinct keys every shard reports everything:
    // bounds all zero and counts exact
    val exact = Aggs.termsAggShardError(df, "key", "id", size = 7, shards = 3, shardSize = 10)
      .as[(String, Long, Long)].collect()
    assert(exact.forall(_._3 == 0L))
    assert(exact.map(_._2).sum == 400L)
  }

  test("ip_prefix: numeric order where lexical would differ") {
    import spark.implicits._
    val ips = Seq("10.2.0.1", "10.10.0.1").toDF("ip")
    val keys = Aggs.ipPrefix(ips, "ip", 16).as[(String, Long)].collect().map(_._1).toSeq
    // lexical string order would put 10.10 first; ES orders by IP value
    assert(keys == Seq("10.2.0.0/16", "10.10.0.0/16"))
  }

  test("bucket_count_ks_test: D per alternative, asymptotic p, fractions guard") {
    def run(counts: Seq[Long], fr: Seq[Double]) =
      Aggs.bucketCountKsTest(
        counts.zipWithIndex.map { case (c, i) => (i, c) }.toDF("bucket", "doc_count"),
        "bucket", "doc_count", fr)
        .as[(Double, Double, Double, Double, Double, Double, Long)]
        .collect().head
    // perfect fit: every D is 0, every p saturates at 1
    val fit = run(Seq(50L, 50L), Seq(0.5, 0.5))
    assert(fit == ((0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 2L)))
    // front-loaded observed mass: greater alternative fires
    val skew = run(Seq(80L, 20L), Seq(0.5, 0.5))
    assert(skew._1 == 0.0 && skew._2 == 0.3 && skew._3 == 0.3)
    assert(skew._4 == 1.0 && skew._5 < 0.001 && skew._6 < 0.001)
    assert(skew._7 == 2L)
    // back-loaded mass mirrors into the less alternative
    val back = run(Seq(20L, 80L), Seq(0.5, 0.5))
    assert(back._1 == 0.3 && back._2 == 0.0)
    intercept[IllegalArgumentException] {
      run(Seq(1L, 1L), Seq(0.5, 0.4))
    }
  }

  test("moving models properties: holt(beta=0) == EWMA; KS stats bounded") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 6 + rnd.nextInt(18)
      val vals = Seq.fill(n)(10.0 + rnd.nextInt(500) / 7.0)
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (f"${2000 + i / 12}-${i % 12 + 1}%02d-10 00:00:00", v)
      }.toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
      val got = Aggs.dateHistogramMovingModels(rows, "ts", "month", "v",
          window = 5, alpha = 0.4, beta = 0.0)
        .select("sum_v", "holt").as[(Double, Double)].collect().toSeq
      // with beta = 0 the trend stays 0 and holt degrades to EWMA
      def ewma(w: Seq[Double]) = w.tail.foldLeft(w.head)((s, x) => 0.4 * x + 0.6 * s)
      val sv = got.map(_._1)
      got.indices.foreach { i =>
        val w = sv.slice(math.max(0, i - 4), i + 1)
        // holt output is round-4; the reference is unrounded
        assert(math.abs(got(i)._2 - ewma(w)) < 1e-3, s"trial $trial bucket $i")
      }
    }
    // KS statistics and p-values stay in [0,1] for arbitrary counts
    (1 to 5).foreach { trial =>
      val counts = Seq.fill(6)(1L + rnd.nextInt(1000))
      val fr = Seq.fill(6)(1.0 / 6)
      val r = Aggs.bucketCountKsTest(
        counts.zipWithIndex.map { case (c, i) => (i, c) }.toDF("b", "c"),
        "b", "c", fr)
        .as[(Double, Double, Double, Double, Double, Double, Long)].collect().head
      Seq(r._1, r._2, r._3, r._4, r._5, r._6).foreach { v =>
        assert(v >= 0.0 && v <= 1.0, s"trial $trial: $r")
      }
      assert(r._3 >= math.max(r._1, r._2) - 1e-9) // two-sided dominates
    }
  }

  test("t_test homoscedastic and paired match textbook formulas") {
    val d = Seq(
      (1L, "a", 10.0), (2L, "a", 12.0), (3L, "a", 14.0),
      (1L, "b", 9.0), (2L, "b", 10.5), (3L, "b", 12.0), (4L, "b", 20.0))
      .toDF("k", "g", "v")
    val homo = Aggs.tTestHomoAgg(d, "v", col("g") === "a", col("g") === "b")
      .as[(Long, Long, Double, Double, Double)].collect().head
    // pooled: m1=12, m2=12.875; ss1=8, ss2=72.1875; sp2=(8+72.1875)/5
    val sp2 = (8.0 + 72.1875) / 5
    val tRef = (12.0 - 12.875) / math.sqrt(sp2 * (1.0 / 3 + 1.0 / 4))
    assert(homo._1 == 3L && homo._2 == 4L && homo._3 == 12.0 && homo._4 == 12.875)
    assert(math.abs(homo._5 - tRef) < 1e-3)
    // paired: keys 1..3 have both sides, diffs [1.0, 1.5, 2.0]
    val paired = Aggs.tTestPairedAgg(d, "k", "v", col("g") === "a", col("g") === "b")
      .as[(Long, Double, Double)].collect().head
    assert(paired._1 == 3L && paired._2 == 1.5)
    val dRef = 1.5 / (0.5 / math.sqrt(3.0)) // sd of [1,1.5,2] = 0.5
    assert(math.abs(paired._3 - dRef) < 1e-3)
  }

  test("holt_winters: seasonal recursion matches a plain-Scala replay") {
    val n = 12
    val rows = (0 until n).map { i =>
      (f"2024-${i % 12 + 1}%02d-05 00:00:00", 100.0 + 10 * (i % 4) + i)
    }.toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = Aggs.dateHistogramHoltWinters(rows, "ts", "month", "v",
        window = 8, alpha = 0.5, beta = 0.3, gamma = 0.2, period = 4)
      .select("sum_v", "holt_winters").as[(Double, Double)].collect().toSeq
    // plain-Scala reference of the declared recursion
    def ref(vs: Seq[Double]): Double = {
      var s = vs.head; var b = 0.0; val seas = Array.fill(4)(0.0); var t = 1
      vs.tail.foreach { x =>
        val i = t % 4
        val sN = 0.5 * (x - seas(i)) + 0.5 * (s + b)
        val bN = 0.3 * (sN - s) + 0.7 * b
        seas(i) = 0.2 * (x - sN) + 0.8 * seas(i)
        s = sN; b = bN; t += 1
      }
      s + b + seas(t % 4)
    }
    val vals = got.map(_._1)
    got.indices.foreach { i =>
      val w = vals.slice(math.max(0, i - 7), i + 1)
      assert(math.abs(got(i)._2 - ref(w)) < 1e-3, s"bucket $i")
    }
    intercept[IllegalArgumentException] {
      Aggs.dateHistogramHoltWinters(rows, "ts", "month", "v", 3, 0.5, 0.3, 0.2, 4)
    }
  }

  test("moving_fn models: linear weights, population stddev, holt recursion") {
    val rows = Seq(
      ("2024-01-05 00:00:00", 10.0), ("2024-02-05 00:00:00", 20.0),
      ("2024-03-05 00:00:00", 30.0), ("2024-04-05 00:00:00", 40.0))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val r = Aggs.dateHistogramMovingModels(rows, "ts", "month", "v",
        window = 3, alpha = 0.5, beta = 0.5)
      .select("unweighted_avg", "linear_wavg", "moving_stddev", "holt")
      .as[(Double, Double, Double, Double)].collect().toSeq
    // single-value window: every model degrades to the value itself
    assert(r.head == ((10.0, 10.0, 0.0, 10.0)))
    // window [10,20]: lwavg = (10*1+20*2)/3; stddev = 5 (population)
    assert(r(1)._1 == 15.0 && r(1)._2 == 16.6667 && r(1)._3 == 5.0)
    // holt over [10,20]: s=0.5*20+0.5*(10+0)=15
    assert(r(1)._4 == 15.0)
    // window [10,20,30]: s1=15,b1=2.5 -> s2=0.5*30+0.5*17.5=23.75
    assert(r(2)._4 == 23.75)
    // full window [20,30,40]: lwavg=(20+60+120)/6
    assert(r(3)._2 == 33.3333 && r(3)._1 == 30.0)
  }
}
