package graft

import graft.dsl.AggsJson
import org.apache.spark.sql.functions._

/** r10 aggs-JSON tree nodes: composite / significant_terms / top_hits
  * — paging equivalence and the loud contracts for shapes the flat
  * compile cannot honor. */
class AggsJsonNodesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("composite pages are a partition of the full key-ordered bucket list") {
    def page(after: Option[(String, String)]) = {
      val af = after.map { case (l, s) =>
        s""", "after": {"l": "$l", "s": "$s"}""" }.getOrElse("")
      AggsJson.compile(docs,
        s"""{"aggs": {"p": {"composite": {"size": 5,
             "sources": [{"l": {"terms": {"field": "lang"}}},
                         {"s": {"terms": {"field": "source"}}}]$af}}}}""")
        .select($"l".as[String], $"s".as[String], $"doc_count".as[Long]).collect().toSeq
    }
    val all = docs.groupBy($"lang".as("l"), $"source".as("s"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy($"l", $"s")
      .select($"l".as[String], $"s".as[String], $"doc_count".as[Long]).collect().toSeq
    var got = Seq.empty[(String, String, Long)]
    var after: Option[(String, String)] = None
    var p = page(after)
    while (p.nonEmpty) {
      got ++= p
      after = Some((p.last._1, p.last._2))
      p = page(after)
    }
    assert(got == all)
  }

  test("composite metric sub-aggs evaluate per bucket; bucket sub-aggs throw") {
    val out = AggsJson.compile(docs,
      """{"aggs": {"p": {"composite": {"size": 3,
           "sources": [{"l": {"terms": {"field": "lang"}}}]},
           "aggs": {"mx": {"max": {"field": "n_chars"}}}}}}""")
    assert(out.columns.toSet == Set("l", "doc_count", "mx"))
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"p": {"composite": {"size": 3,
             "sources": [{"l": {"terms": {"field": "lang"}}}]},
             "aggs": {"inner": {"terms": {"field": "source"}}}}}}""")
    }
    assert(e.getMessage.contains("metric"))
  }

  test("composite after pages a DATE-keyed calendar date_histogram source") {
    val orders = Tables.load(spark, sfDir, "orders")
    def page(after: Option[String]) = {
      val af = after.map(a => s""", "after": {"m": "$a"}""").getOrElse("")
      AggsJson.compile(orders,
        s"""{"aggs": {"p": {"composite": {"size": 4,
             "sources": [{"m": {"date_histogram": {"field": "o_orderdate",
                                "calendar_interval": "month"}}}]$af}}}}""")
        .select($"m".cast("string").as[String], $"doc_count".as[Long]).collect().toSeq
    }
    val p1 = page(None)
    assert(p1.size == 4)
    // the cursor literal casts to the key's DATE type — page 2 starts
    // strictly after page 1's last bucket and the pages partition the
    // full ordered list (the old string literal threw a type mismatch)
    val p2 = page(Some(p1.last._1))
    val all = AggsJson.compile(orders,
      """{"aggs": {"p": {"composite": {"size": 8,
           "sources": [{"m": {"date_histogram": {"field": "o_orderdate",
                              "calendar_interval": "month"}}}]}}}}""")
      .select($"m".cast("string").as[String], $"doc_count".as[Long]).collect().toSeq
    assert(p1 ++ p2 == all)
  }

  test("composite after keys must match the sources, loudly") {
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"p": {"composite": {"size": 3,
             "sources": [{"l": {"terms": {"field": "lang"}}}],
             "after": {"wrong": "de"}}}}}""")
    }
    assert(e.getMessage.contains("sources"))
  }

  test("composite source options: unknown keys and desc order are loud") {
    val unknown = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"p": {"composite": {"size": 3,
             "sources": [{"l": {"terms": {"field": "lang",
                                          "script": "doc.lang"}}}]}}}}""")
    }
    assert(unknown.getMessage.contains("script"))
    // the after cursor pages key-ascending; a desc source would page
    // the wrong way silently — rejected by name
    val desc = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"p": {"composite": {"size": 3,
             "sources": [{"l": {"terms": {"field": "lang",
                                          "order": "desc"}}}]}}}}""")
    }
    assert(desc.getMessage.contains("asc"))
  }

  test("batch-4 loud contracts: t_test paired, matrix_stats arity, " +
      "frequent_item_sets support, scripted_metric non-sum reduce") {
    val paired = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"tt": {"t_test": {
             "a": {"field": "n_chars"}, "b": {"field": "n_chars"},
             "type": "paired"}}}}""")
    }
    assert(paired.getMessage.contains("paired"))
    val arity = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"mx": {"matrix_stats":
             {"fields": ["n_chars", "n_chars", "n_chars"]}}}}""")
    }
    assert(arity.getMessage.contains("two fields"))
    val support = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"fi": {"frequent_item_sets": {
             "fields": [{"field": "source"}],
             "transaction_field": "lang"}}}}""")
    }
    assert(support.getMessage.contains("minimum_support_count"))
    val reduce = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"terms": {"field": "lang"}, "aggs": {
             "v": {"scripted_metric": {
               "map_script": "doc['n_chars'].value",
               "reduce_script": "max(states)"}}}}}}""")
    }
    assert(reduce.getMessage.contains("associative sum"))
    // "consume(states)" merely CONTAINS "sum" — not an associative sum
    val consume = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"terms": {"field": "lang"}, "aggs": {
             "v": {"scripted_metric": {
               "map_script": "doc['n_chars'].value",
               "combine_script": "consume(states)"}}}}}}""")
    }
    assert(consume.getMessage.contains("associative sum"))
    // an init seed would be silently dropped by the partial agg — loud
    val init = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"terms": {"field": "lang"}, "aggs": {
             "v": {"scripted_metric": {
               "init_script": "state.sum = 100",
               "map_script": "doc['n_chars'].value"}}}}}}""")
    }
    assert(init.getMessage.contains("init"))
    // rate without unit: ES's default (parent-interval rate) is the
    // plain bucket sum — silently dividing by days would be ~30x off
    val rate = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"m": {"date_histogram": {"field": "ts",
             "calendar_interval": "month"},
             "aggs": {"r": {"rate": {"field": "n_chars"}}}}}}""")
    }
    assert(rate.getMessage.contains("unit"))
    // a typo'd max_docs_per_value would silently collapse the cap to 1
    val typo = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"div": {
             "diversified_sampler": {"field": "lang", "key_field": "doc_id",
                                     "max_docs_per_val": 40},
             "aggs": {"n": {"value_count": {"field": "doc_id"}}}}}}""")
    }
    assert(typo.getMessage.contains("max_docs_per_val"))
  }

  test("pipeline parity loud contracts: normalize method, moving_percentiles " +
      "window, corr/ks buckets_path") {
    val method = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"histogram": {"field": "n_chars", "interval": 500},
             "aggs": {"s": {"sum": {"field": "n_chars"}},
                      "n": {"normalize": {"buckets_path": "s",
                                          "method": "minmax"}}}}}}""")
    }
    assert(method.getMessage.contains("minmax"))
    val window = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"histogram": {"field": "n_chars", "interval": 500},
             "aggs": {"s": {"sum": {"field": "n_chars"}},
                      "mp": {"moving_percentiles": {"buckets_path": "s"}}}}}}""")
    }
    assert(window.getMessage.contains("window"))
    val path = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"histogram": {"field": "n_chars", "interval": 500}},
             "corr": {"bucket_correlation": {"buckets_path": "wrong>_count",
               "function": {"count_correlation": {"indicator":
                 {"expectations": [0.1, 0.2]}}}}}}}""")
    }
    assert(path.getMessage.contains("wrong"))
  }

  test("nested wrapper: non-array path and unknown options are loud") {
    val notArray = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"n": {"nested": {"path": "lang"},
             "aggs": {"c": {"value_count": {"field": "lang.x"}}}}}}""")
    }
    assert(notArray.getMessage.contains("array of structs"))
    val unknown = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"n": {"nested": {"path": "lang", "ignore_unmapped": true},
             "aggs": {"c": {"value_count": {"field": "lang.x"}}}}}}""")
    }
    assert(unknown.getMessage.contains("ignore_unmapped"))
  }

  test("significant_terms keyword variant matches the Scala operator") {
    val json = AggsJson.compile(docs,
      """{"aggs": {"sig": {"significant_terms": {
           "field": "source.keyword", "min_doc_count": 2, "size": 5}}}}""",
      fgPred = Some(col("lang") === "en"), background = Some(docs))
    val direct = graft.agg.Aggs.significantTermsKeyword(
      docs, "source", col("lang") === "en", 2, 5)
    assert(json.collect().toSeq == direct.collect().toSeq)
  }

  test("filters node: named Query-DSL buckets count in one scan; other_bucket partitions") {
    val out = AggsJson.compile(docs,
      """{"aggs": {"f": {"filters": {"filters": {
           "en": {"term": {"lang": "en"}},
           "long": {"range": {"n_chars": {"gte": 400}}}},
           "other_bucket": true}}}}""").collect().head
    val en = docs.where($"lang" === "en").count()
    val long = docs.where($"n_chars" >= 400).count()
    val other = docs.where(!($"lang" === "en" || $"n_chars" >= 400)).count()
    assert(out.getLong(out.fieldIndex("en")) == en)
    assert(out.getLong(out.fieldIndex("long")) == long)
    assert(out.getLong(out.fieldIndex("_other_")) == other)
    // a sibling agg next to filters is loud (one count row)
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"f": {"filters": {"filters": {"en": {"term": {"lang": "en"}}}},
             "aggs": {"m": {"max": {"field": "n_chars"}}}}}}""")
    }
    assert(e.getMessage.contains("only agg"))
  }

  test("r10 node contracts: sampler needs key_field, date_histogram one-of, include full-match") {
    val e1 = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"s": {"random_sampler": {"probability": 0.5},
             "aggs": {"n": {"value_count": {"field": "doc_id"}}}}}}""")
    }
    assert(e1.getMessage.contains("key_field"))
    val e2 = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"d": {"date_histogram": {"field": "doc_id",
             "fixed_interval": "1d", "calendar_interval": "month"}}}}""")
    }
    assert(e2.getMessage.contains("exactly one"))
    // include is FULL-match (Java matches()), not find: 'src1' must
    // not admit 'src10'
    val buckets = AggsJson.compile(docs,
      """{"aggs": {"s": {"terms": {"field": "source", "size": 30, "include": "src1"}}}}""")
      .select($"s".as[String]).collect().toSet
    assert(buckets == Set("src1"))
  }

  test("cardinality precision_threshold routes to HLL within 5% of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    def run(sketch: Boolean) = AggsJson.compile(li,
      s"""{"aggs": {"g": {"terms": {"field": "l_returnflag", "size": 10}, "aggs": {
           "parts": {"cardinality": {"field": "l_partkey"
             ${if (sketch) ", \"precision_threshold\": 1000" else ""}}}}}}}""")
      .select($"g".as[String], $"parts".as[Long]).collect().toMap
    val exact = run(false)
    val hll = run(true)
    assert(hll.keySet == exact.keySet && exact.nonEmpty)
    hll.foreach { case (g, est) =>
      val e = exact(g).toDouble
      assert(math.abs(est - e) / e <= 0.05, s"$g: $est vs $e")
    }
  }

  test("percentiles metric: tdigest route stays within rank-error of exact, per group") {
    val li = Tables.load(spark, sfDir, "lineitem")
    def run(tdigest: Boolean) = AggsJson.compile(li,
      s"""{"aggs": {"g": {"terms": {"field": "l_returnflag", "size": 10}, "aggs": {
           "q": {"percentiles": {"field": "l_quantity", "percents": [50, 95]
                 ${if (tdigest) ", \"tdigest\": true" else ""}}}}}}}""")
      .select($"g".as[String], $"q_p50".as[Double], $"q_p95".as[Double])
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = run(false)
    val sketch = run(true)
    assert(sketch.keySet == exact.keySet && sketch.nonEmpty)
    // rank-error check per group: the sketch estimate's rank in the
    // group must sit within 2% of the requested percentile
    val groups = li.select($"l_returnflag".as[String], $"l_quantity".as[Double])
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    sketch.foreach { case (g, (p50, p95)) =>
      val vs = groups(g)
      def rank(v: Double) = vs.count(_ <= v).toDouble / vs.length
      assert(math.abs(rank(p50) - 0.50) <= 0.02, s"$g p50 rank ${rank(p50)}")
      assert(math.abs(rank(p95) - 0.95) <= 0.02, s"$g p95 rank ${rank(p95)}")
    }
  }

  test("top_hits without a sort is a loud error (nondeterministic hits)") {
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"b": {"terms": {"field": "lang"}, "aggs": {
             "t": {"top_hits": {"size": 2}}}}}}""")
    }
    assert(e.getMessage.contains("sort"))
  }

  test("top_hits returns size best docs per bucket with rn") {
    val out = AggsJson.compile(docs,
      """{"aggs": {"b": {"terms": {"field": "lang"}, "aggs": {
           "t": {"top_hits": {"size": 2,
             "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
             "_source": ["doc_id", "n_chars"]}}}}}}""")
    assert(out.columns.toSeq == Seq("lang", "doc_id", "n_chars", "rn"))
    val perBucket = out.groupBy("lang").count()
      .select($"count".as[Long]).collect()
    assert(perBucket.forall(_ <= 2))
    val best = docs.groupBy("lang").agg(max("n_chars").as("m"))
      .select($"lang".as[String], $"m".as[Long]).collect().toMap
    out.where($"rn" === 1).select($"lang".as[String], $"n_chars".as[Long])
      .collect().foreach { case (l, n) => assert(n == best(l)) }
  }

  // ---- pipeline nodes (r11) ----

  private def orders = Tables.orders(spark, sfDir)

  test("pipeline chaining: derivative of a cumulative_sum sees the earlier pipe's column") {
    val out = AggsJson.compile(orders,
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "cum": {"cumulative_sum": {"buckets_path": "sales"}},
                    "back": {"derivative": {"buckets_path": "cum"}}}}}}""")
    // d(cumsum)/dt = the original series (round-trip, modulo 4-dp rounding)
    val rows = out.orderBy($"m")
      .select($"sales".as[Double], $"back".as[Option[Double]]).collect()
    assert(rows.head._2.isEmpty) // first bucket has no predecessor
    rows.tail.foreach { case (s, b) =>
      assert(math.abs(b.get - math.rint(s * 10000) / 10000) < 1e-6) }
  }

  test("sequencing pipes refuse a terms parent (bucket order is not key order)") {
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"terms": {"field": "lang"},
             "aggs": {"n": {"value_count": {"field": "doc_id"}},
                      "d": {"derivative": {"buckets_path": "n"}}}}}}""")
    }
    assert(e.getMessage.contains("histogram-family"))
  }

  test("unknown buckets_path and unknown moving_fn script are loud") {
    val e1 = intercept[IllegalArgumentException] {
      AggsJson.compile(orders,
        """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
             "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                      "d": {"derivative": {"buckets_path": "nope"}}}}}}""").collect()
    }
    assert(e1.getMessage.contains("resolves to no column"))
    val e2 = intercept[IllegalArgumentException] {
      AggsJson.compile(orders,
        """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
             "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                      "f": {"moving_fn": {"buckets_path": "sales", "window": 3,
                                          "script": "MovingFunctions.ewma"}}}}}}""").collect()
    }
    assert(e2.getMessage.contains("unsupported moving_fn script"))
  }

  test("sibling pipelines need exactly one parent; dotted paths resolve to flat columns") {
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(orders,
        """{"aggs": {"a": {"terms": {"field": "o_orderpriority"}},
             "b": {"terms": {"field": "o_orderstatus"}},
             "s": {"avg_bucket": {"buckets_path": "a>_count"}}}}""")
    }
    assert(e.getMessage.contains("exactly ONE multi-bucket parent"))
    // stats metric under the parent: path `m>price.avg` -> column price_avg
    val out = AggsJson.compile(orders,
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
             "aggs": {"price": {"stats": {"field": "o_totalprice"}}}},
           "avg_of_avgs": {"avg_bucket": {"buckets_path": "m>price.avg"}}}}""")
    assert(out.columns.toSeq == Seq("avg_of_avgs") && out.count() == 1)
  }

  test("bucket_selector filters like HAVING; bucket_sort pages the bucket frame") {
    val months = orders.select(date_trunc("month", $"o_orderdate").cast("date").as("m"))
      .groupBy($"m").count()
    val expectKept = months.where($"count" >= 180).count()
    val kept = AggsJson.compile(orders,
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"keep": {"bucket_selector": {"buckets_path": {"n": "_count"},
                                                 "script": "params.n >= 180"}}}}}}""")
    assert(kept.count() == expectKept)
    val paged = AggsJson.compile(orders,
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"p": {"bucket_sort": {"sort": [{"_count": {"order": "desc"}}],
                                          "from": 1, "size": 3}}}}}}""")
      .select($"doc_count".as[Long]).collect()
    val top = months.orderBy($"count".desc, $"m".asc)
      .select($"count".as[Long]).collect().slice(1, 4)
    assert(paged.sorted.toSeq == top.sorted.toSeq)
  }

  test("global without sub-aggs, unknown terms options, nested min_doc_count: all loud") {
    val e1 = intercept[IllegalArgumentException] {
      AggsJson.compile(docs, """{"aggs": {"g": {"global": {}}}}""")
    }
    assert(e1.getMessage.contains("sub-aggs"))
    val e2 = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"terms": {"field": "lang", "shard_size": 50}}}}""")
    }
    assert(e2.getMessage.contains("unsupported terms option"))
    val e3 = intercept[IllegalArgumentException] {
      AggsJson.compile(docs,
        """{"aggs": {"l": {"terms": {"field": "lang"}, "aggs": {
             "s": {"terms": {"field": "source", "min_doc_count": 2}}}}}}""")
    }
    assert(e3.getMessage.contains("min_doc_count on nested level"))
    val e4 = intercept[IllegalArgumentException] {
      AggsJson.compile(orders,
        """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
             "calendar_interval": "month", "offset": "10 days; DROP TABLE x"}}}}""")
    }
    assert(e4.getMessage.contains("bad date_histogram offset"))
  }

  test("moving_fn shift: default 0 excludes the current bucket, shift 1 includes it") {
    def frame(shift: String) = AggsJson.compile(orders,
      s"""{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
           "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "ma": {"moving_fn": {"buckets_path": "sales", "window": 2$shift,
                                         "script": "MovingFunctions.sum"}}}}}}""")
      .select($"sales".as[Double], $"ma".as[Option[Double]]).collect()
    val d0 = frame("")
    // shift 0 (ES default), window 2: ma_i = sales_{i-2} + sales_{i-1};
    // the first bucket's frame is empty -> null (ES's gap value)
    assert(d0.head._2.isEmpty)
    assert(math.abs(d0(2)._2.get - (d0(0)._1 + d0(1)._1)) < 1e-3)
    // shift 1: the window ends ON the current bucket
    val d1 = frame(""", "shift": 1""")
    assert(math.abs(d1(2)._2.get - (d1(1)._1 + d1(2)._1)) < 1e-3)
    assert(math.abs(d1.head._2.get - d1.head._1) < 1e-3)
  }

  test("random_sampler scales doc_count and sum-type metrics by 1/p, not avg") {
    import graft.util.Num
    val out = AggsJson.compile(docs,
      """{"aggs": {"s": {"random_sampler": {"probability": 0.5, "key_field": "doc_id"},
           "aggs": {"n": {"value_count": {"field": "doc_id"}},
                    "m": {"avg": {"field": "n_chars"}}}}}}""")
      .select($"n".as[Double], $"m".as[Double]).head()
    val sample = docs.where(Num.uniformHash48(col("doc_id")) < 0.5)
    val sc = sample.count()
    assert(out._1 == sc / 0.5, s"value_count must scale by 1/p: ${out._1} vs $sc")
    val rawAvg = sample.agg(avg($"n_chars")).head().getDouble(0)
    assert(math.abs(out._2 - rawAvg) < 1e-3, "avg must NOT scale")
  }

  test("pipeline aggs under random_sampler are loud (pre-scaled inputs)") {
    val e = intercept[IllegalArgumentException] {
      AggsJson.compile(orders,
        """{"aggs": {"s": {"random_sampler": {"probability": 0.5, "key_field": "o_orderkey"},
             "aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
               "aggs": {"c": {"cumulative_sum": {"buckets_path": "_count"}}}}}}}}""")
    }
    assert(e.getMessage.contains("pre-scaled"))
  }

  test("rare_terms drops null keys like the ES terms family") {
    val withNulls = docs.withColumn("maybe",
      when($"lang" === "en", lit(null).cast("string")).otherwise($"lang"))
    val keys = AggsJson.compile(withNulls,
      """{"aggs": {"r": {"rare_terms": {"field": "maybe", "max_doc_count": 100000}}}}""")
      .select($"key".as[String]).collect()
    assert(keys.nonEmpty && !keys.contains(null),
      s"null-key bucket must not materialize: ${keys.mkString(",")}")
  }
}
