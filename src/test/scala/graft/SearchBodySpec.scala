package graft

import graft.dsl.SearchBody
import org.apache.spark.sql.functions._

/** The widened `_search`-body front door (r10): loud contracts for
  * unsupported/incompatible body keys, and the composition semantics
  * of the new top-level sections (knn hybrid sum, collapse, rescore,
  * post_filter, min_score, search_after, highlight, _source). */
class SearchBodySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("unknown body keys fail loudly, listing the supported set") {
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(docs, """{"query": {"term": {"lang": "en"}}, "pit": {}}""",
        idField = "doc_id")
    }
    assert(e.getMessage.contains("pit"))
    assert(e.getMessage.contains("supported"))
  }

  test("aggs request rejects hit-path-only keys instead of silently dropping them") {
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"aggs": {"l": {"terms": {"field": "lang"}}}, "collapse": {"field": "source"}}""",
        idField = "doc_id")
    }
    assert(e.getMessage.contains("collapse"))
    // but the size:0 idiom (from/size/sort next to aggs) stays legal
    val buckets = SearchBody.search(docs,
      """{"aggs": {"l": {"terms": {"field": "lang"}}}, "size": 0}""",
      idField = "doc_id")
    assert(buckets.count() > 0)
  }

  test("rescore rejects collapse and search_after combos (ES does too)") {
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"match": {"text": "vector"}},
            "rescore": {"query": {"rescore_query": {"script_score": {"script": {"source": "1.0"}}}}},
            "collapse": {"field": "lang"}}""",
        idField = "doc_id")
    }
    assert(e.getMessage.contains("collapse"))
  }

  test("hybrid query+knn sums the two legs' scores; single-leg docs keep one score") {
    val corpus = docs.join(
      Tables.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding")),
      col("doc_id") === col("vec_id")).drop("vec_id")
    val vec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
    val hybrid = SearchBody.search(corpus,
      s"""{"query": {"match": {"text": "vector hash"}},
           "knn": {"field": "embedding", "query_vector": [${vec.mkString(",")}],
                   "k": 10, "num_candidates": 100000},
           "size": 500}""",
      idField = "doc_id")
      .select(col("doc_id").as[Long], col("_score").as[Double]).collect().toMap
    val bm25 = graft.search.Search.bm25Scores(corpus, "doc_id", "text", "vector hash")
      .select(col("id").as[Long], col("score").as[Double]).collect().toMap
    val knn = graft.sim.Ann.knnSearch(corpus, "doc_id",
      s"""{"knn": {"field": "embedding", "query_vector": [${vec.mkString(",")}],
           "k": 10, "num_candidates": 100000}}""")
      .select(col("id").as[Long], col("cosine").as[Double]).collect().toMap
    assert(hybrid.nonEmpty)
    hybrid.foreach { case (id, s) =>
      val want = bm25.getOrElse(id, 0.0) + knn.getOrElse(id, 0.0)
      assert(math.abs(s - want) < 1e-9, s"doc $id: $s vs $want")
    }
    // the union really is both legs
    assert(hybrid.keySet == bm25.keySet ++ knn.keySet)
  }

  test("knn LIST form (ES 8.12): clause similarities sum per doc") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val v1 = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
    val v2 = (0 until 64).map(i => (i * 53 % 100) / 100.0 - 0.5)
    def clause(v: Seq[Double], boost: Double) =
      s"""{"field": "embedding", "query_vector": [${v.mkString(",")}],
           "k": 10, "num_candidates": 100000, "boost": $boost}"""
    val listed = SearchBody.search(corpus,
      s"""{"knn": [${clause(v1, 1.0)}, ${clause(v2, 0.5)}], "size": 500}""",
      idField = "vec_id")
      .select($"vec_id".as[Long], $"_score".as[Double]).collect().toMap
    def leg(v: Seq[Double]) = graft.sim.Ann.knnSearch(corpus, "vec_id",
      s"""{"knn": ${clause(v, 1.0)}}""")
      .select($"id".as[Long], $"cosine".as[Double]).collect().toMap
    val (l1, l2) = (leg(v1), leg(v2))
    assert(listed.nonEmpty && listed.keySet == l1.keySet ++ l2.keySet)
    listed.foreach { case (id, s) =>
      val want = l1.getOrElse(id, 0.0) + 0.5 * l2.getOrElse(id, 0.0)
      assert(math.abs(s - want) < 1e-4, s"doc $id: $s vs $want")
    }
  }

  test("collapse picks one hit per group by the request sort, deterministically") {
    val out = SearchBody.search(docs,
      """{"collapse": {"field": "lang"},
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}]}""",
      idField = "doc_id")
    val rows = out.select($"lang", $"n_chars", $"doc_id").as[(String, Long, Long)].collect()
    assert(rows.map(_._1).distinct.length == rows.length) // one per lang
    val best = docs.groupBy("lang").agg(max("n_chars").as("m"))
      .select($"lang", $"m").as[(String, Long)].collect().toMap
    rows.foreach { case (l, n, _) => assert(n == best(l)) }
  }

  test("post_filter prunes hits without changing their scores") {
    val body = """{"query": {"match": {"text": "vector"}}, "min_score": 0.0,
                   "post_filter": {"term": {"lang": "en"}}}"""
    val filtered = SearchBody.search(docs, body, idField = "doc_id")
    val open = SearchBody.search(docs,
      """{"query": {"match": {"text": "vector"}}, "min_score": 0.0}""", idField = "doc_id")
    val f = filtered.select($"doc_id".as[Long], $"_score".as[Double]).collect().toMap
    val o = open.select($"doc_id".as[Long], $"_score".as[Double]).collect().toMap
    assert(f.nonEmpty && f.size < o.size)
    f.foreach { case (id, s) => assert(o(id) == s) }
  }

  test("search_after continues exactly where the previous page ended") {
    val page1 = SearchBody.search(docs,
      """{"sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "size": 5}""", idField = "doc_id")
      .select($"n_chars".as[Long], $"doc_id".as[Long]).collect()
    val (ln, lid) = page1.last
    val page2 = SearchBody.search(docs,
      s"""{"sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
           "search_after": [$ln, $lid], "size": 5}""", idField = "doc_id")
      .select($"n_chars".as[Long], $"doc_id".as[Long]).collect()
    val both = SearchBody.search(docs,
      """{"sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "size": 10}""", idField = "doc_id")
      .select($"n_chars".as[Long], $"doc_id".as[Long]).collect()
    assert((page1 ++ page2).toSeq == both.toSeq)
  }

  test("search_after cursor: 3-key mixed-direction sort chains losslessly at several page sizes") {
    val sort = """[{"lang": {"order": "asc"}}, {"n_chars": {"order": "desc"}},
                   {"doc_id": {"order": "asc"}}]"""
    val full = SearchBody.search(docs, s"""{"sort": $sort}""", idField = "doc_id")
      .select($"lang".as[String], $"n_chars".as[Long], $"doc_id".as[Long])
      .collect().toSeq
    for (pageSize <- Seq(3, 7, 50)) {
      var got = Seq.empty[(String, Long, Long)]
      var after: Option[(String, Long, Long)] = None
      var done = false
      while (!done) {
        val cursor = after.map { case (l, n, id) =>
          s""", "search_after": ["$l", $n, $id]""" }.getOrElse("")
        val page = SearchBody.search(docs,
          s"""{"sort": $sort, "size": $pageSize$cursor}""", idField = "doc_id")
          .select($"lang".as[String], $"n_chars".as[Long], $"doc_id".as[Long])
          .collect().toSeq
        got ++= page
        if (page.isEmpty) done = true else after = Some(page.last)
      }
      assert(got == full, s"pageSize=$pageSize")
    }
  }

  test("_source keeps hit metadata (_score, snippet, script fields) through the prune") {
    val out = SearchBody.search(docs,
      """{"query": {"match": {"text": "vector"}}, "min_score": 0.0,
          "highlight": {"fields": {"text": {}}},
          "script_fields": {"k": {"script": {"source": "doc['n_chars'].value / 100.0"}}},
          "_source": ["doc_id"]}""",
      idField = "doc_id")
    assert(out.columns.toSet == Set("doc_id", "_score", "snippet", "k"))
    assert(out.count() > 0)
  }

  test("connector es.query with a FULL body routes through the composed front door") {
    import graft.sources.Connector.implicits._
    val body = """{"query": {"term": {"lang": "de"}},
                   "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
                   "size": 5}"""
    val viaConnector = spark.graftDF(s"$sfDir/documents.parquet", body, idField = "doc_id")
      .select($"doc_id".as[Long]).collect().toSeq
    val direct = SearchBody.search(docs, body, idField = "doc_id")
      .select($"doc_id".as[Long]).collect().toSeq
    assert(viaConnector == direct && viaConnector.length == 5)
    // a runtime+query-only body keeps the legacy predicate path (same
    // result, no behavior change), and a bare DSL object still works
    val legacy = spark.graftDF(s"$sfDir/documents.parquet",
      """{"query": {"term": {"lang": "de"}}}""", idField = "doc_id")
    assert(legacy.count() == docs.where($"lang" === "de").count())
    // an unknown body key is now LOUD through the connector too
    val e = intercept[IllegalArgumentException] {
      spark.graftDF(s"$sfDir/documents.parquet",
        """{"query": {"term": {"lang": "de"}}, "pit": {}}""", idField = "doc_id").count()
    }
    assert(e.getMessage.contains("pit"))
  }

  test("scored match with semantics-changing options keeps the AND hit set, BM25-scored") {
    // operator:and changes the hit set; the body must never BM25-score
    // the OR set. The fallback path filters with the AND predicate and
    // scores via the clause-sum formula (scoringClauses) — correct hit
    // set AND real scores.
    val out = SearchBody.search(docs,
      """{"query": {"match": {"text": {"query": "fast hash", "operator": "and"}}},
          "min_score": 0.0}""", idField = "doc_id")
    val want = docs.where(graft.dsl.QueryDslJson.compile(
      """{"match": {"text": {"query": "fast hash", "operator": "and"}}}"""))
    assert(out.count() == want.count() && out.count() > 0)
    val bm25 = graft.search.Search.bm25Scores(docs, "doc_id", "text", "fast hash")
      .select($"id".as[Long], $"score".as[Double]).collect().toMap
    out.select($"doc_id".as[Long], $"_score".as[Double]).collect().foreach {
      case (id, s) => assert(s == bm25(id), s"doc $id")
    }
  }

  test("rescore ARRAY: stages chain, each re-ranking the previous window") {
    def stage(w: Int, src: String, rw: Double) =
      s"""{"window_size": $w, "query": {
            "rescore_query": {"script_score": {"script": {"source": "$src"}}},
            "rescore_query_weight": $rw}}"""
    val chained = SearchBody.search(docs,
      s"""{"query": {"match": {"text": "fast hash join"}},
           "rescore": [${stage(50, "Math.log(1.0 + doc['n_chars'].value)", 0.5)},
                       ${stage(20, "doc['n_chars'].value / 1000.0", 1.0)}],
           "size": 10}""", idField = "doc_id")
      .select($"doc_id".as[Long], $"_score".as[Double]).collect().toSeq
    // hand-chain: stage 1 == the single-stage body, stage 2 on its top-20
    val s1 = SearchBody.search(docs,
      s"""{"query": {"match": {"text": "fast hash join"}},
           "rescore": ${stage(50, "Math.log(1.0 + doc['n_chars'].value)", 0.5)},
           "size": 50}""", idField = "doc_id")
    val nchars = docs.select($"doc_id".as[Long], $"n_chars".as[Long]).collect().toMap
    val want = s1.select($"doc_id".as[Long], $"_score".as[Double]).collect().toSeq
      .sortBy { case (id, s) => (-s, id) }.take(20)
      .map { case (id, s) =>
        id -> BigDecimal(s + nchars(id) / 1000.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(chained.sortBy { case (id, s) => (-s, id) } == want)
  }

  test("scored bool body: must BM25 sums, filter gates without scoring") {
    val out = SearchBody.search(docs,
      """{"query": {"bool": {"must": [{"match": {"text": "vector hash"}}],
                              "filter": [{"term": {"lang": "en"}}]}},
          "min_score": 0.0}""", idField = "doc_id")
      .select($"doc_id".as[Long], $"_score".as[Double]).collect().toMap
    val bm25 = graft.search.Search.bm25Scores(docs, "doc_id", "text", "vector hash")
      .select($"id".as[Long], $"score".as[Double]).collect().toMap
    val en = docs.where($"lang" === "en").select($"doc_id".as[Long]).collect().toSet
    assert(out.nonEmpty && out.keySet == bm25.keySet.intersect(en))
    out.foreach { case (id, s) => assert(s == bm25(id)) }
  }

  test("suggest section: term suggester through the body; one-frame contracts are loud") {
    val viaBody = SearchBody.search(docs,
      """{"suggest": {"fix": {"text": "spak",
           "term": {"field": "text", "suggest_mode": "always", "max_edits": 2, "size": 5}}}}""",
      idField = "doc_id").collect().toSeq
    val direct = graft.search.Search.suggestMode(docs, "text", "spak", "always", 2, 5)
      .collect().toSeq
    assert(viaBody == direct && viaBody.nonEmpty)
    // suggest + query = dead hit path → loud
    val e1 = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"term": {"lang": "en"}},
            "suggest": {"fix": {"text": "spak", "term": {"field": "text"}}}}""",
        idField = "doc_id")
    }
    assert(e1.getMessage.contains("query"))
    // two named suggesters = two frames → loud
    val e2 = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"suggest": {"a": {"text": "spak", "term": {"field": "text"}},
                        "b": {"text": "spar", "term": {"field": "text"}}}}""",
        idField = "doc_id")
    }
    assert(e2.getMessage.contains("one named suggester"))
    // completion without weight_field names the mapping-time weight gap
    val e3 = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"suggest": {"c": {"prefix": "sp", "completion": {"field": "text"}}}}""",
        idField = "doc_id")
    }
    assert(e3.getMessage.contains("weight_field"))
  }

  test("multi-term highlight through the body matches the fragments operator") {
    val viaBody = SearchBody.search(docs,
      """{"query": {"match": {"text": "fast hash join"}},
          "highlight": {"fields": {"text": {"number_of_fragments": 2}}},
          "sort": [{"doc_id": {"order": "asc"}}]}""",
      idField = "doc_id")
      .select($"doc_id".as[Long], $"snippet".as[String]).collect().toMap
    val direct = graft.search.Search.highlightFragments(docs, "doc_id", "text",
      "fast hash join", 2)
      .select($"id".as[Long], $"snippet".as[String]).collect().toMap
    assert(viaBody.nonEmpty && viaBody == direct)
  }

  test("_source: false returns id + hit metadata only") {
    val out = SearchBody.search(docs,
      """{"query": {"match": {"text": "vector"}}, "min_score": 0.0, "_source": false}""",
      idField = "doc_id")
    assert(out.columns.toSet == Set("doc_id", "_score"))
    assert(out.count() > 0)
    // _source: true is the explicit default (all doc columns)
    val full = SearchBody.search(docs,
      """{"query": {"term": {"lang": "en"}}, "_source": true}""", idField = "doc_id")
    assert(full.columns.toSet == docs.columns.toSet)
  }

  test("highlight without a match query to take the term from is a loud error") {
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"term": {"lang": "en"}}, "highlight": {"fields": {"text": {}}}}""",
        idField = "doc_id")
    }
    assert(e.getMessage.contains("match"))
  }

  test("fields retrieval: wildcards expand, formats apply, unknown fields loud") {
    val orders = Tables.load(spark, sfDir, "orders")
    val out = SearchBody.search(orders,
      """{"query": {"term": {"o_orderstatus": "F"}}, "size": 5, "_source": false,
          "fields": ["o_order*", {"field": "o_orderdate", "format": "yyyy-MM"}],
          "sort": [{"o_orderkey": {"order": "asc"}}]}""",
      idField = "o_orderkey")
    assert(out.columns.toSet ==
      Set("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"))
    // the formatted value replaces the field under its own name
    assert(out.select($"o_orderdate".as[String]).head().matches("\\d{4}-\\d{2}"))
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(orders,
        """{"query": {"term": {"o_orderstatus": "F"}}, "fields": ["o_nope"]}""",
        idField = "o_orderkey")
    }
    assert(e.getMessage.contains("o_nope"))
    val e2 = intercept[IllegalArgumentException] {
      SearchBody.search(orders,
        """{"query": {"term": {"o_orderstatus": "F"}}, "fields": ["z_*"]}""",
        idField = "o_orderkey")
    }
    assert(e2.getMessage.contains("z_*"))
  }

  test("rich body sort: _script key orders and feeds the search_after cursor") {
    val orders = Tables.load(spark, sfDir, "orders")
    val page1 = SearchBody.search(orders,
      s"""{"sort": [{"_script": {"script": {"source":
           "Math.abs(doc['o_totalprice'].value - params.pivot)",
           "params": {"pivot": 150000.0}}, "order": "asc"}},
           {"o_orderkey": {"order": "asc"}}],
           "size": 10, "_source": ["o_orderkey", "o_totalprice"]}""",
      idField = "o_orderkey")
      .select($"o_orderkey".as[Long], $"o_totalprice".as[Double]).collect()
    val (lastKey, lastId) = (math.abs(page1.last._2 - 150000.0), page1.last._1)
    val page2 = SearchBody.search(orders,
      s"""{"sort": [{"_script": {"script": {"source":
           "Math.abs(doc['o_totalprice'].value - params.pivot)",
           "params": {"pivot": 150000.0}}, "order": "asc"}},
           {"o_orderkey": {"order": "asc"}}],
           "search_after": [$lastKey, $lastId],
           "size": 10, "_source": ["o_orderkey", "o_totalprice"]}""",
      idField = "o_orderkey")
      .select($"o_orderkey".as[Long], $"o_totalprice".as[Double]).collect()
    // pages chain losslessly: page2 == rows 10-19 of the unpaged run
    val all = SearchBody.search(orders,
      s"""{"sort": [{"_script": {"script": {"source":
           "Math.abs(doc['o_totalprice'].value - params.pivot)",
           "params": {"pivot": 150000.0}}, "order": "asc"}},
           {"o_orderkey": {"order": "asc"}}],
           "size": 20, "_source": ["o_orderkey", "o_totalprice"]}""",
      idField = "o_orderkey")
      .select($"o_orderkey".as[Long], $"o_totalprice".as[Double]).collect()
    assert(page1.toSeq == all.take(10).toSeq)
    assert(page2.toSeq == all.drop(10).toSeq)
  }

  test("multivalue sort mode through the body matches the Sorting operator") {
    val qty = Tables.load(spark, sfDir, "lineitem").groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_quantity")).as("qtys"))
    val frame = Tables.load(spark, sfDir, "orders")
      .join(qty, col("o_orderkey") === col("l_orderkey"))
    val viaBody = SearchBody.search(frame,
      """{"sort": [{"qtys": {"order": "desc", "mode": "min"}},
                   {"o_orderkey": {"order": "asc"}}],
          "size": 20, "_source": ["o_orderkey"]}""",
      idField = "o_orderkey").select($"o_orderkey".as[Long]).collect().toSeq
    val direct = frame
      .orderBy(graft.search.Sorting.compile(
        """[{"qtys": {"order": "desc", "mode": "min"}}]""") :+ col("o_orderkey").asc: _*)
      .limit(20).select($"o_orderkey".as[Long]).collect().toSeq
    assert(viaBody == direct && viaBody.size == 20)
  }

  test("multi-field highlight: per-field snippet columns, terms from the matching clause") {
    val out = SearchBody.search(docs,
      """{"query": {"bool": {
            "must": [{"match": {"text": "vector"}}],
            "should": [{"match": {"source": "src1"}}]}},
          "sort": ["_score", {"doc_id": {"order": "asc"}}], "size": 20,
          "highlight": {"fields": {"text": {}, "source": {}}}}""",
      idField = "doc_id")
    assert(out.columns.contains("snippet_text") && out.columns.contains("snippet_source"))
    val rows = out.select($"snippet_text".as[String], $"snippet_source".as[String],
      $"source".as[String]).collect()
    assert(rows.forall(_._1.contains("<em>vector</em>")))
    // only src1 docs highlight in source; others get the empty miss
    assert(rows.forall(r => if (r._3 == "src1") r._2.contains("<em>src1</em>") else r._2 == ""))
    // a highlight field no scoring clause targets is loud
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"match": {"text": "vector"}},
            "highlight": {"fields": {"lang": {}}}}""",
        idField = "doc_id")
    }
    assert(e.getMessage.contains("lang"))
  }

  test("scored bool: corpus scan count is CONSTANT in the clause count (one-pass kernel)") {
    def scans(body: String): Int =
      "FileScan".r.findAllIn(
        SearchBody.search(docs, body, idField = "doc_id")
          .queryExecution.executedPlan.toString).length
    val one = scans(
      """{"query": {"bool": {"must": [{"match": {"text": "vector"}}]}}, "min_score": 0.0}""")
    val three = scans(
      """{"query": {"bool": {"must": [{"match": {"text": "vector"}}],
          "should": [{"match": {"text": "hash"}}, {"match": {"source": "src1"}}]}},
          "min_score": 0.0}""")
    assert(three == one, s"3-clause body scans $three vs 1-clause $one")
  }

  test("nested retriever tree: rrf over a linear composite leg matches the hand-wired fusion") {
    val corpus = docs.join(
      Tables.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding")),
      col("doc_id") === col("vec_id")).drop("vec_id")
    val vec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
    val viaTree = graft.dsl.Retrievers.topK(corpus, "doc_id", corpus, "doc_id",
      s"""{"retriever": {"rrf": {"retrievers": [
            {"linear": {"retrievers": [
              {"retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}}, "weight": 0.7},
              {"retriever": {"knn": {"field": "embedding", "query_vector": [${vec.mkString(",")}]}}, "weight": 0.3}],
              "rank_window_size": 50}},
            {"standard": {"query": {"match": {"text": "vector hash"}}}}],
            "rank_window_size": 40, "rank_constant": 60}}}""", k = 10)
      .select($"id".as[Long], $"rrf_score".as[Double]).collect().toSeq
    val linearLeg = graft.search.Search.linearTopK(Seq(
      (graft.search.Search.bm25Scores(corpus, "doc_id", "text", "fast hash join"), 0.7),
      (corpus.select(col("doc_id").as("id"),
        graft.util.Num.round(graft.dedup.Vectors.cosine(
          col("embedding").cast("array<double>"),
          array(vec.map(lit(_)): _*)), 4).as("score")), 0.3)),
      windowSize = 50, k = 50)
      .select(col("id"), col("linear_score").as("score"))
    val handWired = graft.search.Search.rrfTopK(Seq(
      linearLeg,
      graft.search.Search.bm25Scores(corpus, "doc_id", "text", "vector hash")),
      rankConstant = 60, windowSize = 40, k = 10)
      .select($"id".as[Long], $"rrf_score".as[Double]).collect().toSeq
    assert(viaTree == handWired && viaTree.size == 10)
  }

  test("standard retriever leaf accepts any scored query shape; knn leaf honors filter") {
    val corpus = docs.join(
      Tables.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"), col("label")),
      col("doc_id") === col("vec_id")).drop("vec_id")
    val vec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
    // bool standard leaf: scoring clauses sum, filter clause gates
    val viaTree = graft.dsl.Retrievers.topK(corpus, "doc_id", corpus, "doc_id",
      """{"retriever": {"standard": {"query": {"bool": {
           "must": [{"match": {"text": "vector hash"}}],
           "filter": [{"term": {"lang": "en"}}]}}}}}""", k = 10)
      .select($"id".as[Long], $"score".as[Double]).collect().toSeq
    val direct = graft.dsl.SearchBody.search(docs,
      """{"query": {"bool": {"must": [{"match": {"text": "vector hash"}}],
          "filter": [{"term": {"lang": "en"}}]}}, "min_score": 0.0, "size": 10}""",
      idField = "doc_id")
      .select($"doc_id".as[Long], $"_score".as[Double]).collect().toSeq
    assert(viaTree == direct && viaTree.size == 10)
    // knn leaf pre-filter restricts the searched corpus
    val filtered = graft.dsl.Retrievers.topK(corpus, "doc_id", corpus, "doc_id",
      s"""{"retriever": {"knn": {"field": "embedding",
           "query_vector": [${vec.mkString(",")}],
           "filter": {"term": {"label": 3}}}}}""", k = 5)
      .select($"id".as[Long]).collect().toSet
    val labels = corpus.where($"label" === 3).select($"doc_id".as[Long]).collect().toSet
    assert(filtered.nonEmpty && filtered.subsetOf(labels))
  }

  test("text_similarity_reranker: swapped inference service takes effect") {
    import graft.inference.{Inference, InferenceService}
    val body =
      """{"retriever": {"text_similarity_reranker": {
            "retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
            "field": "text", "inference_text": "fast hash merge",
            "rank_window_size": 15}}, "size": 5}"""
    val stubbed = SearchBody.search(docs, body, idField = "doc_id")
      .select($"id".as[Long], $"score".as[Double]).collect().toSeq
    assert(stubbed.size == 5 && stubbed.map(_._2) == stubbed.map(_._2).sorted.reverse)
    val prev = Inference.service
    try {
      Inference.service = new InferenceService {
        def expandQuery(q: String) = prev.expandQuery(q)
        def rerankScore(q: String, text: org.apache.spark.sql.Column) = lit(42.0)
        def complete(p: org.apache.spark.sql.Column) = prev.complete(p)
        def decoder() = prev.decoder()
        def embed(text: String) = prev.embed(text)
      }
      val swapped = SearchBody.search(docs, body, idField = "doc_id")
        .select($"score".as[Double]).collect().toSeq
      assert(swapped.forall(_ == 42.0))
    } finally Inference.service = prev
  }

  test("rank.rrf contracts: needs knn legs, rejects unknown methods and knobs") {
    val e1 = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"match": {"text": "hash"}},
            "rank": {"rrf": {}}, "size": 5}""", idField = "doc_id")
    }
    assert(e1.getMessage.contains("knn"))
    val e2 = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"match": {"text": "hash"}},
            "knn": {"field": "embedding", "query_vector": [0.1], "k": 5},
            "rank": {"linear": {}}, "size": 5}""", idField = "doc_id")
    }
    assert(e2.getMessage.contains("rrf"))
    val e3 = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"match": {"text": "hash"}},
            "knn": {"field": "embedding", "query_vector": [0.1], "k": 5},
            "rank": {"rrf": {"window": 9}}, "size": 5}""", idField = "doc_id")
    }
    assert(e3.getMessage.contains("unknown rank.rrf key"))
  }

  test("explain: true needs a match query; _explanation survives _source: false") {
    val e = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"term": {"lang": "en"}}, "explain": true, "size": 5}""",
        idField = "doc_id")
    }
    assert(e.getMessage.contains("single-field match"))
    val out = SearchBody.search(docs,
      """{"query": {"match": {"text": "vector hash"}}, "explain": true,
          "sort": ["_score", {"doc_id": {"order": "asc"}}],
          "size": 5, "_source": false}""", idField = "doc_id")
    assert(out.columns.contains("_explanation"))
    val ex = out.select($"_explanation".as[String]).collect()
    assert(ex.nonEmpty && ex.forall(_.startsWith("weight(")))
  }

  test("terminate_after caps the collected set before sort/size") {
    val body = (n: String) =>
      s"""{"query": {"term": {"lang": "en"}}$n,
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "size": 5, "_source": ["doc_id", "n_chars"]}"""
    val capped = SearchBody.search(docs, body(""", "terminate_after": 20"""),
      idField = "doc_id").select($"doc_id".as[Long]).collect().toSet
    val first20 = docs.where($"lang" === "en").orderBy($"doc_id").limit(20)
    val expect = first20.orderBy($"n_chars".desc, $"doc_id".asc).limit(5)
      .select($"doc_id".as[Long]).collect().toSet
    assert(capped == expect)
    // and the uncapped request CAN see docs beyond the first 20 matches
    val uncapped = SearchBody.search(docs, body(""),
      idField = "doc_id").select($"doc_id".as[Long]).collect().toSet
    assert(uncapped != capped)
  }

  test("aggs bodies: size 0 is the canonical no-op, size > 0 / sort are loud, " +
      "terminate_after caps the collected set") {
    // size: 0 — the standard aggs idiom — compiles
    val ok = SearchBody.search(docs,
      """{"query": {"term": {"lang": "en"}}, "size": 0,
          "aggs": {"n": {"value_count": {"field": "doc_id"}}}}""",
      idField = "doc_id")
    assert(ok.head().getLong(0) > 0)
    val sized = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"size": 5, "aggs": {"n": {"value_count": {"field": "doc_id"}}}}""",
        idField = "doc_id")
    }
    assert(sized.getMessage.contains("size"))
    val sorted = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"sort": [{"doc_id": "asc"}],
            "aggs": {"n": {"value_count": {"field": "doc_id"}}}}""",
        idField = "doc_id")
    }
    assert(sorted.getMessage.contains("sort"))
    // terminate_after feeds the aggs the first-n-matches prefix
    val capped = SearchBody.search(docs,
      """{"query": {"term": {"lang": "en"}}, "terminate_after": 20,
          "aggs": {"n": {"value_count": {"field": "doc_id"}}}}""",
      idField = "doc_id").head().getLong(0)
    assert(capped == 20)
  }

  test("slice: the max slices partition the corpus exactly; bad ranges loud") {
    def slice(i: Int) = SearchBody.search(docs,
      s"""{"slice": {"id": $i, "max": 3}, "_source": ["doc_id"]}""",
      idField = "doc_id").select($"doc_id".as[Long]).collect().toSet
    val parts = (0 until 3).map(slice)
    assert(parts.map(_.size).sum == docs.count())
    assert(parts.reduce(_ ++ _).size == docs.count()) // disjoint union
    val bad = intercept[IllegalArgumentException] {
      SearchBody.search(docs, """{"slice": {"id": 4, "max": 3}}""", idField = "doc_id")
    }
    assert(bad.getMessage.contains("0 <= id < max"))
    val unknown = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"slice": {"id": 0, "max": 3, "routing": "x"}}""", idField = "doc_id")
    }
    assert(unknown.getMessage.contains("routing"))
    // rescore windows / collapse groups are GLOBAL — a per-slice
    // window would disagree with the unsliced request, so loud
    val withRescore = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"match": {"text": "vector hash"}},
            "slice": {"id": 0, "max": 2},
            "rescore": {"window_size": 5, "query": {"rescore_query":
              {"script_score": {"script": {"source": "_score * 2"}}}}}}""",
        idField = "doc_id")
    }
    assert(withRescore.getMessage.contains("rescore"))
  }

  test("slice scores from FULL-index stats; null slice-field docs land in one slice") {
    // a doc's _score must be identical in the sliced and unsliced
    // request (per-slice IDF would disagree across slices)
    def scores(slice: String) = SearchBody.search(docs,
      s"""{"query": {"match": {"text": "vector hash"}}$slice,
          "sort": ["_score", {"doc_id": "asc"}], "_source": ["doc_id"]}""",
      idField = "doc_id")
      .select($"doc_id".as[Long], $"_score".as[Double]).collect().toMap
    val full = scores("")
    val sliced = (0 until 2).map(i => scores(s""", "slice": {"id": $i, "max": 2}"""))
    assert(sliced.map(_.size).sum == full.size)
    sliced.flatten.foreach { case (id, s) => assert(full(id) == s) }
    // null slice-field values hash as "" — every doc appears in
    // EXACTLY one slice, so the union is still the corpus
    val nulled = docs.withColumn("maybe",
      when($"doc_id" % 7 === 0, lit(null).cast("string")).otherwise($"lang"))
    def bySlice(i: Int) = SearchBody.search(nulled,
      s"""{"slice": {"id": $i, "max": 3, "field": "maybe"}, "_source": ["doc_id"]}""",
      idField = "doc_id").select($"doc_id".as[Long]).collect().toSeq
    val parts = (0 until 3).map(bySlice)
    assert(parts.map(_.size).sum == nulled.count())
    assert(parts.flatten.distinct.size == nulled.count())
  }

  test("track_scores attaches _score to field-sorted hits; absent stays scoreless") {
    val body = (ts: String) =>
      s"""{"query": {"match": {"text": "vector hash"}}$ts,
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": "asc"}],
          "size": 5, "_source": ["doc_id"]}"""
    val tracked = SearchBody.search(docs, body(""", "track_scores": true"""),
      idField = "doc_id")
    assert(tracked.columns.contains("_score"))
    assert(tracked.where($"_score" > 0.0).count() == 5)
    val plain = SearchBody.search(docs, body(""), idField = "doc_id")
    assert(!plain.columns.contains("_score"))
  }

  test("stored_fields: keep-list and _none_; combining with _source loud") {
    val kept = SearchBody.search(docs,
      """{"query": {"term": {"lang": "de"}}, "stored_fields": ["source"],
          "sort": [{"doc_id": "asc"}], "size": 5}""", idField = "doc_id")
    assert(kept.columns.toSet == Set("doc_id", "source"))
    val none = SearchBody.search(docs,
      """{"query": {"term": {"lang": "de"}}, "stored_fields": "_none_",
          "sort": [{"doc_id": "asc"}], "size": 5}""", idField = "doc_id")
    assert(none.columns.toSet == Set("doc_id"))
    val combo = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"stored_fields": ["source"], "_source": ["doc_id"]}""", idField = "doc_id")
    }
    assert(combo.getMessage.contains("ambiguous"))
    val typo = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"stored_fields": ["sourcex"]}""", idField = "doc_id")
    }
    assert(typo.getMessage.contains("sourcex"))
  }

  test("terminate_after background-agg guard matches agg-node KEYS, not substrings") {
    // a terms agg on a field merely NAMED like a background agg node
    // must pass — substring matching on the rendered JSON would
    // spuriously reject it
    val ok = SearchBody.search(
      docs.withColumn("global_region", $"lang"),
      """{"query": {"term": {"lang": "en"}}, "terminate_after": 20,
          "aggs": {"g": {"terms": {"field": "global_region", "size": 3}}}}""",
      idField = "doc_id")
    assert(ok.count() > 0)
    // ...and a real background node stays loud even NESTED under a
    // capped-compatible parent (the tree walk recurses through sub-aggs)
    val bad = intercept[IllegalArgumentException] {
      SearchBody.search(docs,
        """{"query": {"term": {"lang": "en"}}, "terminate_after": 20,
            "aggs": {"a": {"terms": {"field": "lang", "size": 3},
                           "aggs": {"g": {"global": {}}}}}}""",
        idField = "doc_id")
    }
    assert(bad.getMessage.contains("global"))
  }
}
