package graft

import graft.dsl.QueryDsl
import org.apache.spark.sql.functions._

class QueryDslSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alpha", 10, "src1"),
    (2L, "beta", 20, "src2"),
    (3L, "alpha", 30, "src10"),
    (4L, "gamma", 40, "other")).toDF("id", "kind", "v", "src")

  test("multi_match filter node: or/and per field, cross_fields AND across fields, phrase") {
    val docs = Tables.documents(spark, sfDir)
    def ids(json: String) = docs.where(graft.dsl.QueryDslJson.compile(json))
      .select($"doc_id".as[Long]).collect().toSet
    val s = graft.search.Search
    import org.apache.spark.sql.functions._
    // best_fields filter = any field matches (boosts scoring-only)
    assert(ids("""{"multi_match": {"query": "merge src5", "fields": ["text", "source^2"]}}""") ==
      docs.where(s.matchQuery(col("text"), "merge src5") ||
        s.matchQuery(col("source"), "merge src5"))
        .select($"doc_id".as[Long]).collect().toSet)
    // operator and gates per field; cross_fields satisfies AND across fields
    val perField = ids("""{"multi_match": {"query": "merge src5",
      "fields": ["text", "source"], "operator": "and"}}""")
    val cross = ids("""{"multi_match": {"query": "merge src5",
      "fields": ["text", "source"], "type": "cross_fields", "operator": "and"}}""")
    assert(perField.subsetOf(cross) && cross.nonEmpty)
    // phrase type gates on the phrase per field
    assert(ids("""{"multi_match": {"query": "table scan",
      "fields": ["text", "source"], "type": "phrase"}}""") ==
      docs.where(s.matchPhrase(col("text"), "table scan") ||
        s.matchPhrase(col("source"), "table scan"))
        .select($"doc_id".as[Long]).collect().toSet)
  }

  test(".keyword subfield addressing maps to the parent column") {
    val hits = df.where(graft.dsl.QueryDslJson.compile(
      """{"bool": {"filter": [
           {"term": {"kind.keyword": "alpha"}},
           {"range": {"v": {"lte": 30}}}]}}"""))
      .select("id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
    // terms and prefix too
    assert(df.where(graft.dsl.QueryDslJson.compile(
      """{"terms": {"src.keyword": ["src1", "other"]}}""")).count() == 2L)
    assert(df.where(graft.dsl.QueryDslJson.compile(
      """{"prefix": {"src.keyword": "src1"}}""")).count() == 2L)
  }

  test("_validate/query: analysis-only compile, no execution") {
    import graft.dsl.Validate
    // valid body: resolves against the schema, explanation carries the
    // rewritten predicate (what PushedFilters will see)
    val (ok, expl) = Validate.validateQuery(df,
      """{"bool": {"filter": [{"term": {"kind": "alpha"}}, {"range": {"v": {"gte": 20}}}]}}""")
    assert(ok, expl)
    assert(expl.toLowerCase.contains("kind"), expl)
    // unknown field: analysis (not execution) rejects it
    val (bad, why) = Validate.validateQuery(df,
      """{"term": {"nope": "x"}}""")
    assert(!bad)
    assert(why.toLowerCase.contains("nope"), why)
    // malformed DSL: compiler rejects it
    val (bad2, _) = Validate.validateQuery(df, """{"not_a_query": {}}""")
    assert(!bad2)
  }

  test("_explain function_score: per-component breakdown") {
    val r = graft.search.Search.explainFunctionScore(
      df, "id", "v", origin = 30.0, scale = 10.0, docId = 3L)
      .as[(String, Double)].collect().toSeq
    assert(r.map(_._1) == Seq("field_value_factor", "gauss", "score"))
    val m = r.toMap
    assert(math.abs(m("field_value_factor") - math.log1p(30.0)) < 1e-3)
    assert(m("gauss") == 1.0) // x == origin
    assert(math.abs(m("score") - m("field_value_factor") * m("gauss")) < 1e-3)
  }

  test("term / terms / ids") {
    assert(df.where(QueryDsl.term(col("kind"), "alpha")).count() == 2)
    assert(df.where(QueryDsl.terms(col("kind"), Seq("beta", "gamma"))).count() == 2)
    assert(df.where(QueryDsl.ids(col("id"), Seq(1L, 4L))).count() == 2)
  }

  test("range with mixed bounds") {
    assert(df.where(QueryDsl.range(col("v"), gte = Some(20), lt = Some(40))).count() == 2)
    assert(df.where(QueryDsl.range(col("v"), gt = Some(10))).count() == 3)
    intercept[IllegalArgumentException](QueryDsl.range(col("v")))
  }

  test("prefix / wildcard / regexp anchored") {
    assert(df.where(QueryDsl.prefix(col("src"), "src")).count() == 3)
    assert(df.where(QueryDsl.wildcard(col("src"), "src?")).count() == 2)
    assert(df.where(QueryDsl.wildcard(col("src"), "src*")).count() == 3)
    // ES regexp is fully anchored: "src1" must NOT match "src10"
    assert(df.where(QueryDsl.regexp(col("src"), "src1")).count() == 1)
  }

  test("fuzzy edit distance") {
    assert(df.where(QueryDsl.fuzzy(col("src"), "src1", 1))
      .count() == 3) // src1(0), src2(1), src10(1)
  }

  test("bool minimum_should_match") {
    val q = QueryDsl.bool(
      should = Seq(col("kind") === "alpha", col("v") >= 30, col("src") === "src1"),
      minimumShouldMatch = 2)
    // id1: alpha+src1, id3: alpha+30 -> 2 hits; id4: only v>=30
    assert(df.where(q).as[(Long, String, Int, String)].collect().map(_._1).sorted.toSeq == Seq(1L, 3L))
  }

  test("bool must/mustNot with should as pure OR") {
    val q = QueryDsl.bool(
      must = Seq(col("v") > 10),
      should = Seq(col("kind") === "alpha", col("kind") === "beta"),
      mustNot = Seq(col("src") === "src2"),
      minimumShouldMatch = 1)
    assert(df.where(q).select("id").as[Long].collect().toSeq.sorted == Seq(3L))
  }

  test("wrapper query: base64-embedded json compiles recursively") {
    val inner = """{"term": {"kind": "alpha"}}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(inner.getBytes("UTF-8"))
    val viaWrapper = df.where(
      graft.dsl.QueryDslJson.compile(s"""{"wrapper": {"query": "$b64"}}"""))
      .count()
    assert(viaWrapper == df.where(col("kind") === "alpha").count() && viaWrapper == 2)
  }

  test("json span_near and terms_set clauses compile") {
    val docs = Seq(
      (1L, "fast hash join wins"),
      (2L, "join a b c hash"),
      (3L, "hash only")).toDF("id", "text")
    // unordered, slop 1: id1 (adjacent) matches; id2 (3 intervening) not
    val near = docs.where(graft.dsl.QueryDslJson.compile(
      """{"span_near": {"clauses": [{"span_term": {"text": "hash"}},
        {"span_term": {"text": "join"}}], "slop": 1, "in_order": false}}"""))
      .select("id").as[Long].collect().toSet
    assert(near == Set(1L))
    // ordered (in_order default): "hash join" in order, slop 0
    val ord = docs.where(graft.dsl.QueryDslJson.compile(
      """{"span_near": {"clauses": [{"span_term": {"text": "hash"}},
        {"span_term": {"text": "join"}}], "slop": 0}}"""))
      .select("id").as[Long].collect().toSet
    assert(ord == Set(1L))
    val ts = docs.where(graft.dsl.QueryDslJson.compile(
      """{"terms_set": {"text": {"terms": ["hash", "join", "zzz"],
        "minimum_should_match": 2}}}"""))
      .select("id").as[Long].collect().toSet
    assert(ts == Set(1L, 2L))
  }

  test("json span_or / match_bool_prefix / combined_fields / simple_query_string") {
    val docs = Seq(
      (1L, "fast hash join wins", "srcA"),
      (2L, "vector search db", "srcB"),
      (3L, "hash only batch", "srcA")).toDF("id", "text", "source")
    def ids(json: String) = docs.where(graft.dsl.QueryDslJson.compile(json))
      .select("id").as[Long].collect().toSet
    // span_or: single-term span OR adjacent span_near
    assert(ids("""{"span_or": {"clauses": [{"span_term": {"text": "vector"}},
      {"span_near": {"clauses": [{"span_term": {"text": "hash"}},
        {"span_term": {"text": "join"}}], "slop": 0, "in_order": false}}]}}""") == Set(1L, 2L))
    assert(ids("""{"match_bool_prefix": {"text": "hash bat"}}""") == Set(3L))
    assert(ids("""{"combined_fields": {"query": "hash srca",
      "fields": ["text", "source"]}}""") == Set(1L, 3L))
    assert(ids("""{"simple_query_string": {"query": "hash + -join | vector",
      "fields": ["text"]}}""") == Set(2L, 3L))
  }

  test("json script / pinned / sparse_vector clauses compile") {
    val docs = Seq(
      (1L, "fast hash join wins", 10L),
      (2L, "vector search db", 25L),
      (3L, "hash only batch", 40L)).toDF("_id", "text", "n")
    def ids(json: String) = docs.where(graft.dsl.QueryDslJson.compile(json))
      .select("_id").as[Long].collect().toSet
    // boolean Painless filter with params
    assert(ids("""{"script": {"script": {
      "source": "doc['n'].value * 2 > params.t", "params": {"t": 49}}}}""") == Set(2L, 3L))
    // pinned in filter context = organic OR promoted ids
    assert(ids("""{"pinned": {"ids": [3],
      "organic": {"term": {"text": "vector search db"}}}}""") == Set(2L, 3L))
    // sparse_vector filter = any query token present
    assert(ids("""{"sparse_vector": {"field": "text",
      "query_vector": {"vector": 1.5, "batch": 0.2}}}""") == Set(2L, 3L))
    // and the scoring path: tf-weighted dot product, desc
    val top = graft.search.Search.sparseVectorTopK(
      docs.toDF("id0", "text", "n"), "id0", "text",
      Seq("hash" -> 1.0, "vector" -> 0.4), 10)
      .as[(Long, Double)].collect().toSeq
    assert(top == Seq((1L, 1.0), (3L, 1.0), (2L, 0.4)))
  }

  test("span_multi prefix clause inside span_near") {
    val docs = Seq(
      (1L, "fast hash join wins"),       // hash..join adjacent
      (2L, "join of a b c d hashing x"), // gap 5 > slop 3
      (3L, "join with hazy logic"),      // prefix 'ha' via hazy, gap 1
      (4L, "join only")).toDF("_id", "text")
    def ids(json: String) = docs.where(graft.dsl.QueryDslJson.compile(json))
      .select("_id").as[Long].collect().toSet
    assert(ids("""{"span_near": {"clauses": [
      {"span_term": {"text": "join"}},
      {"span_multi": {"match": {"prefix": {"text": "ha"}}}}], "slop": 3}}""") == Set(1L, 3L))
    // trailing-* wildcard normalizes to the same prefix
    assert(ids("""{"span_near": {"clauses": [
      {"span_term": {"text": "join"}},
      {"span_multi": {"match": {"wildcard": {"text": "ha*"}}}}], "slop": 3}}""") == Set(1L, 3L))
    intercept[IllegalArgumentException](ids("""{"span_near": {"clauses": [
      {"span_term": {"text": "join"}},
      {"span_multi": {"match": {"wildcard": {"text": "h?sh"}}}}], "slop": 3}}"""))
  }

  test("search template: mustache params, toJson, inverted default") {
    import graft.dsl.SearchTemplate
    val df = Seq((1L, "en", 300L), (2L, "en", 100L), (3L, "de", 400L))
      .toDF("id", "lang", "n")
    // scalar + default: min param present
    val hit = df.where(SearchTemplate.compile(
      """{"source": "{\"bool\": {\"must\": [{\"term\": {\"lang\": \"{{lang}}\"}}, {\"range\": {\"n\": {\"gte\": {{min}}{{^min}}50{{/min}}}}}]}}",
         "params": {"lang": "en", "min": 200}}"""))
      .select("id").as[Long].collect().toSet
    assert(hit == Set(1L))
    // absent param -> inverted-section default (50)
    val dflt = df.where(SearchTemplate.compile(
      """{"source": "{\"bool\": {\"must\": [{\"term\": {\"lang\": \"{{lang}}\"}}, {\"range\": {\"n\": {\"gte\": {{min}}{{^min}}50{{/min}}}}}]}}",
         "params": {"lang": "en"}}"""))
      .select("id").as[Long].collect().toSet
    assert(dflt == Set(1L, 2L))
    // toJson injects an array for a terms query
    val tj = df.where(SearchTemplate.compile(
      """{"source": "{\"terms\": {\"lang\": {{#toJson}}langs{{/toJson}}}}",
         "params": {"langs": ["en", "fr"]}}"""))
      .select("id").as[Long].collect().toSet
    assert(tj == Set(1L, 2L))
  }

  test("geo_shape envelope relations") {
    import graft.rel.Relational
    val df = Seq(
      (1L, 0.0, 1.0, 0.0, 1.0),    // inside query env
      (2L, -5.0, 5.0, -5.0, 5.0),  // contains query env
      (3L, 1.5, 3.0, 0.0, 1.0),    // overlaps top edge
      (4L, 10.0, 11.0, 10.0, 11.0) // disjoint
    ).toDF("id", "mnla", "mxla", "mnlo", "mxlo")
    def ids(rel: String) = df.where(Relational.envelopeRelation(
      col("mnla"), col("mxla"), col("mnlo"), col("mxlo"),
      -2.0, 2.0, -2.0, 2.0, rel)).select("id").as[Long].collect().toSet
    assert(ids("intersects") == Set(1L, 2L, 3L))
    assert(ids("disjoint") == Set(4L))
    assert(ids("within") == Set(1L))
    assert(ids("contains") == Set(2L))
  }

  test("knn query clause composes under bool; pure-Column compile rejects it loudly") {
    import graft.dsl.QueryDslJson
    val emb = Tables.load(spark, sfDir, "embeddings")
    val vec = (0 until 64).map(i => (i * 41 % 100) / 100.0 - 0.5)
    val knn = s"""{"knn": {"field": "embedding",
      "query_vector": [${vec.mkString(",")}], "k": 10, "num_candidates": 100000}}"""
    // standalone: exactly the kernel's top-10 id set
    val expect = graft.sim.Ann.knnSearch(emb, "vec_id", knn, "vec_id")
      .select($"id".as[Long]).collect().toSet
    val got = emb.where(QueryDslJson.compile(knn, "vec_id", emb))
      .select($"vec_id".as[Long]).collect().toSet
    assert(got == expect && got.size == 10)
    // under bool: the sibling filter INTERSECTS the knn id set
    val filtered = emb.where(QueryDslJson.compile(
      s"""{"bool": {"must": [$knn], "filter": [{"term": {"label": 1}}]}}""",
      "vec_id", emb)).select($"vec_id".as[Long], $"label".as[Int]).collect()
    assert(filtered.forall(r => expect(r._1) && r._2 == 1))
    // the frame-less overload cannot rewrite knn — loud, never wrong
    val e = intercept[IllegalArgumentException] {
      QueryDslJson.compile(knn, "vec_id")
    }
    assert(e.getMessage.contains("corpus"))
  }

  test("query rules: criteria gate which rules fire; unsupported criterion loud") {
    import graft.dsl.{QueryRules, RuleStore}
    val rs = """{"rules": [
      {"rule_id": "a", "type": "pinned",
       "criteria": [{"type": "exact", "metadata": "q", "values": ["red shoes"]}],
       "actions": {"ids": [1, 2]}},
      {"rule_id": "b", "type": "pinned",
       "criteria": [{"type": "prefix", "metadata": "q", "values": ["red"]},
                     {"type": "suffix", "metadata": "q", "values": ["boots"]}],
       "actions": {"ids": [3]}},
      {"rule_id": "c", "type": "exclude",
       "criteria": [{"type": "contains", "metadata": "q", "values": ["shoes"]}],
       "actions": {"ids": [9]}},
      {"rule_id": "d", "type": "pinned",
       "criteria": [{"type": "always"}],
       "actions": {"ids": [4]}}]}"""
    // "red shoes": a fires, b does NOT (suffix criterion fails — ALL
    // criteria must match), c fires, d always fires
    assert(QueryRules.firedActions(Seq(rs), Map("q" -> "red shoes")) ==
      (Seq(1L, 2L, 4L), Seq(9L)))
    // "red boots": b and d fire only
    assert(QueryRules.firedActions(Seq(rs), Map("q" -> "red boots")) ==
      (Seq(3L, 4L), Seq.empty[Long]))
    // no metadata at all: only the always rule
    assert(QueryRules.firedActions(Seq(rs), Map.empty) ==
      (Seq(4L), Seq.empty[Long]))
    val bad = intercept[IllegalArgumentException] {
      QueryRules.firedActions(Seq("""{"rules": [{"rule_id": "z", "type": "pinned",
        "criteria": [{"type": "fuzzy", "metadata": "q", "values": ["x"]}],
        "actions": {"ids": [1]}}]}"""), Map("q" -> "x"))
    }
    assert(bad.getMessage.contains("criterion type"))
    val missing = intercept[IllegalArgumentException] {
      RuleStore.resolve("never-registered")
    }
    assert(missing.getMessage.contains("never-registered"))
  }

  test("rule/pinned retriever tree nodes: criteria gate, promotion survives fusion") {
    import graft.dsl.{Retrievers, RuleStore}
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.load(spark, sfDir, "embeddings")
    RuleStore.put("tree-rules", """{"rules": [
      {"rule_id": "p", "type": "pinned",
       "criteria": [{"type": "exact", "metadata": "q", "values": ["fast hash join"]}],
       "actions": {"ids": [42]}},
      {"rule_id": "n", "type": "pinned",
       "criteria": [{"type": "exact", "metadata": "q", "values": ["other"]}],
       "actions": {"ids": [3]}}]}""")
    def run(criteria: String) = Retrievers.topK(docs, "doc_id", emb, "vec_id",
      s"""{"retriever": {"rule": {
           "retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
           "ruleset_ids": ["tree-rules"],
           "match_criteria": {"q": "$criteria"}}}}""", k = 5)
      .select($"id".as[Long]).collect().toSeq
    // matching criteria: 42 promoted to rank 1; the non-matching
    // rule's id 3 gets NO promotion
    val fired = run("fast hash join")
    assert(fired.head == 42L, s"pinned id must rank first: $fired")
    val unfired = run("nothing matches")
    assert(unfired.headOption != Some(42L) || !fired.tail.contains(3L))
    // promotion survives FUSION: the rule leg under rrf keeps the
    // pinned doc at the top of that leg's contribution
    val fused = Retrievers.topK(docs, "doc_id", emb, "vec_id",
      """{"retriever": {"rrf": {"rank_window_size": 20, "retrievers": [
           {"rule": {"retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
                     "ruleset_ids": ["tree-rules"], "match_criteria": {"q": "fast hash join"}}},
           {"standard": {"query": {"match": {"text": "vector merge"}}}}]}}}""", k = 10)
      .select($"id".as[Long]).collect().toSeq
    assert(fused.contains(42L))
    // pinned retriever: fixed promotion, no criteria
    val pinned = Retrievers.topK(docs, "doc_id", emb, "vec_id",
      """{"retriever": {"pinned": {
           "retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
           "ids": [99, 42]}}}""", k = 5)
      .select($"id".as[Long]).collect().toSeq
    assert(pinned.take(2) == Seq(99L, 42L),
      s"pinned order is rule order, unmatched docs included: $pinned")
  }

  test("semantic routes through the inference seam; weighted_tokens pruning is loud") {
    import graft.dsl.QueryDslJson
    import graft.inference.{Inference, InferenceService, DeterministicStub}
    val docs = Tables.documents(spark, sfDir)
    val stubHits = docs.where(QueryDslJson.compile(
      """{"semantic": {"field": "text", "query": "vector hash"}}"""))
      .count()
    // a swapped service changes the expansion — proof the clause
    // reads the seam, not a hardcoded analyzer call
    val swapped: InferenceService = new InferenceService {
      def expandQuery(q: String) = Seq("zzz-not-a-token" -> 1.0)
      def rerankScore(q: String, t: org.apache.spark.sql.Column) =
        DeterministicStub.rerankScore(q, t)
      def complete(p: org.apache.spark.sql.Column) = DeterministicStub.complete(p)
      def decoder() = DeterministicStub.decoder()
      def embed(text: String) = DeterministicStub.embed(text)
    }
    Inference.service = swapped
    try {
      val none = docs.where(QueryDslJson.compile(
        """{"semantic": {"field": "text", "query": "vector hash"}}""")).count()
      assert(none == 0 && stubHits > 0)
    } finally Inference.service = DeterministicStub
    val loud = intercept[IllegalArgumentException] {
      QueryDslJson.compile("""{"weighted_tokens": {"text": {
        "tokens": {"a": 1.0},
        "pruning_config": {"tokens_freq_ratio_threshold": 5}}}}""")
    }
    assert(loud.getMessage.contains("pruning_config"))
  }
}
