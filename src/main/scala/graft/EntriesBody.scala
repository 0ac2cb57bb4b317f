package graft

import org.apache.spark.sql.functions._
import EntryShared._

/** §2.B rider: the widened `_search`-body JSON front door (r10) — each
  * key feeds ONE JSON request through SearchBody.search and composes
  * operators that were previously reachable only through the Scala
  * API: top-level `knn` (ES 8.4 hybrid score sum), `collapse`,
  * `rescore`, `post_filter`, `min_score`, `search_after`,
  * `highlight`, `_source`, `script_fields`/`docvalue_fields`.
  * Oracles mirror the composed pipeline step by step in DuckDB SQL.
  */
private[graft] object EntriesBody {

  // deterministic 64-dim query vector (same recipe as q_knn)
  private val KnnVec = (0 until 64).map(i => (i * 37 % 100) / 100.0 - 0.5)
  private val KnnVecSql =
    "list_transform(range(0, 64), i -> (i * 37 % 100) / 100.0 - 0.5)"

  // the shared monthly bucket frame every pipeline-agg oracle reduces:
  // the DuckDB mirror of {"date_histogram": month, "aggs": {"sales": sum}}
  private val MonthlyCte =
    "WITH b AS (SELECT date_trunc('month', o_orderdate) AS m, " +
      "count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sales " +
      "FROM orders GROUP BY 1) "

  // documents ⋈ embeddings on doc_id = vec_id: the text+vector corpus
  // the hybrid (query + knn) request searches — one row per document,
  // BM25 over `text`, cosine over `embedding`
  private def hybridCorpus(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents").join(
      t(s, d, "embeddings").select(col("vec_id"), col("embedding")),
      col("doc_id") === col("vec_id")).drop("vec_id")

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    // ES 8.4 hybrid: BM25 match leg + knn leg, scores summed for docs
    // retrieved by both, single-leg docs keep that leg's score; knn
    // boost weights the vector leg
    "q_search_body_knn" -> ((s, d) => graft.dsl.SearchBody.search(
      hybridCorpus(s, d),
      s"""{"query": {"match": {"text": "vector hash"}},
          "knn": {"field": "embedding", "query_vector": [${KnnVec.mkString(",")}],
                  "k": 20, "num_candidates": 100000, "boost": 0.5},
          "size": 15}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // knn-only body WITH the pre-filter (restricts the searched
    // corpus, like ES) — the filter path through the front door
    "q_search_body_knn_filter" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "embeddings"),
      s"""{"knn": {"field": "embedding", "query_vector": [${KnnVec.mkString(",")}],
            "k": 5, "num_candidates": 100000, "filter": {"term": {"label": 3}}}}""",
      idField = "vec_id")
      .select(col("vec_id"), col("_score"))),
    // field collapsing through the body: one hit per source, best by
    // the request's sort
    "q_search_body_collapse" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "en"}},
          "collapse": {"field": "source"},
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "size": 10}""",
      idField = "doc_id")),
    // two-phase ranking through the body: BM25 first pass, top-50
    // window re-scored by a Painless script_score
    "q_search_body_rescore" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "fast hash join"}},
          "rescore": {"window_size": 50, "query": {
            "rescore_query": {"script_score": {"script": {
              "source": "Math.log(1.0 + doc['n_chars'].value)"}}},
            "query_weight": 1.0, "rescore_query_weight": 0.5}},
          "size": 10}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // absolute relevance floor through the body (scored match query)
    "q_search_body_min_score" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "vector hash"}}, "min_score": 0.85}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // post_filter: applied to hits AFTER scoring — the BM25 scores are
    // computed over the full match set, the lang filter only prunes
    // which hits return
    "q_search_body_post_filter" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "fast hash"}},
          "post_filter": {"term": {"lang": "en"}}, "min_score": 0.5}""",
      idField = "doc_id")
      .select(col("doc_id"), col("lang"), col("_score"))),
    // search_after cursor through the body: strictly-after predicate
    // over the (n_chars desc, doc_id asc) sort — one pushed-down scan
    "q_search_body_search_after" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "de"}},
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "search_after": [400, 120], "size": 10}""",
      idField = "doc_id")
      .select(col("doc_id"), col("n_chars"))),
    // highlight through the body: snippet column next to the hit
    "q_search_body_highlight" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "vector"}},
          "highlight": {"fields": {"text": {}}},
          "sort": [{"doc_id": {"order": "asc"}}], "size": 20}""",
      idField = "doc_id")
      .select(col("doc_id"), col("snippet"))),
    // highlight custom tags: request-level pre/post_tags with a
    // per-field override (ES's precedence rule)
    "q_search_body_highlight_tags" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "vector"}},
          "highlight": {"pre_tags": ["<b>"], "post_tags": ["</b>"],
                        "fields": {"text": {"pre_tags": ["<mark>"],
                                            "post_tags": ["</mark>"]}}},
          "sort": [{"doc_id": {"order": "asc"}}], "size": 20}""",
      idField = "doc_id")
      .select(col("doc_id"), col("snippet"))),
    // _source response shaping: wildcard includes + excludes compile
    // to a pure projection Catalyst prunes out of the scan
    "q_search_body_source" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "en"}},
          "_source": {"includes": ["doc_id", "n_*", "lang"], "excludes": ["lang"]}}""",
      idField = "doc_id")),
    // script_fields (per-hit Painless projections, evaluated AFTER the
    // query like ES) + docvalue_fields + _source in one request
    "q_search_body_fields" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "fr"}},
          "script_fields": {"kchars": {"script": {"source": "doc['n_chars'].value / 100.0"}}},
          "docvalue_fields": [{"field": "source"}],
          "_source": ["doc_id"]}""",
      idField = "doc_id")),
    // composite as a JSON tree node: terms sources + after-key paging
    // (pushed below the partial agg) + a metric sub-agg per bucket
    "q_aggs_json_composite" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"page": {"composite": {
           "size": 10,
           "sources": [{"lang": {"terms": {"field": "lang"}}},
                       {"source": {"terms": {"field": "source"}}}],
           "after": {"lang": "de", "source": "src3"}},
           "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}""")),
    // significant_terms as a JSON tree node through the FULL search
    // body: the query is the foreground, the index the background
    "q_aggs_json_sig_terms" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "en"}},
          "aggs": {"sig": {"significant_terms": {
            "field": "text", "min_doc_count": 5, "size": 10}}}}""",
      idField = "doc_id")),
    // scored bool through the body: must-match BM25 summed per
    // clause, filter clauses gate without scoring (the connector
    // readMetadata formula, now reachable via the search body)
    "q_search_body_bool" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"bool": {
            "must": [{"match": {"text": "vector hash"}}],
            "filter": [{"term": {"lang": "en"}}]}},
          "min_score": 0.0}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // scored match_phrase through the body: phrase-gated BM25 (the
    // phrase is a positional gate; df stays index-wide)
    "q_search_body_phrase" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match_phrase": {"text": "table scan"}}, "min_score": 0.0}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // scored multi_match through the body: per-field BM25 via the
    // one-pass kernel, ^boost weights, most_fields sum, min_score
    // floor — all composed in one plan
    "q_search_body_multi_match" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"multi_match": {"query": "merge src5",
           "fields": ["text", "source^2"], "type": "most_fields"}},
          "min_score": 0.3}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // the ES 8.14+ retriever tree through the BODY front door: a
    // linear (min-max normalized, weighted) fusion of a standard
    // BM25 leaf and a knn cosine leaf, both over the hybrid corpus
    "q_search_body_retriever" -> ((s, d) => graft.dsl.SearchBody.search(
      hybridCorpus(s, d),
      s"""{"retriever": {"linear": {"retrievers": [
            {"retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
             "weight": 0.7},
            {"retriever": {"knn": {"field": "embedding",
              "query_vector": [${KnnVec.mkString(",")}]}}, "weight": 0.3}],
            "rank_window_size": 50}},
          "size": 10}""",
      idField = "doc_id")),
    // the ES 8 `fields` retrieval section (the modern `_source`
    // replacement): wildcard expansion + per-entry date format, hits
    // shaped as id + retrieved fields only (`_source: false`)
    "q_search_body_fields_api" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "orders"),
      """{"query": {"term": {"o_orderstatus": "F"}},
          "sort": [{"o_orderkey": {"order": "asc"}}],
          "size": 15, "_source": false,
          "fields": ["o_order*", {"field": "o_orderdate", "format": "yyyy-MM"}]}""",
      idField = "o_orderkey")),
    // multivalue sort `mode` through the body: each order's lineitem
    // quantities fold to ONE median sort key (ES MultiValueMode) —
    // the same computed key the search_after cursor would compare
    "q_search_body_sort_mode" -> ((s, d) => {
      val qty = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_quantity")).as("qtys"))
      graft.dsl.SearchBody.search(
        t(s, d, "orders").join(qty, col("o_orderkey") === col("l_orderkey")),
        """{"sort": [{"qtys": {"order": "desc", "mode": "median"}},
                     {"o_orderkey": {"order": "asc"}}],
            "size": 100, "_source": ["o_orderkey"]}""",
        idField = "o_orderkey")
    }),
    // _geo_distance sort through the body, COMPOSED with search_after:
    // the cursor predicate compares the same computed haversine key
    // the ordering uses (dist > 3000 km, ties broken by c_custkey)
    "q_search_body_sort_geo" -> ((s, d) => graft.dsl.SearchBody.search(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"sort": [{"_geo_distance": {"loc": {"lat": 0.0, "lon": 0.0},
                     "order": "asc", "unit": "km"}},
                   {"c_custkey": {"order": "asc"}}],
          "search_after": [3000.0, 0],
          "size": 50, "_source": ["c_custkey"]}""",
      idField = "c_custkey")),
    // multi-FIELD highlight with terms from a scored BOOL query: each
    // highlight field takes the terms of the clauses targeting it
    // (text <- the must match, source <- the should match), one
    // snippet column per field (ES response shape)
    "q_search_body_highlight_multi" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"bool": {
            "must": [{"match": {"text": "fast hash join"}}],
            "should": [{"match": {"source": "src1"}}]}},
          "sort": ["_score", {"doc_id": {"order": "asc"}}],
          "size": 10,
          "highlight": {"fields": {"text": {"number_of_fragments": 3}, "source": {}}},
          "_source": ["doc_id"]}""",
      idField = "doc_id")),
    // nested sort through the body: mode fold over inner docs
    // restricted by the nested filter (orders by min returned-item
    // quantity; no matching inner doc -> missing, sorted last)
    "q_search_body_sort_nested" -> ((s, d) => {
      val items = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_quantity"), col("l_returnflag"))).as("items"))
      graft.dsl.SearchBody.search(
        t(s, d, "orders").join(items, col("o_orderkey") === col("l_orderkey")),
        """{"sort": [{"items.l_quantity": {"order": "asc", "mode": "min",
              "nested": {"path": "items",
                         "filter": {"term": {"l_returnflag": "R"}}}}},
                     {"o_orderkey": {"order": "asc"}}],
            "size": 100, "_source": ["o_orderkey"]}""",
        idField = "o_orderkey")
    }),
    // missing-value placement through the body: _first inverts ES's
    // missing-last default
    "q_search_body_sort_missing" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "orders").withColumn("pri",
        when(col("o_orderpriority") === "1-URGENT", lit(null).cast("string"))
          .otherwise(col("o_orderpriority"))),
      """{"sort": [{"pri": {"order": "asc", "missing": "_first"}},
                   {"o_orderkey": {"order": "asc"}}],
          "size": 100, "_source": ["o_orderkey", "pri"]}""",
      idField = "o_orderkey")),
    // the ES 8.18 rescorer retriever: a rescore block over the child's
    // top window — same two-phase math as the body rescore section
    "q_retriever_rescorer" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"retriever": {"rescorer": {
            "retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
            "rank_window_size": 50,
            "rescore": {"query": {
              "rescore_query": {"script_score": {"script":
                {"source": "Math.log(1 + doc['n_chars'].value) * 0.5"}}},
              "query_weight": 1.0, "rescore_query_weight": 1.0}}}},
          "size": 10}""",
      idField = "doc_id")),
    // the ES 8.18 text_similarity_reranker retriever: the child
    // standard retriever's top-20 re-scored by the inference seam's
    // rerank (deterministic term-overlap stub — swap Inference.service
    // for a real endpoint)
    "q_retriever_rerank" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"retriever": {"text_similarity_reranker": {
            "retriever": {"standard": {"query": {"match": {"text": "fast hash join"}}}},
            "field": "text", "inference_text": "fast hash merge",
            "rank_window_size": 20}},
          "size": 10}""",
      idField = "doc_id")),
    // indices_boost through the body: per-index score multiplier over
    // the connector's __graft_src_index tag (synthesized here from
    // lang partitions, like the Scala key's boosted-index stand-in);
    // first matching name-or-pattern wins, unmatched keep 1.0
    "q_search_body_indices_boost" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents").withColumn("__graft_src_index",
        concat(lit("/data/idx_"), col("lang"))),
      """{"query": {"match": {"text": "fast hash join"}},
          "indices_boost": [{"idx_en": 2.0}, {"idx_*": 1.0}],
          "sort": ["_score", {"doc_id": {"order": "asc"}}], "size": 15,
          "_source": ["doc_id"]}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // the body `suggest` section: a term suggester through the JSON
    // front door (suggest_mode always — every in-band correction by
    // descending document frequency)
    "q_search_body_suggest" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"suggest": {"fix": {"text": "spak",
           "term": {"field": "text", "suggest_mode": "always",
                    "max_edits": 2, "size": 5}}}}""",
      idField = "doc_id")),
    // multi_terms as a JSON node: compound-key terms, one exchange,
    // a metric per bucket
    "q_aggs_json_multi_terms" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"combo": {"multi_terms": {
           "terms": [{"field": "lang"}, {"field": "source"}], "size": 10},
           "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}""")),
    // date_range as a JSON node: date-string bounds (from inclusive,
    // to exclusive), "from-to" bucket keys, metric per bucket
    "q_aggs_json_date_range" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"era": {"date_range": {"field": "o_orderdate", "ranges": [
           {"to": "1997-01-01"},
           {"from": "1997-01-01", "to": "1999-01-01"},
           {"from": "1999-01-01"}]},
           "aggs": {"revenue": {"sum": {"field": "o_totalprice"}}}}}}""")),
    // rare_terms as a JSON node: the long-tail buckets (doc_count <=
    // max_doc_count), rarest first
    "q_aggs_json_rare_terms" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"rare_src": {"rare_terms": {"field": "source",
           "max_doc_count": 30}}}}""")),
    // percentile_ranks as a grouped JSON metric: percent of each
    // bucket's values at or below the requested values
    "q_aggs_json_pctl_ranks" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"by_flag": {"terms": {"field": "l_returnflag", "size": 10}, "aggs": {
           "pr": {"percentile_ranks": {"field": "l_extendedprice",
                  "values": [1000, 10000, 50000]}}}}}}""")),
    // adjacency_matrix as a JSON node: named Query-DSL filters,
    // singles + pairwise intersections in one scan (same kernel and
    // params as q_agg_adjacency, so the oracle is shared)
    "q_aggs_json_adjacency" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"adjacency_matrix": {"filters": {
           "urgent": {"term": {"o_orderpriority": "1-URGENT"}},
           "big": {"range": {"o_totalprice": {"gt": 20000}}},
           "open": {"term": {"o_orderstatus": "O"}}}}}}}""")),
    // geo_distance rings as a JSON node: contiguous ES ranges chain
    // to the kernel's ring edges (same params as q_agg_geo_distance)
    "q_aggs_json_geo_distance" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"aggs": {"rings": {"geo_distance": {"field": "loc",
           "origin": {"lat": 10.0, "lon": 20.0},
           "ranges": [{"to": 2000.0}, {"from": 2000.0, "to": 5000.0},
                      {"from": 5000.0, "to": 10000.0}, {"from": 10000.0}]}}}}""")),
    // collapse + inner_hits through the body: the collapsed hit
    // carries its group's top-3 ids (search-sort order) as an array
    "q_search_body_collapse_inner" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "en"}},
          "collapse": {"field": "source", "inner_hits": {"size": 3}},
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "size": 10}""",
      idField = "doc_id")
      // the API carries inner_hits as an ARRAY; the gate stringifies
      // it (the driver's row hash needs scalar cells)
      .select(col("doc_id"), col("source"), col("n_chars"),
        concat_ws(",", col("inner_hits")).as("inner_hits"))),
    // auto_date_histogram as a JSON node: delegates to the Scala
    // kernel (shared interval election — same params as
    // q_agg_auto_date_histogram, so the oracle is shared too)
    "q_aggs_json_auto_date" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"auto": {"auto_date_histogram": {"field": "o_orderdate",
           "buckets": 20}}}}""")),
    // string_stats as a grouped JSON metric (the Scala key is global;
    // the JSON route composes it per terms bucket)
    "q_aggs_json_string_stats" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}, "aggs": {
           "len": {"string_stats": {"field": "text"}}}}}}""")),
    // boxplot as a grouped JSON metric: per-bucket five-number summary
    "q_aggs_json_boxplot" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"by_flag": {"terms": {"field": "l_returnflag", "size": 10}, "aggs": {
           "bp": {"boxplot": {"field": "l_extendedprice"}}}}}}""")),
    // top_metrics as a grouped JSON metric: the metric value AT the
    // best sort key per bucket (one max_by partial agg, no window)
    "q_aggs_json_top_metrics" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}, "aggs": {
           "latest": {"top_metrics": {"metrics": {"field": "n_chars"},
                      "sort": {"field": "doc_id", "order": "desc"}}}}}}}""")),
    // random_sampler as a JSON wrapper: the terms+metric sub-tree
    // evaluates on a deterministic 10% hash sample — one scan;
    // doc_count scales back by 1/probability (ES parity), avg stays
    // unscaled (ES's per-metric special-casing)
    "q_aggs_json_sampler" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"sample": {"random_sampler": {"probability": 0.1, "key_field": "o_orderkey"},
           "aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 10},
             "aggs": {"avg_price": {"avg": {"field": "o_totalprice"}}}}}}}}""")),
    // `missing` JSON node: null-bucket count (null keys synthesized —
    // the testdata has no nulls, same pattern as composite_missing)
    "q_aggs_json_missing" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents").withColumn("maybe_lang",
        when(col("lang") === "en", lit(null).cast("string")).otherwise(col("lang"))),
      """{"aggs": {"no_lang": {"missing": {"field": "maybe_lang"}}}}""")),
    // geotile_grid as a JSON bucket node (+ a metric): the geo_point
    // field maps to the <field>_lat/<field>_lon column pair; grid key
    // math is the same Aggs.geotileKey as the Scala operator
    "q_aggs_json_geotile" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"aggs": {"cells": {"geotile_grid": {"field": "loc", "precision": 6},
           "aggs": {"acct": {"avg": {"field": "c_acctbal"}}}}}}""")),
    // calendar_interval date_histogram (variable-width month buckets
    // fixed_interval cannot express) + a metric, per bucket
    "q_aggs_json_calendar" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"by_month": {"date_histogram": {"field": "o_orderdate",
           "calendar_interval": "month"},
           "aggs": {"revenue": {"sum": {"field": "o_totalprice"}}}}}}""")),
    // terms include/exclude bucket-key regex filters (full-match, ES
    // semantics) — pushed below the partial agg as row predicates
    "q_aggs_json_terms_filter" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"src": {"terms": {"field": "source", "size": 20,
           "include": "src[0-9]", "exclude": "src[47]"},
           "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}""")),
    // SemDeDup (Abbas et al. 2023): cluster-then-compare semantic
    // dedup — assignment blocks the cosine screen to within-cluster
    // pairs (sum of C(n_c, 2), never C(N, 2))
    "q_dedup_semantic" -> ((s, d) => graft.dedup.Dedup.semanticDedupPairs(
      t(s, d, "embeddings"), "vec_id", "embedding",
      nCentroids = 16, minCosine = 0.35)),
    // ES|QL 9.1 SAMPLE: deterministic content-hash Bernoulli row
    // sample (not rand() — same rows survive any partitioning/retry),
    // composed mid-pipeline; the r9 verdict's named ES|QL-9.x gap
    "q_esql_sample" -> ((s, d) => graft.dsl.Esql.run(s, d,
      """from orders | keep o_orderkey, o_orderstatus | sample 0.25
        | stats n = count(*) by o_orderstatus | sort o_orderstatus""")),
    // multi-column JSON metrics in a grouped tree: stats +
    // exact-interpolated percentiles + weighted_avg per terms bucket
    "q_aggs_json_metrics" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"by_flag": {"terms": {"field": "l_returnflag", "size": 10}, "aggs": {
           "price": {"stats": {"field": "l_extendedprice"}},
           "qty": {"percentiles": {"field": "l_quantity", "percents": [25, 50, 95]}},
           "wavg": {"weighted_avg": {"value": {"field": "l_extendedprice"},
                                     "weight": {"field": "l_quantity"}}}}}}}""")),
    // filters as a JSON node: each named bucket is a FULL Query-DSL
    // object (bool/range/term compose), counts in one scan +
    // other_bucket for the unmatched remainder
    "q_aggs_json_filters" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"f": {"filters": {"filters": {
           "long_en": {"bool": {"filter": [{"term": {"lang": "en"}},
                                           {"range": {"n_chars": {"gte": 400}}}]}},
           "short": {"range": {"n_chars": {"lt": 150}}}},
           "other_bucket": true}}}}""")),
    // terms > top_hits as a JSON tree: per-bucket best documents by a
    // total sort, _source-selected columns
    "q_aggs_json_top_hits" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"pri": {"terms": {"field": "o_orderpriority"}, "aggs": {
           "top": {"top_hits": {"size": 3,
             "sort": [{"o_totalprice": {"order": "desc"}}, {"o_orderkey": {"order": "asc"}}],
             "_source": ["o_orderkey", "o_totalprice"]}}}}}}""")),
    // explain: true — per-hit _explanation (the BM25 term breakdown
    // string) riding through _source pruning as hit metadata
    "q_search_body_explain" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "vector hash"}},
          "explain": true,
          "sort": ["_score", {"doc_id": {"order": "asc"}}],
          "size": 10, "_source": ["doc_id"]}""",
      idField = "doc_id")),
    // terminate_after: the collected hit set caps at n (deterministic
    // id-order prefix) BEFORE sort/size see it — top-50 by length
    // among the first 100 matching docs, not the corpus top-50
    "q_search_body_terminate" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "en"}},
          "terminate_after": 100,
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
          "size": 50, "_source": ["doc_id", "n_chars"]}""",
      idField = "doc_id")),
    // ES 8.8 `rank` body section: reciprocal-rank fusion REPLACES the
    // hybrid score-sum — query leg + knn leg each contribute their top
    // rank_window_size ranks, fused 1/(rank_constant + rank)
    "q_search_body_rank" -> ((s, d) => graft.dsl.SearchBody.search(
      hybridCorpus(s, d),
      s"""{"query": {"match": {"text": "vector hash"}},
          "knn": {"field": "embedding", "query_vector": [${KnnVec.mkString(",")}],
                  "k": 50, "num_candidates": 100000},
          "rank": {"rrf": {"rank_window_size": 50, "rank_constant": 60}},
          "size": 10}""",
      idField = "doc_id")
      .select(col("doc_id"), col("_score"))),
    // composite with a geotile_grid SOURCE through the JSON door —
    // the map-dashboard page shape (shared kernel + oracle with the
    // Scala key)
    "q_aggs_json_composite_tile" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"aggs": {"p": {"composite": {"size": 12,
           "sources": [{"tile": {"geotile_grid": {"field": "loc", "precision": 4}}},
                       {"seg": {"terms": {"field": "c_mktsegment"}}}],
           "after": {"tile": "4/11/7", "seg": "BUILDING"}}}}}""")),
    // sliced scroll through the body: slice 1 of 4 as a plain
    // pushable predicate (same md5-48 draw as the Scala operator, so
    // the oracle is shared verbatim)
    "q_search_body_slice" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"slice": {"id": 1, "max": 4},
          "sort": [{"doc_id": "asc"}], "_source": ["doc_id", "lang"]}""",
      idField = "doc_id")),
    // track_scores: field-sorted hits still carry the BM25 _score
    "q_search_body_track_scores" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"match": {"text": "vector hash"}},
          "track_scores": true,
          "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": "asc"}],
          "size": 20, "_source": ["doc_id", "n_chars"]}""",
      idField = "doc_id")),
    // stored_fields keep-list (the legacy retrieval section)
    "q_search_body_stored_fields" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "de"}},
          "stored_fields": ["source"],
          "sort": [{"doc_id": "asc"}], "size": 50}""",
      idField = "doc_id")),
    // aggs + terminate_after through the body: the agg tree reads the
    // id-ordered first-n-matches prefix (the shared collector cap)
    "q_search_body_terminate_aggs" -> ((s, d) => graft.dsl.SearchBody.search(
      t(s, d, "documents"),
      """{"query": {"term": {"lang": "en"}}, "terminate_after": 50, "size": 0,
          "aggs": {"src": {"terms": {"field": "source", "size": 10},
            "aggs": {"chars": {"sum": {"field": "n_chars"}}}}}}""",
      idField = "doc_id")),
    // normalize parent pipe: percent_of_sum + z-score columns over
    // the monthly bucket frame
    "q_aggs_json_normalize" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
                           "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "pct": {"normalize": {"buckets_path": "sales",
                                          "method": "percent_of_sum"}},
                    "z": {"normalize": {"buckets_path": "sales",
                                        "method": "z-score"}}}}}}""")),
    // moving_percentiles parent pipe: sliding median over 3 buckets
    "q_aggs_json_moving_pctl" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
                           "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "mp": {"moving_percentiles": {"buckets_path": "sales",
                                                  "window": 3}}}}}}""")),
    // date_histogram > cumulative_cardinality (first-seen counting on
    // the raw rows — the dedicated tree shape)
    "q_aggs_json_cum_card" -> ((s, d) => graft.dsl.AggsJson.compile(
      Tables.events(s, d),
      """{"aggs": {"h": {"date_histogram": {"field": "ts_ns",
                           "fixed_interval": "1h"},
           "aggs": {"cc": {"cumulative_cardinality": {"field": "user_id"}}}}}}""")),
    // bucket_correlation sibling: monthly doc counts vs the
    // deterministic indicator curve (ES count_correlation shape)
    "q_aggs_json_bucket_corr" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      s"""{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
                            "calendar_interval": "month"}},
           "corr": {"bucket_correlation": {"buckets_path": "m>_count",
             "function": {"count_correlation": {"indicator":
               {"expectations": [${(0 until 80).map(i => (i * 37 % 100) / 100.0).mkString(",")}]}}}}}}}""")),
    // bucket_count_ks_test sibling over the clamped width-10 value
    // histogram vs uniform fractions
    "q_aggs_json_ks_test" -> ((s, d) => graft.dsl.AggsJson.compile(
      Tables.events(s, d).withColumn("vclamp", least(col("value"), lit(99.0))),
      """{"aggs": {"b": {"histogram": {"field": "vclamp", "interval": 10}},
           "ks": {"bucket_count_ks_test": {"buckets_path": "b>_count",
             "alternative": ["less", "greater", "two_sided"],
             "fractions": [0.1,0.1,0.1,0.1,0.1,0.1,0.1,0.1,0.1,0.1]}}}}""")),
    // geohex_grid JSON node (shared axial-lattice kernel)
    "q_aggs_json_geohex" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"aggs": {"hex": {"geohex_grid":
           {"field": "loc", "cell_degrees": 5.0, "k": 15}}}}""")),
    // `nested` wrapper over a REAL array-of-structs column: metrics
    // over the exploded inner docs (ES refs `items.*` resolve as
    // flat columns after the explode)
    "q_aggs_json_nested" -> ((s, d) => {
      val items = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_quantity"), col("l_returnflag"))).as("items"))
      graft.dsl.AggsJson.compile(
        t(s, d, "orders").join(items, col("o_orderkey") === col("l_orderkey")),
        """{"aggs": {"n": {"nested": {"path": "items"},
             "aggs": {"qty_sum": {"sum": {"field": "items.l_quantity"}},
                      "qty_avg": {"avg": {"field": "items.l_quantity"}}}}}}""")
    }),
    // nested > terms > reverse_nested: inner-doc buckets carrying the
    // PARENT doc count (one partial-agged groupBy, both counts)
    "q_aggs_json_reverse_nested" -> ((s, d) => {
      val items = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_quantity"), col("l_returnflag"))).as("items"))
      graft.dsl.AggsJson.compile(
        t(s, d, "orders").join(items, col("o_orderkey") === col("l_orderkey")),
        """{"aggs": {"n": {"nested": {"path": "items",
                             "parent_id_field": "o_orderkey"},
             "aggs": {"key": {"terms": {"field": "items.l_returnflag"},
               "aggs": {"parent_count": {"reverse_nested": {}}}}}}}}""")
    }),
    // significant_text through the JSON door (foreground = the
    // request's query predicate, background = the pre-query frame)
    "q_aggs_json_sig_text" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"st": {"significant_text": {
           "field": "text", "key_field": "doc_id",
           "sample_probability": 0.5, "min_doc_count": 5, "size": 10}}}}""",
      fgPred = Some(col("lang") === "en"),
      background = Some(t(s, d, "documents")))),
    // terms > geo_line (the vessel-track shape), shared kernel
    "q_aggs_json_geo_line" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"aggs": {"k": {"terms": {"field": "c_nationkey"},
           "aggs": {"line": {"geo_line": {"point": {"field": "loc"},
             "sort": {"field": "c_custkey"}, "size": 5}}}}}}""")),
    // ---- aggs-JSON batch 4: metric/bucket parity with the Scala
    // kernels (each node delegates to or reproduces the Scala twin,
    // so the formulas cannot diverge; oracles shared where columns
    // align, adapted where the JSON naming differs) ----
    // geo_bounds + geo_centroid as per-bucket METRICS under terms
    // (the map-widget shape: envelope + mean point per segment)
    "q_aggs_json_geo_bounds" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lat", "loc_lat").withColumnRenamed("lon", "loc_lon"),
      """{"aggs": {"seg": {"terms": {"field": "c_mktsegment", "size": 10},
           "aggs": {"vp": {"geo_bounds": {"field": "loc"}},
                    "cc": {"geo_centroid": {"field": "loc"}}}}}}""")),
    // the planar twins over point x/y (ES 8.6)
    "q_aggs_json_cartesian" -> ((s, d) => graft.dsl.AggsJson.compile(
      withGeo(t(s, d, "customer"))
        .withColumnRenamed("lon", "pt_x").withColumnRenamed("lat", "pt_y"),
      """{"aggs": {"seg": {"terms": {"field": "c_mktsegment", "size": 10},
           "aggs": {"cb": {"cartesian_bounds": {"field": "pt"}},
                    "cn": {"cartesian_centroid": {"field": "pt"}}}}}}""")),
    "q_aggs_json_mad" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"mad": {"median_absolute_deviation":
           {"field": "l_extendedprice"}}}}""")),
    "q_aggs_json_t_test" -> ((s, d) => graft.dsl.AggsJson.compile(
      Tables.events(s, d),
      """{"aggs": {"tt": {"t_test": {
           "a": {"field": "value", "filter": {"term": {"event_type": "click"}}},
           "b": {"field": "value", "filter": {"term": {"event_type": "view"}}},
           "type": "heteroscedastic"}}}}""")),
    "q_aggs_json_matrix_stats" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"mx": {"matrix_stats":
           {"fields": ["l_quantity", "l_extendedprice"]}}}}""")),
    "q_aggs_json_vwh" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"q": {"variable_width_histogram":
           {"field": "l_quantity", "buckets": 4}}}}""")),
    "q_aggs_json_ip_prefix" -> ((s, d) => graft.dsl.AggsJson.compile(
      withIp(Tables.events(s, d)),
      """{"aggs": {"nets": {"ip_prefix":
           {"field": "ip", "prefix_length": 12, "is_ipv6": false}}}}""")),
    // categorize_text over the pre-concatenated message column (the
    // Scala twin's exact input, so the oracle is shared verbatim)
    "q_aggs_json_categorize" -> ((s, d) => graft.dsl.AggsJson.compile(
      Tables.events(s, d)
        .withColumn("msg", concat_ws(" ", col("event_type"), col("props"))),
      """{"aggs": {"cats": {"categorize_text":
           {"field": "msg", "max_matched_tokens": 4}}}}""")),
    "q_aggs_json_frequent_items" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem").join(
        broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey")),
      """{"aggs": {"fi": {"frequent_item_sets": {
           "fields": [{"field": "p_brand"}],
           "transaction_field": "l_orderkey",
           "minimum_support_count": 50, "size": 20}}}}""")),
    // diversified_sampler as a GENERIC sub-tree wrapper (per-lang cap
    // of 40 via the deterministic md5 order on doc_id)
    "q_aggs_json_diversified" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"div": {
           "diversified_sampler": {"field": "lang", "key_field": "doc_id",
                                   "max_docs_per_value": 40},
           "aggs": {"sample_size": {"value_count": {"field": "doc_id"}},
                    "avg_metric": {"avg": {"field": "n_chars"}}}}}}""")),
    // date_histogram > rate: per-day revenue rate from each month's
    // true day count
    "q_aggs_json_rate" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
                           "calendar_interval": "month"},
           "aggs": {"r": {"rate": {"field": "o_totalprice", "unit": "day"}}}}}}""")),
    // scripted_metric under terms: the Painless map script compiles to
    // codegen'd column math summed in the same partial agg
    "q_aggs_json_scripted" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"key": {"terms": {"field": "l_returnflag", "size": 10},
           "aggs": {"value": {"scripted_metric": {
             "map_script": "doc['l_extendedprice'].value * (1 - doc['l_discount'].value)",
             "combine_script": "state.sum", "reduce_script": "states.sum"}}}}}}""")),
    // `global` scope wrapper: sub-aggs over the WHOLE index while the
    // request frame is query-filtered (background passes explicitly)
    "q_aggs_json_global" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.dsl.AggsJson.compile(docs.where(col("lang") === "en"),
        """{"aggs": {"all_docs": {"global": {}, "aggs": {
             "cnt": {"value_count": {"field": "doc_id"}},
             "avg_chars": {"avg": {"field": "n_chars"}}}}}}""",
        fgPred = None, background = Some(docs))
    }),
    // ip_range JSON node: same kernel (and oracle) as the Scala key
    "q_aggs_json_ip_range" -> ((s, d) => graft.dsl.AggsJson.compile(
      withIp(Tables.events(s, d)),
      """{"aggs": {"r": {"ip_range": {"field": "ip", "ranges": [
           {"key": "low", "to": "10.64.0.0"},
           {"key": "mid", "from": "10.64.0.0", "to": "10.192.0.0"},
           {"key": "high", "from": "10.192.0.0"}]}}}}""")),
    // date_histogram `offset` through the JSON walk (billing months
    // starting on the 10th) — same formula as the Scala kernel
    "q_aggs_json_dh_offset" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"bucket": {"date_histogram": {"field": "o_orderdate",
           "calendar_interval": "month", "offset": "10 days"}}}}""")),
    // date_histogram min_doc_count: 0 — gap buckets materialize
    // (delegates to the sequence()-spine kernel)
    "q_aggs_json_dh_empty" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate",
           "calendar_interval": "month", "min_doc_count": 0}}}}""")),
    // terms min_doc_count: the HAVING form (rare languages drop)
    "q_aggs_json_min_doc_count" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "documents"),
      """{"aggs": {"l": {"terms": {"field": "lang", "size": 10, "min_doc_count": 70},
           "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}""")),
    // PARENT pipelines through the JSON door: derivative +
    // cumulative_sum beside the sum metric they reference — window
    // math over the tiny monthly bucket frame, the heavy exchange
    // stays in the partial-aggregated groupBy below it
    "q_aggs_json_derivative" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "deriv": {"derivative": {"buckets_path": "sales"}},
                    "cum": {"cumulative_sum": {"buckets_path": "sales"}}}}}}""")),
    // moving_fn (MovingFunctions whitelist; ES default shift:0 —
    // window ends BEFORE the current bucket; shift:1 recovers the
    // Scala kernels' include-current convention) + serial_diff
    // (lag-12 = year-over-year differencing on monthly buckets)
    "q_aggs_json_moving_fn" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "mavg3": {"moving_fn": {"buckets_path": "sales", "window": 3,
                                            "script": "MovingFunctions.unweightedAvg"}},
                    "yoy": {"serial_diff": {"buckets_path": "sales", "lag": 12}}}}}}""")),
    // bucket_script: per-bucket Painless column math over sibling
    // metric paths (avg order value from sum / _count)
    "q_aggs_json_bucket_script" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "lineitem"),
      """{"aggs": {"flag": {"terms": {"field": "l_returnflag", "size": 10},
           "aggs": {"rev": {"sum": {"field": "l_extendedprice"}},
                    "per_doc": {"bucket_script": {
                      "buckets_path": {"r": "rev", "n": "_count"},
                      "script": "params.r / params.n"}}}}}}""")),
    // bucket_selector: the HAVING of the aggs world — buckets whose
    // doc_count misses the threshold drop after the reduce
    "q_aggs_json_bucket_selector" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "keep": {"bucket_selector": {
                      "buckets_path": {"n": "_count"},
                      "script": "params.n >= 180"}}}}}}""")),
    // bucket_sort: reorder + page the parent's buckets (sort by the
    // referenced metric, from-offset + size truncation, key tie-break)
    "q_aggs_json_bucket_sort" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
           "aggs": {"sales": {"sum": {"field": "o_totalprice"}},
                    "page": {"bucket_sort": {"sort": [{"sales": {"order": "desc"}}],
                                             "from": 2, "size": 5}}}}}}""")),
    // SIBLING pipelines: avg/min/max/sum_bucket beside the monthly
    // parent — the one-row reduce over the bucket frame
    "q_aggs_json_sibling" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
             "aggs": {"sales": {"sum": {"field": "o_totalprice"}}}},
           "avg_monthly": {"avg_bucket": {"buckets_path": "m>sales"}},
           "best_month": {"max_bucket": {"buckets_path": "m>sales"}},
           "worst_month": {"min_bucket": {"buckets_path": "m>sales"}},
           "total": {"sum_bucket": {"buckets_path": "m>sales"}}}}""")),
    // stats_bucket + percentiles_bucket over the monthly doc_count —
    // the _count buckets_path form
    "q_aggs_json_stats_bucket" -> ((s, d) => graft.dsl.AggsJson.compile(
      t(s, d, "orders"),
      """{"aggs": {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
             "aggs": {"sales": {"sum": {"field": "o_totalprice"}}}},
           "st": {"stats_bucket": {"buckets_path": "m>sales"}},
           "pct": {"percentiles_bucket": {"buckets_path": "m>_count",
                                          "percents": [25, 50, 75]}}}}""")))

  val oracleSql: Map[String, String] = Map(
    "q_search_body_knn" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "hash")) +
      ", e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      s"q AS (SELECT $KnnVecSql AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "p AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS cosine " +
      "FROM n CROSS JOIN qn), " +
      "kk AS (SELECT id, cosine FROM (SELECT *, row_number() OVER (ORDER BY cosine DESC, id) AS rnk FROM p) WHERE rnk <= 20), " +
      "u AS (SELECT coalesce(sc.id, kk.id) AS doc_id, " +
      "round(coalesce(sc.score, 0) + coalesce(kk.cosine, 0) * 0.5, 4) AS _score " +
      "FROM sc FULL OUTER JOIN kk ON sc.id = kk.id) " +
      "SELECT doc_id, _score FROM u ORDER BY _score DESC, doc_id LIMIT 15"),
    "q_search_body_knn_filter" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v " +
      "FROM embeddings WHERE label = 3), " +
      s"q AS (SELECT $KnnVecSql AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "p AS (SELECT vec_id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS _score " +
      "FROM n CROSS JOIN qn) " +
      "SELECT vec_id, _score FROM (SELECT *, row_number() OVER (ORDER BY _score DESC, vec_id) AS rnk FROM p) " +
      "WHERE rnk <= 5 ORDER BY _score DESC, vec_id"),
    "q_search_body_collapse" -> ("SELECT doc_id, text, lang, source, n_chars FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rn " +
      "FROM documents WHERE lang = 'en') WHERE rn = 1 " +
      "ORDER BY n_chars DESC, doc_id ASC LIMIT 10"),
    "q_search_body_rescore" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", w AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50) " +
      "SELECT w.id AS doc_id, round(w.score * 1.0 + ln(1.0 + d.n_chars) * 0.5, 4) AS _score " +
      "FROM w JOIN documents d ON d.doc_id = w.id ORDER BY _score DESC, doc_id LIMIT 10"),
    "q_search_body_min_score" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "hash")) +
      " SELECT id AS doc_id, score AS _score FROM sc WHERE score >= 0.85 " +
      "ORDER BY _score DESC, doc_id"),
    "q_search_body_post_filter" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash")) +
      " SELECT d.doc_id, d.lang, sc.score AS _score FROM sc JOIN documents d ON d.doc_id = sc.id " +
      "WHERE sc.score >= 0.5 AND d.lang = 'en' ORDER BY _score DESC, doc_id"),
    "q_search_body_search_after" -> ("SELECT doc_id, n_chars FROM documents " +
      "WHERE lang = 'de' AND (n_chars < 400 OR (n_chars = 400 AND doc_id > 120)) " +
      "ORDER BY n_chars DESC, doc_id ASC LIMIT 10"),
    "q_search_body_highlight" -> ("SELECT doc_id, regexp_replace(regexp_extract(lower(text), " +
      "'([a-z0-9]+ ){0,3}\\bvector\\b( [a-z0-9]+){0,3}'), '\\bvector\\b', '<em>vector</em>', 'g') AS snippet " +
      "FROM documents WHERE list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), " +
      "x -> len(x) > 0), 'vector') ORDER BY doc_id LIMIT 20"),
    "q_search_body_highlight_tags" -> ("SELECT doc_id, regexp_replace(regexp_extract(lower(text), " +
      "'([a-z0-9]+ ){0,3}\\bvector\\b( [a-z0-9]+){0,3}'), '\\bvector\\b', '<mark>vector</mark>', 'g') AS snippet " +
      "FROM documents WHERE list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), " +
      "x -> len(x) > 0), 'vector') ORDER BY doc_id LIMIT 20"),
    "q_search_body_source" -> ("SELECT doc_id, n_chars FROM documents WHERE lang = 'en'"),
    "q_search_body_fields" -> ("SELECT doc_id, n_chars / 100.0 AS kchars, source " +
      "FROM documents WHERE lang = 'fr'"),
    "q_aggs_json_composite" -> ("SELECT lang, source, count(*)::BIGINT AS doc_count, " +
      "round(avg(n_chars), 4) AS avg_chars FROM documents " +
      "WHERE lang > 'de' OR (lang = 'de' AND source > 'src3') " +
      "GROUP BY lang, source ORDER BY lang, source LIMIT 10"),
    "q_aggs_json_sig_terms" -> ("WITH terms AS (SELECT lang = 'en' AS fg, " +
      "unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS term FROM documents), " +
      "tot AS (SELECT count_if(lang = 'en')::DOUBLE AS fg_total, count(*)::DOUBLE AS bg_total FROM documents), " +
      "g AS (SELECT term, count_if(fg)::BIGINT AS fg_count, count(*)::BIGINT AS bg_count FROM terms GROUP BY term HAVING count_if(fg) >= 5) " +
      "SELECT term, fg_count, bg_count, " +
      "round((fg_count / fg_total) * ln((fg_count / fg_total) / (bg_count / bg_total)), 4) AS score " +
      "FROM g CROSS JOIN tot ORDER BY score DESC, term LIMIT 10"),
    "q_search_body_bool" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "hash")) +
      " SELECT d.doc_id, sc.score AS _score FROM sc JOIN documents d ON d.doc_id = sc.id " +
      "WHERE d.lang = 'en' ORDER BY _score DESC, doc_id"),
    "q_search_body_phrase" -> (TokCte + bm25Ctes("", "tok", Seq("table", "scan")) +
      ", g AS (SELECT doc_id FROM tok WHERE contains(' ' || array_to_string(toks, ' ') || ' ', ' table scan ')) " +
      "SELECT id AS doc_id, score AS _score FROM sc WHERE id IN (SELECT doc_id FROM g) " +
      "ORDER BY _score DESC, doc_id"),
    "q_search_body_multi_match" -> (TokCte + STokCte +
      bm25Ctes("1", "tok", Seq("merge", "src5")) +
      bm25Ctes("2", "stok", Seq("merge", "src5")) +
      ", u AS (SELECT id, score * 1.0 AS s FROM sc1 UNION ALL SELECT id, score * 2.0 FROM sc2) " +
      "SELECT id AS doc_id, _score FROM (SELECT id, round(sum(s), 4) AS _score FROM u GROUP BY id) " +
      "WHERE _score >= 0.3 ORDER BY _score DESC, doc_id"),
    "q_search_body_retriever" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      s"q AS (SELECT $KnnVecSql AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "sem AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS score " +
      "FROM n CROSS JOIN qn), " +
      "wl AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50), " +
      "ws AS (SELECT id, score FROM sem ORDER BY score DESC, id LIMIT 50), " +
      "ml AS (SELECT min(score) AS mn, max(score) AS mx FROM wl), " +
      "ms AS (SELECT min(score) AS mn, max(score) AS mx FROM ws), " +
      "u AS (SELECT id, (CASE WHEN mx > mn THEN (score - mn) / (mx - mn) ELSE 1.0 END) * 0.7 AS c FROM wl CROSS JOIN ml " +
      "UNION ALL SELECT id, (CASE WHEN mx > mn THEN (score - mn) / (mx - mn) ELSE 1.0 END) * 0.3 AS c FROM ws CROSS JOIN ms) " +
      "SELECT id, round(sum(c), 4) AS linear_score, count(*)::INT AS matched FROM u " +
      "GROUP BY id ORDER BY linear_score DESC, id LIMIT 10"),
    "q_search_body_fields_api" -> ("SELECT o_orderkey, o_orderstatus, " +
      "strftime(o_orderdate, '%Y-%m') AS o_orderdate, o_orderpriority " +
      "FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 15"),
    "q_search_body_sort_mode" -> ("WITH q AS (SELECT l_orderkey, list_sort(list(l_quantity)) AS ql " +
      "FROM lineitem GROUP BY 1), " +
      "m AS (SELECT o_orderkey, (ql[(len(ql)+1)//2] + ql[len(ql)//2+1]) / 2.0 AS med " +
      "FROM orders JOIN q ON o_orderkey = l_orderkey) " +
      "SELECT o_orderkey FROM m ORDER BY med DESC, o_orderkey LIMIT 100"),
    "q_search_body_sort_geo" -> (GeoCte + ", d AS (SELECT c_custkey, " +
      "2 * 6371 * asin(sqrt(pow(sin(radians(0.0 - lat) / 2), 2) + " +
      "cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(0.0 - lon) / 2), 2))) AS dist FROM g) " +
      "SELECT c_custkey FROM d WHERE dist > 3000.0 OR (dist = 3000.0 AND c_custkey > 0) " +
      "ORDER BY dist, c_custkey LIMIT 50"),
    "q_search_body_highlight_multi" -> (TokCte + STokCte +
      bm25Ctes("1", "tok", Seq("fast", "hash", "join")) +
      bm25Ctes("2", "stok", Seq("src1")) +
      ", u AS (SELECT id, score FROM sc1 UNION ALL SELECT id, score FROM sc2), " +
      "b AS (SELECT id, round(sum(score), 4) AS _score FROM u GROUP BY id), " +
      "h AS (SELECT d.doc_id, d.text, d.source, b._score FROM documents d " +
      "JOIN tok USING (doc_id) JOIN b ON b.id = d.doc_id " +
      "WHERE list_has_any(toks, ['fast','hash','join']) " +
      "ORDER BY b._score DESC, d.doc_id LIMIT 10) " +
      "SELECT doc_id, _score, array_to_string(list_filter([" +
      "regexp_replace(regexp_extract(lower(text), '([a-z0-9]+ ){0,3}\\bfast\\b( [a-z0-9]+){0,3}'), '\\bfast\\b', '<em>fast</em>', 'g'), " +
      "regexp_replace(regexp_extract(lower(text), '([a-z0-9]+ ){0,3}\\bhash\\b( [a-z0-9]+){0,3}'), '\\bhash\\b', '<em>hash</em>', 'g'), " +
      "regexp_replace(regexp_extract(lower(text), '([a-z0-9]+ ){0,3}\\bjoin\\b( [a-z0-9]+){0,3}'), '\\bjoin\\b', '<em>join</em>', 'g')" +
      "], x -> x != '')[1:3], ' ... ') AS snippet_text, " +
      "regexp_replace(regexp_extract(lower(source), '([a-z0-9]+ ){0,3}\\bsrc1\\b( [a-z0-9]+){0,3}'), '\\bsrc1\\b', '<em>src1</em>', 'g') AS snippet_source " +
      "FROM h ORDER BY _score DESC, doc_id"),
    "q_search_body_sort_nested" -> ("WITH m AS (SELECT l_orderkey, " +
      "min(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS k FROM lineitem GROUP BY 1) " +
      "SELECT o_orderkey FROM orders JOIN m ON o_orderkey = l_orderkey " +
      "ORDER BY k ASC NULLS LAST, o_orderkey LIMIT 100"),
    "q_search_body_sort_missing" -> ("SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' " +
      "THEN NULL ELSE o_orderpriority END AS pri FROM orders " +
      "ORDER BY pri ASC NULLS FIRST, o_orderkey LIMIT 100"),
    "q_retriever_rescorer" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", w AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 50) " +
      "SELECT w.id, round(w.score * 1.0 + ln(1.0 + d.n_chars) * 0.5 * 1.0, 4) AS score " +
      "FROM w JOIN documents d ON d.doc_id = w.id ORDER BY score DESC, id LIMIT 10"),
    "q_retriever_rerank" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      ", w AS (SELECT id FROM sc ORDER BY score DESC, id LIMIT 20) " +
      "SELECT w.id, CAST(round(" +
      "1.0 * len(list_filter(toks, t -> t = 'fast')) + " +
      "1.0 * len(list_filter(toks, t -> t = 'hash')) + " +
      "1.0 * len(list_filter(toks, t -> t = 'merge')), 4) AS DOUBLE) AS score " +
      "FROM w JOIN tok ON tok.doc_id = w.id ORDER BY score DESC, id LIMIT 10"),
    "q_search_body_indices_boost" -> (TokCte + bm25Ctes("", "tok", Seq("fast", "hash", "join")) +
      " SELECT d.doc_id, round(sc.score * (CASE WHEN d.lang = 'en' THEN 2.0 ELSE 1.0 END), 4) AS _score " +
      "FROM sc JOIN documents d ON d.doc_id = sc.id ORDER BY _score DESC, doc_id LIMIT 15"),
    "q_search_body_suggest" -> (TokCte + ", v AS (SELECT token, count(*)::BIGINT AS freq FROM " +
      "(SELECT unnest(list_distinct(toks)) AS token FROM tok) GROUP BY token) " +
      "SELECT token, freq FROM v " +
      "WHERE token <> 'spak' AND levenshtein(token, 'spak') <= 2 " +
      "ORDER BY freq DESC, token LIMIT 5"),
    // shared oracles: these JSON nodes delegate to the same kernels
    // with the same params as their Scala keys
    "q_aggs_json_auto_date" -> EntriesAggs.oracleSql("q_agg_auto_date_histogram"),
    // the JSON nodes delegating to (or reproducing) Scala kernels
    // share those kernels' oracles — one definition per formula
    "q_aggs_json_ip_range" -> EntriesLate.oracleSql("q_agg_ip_range"),
    "q_aggs_json_composite_tile" -> EntriesAggs.oracleSql("q_agg_composite_geo"),
    "q_search_body_slice" -> EntriesLate.oracleSql("q_slice"),
    "q_search_body_track_scores" -> (TokCte +
      bm25Ctes("", "tok", Seq("vector", "hash")) +
      " SELECT d.doc_id, d.n_chars, sc.score AS _score " +
      "FROM sc JOIN documents d ON d.doc_id = sc.id " +
      "ORDER BY d.n_chars DESC, d.doc_id LIMIT 20"),
    "q_search_body_stored_fields" -> ("SELECT doc_id, source FROM documents " +
      "WHERE lang = 'de' ORDER BY doc_id LIMIT 50"),
    // batch 4: shared with the Scala twins where columns align,
    // adapted (same CTE, JSON column names) where they differ
    "q_aggs_json_geo_bounds" -> (GeoCte.replace(
      "SELECT c_custkey,", "SELECT c_custkey, c_mktsegment,") +
      " SELECT c_mktsegment AS seg, count(*)::BIGINT AS doc_count, " +
      "round(max(lat), 4) AS vp_top, round(min(lon), 4) AS vp_left, " +
      "round(min(lat), 4) AS vp_bottom, round(max(lon), 4) AS vp_right, " +
      "round(avg(lat), 4) AS cc_lat, round(avg(lon), 4) AS cc_lon " +
      "FROM g GROUP BY 1 ORDER BY doc_count DESC, seg LIMIT 10"),
    "q_aggs_json_cartesian" -> (GeoCte.replace(
      "SELECT c_custkey,", "SELECT c_custkey, c_mktsegment,") +
      " SELECT c_mktsegment AS seg, count(*)::BIGINT AS doc_count, " +
      "round(min(lon), 4) AS cb_min_x, round(max(lon), 4) AS cb_max_x, " +
      "round(min(lat), 4) AS cb_min_y, round(max(lat), 4) AS cb_max_y, " +
      "round(avg(lon), 4) AS cn_x, round(avg(lat), 4) AS cn_y " +
      "FROM g GROUP BY 1 ORDER BY doc_count DESC, seg LIMIT 10"),
    "q_search_body_terminate_aggs" -> ("WITH capped AS (SELECT * FROM documents " +
      "WHERE lang = 'en' ORDER BY doc_id LIMIT 50) " +
      "SELECT source AS src, count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE) AS chars " +
      "FROM capped GROUP BY 1 ORDER BY doc_count DESC, src LIMIT 10"),
    "q_aggs_json_normalize" -> ("WITH b AS (SELECT date_trunc('month', o_orderdate) AS m, " +
      "count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sales FROM orders GROUP BY 1) " +
      "SELECT m, doc_count, sales, " +
      "round(sales / CAST(sum(CAST(sales AS DECIMAL(18,4))) OVER () AS DOUBLE) * 100.0, 4) AS pct, " +
      "round((sales - CAST(sum(CAST(sales AS DECIMAL(18,4))) OVER () AS DOUBLE) / count(*) OVER ()) " +
      "/ stddev_pop(sales) OVER (), 4) AS z " +
      "FROM b ORDER BY m"),
    "q_aggs_json_moving_pctl" -> ("WITH b AS (SELECT date_trunc('month', o_orderdate) AS m, " +
      "count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sales FROM orders GROUP BY 1) " +
      "SELECT m, doc_count, sales, " +
      "round(quantile_cont(sales, 0.5) OVER (ORDER BY m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mp " +
      "FROM b ORDER BY m"),
    "q_aggs_json_cum_card" -> ("WITH fs AS (SELECT user_id, " +
      "min((epoch_ns(ts) // 3600000000000) * 3600000000000) AS bucket FROM events GROUP BY 1), " +
      "pb AS (SELECT bucket, count(*)::BIGINT AS new_users FROM fs GROUP BY 1) " +
      "SELECT bucket, new_users, (sum(new_users) OVER (ORDER BY bucket))::BIGINT AS cum_users " +
      "FROM pb ORDER BY bucket"),
    "q_aggs_json_bucket_corr" -> EntriesAggs.oracleSql("q_agg_bucket_corr"),
    "q_aggs_json_ks_test" -> EntriesAggs.oracleSql("q_agg_ks_test"),
    "q_aggs_json_geohex" -> EntriesAggs.oracleSql("q_agg_geohex"),
    "q_aggs_json_nested" -> ("SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum, " +
      "round(avg(l_quantity), 4) AS qty_avg FROM lineitem"),
    "q_aggs_json_reverse_nested" -> EntriesAggs.oracleSql("q_agg_reverse_nested"),
    "q_aggs_json_sig_text" -> EntriesDsl.oracleSql("q_agg_sig_text"),
    "q_aggs_json_geo_line" -> EntriesAggs.oracleSql("q_agg_geo_line"),
    "q_aggs_json_mad" -> EntriesAggs.oracleSql("q_agg_mad"),
    "q_aggs_json_t_test" -> EntriesAggs.oracleSql("q_agg_t_test"),
    "q_aggs_json_matrix_stats" -> EntriesAggs.oracleSql("q_agg_matrix_stats"),
    "q_aggs_json_vwh" -> EntriesAggs.oracleSql("q_agg_variable_width"),
    "q_aggs_json_ip_prefix" -> EntriesLate.oracleSql("q_agg_ip_prefix"),
    "q_aggs_json_categorize" -> EntriesAggs.oracleSql("q_agg_categorize"),
    "q_aggs_json_frequent_items" -> EntriesFulltext.oracleSql("q_agg_frequent_items"),
    "q_aggs_json_diversified" -> EntriesAggs.oracleSql("q_agg_diversified"),
    "q_aggs_json_rate" -> EntriesAggs.oracleSql("q_agg_rate"),
    "q_aggs_json_scripted" -> EntriesAggs.oracleSql("q_agg_scripted_metric"),
    "q_aggs_json_dh_offset" -> EntriesAggs.oracleSql("q_agg_date_histogram_offset"),
    "q_aggs_json_dh_empty" -> EntriesAggs.oracleSql("q_agg_histogram_empty"),
    "q_aggs_json_global" -> ("SELECT count(doc_id)::BIGINT AS cnt, " +
      "round(avg(n_chars), 4) AS avg_chars FROM documents"),
    "q_aggs_json_min_doc_count" -> ("SELECT lang AS l, count(*)::BIGINT AS doc_count, " +
      "round(avg(n_chars), 4) AS avg_chars FROM documents GROUP BY lang " +
      "HAVING count(*) >= 70 ORDER BY doc_count DESC, l LIMIT 10"),
    "q_aggs_json_adjacency" -> EntriesAggs.oracleSql("q_agg_adjacency"),
    "q_aggs_json_geo_distance" -> EntriesAggs.oracleSql("q_agg_geo_distance"),
    "q_search_body_collapse_inner" -> ("WITH r AS (SELECT *, " +
      "row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn " +
      "FROM documents WHERE lang = 'en'), " +
      "ih AS (SELECT source, array_to_string((list(doc_id ORDER BY n_chars DESC, doc_id))[1:3], ',') AS inner_hits " +
      "FROM r GROUP BY source) " +
      "SELECT r.doc_id, r.source, r.n_chars, ih.inner_hits FROM r JOIN ih USING (source) " +
      "WHERE rn = 1 ORDER BY n_chars DESC, doc_id LIMIT 10"),
    "q_aggs_json_string_stats" -> ("SELECT lang AS by_lang, count(*)::BIGINT AS doc_count, " +
      "count(text)::BIGINT AS len_count, min(length(text))::INT AS len_min_length, " +
      "max(length(text))::INT AS len_max_length, round(avg(length(text)), 4) AS len_avg_length " +
      "FROM documents GROUP BY lang ORDER BY by_lang LIMIT 10"),
    "q_aggs_json_boxplot" -> ("SELECT l_returnflag AS by_flag, count(*)::BIGINT AS doc_count, " +
      "round(quantile_cont(l_extendedprice, 0.0), 4) AS bp_min, " +
      "round(quantile_cont(l_extendedprice, 0.25), 4) AS bp_q1, " +
      "round(quantile_cont(l_extendedprice, 0.5), 4) AS bp_q2, " +
      "round(quantile_cont(l_extendedprice, 0.75), 4) AS bp_q3, " +
      "round(quantile_cont(l_extendedprice, 1.0), 4) AS bp_max " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY by_flag LIMIT 10"),
    "q_aggs_json_top_metrics" -> ("SELECT lang AS by_lang, count(*)::BIGINT AS doc_count, " +
      "max_by(n_chars, doc_id) AS latest_n_chars, max(doc_id) AS latest_sort " +
      "FROM documents GROUP BY lang ORDER BY by_lang LIMIT 10"),
    "q_aggs_json_multi_terms" -> ("SELECT lang, source, count(*)::BIGINT AS doc_count, " +
      "round(avg(n_chars), 4) AS avg_chars FROM documents " +
      "GROUP BY lang, source ORDER BY doc_count DESC, lang, source LIMIT 10"),
    "q_aggs_json_date_range" -> ("WITH r AS (SELECT o_totalprice, " +
      "CASE WHEN o_orderdate < DATE '1997-01-01' THEN '*-1997-01-01' " +
      "WHEN o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1999-01-01' THEN '1997-01-01-1999-01-01' " +
      "WHEN o_orderdate >= DATE '1999-01-01' THEN '1999-01-01-*' END AS era FROM orders) " +
      "SELECT era, count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
      "FROM r WHERE era IS NOT NULL GROUP BY era ORDER BY era"),
    "q_aggs_json_rare_terms" -> ("SELECT source AS key, count(*)::BIGINT AS doc_count " +
      "FROM documents GROUP BY source HAVING count(*) <= 30 ORDER BY doc_count, key"),
    "q_aggs_json_pctl_ranks" -> ("SELECT l_returnflag AS by_flag, count(*)::BIGINT AS doc_count, " +
      "round(count_if(l_extendedprice <= 1000)::DOUBLE / count(l_extendedprice)::DOUBLE * 100.0, 4) AS pr_rank_1000, " +
      "round(count_if(l_extendedprice <= 10000)::DOUBLE / count(l_extendedprice)::DOUBLE * 100.0, 4) AS pr_rank_10000, " +
      "round(count_if(l_extendedprice <= 50000)::DOUBLE / count(l_extendedprice)::DOUBLE * 100.0, 4) AS pr_rank_50000 " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY by_flag LIMIT 10"),
    "q_aggs_json_sampler" -> ("SELECT o_orderstatus AS by_status, " +
      "floor(count(*)::DOUBLE / 0.1)::BIGINT AS doc_count, " +
      "round(avg(o_totalprice), 4) AS avg_price FROM orders " +
      s"WHERE ${hexFold("o_orderkey::VARCHAR", 12)} / 281474976710656.0 < 0.1 " +
      "GROUP BY o_orderstatus ORDER BY doc_count DESC, by_status LIMIT 10"),
    "q_aggs_json_missing" -> ("SELECT count(*)::BIGINT AS doc_count FROM documents WHERE lang = 'en'"),
    "q_aggs_json_geotile" -> ("WITH g AS (SELECT c_acctbal, (c_custkey * 7919 % 18000) / 100.0 - 90.0 AS lat, " +
      "(c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon FROM customer), " +
      "c AS (SELECT c_acctbal, greatest(least(lat, 85.05112878), -85.05112878) AS latc, lon FROM g), " +
      "t AS (SELECT c_acctbal, CAST(least(floor((lon + 180.0) / 360.0 * 64.0), 63.0) AS BIGINT) AS x, " +
      "CAST(greatest(least(floor(round((1.0 - ln(tan(radians(latc)) + 1.0 / cos(radians(latc))) / pi()) / 2.0 * 64.0, 9)), 63.0), 0.0) AS BIGINT) AS y FROM c) " +
      "SELECT '6/' || x::VARCHAR || '/' || y::VARCHAR AS cells, count(*)::BIGINT AS doc_count, " +
      "round(avg(c_acctbal), 4) AS acct FROM t GROUP BY 1 ORDER BY cells"),
    "q_aggs_json_calendar" -> ("SELECT date_trunc('month', o_orderdate) AS by_month, " +
      "count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
      "FROM orders GROUP BY 1 ORDER BY by_month"),
    "q_aggs_json_terms_filter" -> ("SELECT source AS src, count(*)::BIGINT AS doc_count, " +
      "round(avg(n_chars), 4) AS avg_chars FROM documents " +
      "WHERE regexp_full_match(source, 'src[0-9]') AND NOT regexp_full_match(source, 'src[47]') " +
      "GROUP BY source ORDER BY doc_count DESC, src LIMIT 20"),
    "q_dedup_semantic" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 16), " +
      "asg AS (SELECT id, cent_id FROM (SELECT c.vec_id AS id, cents.cent_id, " +
      "row_number() OVER (PARTITION BY c.vec_id ORDER BY round(list_reduce(list_prepend(0.0, list_transform(range(1, len(c.v) + 1), i -> c.v[i] * cv[i])), (x, y) -> x + y) / (c.nrm * cnrm), 4) DESC, cents.cent_id) AS rn " +
      "FROM n c CROSS JOIN cents) WHERE rn = 1), " +
      "wc AS (SELECT asg.cent_id, n.vec_id AS id, n.v, n.nrm FROM asg JOIN n ON n.vec_id = asg.id), " +
      "p AS (SELECT a.cent_id AS cluster_id, a.id AS id1, b.id AS id2, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])), (x, y) -> x + y) / (a.nrm * b.nrm), 4) AS cosine " +
      "FROM wc a JOIN wc b ON a.cent_id = b.cent_id AND a.id < b.id) " +
      "SELECT cluster_id, id1, id2, cosine FROM p WHERE cosine >= 0.35 " +
      "ORDER BY cluster_id, id1, id2"),
    "q_esql_sample" -> ("SELECT count(*)::BIGINT AS n, o_orderstatus FROM orders " +
      s"WHERE ${hexFold("o_orderkey::VARCHAR || chr(0) || o_orderstatus", 12)} / 281474976710656.0 < 0.25 " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_aggs_json_metrics" -> ("SELECT l_returnflag AS by_flag, count(*)::BIGINT AS doc_count, " +
      "count(l_extendedprice)::BIGINT AS price_count, round(min(l_extendedprice), 4) AS price_min, " +
      "round(max(l_extendedprice), 4) AS price_max, round(avg(l_extendedprice), 4) AS price_avg, " +
      "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS price_sum, " +
      "round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25, " +
      "round(quantile_cont(l_quantity, 0.50), 4) AS qty_p50, " +
      "round(quantile_cont(l_quantity, 0.95), 4) AS qty_p95, " +
      "round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) / " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS wavg " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY by_flag LIMIT 10"),
    "q_aggs_json_filters" -> ("SELECT " +
      "sum(CASE WHEN lang = 'en' AND n_chars >= 400 THEN 1 ELSE 0 END)::BIGINT AS long_en, " +
      "sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END)::BIGINT AS short, " +
      "sum(CASE WHEN NOT ((lang = 'en' AND n_chars >= 400) OR n_chars < 150) THEN 1 ELSE 0 END)::BIGINT AS _other_ " +
      "FROM documents"),
    "q_aggs_json_top_hits" -> ("SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM " +
      "(SELECT o_orderpriority, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
      "WHERE rn <= 3 ORDER BY o_orderpriority, rn"),
    "q_search_body_explain" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "hash")) +
      ", ex AS (SELECT tf.doc_id AS id, string_agg('weight(' || term || ')=' || " +
      "CAST(CAST(round(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) * " +
      "tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / st.avgdl)), 4) " +
      "AS DECIMAL(18,4)) AS VARCHAR), ' + ' ORDER BY term) AS _explanation " +
      "FROM tf JOIN df USING (term) CROSS JOIN st GROUP BY tf.doc_id) " +
      "SELECT sc.id AS doc_id, sc.score AS _score, ex._explanation " +
      "FROM sc JOIN ex ON sc.id = ex.id ORDER BY _score DESC, doc_id LIMIT 10"),
    "q_search_body_terminate" -> ("WITH c AS (SELECT doc_id, n_chars FROM documents " +
      "WHERE lang = 'en' ORDER BY doc_id LIMIT 100) " +
      "SELECT doc_id, n_chars FROM c ORDER BY n_chars DESC, doc_id LIMIT 50"),
    "q_search_body_rank" -> (TokCte + bm25Ctes("", "tok", Seq("vector", "hash")) +
      ", e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
      s"q AS (SELECT $KnnVecSql AS qv), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e), " +
      "qn AS (SELECT qv, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS qnrm FROM q), " +
      "sem AS (SELECT vec_id AS id, " +
      "round(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])), (x, y) -> x + y) / (nrm * qnrm), 4) AS cosine " +
      "FROM n CROSS JOIN qn), " +
      "kk AS (SELECT id, cosine FROM (SELECT *, row_number() OVER (ORDER BY cosine DESC, id) AS rnk FROM sem) WHERE rnk <= 50), " +
      "rl AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM sc), " +
      "rs AS (SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM kk), " +
      "u AS (SELECT id, 1.0 / (60 + rank) AS c FROM rl WHERE rank <= 50 " +
      "UNION ALL SELECT id, 1.0 / (60 + rank) AS c FROM rs WHERE rank <= 50) " +
      "SELECT id AS doc_id, round(sum(c), 4) AS _score FROM u " +
      "GROUP BY id ORDER BY _score DESC, doc_id LIMIT 10"),
    "q_aggs_json_derivative" -> (MonthlyCte +
      "SELECT m, doc_count, sales, " +
      "round(sales - lag(sales) OVER (ORDER BY m), 4) AS deriv, " +
      "round(sum(sales) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum " +
      "FROM b ORDER BY m"),
    "q_aggs_json_moving_fn" -> (MonthlyCte +
      "SELECT m, doc_count, sales, " +
      "round(avg(sales) OVER (ORDER BY m ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) AS mavg3, " +
      "round(sales - lag(sales, 12) OVER (ORDER BY m), 4) AS yoy " +
      "FROM b ORDER BY m"),
    "q_aggs_json_bucket_script" -> ("WITH b AS (SELECT l_returnflag AS flag, " +
      "count(*)::BIGINT AS doc_count, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev " +
      "FROM lineitem GROUP BY 1) " +
      "SELECT flag, doc_count, rev, round(rev / doc_count, 4) AS per_doc " +
      "FROM b ORDER BY doc_count DESC, flag LIMIT 10"),
    "q_aggs_json_bucket_selector" -> (MonthlyCte +
      "SELECT m, doc_count, sales FROM b WHERE doc_count >= 180 ORDER BY m"),
    "q_aggs_json_bucket_sort" -> (MonthlyCte +
      "SELECT m, doc_count, sales FROM b ORDER BY sales DESC, m ASC LIMIT 5 OFFSET 2"),
    "q_aggs_json_sibling" -> (MonthlyCte +
      "SELECT round(avg(sales), 4) AS avg_monthly, max(sales) AS best_month, " +
      "min(sales) AS worst_month, " +
      "round(CAST(sum(CAST(sales AS DECIMAL(18,4))) AS DOUBLE), 4) AS total FROM b"),
    "q_aggs_json_stats_bucket" -> (MonthlyCte +
      "SELECT count(sales)::BIGINT AS st_count, round(min(sales), 4) AS st_min, " +
      "round(max(sales), 4) AS st_max, round(avg(sales), 4) AS st_avg, " +
      "round(CAST(sum(CAST(sales AS DECIMAL(18,4))) AS DOUBLE), 4) AS st_sum, " +
      "round(quantile_cont(doc_count, 0.25), 4) AS pct_p25, " +
      "round(quantile_cont(doc_count, 0.50), 4) AS pct_p50, " +
      "round(quantile_cont(doc_count, 0.75), 4) AS pct_p75 FROM b"))
}
