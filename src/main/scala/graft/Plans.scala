package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args.toSeq match {
      case Nil => Seq("q_term", "q_range", "q_bool", "q_dsl_json", "q_agg_terms",
        "q_join_enrich", "q_join_revenue", "q_bm25", "q_agg_top_hits",
        "q_match_phrase_slop", "q_dedup_simhash", "q_geo_grid", "q_uri_boost",
        "q_has_child", "q_pinned",
        // r3 flagships
        "q_chunk", "q_contamination", "q_agg_children", "q_span_near",
        "q_sample_strat", "q_agg_rate", "q_agg_auto_date_histogram",
        // r4 flagships
        "q_knn", "q_dedup_paragraph", "q_lm_score", "q_agg_cum_card",
        "q_simple_query_string", "q_agg_variable_width",
        // r6 flagships
        "q_sort_mode", "q_ngram_topk", "q_agg_terms_partition",
        "q_rank_vectors", "q_time_series", "q_ltr", "q_mtermvectors",
        // r7 flagships
        "q_eql_sequence", "q_knn_rescore", "q_transform_latest",
        "q_function_modes", "q_agg_ip_prefix", "q_nested_score",
        "q_rescore_multi", "q_esql_cidr",
        // r12 flagships
        "q_pipeline_full", "q_terminate_after", "q_agg_ks_test",
        "q_agg_holt_winters", "q_docvalue_fields", "q_span_masked",
        // r10 front-door flagships
        "q_search_body_knn", "q_search_body_rescore", "q_search_body_bool",
        "q_aggs_json_composite", "q_aggs_json_metrics", "q_search_body_retriever")
      case names => names
    }) {
      println(s"========= $name")
      println(SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
