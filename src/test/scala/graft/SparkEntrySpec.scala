package graft

class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("SURVEY §2 operator ids are all registered") {
    val expected = Set(
      // §2A
      "log_schema", "filter_site", "filter_type", "filter_host",
      "filter_generator", "filter_since_until", "filter_status",
      "filter_duration_longer", "filter_uri_exact", "filter_uri_prefix",
      "filter_method", "filter_unsafe_method", "filter_combined", "time_parse",
      "query_args", "filter_referer", "filter_user_agent",
      // §2B
      "window", "last", "group_site", "accumulate_top", "accumulate_more",
      "stats", "per_site_out", "per_site_layout", "jsonl", "one_line",
      "one_line_full", "one_line_clf", "age_only", "follow",
      "max_age_retention", "rate_limit", "rate_limit_stream",
      "jsonl_source", "csv_source", "partitioned_sink", "top_pages",
      "duration_quantiles", "duration_histogram",
      "duration_quantiles_approx", "timeseries", "timeseries_stream",
      "dedup_exact_stream",
      // §2C
      "anonymize_ip", "track_visitors", "track_visitors_stream", "geoip",
      "geoip_stream",
      "resolve_forwarded_to", "visitor_stats",
      // §2D
      "q1_agg", "q3_topn", "q5_join", "q_window", "q_distinct",
      "q_approx_distinct", "q_exists", "q_funnel", "q_sessionize", "q_json",
      "q_rollup", "q_cube", "q_asof", "q_pivot", "q_skew_join",
      "q_semi", "q_grouping_sets", "q_correlated", "q_intersect",
      "q_except", "q_window_range", "stats_stream", "embedding_centroid",
      "accumulate_top_stream", "sessionize_stream", "q_bucket_join",
      "bigram_fluency", "q_sql_exists", "attribution_stream",
      // §2E
      "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram",
      "dedup_cdc", "dedup_clusters",
      "dedup_embedding", "dedup_embedding_ivf",
      "ann_brute", "ann_lsh", "ann_ivf", "lang_id",
      "quality_score",
      "token_count", "repetition_score", "fingerprint", "fingerprint_winnow",
      "mm_decode", "mm_resize",
      "mm_frame_sample",
      "sample_hash", "sample_stratified", "mix_sources", "decontaminate",
      "pii_scrub", "pack_sequences", "token_df_score", "tfidf_top_terms",
      "dedup_winnow_pairs")
    val registered = SparkEntry.queries.keySet
    assert((expected -- registered).isEmpty,
      s"missing operators: ${expected -- registered}")
  }

  test("every registered query executes on sf0.001") {
    // the exact smoke the driver runs before Verify — catch runtime
    // breakage (not just compilation) for every operator
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(name) {
        val n = fn(spark, sf).count()
        assert(n >= 0)
      }
    }
  }
}
