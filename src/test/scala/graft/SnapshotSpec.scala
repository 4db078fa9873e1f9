package graft

import org.scalatest.funsuite.AnyFunSuite

/** Row-count snapshot at sf0.001 for every declared query — pins the
  * semantics across rounds: an accidental filter/join/threshold change in
  * a future edit shows up as a count drift here before it ever reaches
  * the driver's oracle gate. Regenerate deliberately (never blindly) via
  * the verify dump when semantics change on purpose. */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val expected: Map[String, Long] = Map(
    "q_agg_approx_distinct" -> 3L,
    "q_agg_argmax" -> 150L,
    "q_agg_collect" -> 1473L,
    "q_agg_distinct" -> 3L,
    "q_agg_hash" -> 6L,
    "q_agg_stats" -> 3L,
    "q_agg_kmv" -> 3L,
    "q_ann_ivf" -> 25L,
    "q_ann_lsh" -> 6L,
    "q_array_explode" -> 640L,
    "q_array_funcs" -> 500L,
    "q_chunk_docs" -> 1388L,
    "q_cond_funcs" -> 1500L,
    "q_csv_roundtrip" -> 99L,
    "q_jsonl_roundtrip" -> 99L,
    "q_quality_repetition" -> 500L,
    "q_unigram_logprob" -> 500L,
    "q_gapfill_locf" -> 480L,
    "q_histogram" -> 11L,
    "q_agg_mode" -> 3L,
    "q_corr" -> 3L,
    "q_pagerank" -> 500L,
    "q_retention_cohort" -> 786L,
    "q_window_range" -> 1500L,
    "q_scd2" -> 802L,
    "q_outliers" -> 46L,
    "q_bm25" -> 457L,
    "q_fuzzy_match" -> 78L,
    "q_triangles" -> 22L,
    "q_sessionize" -> 585L,
    "q_classifier_score" -> 500L,
    "q_hof_funcs" -> 500L,
    "q_unpivot" -> 12L,
    "q_dedup_containment" -> 4L,
    "q_agg_bits" -> 3L,
    "q_cube" -> 24L,
    "q_date_funcs" -> 1500L,
    "q_decontaminate" -> 367L,
    "q_dedup_clusters" -> 21L,
    "q_dedup_embedding" -> 5L,
    "q_embed_quantize" -> 500L,
    "q_dedup_exact" -> 500L,
    "q_dedup_minhash_lsh" -> 28L,
    "q_dedup_near" -> 2L,
    "q_dedup_simhash" -> 70L,
    "q_doc_assembly" -> 1473L,
    "q_except" -> 15L,
    "q_filter_null_branch" -> 6000L,
    "q_filter_or_eq" -> 8L,
    "q_filter_pred" -> 238L,
    "q_fingerprint" -> 500L,
    "q_join_bucketed" -> 5L,
    "q_join_skew_salted" -> 202L,
    "q_merge_upsert" -> 526L,
    "q_partition_prune" -> 3L,
    "q_funnel" -> 3L,
    "q_grouping_sets" -> 8L,
    "q_intersect" -> 10L,
    "q_join_anti" -> 18L,
    "q_join_asof" -> 202L,
    "q_join_full" -> 761L,
    "q_join_bridge_m2n" -> 1473L,
    "q_join_chain" -> 5L,
    "q_join_cross" -> 50L,
    "q_join_inner_fk" -> 150L,
    "q_join_left" -> 150L,
    "q_join_nullsafe" -> 289L,
    "q_join_selectinload" -> 1473L,
    "q_join_semi" -> 145L,
    "q_join_theta_range" -> 1L,
    "q_json_funcs" -> 1000L,
    "q_lang_id" -> 500L,
    "q_llm_summarize" -> 500L,
    "q_map_funcs" -> 1000L,
    "q_math_funcs" -> 6000L,
    "q_mix_weighted" -> 693L,
    "q_multimodal_decode" -> 500L,
    "q_multimodal_frames" -> 1684L,
    "q_multimodal_struct" -> 193L,
    "q_multimodal_resize" -> 500L,
    "q_pack_bins" -> 500L,
    "q_percentile" -> 3L,
    "q_pivot" -> 5L,
    "q_project" -> 200L,
    "q_quality_score" -> 500L,
    "q_regex_funcs" -> 200L,
    "q_rollup" -> 31L,
    "q_sample_hash" -> 41L,
    "q_sample_stratified" -> 500L,
    "q_scan_project" -> 6000L,
    "q_scrub_text" -> 1000L,
    "q_similarity_topk" -> 25L,
    "q_sort_limit" -> 10L,
    "q_split_assign" -> 500L,
    "q_stream_join" -> 2L,
    "q_subquery" -> 150L,
    "q_stream_session" -> 946L,
    "q_stream_sliding" -> 3457L,
    "q_stream_tumbling" -> 868L,
    "q_string_funcs" -> 200L,
    "q_text_tokenize_tf" -> 31L,
    "q_tfidf" -> 1500L,
    "q_token_count" -> 500L,
    "q_token_bpe" -> 33L,
    "q_topk_per_group" -> 75L,
    "q_union" -> 401L,
    "q_union_distinct" -> 15L,
    "q_window_analytic" -> 1000L,
    "q_window_distribution" -> 150L,
    "q_window_frame" -> 1000L,
    "q_window_rank" -> 150L)

  test("row counts at sf0.001 match the round-1 snapshot") {
    val drift = expected.flatMap { case (name, want) =>
      val got = SparkEntry.queries(name)(spark, TestSession.sfDir).count()
      if (got != want) Some(s"$name: got $got, snapshot $want") else None
    }
    assert(drift.isEmpty, drift.mkString("; "))
  }

  test("snapshot covers exactly the declared queries") {
    assert(expected.keySet == SparkEntry.queries.keySet)
  }
}
