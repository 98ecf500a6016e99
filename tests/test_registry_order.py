"""The driver harness verifies only the first ``DRIVER_CAP`` entries of
``queries()`` (rounds 1-2 each checked exactly the first 50 registered).
These tests pin the explicit ordering so the checked set stays a
deliberate decision: every query that has never had a driver oracle row
must sit inside the cap, and anything rotated past the cap must already
be driver-green in prior rounds AND coverage-redundant.
"""

from __future__ import annotations

from level2_to_cassandra_spark import registry

# Queries with no driver hash-green row through CORRECTNESS_r06 —
# must be inside the cap until a round records them green.
NEVER_DRIVER_CHECKED = {
    # brand-new in r07 — their first hash check is now
    "q_agg_argmax", "q_hist_equiwidth", "q_bm25",
    "q_cooccurrence_pmi", "q_anomaly_zscore", "q_join_asof_forward",
    "q_agg_mode", "q_window_ntile",
    # late-r07 additions (batches 3-5)
    "q_gap_islands", "q_scd2", "q_snapshot_diff",
    "q_window_running_distinct", "q_pagerank", "q_winsorize",
    # late-r07 additions (batch 6)
    "q_rollup_cascade", "q_skew_profile", "q_orc_scan",
    "q_quality_checks", "q_drift_psi", "q_max_concurrency",
}

# Queries whose implementation was touched in r07 (brute_topk broadcast
# guard -> q_sim_topk; prebuilt-index knob/coverage guards ->
# q_sim_ann_ivfpq; the csv NULL-safe line builder; bpe.py gained the
# distributed merge loop beside the shared kernel) — must re-verify
# in-cap even though they are already driver-green.
TOUCHED_THIS_ROUND = {
    "q_sim_topk", "q_sim_ann_ivfpq", "q_csv_scan", "q_text_tokens_bpe",
    # asof.py gained direction='forward' — both existing asof queries
    # re-verify alongside the new forward one
    "q_join_asof", "q_join_asof_tolerance",
}

# The r07 confirming cohorts that must ALSO be in-cap (VERDICT r06
# #1): the 9 r06 first-rows and the 10 single-driver-row backlog — all
# already green once, rotated in for their second lifetime row.
CONFIRMING_THIS_ROUND = {
    "q_agg_approx", "q_agg_approx_percentile", "q_agg_hll_sketch",
    "q_sample_weighted", "q_zorder", "q_join_asof_tolerance",
    "q_twap", "q_unpivot",
    "q_resample_interp", "q_text_span_dedup", "q_domain_cap",
    "q_ngram_counts", "q_token_histogram", "q_embed_quantize",
    "q_sample_stratified", "q_text_repetition", "q_time_bucket_agg",
    "q_sessionize",
}

# Driver-green in at least one prior round (>=2 lifetime rows each as
# of r06), each with an in-cap sibling covering the same SURVEY.md §2
# row — may sit past the cap.  The local replica harness still
# oracle-checks every one of these on every run.
SAFE_TO_ROTATE_OUT = {
    "q_agg_bitmap_distinct", "q_agg_conditional", "q_agg_distinct",
    "q_agg_percentile", "q_agg_rollup", "q_agg_salted",
    "q_chunk_docs", "q_classifier_score", "q_contamination",
    "q_corpus_pipeline", "q_curate_corpus", "q_dedup_cluster",
    "q_dedup_incremental", "q_dedup_incremental_fuzzy", "q_dedup_keep",
    "q_dedup_lww", "q_event_transitions", "q_filter_predicates",
    "q_funnel", "q_join_anti", "q_join_broadcast", "q_join_outer",
    "q_join_range", "q_join_semi", "q_json_scan", "q_length_buckets",
    "q_llm_dedup_simhash", "q_mixture_plan", "q_multimodal_features",
    "q_ohlc_bars", "q_pack_sequences", "q_resample_locf",
    "q_retention", "q_sample_split", "q_scalar_array",
    "q_scalar_datetime", "q_scalar_json", "q_scalar_math",
    "q_scalar_string", "q_scan_project_filter", "q_semdedup",
    "q_set_ops", "q_scalar_map", "q_set_ops_all",
    "q_shuffle_epoch", "q_sim_ann_ivf", "q_sim_ann_lsh",
    "q_sim_ann_pq", "q_sort_limit", "q_sql_grouping_sets",
    "q_text_bigram_lm", "q_text_editdist", "q_text_entropy",
    "q_text_fingerprint", "q_text_langid", "q_text_redact",
    "q_text_rolling_hash", "q_text_stats", "q_text_tfidf",
    "q_tokenize_ids", "q_topk_per_group", "q_udaf_trimmed_mean",
    "q_vocab_coverage", "q_window_distribution", "q_window_lag",
    "q_window_moving_avg", "q_window_range_frame", "q_window_rank",
    # rotated out mid-r07 to fund first rows for the five late-r07
    # queries: each is twice-green (r01/r02 + r04 or later) and its
    # machinery keeps in-cap siblings (join family, sort/top-k,
    # scalar-subquery broadcasts, the pandas-UDF/UDTF plan surface
    # carried by q_text_tokens_bpe + the plan-wide row-Python ban)
    "q_join_cross", "q_udf_pandas_cosine", "q_udtf_tokenize",
    "q_sort_nulls", "q_subquery_correlated", "q_agg_pivot",
    # rotated out late-r07 to fund batch-6 first rows: stale r01/r02
    # confirms whose machinery keeps in-cap siblings (q_join_inner,
    # the asof union-merge family, q_snapshot_diff's full outer,
    # q_sql_star_revenue's multiway star join)
    "q_join_right", "q_join_multiway", "q_join_full",
    # q_agg_stats: twice-green r01/r02; moment/percentile machinery
    # carried in-cap by q_winsorize, q_anomaly_zscore, q_skew_profile
    "q_agg_stats",
    # q_agg_cube: twice-green r01/r02; Expand-based grouping carried
    # in-cap by q_unpivot (q_sql_grouping_sets past-cap, twice-green)
    "q_agg_cube",
    # q_sql_star_revenue: multiply-green; VERDICT r06 #6 concerns its
    # bench median (kept in bench.py HEADLINE), not its hash row
    "q_sql_star_revenue",
}


def test_order_covers_registry_exactly():
    names = list(registry.all_queries().keys())
    assert names == list(registry.DRIVER_ORDER)
    assert len(names) == len(set(names))


def test_unverified_queries_inside_driver_cap():
    in_cap = set(registry.DRIVER_ORDER[: registry.DRIVER_CAP])
    missing = (NEVER_DRIVER_CHECKED | TOUCHED_THIS_ROUND
               | CONFIRMING_THIS_ROUND) - in_cap
    assert not missing, f"must-check queries past the cap: {missing}"


def test_only_twice_green_redundant_queries_past_cap():
    tail = set(registry.DRIVER_ORDER[registry.DRIVER_CAP:])
    unexpected = tail - SAFE_TO_ROTATE_OUT
    assert not unexpected, f"queries past the cap without prior green rows: {unexpected}"


def test_entry_module_preserves_order():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries().keys()) == list(registry.DRIVER_ORDER)
