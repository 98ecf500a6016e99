"""The driver harness verifies only the first ``DRIVER_CAP`` entries of
``queries()`` (rounds 1-2 each checked exactly the first 50 registered).
These tests pin the explicit ordering so the checked set stays a
deliberate decision: every query that has never had a driver oracle row
must sit inside the cap, and anything rotated past the cap must already
be driver-green in prior rounds AND coverage-redundant.
"""

from __future__ import annotations

from level2_to_cassandra_spark import registry

# Queries with no driver hash-green row through CORRECTNESS_r04, or
# whose oracle changed this round and must (re-)verify — must be inside
# the cap until a round records them green.
NEVER_DRIVER_CHECKED = {
    # oracle-backed since r03/r04 but never inside the cap; rotated in
    # for r05 per VERDICT r04 "Next round" #1
    "q_resample_interp", "q_text_span_dedup", "q_domain_cap",
    "q_ngram_counts", "q_token_histogram", "q_embed_quantize",
    "q_sample_stratified", "q_text_repetition",
    # r04 no_oracle rows that gained real DuckDB oracles in r05
    # (VERDICT #2/#3/#5, plus the portable IVF quantizer) — their
    # first hash check happens now
    "q_multimodal_features", "q_llm_dedup_simhash", "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    # brand-new in r05
    "q_semdedup", "q_text_bigram_lm", "q_vocab_coverage",
    "q_classifier_score", "q_tokenize_ids", "q_corpus_pipeline",
    "q_text_entropy", "q_funnel", "q_retention",
    "q_shuffle_epoch", "q_length_buckets", "q_sim_ann_pq",
    "q_sim_ann_ivfpq", "q_event_transitions", "q_mixture_plan",
}

# Driver-green in at least one prior round (or rows-only by design),
# each with an in-cap sibling covering the same SURVEY.md §2 row — may
# sit past the cap.
SAFE_TO_ROTATE_OUT = {
    # rotated out for r05 (VERDICT r04 #1 names the first six)
    "q_text_tfidf", "q_udf_pandas_cosine", "q_udtf_tokenize",
    "q_ohlc_bars", "q_time_bucket_agg", "q_sessionize",
    "q_agg_rollup", "q_window_moving_avg",
    # thrice-green (r01+r02+r03), rotated out for r04
    "q_filter_predicates", "q_agg_distinct", "q_agg_salted",
    "q_set_ops", "q_scalar_string", "q_scalar_math", "q_scalar_array",
    "q_window_rank", "q_join_semi", "q_join_anti",
    # once-green in r03, untouched, evicted to give the r04 cohort
    # first driver rows; each redundant with an in-cap sibling
    "q_text_langid", "q_text_tokens_bpe", "q_text_rolling_hash",
    "q_sample_split", "q_text_fingerprint",
    # twice-green (r01+r02), untouched, coverage-redundant
    "q_set_ops_all", "q_agg_cube", "q_agg_stats", "q_agg_pivot",
    "q_join_right", "q_join_full", "q_join_multiway", "q_join_cross",
    "q_scalar_map", "q_sort_nulls", "q_subquery_correlated",
    "q_window_lag",
    # evicted for the r05 additions' first driver rows: each
    # thrice-green with an in-cap sibling (see registry.py)
    "q_scalar_json", "q_agg_conditional", "q_window_distribution",
    "q_sort_limit", "q_agg_percentile", "q_join_outer", "q_dedup_lww",
    "q_sim_topk", "q_join_broadcast", "q_join_range",
    # once-green r04, evicted mid-r05 for the epoch-shuffle/length-
    # bucket first rows (in-cap siblings: q_dedup_incremental_fuzzy,
    # q_corpus_pipeline/q_pack_sequences)
    "q_dedup_incremental", "q_chunk_docs", "q_dedup_keep",
    "q_text_editdist", "q_sql_grouping_sets", "q_resample_locf",
    # rows-only by design: a driver row would add no oracle signal
    # beyond the local recall/tolerance tests
    "q_agg_approx_percentile",
    "q_agg_approx",
    "q_agg_hll_sketch",
}


def test_order_covers_registry_exactly():
    names = list(registry.all_queries().keys())
    assert names == list(registry.DRIVER_ORDER)
    assert len(names) == len(set(names))


def test_unverified_queries_inside_driver_cap():
    in_cap = set(registry.DRIVER_ORDER[: registry.DRIVER_CAP])
    missing = NEVER_DRIVER_CHECKED - in_cap
    assert not missing, f"never-driver-checked queries past the cap: {missing}"


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
