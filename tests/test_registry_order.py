"""The driver harness verifies only the first ``DRIVER_CAP`` entries of
``queries()`` (rounds 1-2 each checked exactly the first 50 registered).
These tests pin the explicit ordering so the checked set stays a
deliberate decision: every query that has never had a driver oracle row
must sit inside the cap, and anything rotated past the cap must already
be driver-green in prior rounds AND coverage-redundant.
"""

from __future__ import annotations

from level2_to_cassandra_spark import registry

# Queries with no driver hash-green row through CORRECTNESS_r05, or
# whose oracle changed this round and must (re-)verify — must be inside
# the cap until a round records them green.
NEVER_DRIVER_CHECKED = {
    # former rows-only sketches that gained verifiable-projection
    # oracles in r06 (VERDICT r05 #1) — their first hash check is now
    "q_agg_approx", "q_agg_approx_percentile", "q_agg_hll_sketch",
    # brand-new in r06
    "q_sample_weighted",
    "q_zorder",
    "q_join_asof_tolerance",
    "q_twap",
    "q_csv_scan",
    "q_unpivot",
}

# Queries whose implementation was touched in r06 (ANN build/serve
# split + collect guards, tfidf regression fix) — must re-verify in-cap
# even though they are already driver-green.
TOUCHED_THIS_ROUND = {
    "q_sim_ann_ivfpq", "q_sim_ann_pq", "q_sim_ann_ivf", "q_text_tfidf",
}

# Driver-green in at least one prior round, each with an in-cap sibling
# covering the same SURVEY.md §2 row — may sit past the cap.
SAFE_TO_ROTATE_OUT = {
    # r05 first-rows that are also long-oracle-stable locally, plus the
    # r04+r05 twice-green cohort — evicted for the r06 rotation
    "q_resample_interp", "q_text_span_dedup", "q_domain_cap",
    "q_ngram_counts", "q_token_histogram", "q_embed_quantize",
    "q_sample_stratified", "q_text_repetition",
    "q_text_redact", "q_curate_corpus", "q_dedup_cluster",
    "q_pack_sequences", "q_contamination", "q_agg_bitmap_distinct",
    "q_udaf_trimmed_mean", "q_window_range_frame",
    # multi-round-green, rotated out in r04/r05
    "q_udf_pandas_cosine", "q_udtf_tokenize",
    "q_time_bucket_agg", "q_sessionize",
    "q_agg_rollup", "q_window_moving_avg",
    # thrice-green (r01+r02+r03), rotated out for r04
    "q_filter_predicates", "q_agg_distinct", "q_agg_salted",
    "q_set_ops", "q_scalar_string", "q_scalar_math", "q_scalar_array",
    "q_window_rank", "q_join_semi", "q_join_anti",
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
    # evicted for the r06 first rows: both 3-round-green with in-cap
    # sibling coverage
    "q_text_stats",
    "q_scalar_datetime",
    "q_topk_per_group",
    "q_sql_star_revenue",
    "q_scan_project_filter",
    "q_json_scan",
}


def test_order_covers_registry_exactly():
    names = list(registry.all_queries().keys())
    assert names == list(registry.DRIVER_ORDER)
    assert len(names) == len(set(names))


def test_unverified_queries_inside_driver_cap():
    in_cap = set(registry.DRIVER_ORDER[: registry.DRIVER_CAP])
    missing = (NEVER_DRIVER_CHECKED | TOUCHED_THIS_ROUND) - in_cap
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
