"""Central query registry.

Every engine capability that the driver harness checks is declared here
as a named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) an equivalent ANSI SQL string that DuckDB runs
as the correctness oracle.  ``__spark_entry__.py`` exposes this registry
verbatim.

Conventions (they keep the driver's order-insensitive value-hash
comparison honest):

* every computed/aggregate column is aliased IDENTICALLY in the Spark
  code and the oracle SQL;
* integer-sum results are cast to BIGINT on both sides (DuckDB SUM(int)
  is HUGEINT, Spark is LONG — casts make schemas agree);
* double aggregates are rounded to a fixed scale on both sides so
  summation-order float jitter cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

#: The driver harness verifies only the first ``DRIVER_CAP`` entries of
#: ``queries()`` (observed in rounds 1-2: CORRECTNESS_r0{1,2}.json each
#: contain exactly the first 50 registrations).  ``DRIVER_ORDER`` makes
#: the checked set an explicit, reviewed decision instead of an import
#: side effect.  Rotation policy (enforced mechanically by
#: tests/test_registry_order.py against the committed CORRECTNESS_r*
#: artifacts, so it cannot silently desync from history):
#:
#: * a query with NO lifetime driver-green row (new this round) is
#:   always in-cap — a first row outranks any confirmation;
#: * a query whose implementation or oracle CHANGED this round is
#:   in-cap to re-hash against the driver;
#: * the remaining slots go to the LONGEST-UNCONFIRMED names, so
#:   lifetime coverage accumulates where it is thinnest;
#: * everything past the cap holds >=2 lifetime driver-green rows and
#:   is still oracle-checked by the local replica harness
#:   (tests/test_queries_oracle.py) on every run — the tail loses only
#:   the per-round driver row.
DRIVER_CAP = 50

DRIVER_ORDER = (
    # ==================== in-cap (first 50) ============================
    # r09 ROTATION (VERDICT r08 task #4): every r07-cohort name is
    # r08-green with >=2 lifetime rows, so the whole cap rotates to the
    # 50 longest-unconfirmed names — the r02/r03/r04/r05 tails whose
    # last driver row is 4-7 rounds old — so lifetime coverage
    # accumulates where it is thinnest.  The local replica harness
    # (tests/test_queries_oracle.py) still oracle-checks all 130 every
    # run; the driver row is the extra, independent confirmation.
    # -- last driver-green r02 (7 rounds stale) -------------------------
    "q_agg_cube",
    "q_agg_pivot",
    "q_agg_stats",
    "q_join_cross",
    "q_join_full",
    "q_join_multiway",
    "q_join_right",
    "q_scalar_map",
    "q_set_ops_all",
    "q_sort_nulls",
    "q_subquery_correlated",
    "q_window_lag",
    # -- last driver-green r03 (6 rounds stale) -------------------------
    "q_agg_distinct",
    "q_agg_salted",
    "q_filter_predicates",
    "q_join_anti",
    "q_join_semi",
    "q_scalar_array",
    "q_scalar_math",
    "q_scalar_string",
    "q_set_ops",
    "q_window_rank",
    # -- last driver-green r04 (5 rounds stale) -------------------------
    "q_udf_pandas_cosine",
    "q_udtf_tokenize",
    "q_agg_conditional",
    "q_dedup_lww",
    "q_scalar_json",
    "q_agg_percentile",
    "q_agg_rollup",
    "q_join_broadcast",
    "q_join_outer",
    "q_join_range",
    # -- last driver-green r05 (4 rounds stale) -------------------------
    "q_agg_bitmap_distinct",
    "q_contamination",
    "q_curate_corpus",
    "q_dedup_cluster",
    "q_json_scan",
    "q_pack_sequences",
    "q_text_redact",
    "q_udaf_trimmed_mean",
    # -- NEW QUERY in r09: nearest-direction as-of join (pandas
    # merge_asof direction='nearest' parity; single-WindowExec dual
    # fill) — first driver row.  Slot freed by q_scan_project_filter
    # (x5 lifetime rows, the thickest r05 name; scan/pushdown
    # machinery carried in-cap by every other scan query) -------------
    "q_join_asof_nearest",
    # -- NEW QUERIES in r09: ordered string aggregation (LISTAGG
    # WITHIN GROUP parity via per-group struct-sorted collect_list)
    # and the sliding-window aggregate (overlapping-window twin of
    # q_time_bucket_agg) — first driver rows.  Slots freed by
    # q_text_stats / q_topk_per_group (x5 lifetime each; their
    # machinery stays in-cap via the other text gates and the
    # windowed-rank queries) -------------------------------------------
    "q_agg_string",
    "q_window_sliding",
    # -- NEW QUERY in r09: explicitly salted equi-join — the manual
    # skew tool for cases AQE's sort-merge splitting cannot reach;
    # oracle = the plain join.  Slot freed by q_sql_star_revenue
    # (x4 lifetime; star-join machinery carried in-cap by
    # q_join_broadcast/q_join_multiway, and it keeps its bench.py
    # HEADLINE row) ------------------------------------------------------
    "q_join_salted",
    # -- NEW QUERY in r09: per-node triangle counting with the
    # degree-ordered orientation (bounded wedge join) — first driver
    # row.  Slot freed by q_scalar_datetime (x4 lifetime; the
    # datetime scalar surface keeps q_scalar_* siblings past-cap
    # checked by the local replica every run) ---------------------------
    "q_graph_triangles",
    # -- NEW QUERY in r09: more-like-this sparse tf-idf retrieval
    # (query docs broadcast against the top-8 postings) — first
    # driver row.  Slot freed by q_window_range_frame (x2 but r05 —
    # the RANGE-frame machinery keeps its local replica check; thin
    # slots go to first rows first) -------------------------------------
    "q_text_more_like_this",
    # -- NEW QUERY in r09: MERGE INTO / CDC apply as one full-outer
    # join — first driver row.  Slot freed by q_window_distribution
    # (x4 lifetime; the distribution-window machinery keeps its local
    # replica check and q_window_ntile's r08 row) -----------------------
    "q_merge_upsert",
    # -- NEW QUERY in r09: per-label embedding centroids (posexplode +
    # one hash aggregate — the dense-vector agg scale shape) — first
    # driver row.  Slot freed by q_sort_limit (x4 lifetime; the
    # TakeOrderedAndProject machinery keeps q_sort_nulls in-cap and
    # its plan pin runs locally every time) -----------------------------
    "q_agg_vector_mean",
    # -- NEW QUERY in r09: k-hop BFS frontier sizes over the
    # sparsified supplier graph (shares q_graph_triangles' edge
    # build) — first driver row.  Slot freed by q_window_moving_avg
    # (x3 lifetime r04; the sliding-frame machinery keeps
    # q_window_range_frame's local check + q_window_sliding in-cap) ----
    "q_graph_khop",
    # -- TOUCHED in r09: the q_max_concurrency ORACLE gained (ts,
    # event_id) tie-ordering in its numbered CTE (ADVICE r07 low #2) —
    # the changed SQL must re-hash against the driver -------------------
    "q_max_concurrency",
    # ======================= past the cap ==============================
    # Everything below is driver-green with its last row in r05-r08
    # (the r07 cohort all confirmed in r08) and >=2 lifetime rows;
    # ordered stalest-first so the next rotation reads off the top.
    # (q_scan_project_filter rotated out late-r09 to fund the
    # q_join_asof_nearest first row — x5 lifetime, thickest r05 name.)
    "q_scalar_datetime",
    "q_window_moving_avg",
    "q_sort_limit",
    "q_window_distribution",
    "q_window_range_frame",
    "q_scan_project_filter",
    "q_sql_star_revenue",
    "q_text_stats",
    "q_topk_per_group",
    "q_chunk_docs",
    "q_classifier_score",
    "q_corpus_pipeline",
    "q_dedup_incremental",
    "q_dedup_keep",
    "q_event_transitions",
    "q_funnel",
    "q_length_buckets",
    "q_llm_dedup_simhash",
    "q_mixture_plan",
    "q_multimodal_features",
    "q_ohlc_bars",
    "q_resample_locf",
    "q_retention",
    "q_sample_split",
    "q_semdedup",
    "q_shuffle_epoch",
    "q_sim_ann_ivf",
    "q_sim_ann_lsh",
    "q_sim_ann_pq",
    "q_sql_grouping_sets",
    "q_text_bigram_lm",
    "q_text_editdist",
    "q_text_entropy",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_rolling_hash",
    "q_tokenize_ids",
    "q_vocab_coverage",
    "q_dedup_incremental_fuzzy",
    "q_text_tfidf",
    "q_agg_argmax",
    "q_agg_mode",
    "q_anomaly_zscore",
    "q_bm25",
    "q_cooccurrence_pmi",
    "q_drift_psi",
    "q_gap_islands",
    "q_hist_equiwidth",
    "q_join_asof_forward",
    "q_orc_scan",
    "q_pagerank",
    "q_quality_checks",
    "q_rollup_cascade",
    "q_scd2",
    "q_skew_profile",
    "q_snapshot_diff",
    "q_window_ntile",
    "q_window_running_distinct",
    "q_winsorize",
    "q_agg_approx",
    "q_agg_approx_percentile",
    "q_agg_hll_sketch",
    "q_csv_scan",
    "q_domain_cap",
    "q_embed_quantize",
    "q_join_asof_tolerance",
    "q_ngram_counts",
    "q_resample_interp",
    "q_sample_stratified",
    "q_sample_weighted",
    "q_sessionize",
    "q_text_repetition",
    "q_text_span_dedup",
    "q_time_bucket_agg",
    "q_token_histogram",
    "q_twap",
    "q_unpivot",
    "q_zorder",
    "q_sim_ann_ivfpq",
    "q_text_tokens_bpe",
    "q_sim_topk",
    "q_join_asof",
    "q_window_cumulative",
    "q_agg_basic",
    "q_join_inner",
    "q_llm_dedup_embed",
    "q_llm_dedup_exact",
    "q_llm_dedup_fuzzy",
    "q_llm_dedup_minhash",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Name → Query in ``DRIVER_ORDER``, importing all query modules on
    first use.  Raises if the registry and DRIVER_ORDER diverge, so a
    new query must be placed in the order deliberately (in-cap or out)
    rather than landing wherever module import order drops it."""
    _ensure_loaded()
    registered = set(_REGISTRY)
    ordered = set(DRIVER_ORDER)
    if registered != ordered:
        raise RuntimeError(
            "registry/DRIVER_ORDER mismatch: "
            f"unordered={sorted(registered - ordered)} "
            f"stale={sorted(ordered - registered)}"
        )
    return {name: _REGISTRY[name] for name in DRIVER_ORDER}


def query_fns() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    # Import for side effects: each module registers its queries.
    from level2_to_cassandra_spark.queries import (  # noqa: F401
        relational,
        scalars,
        windows,
        joins,
        llm,
        timeseries,
        traindata,
        graph,
    )

    _loaded = True
