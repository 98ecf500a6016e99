"""Tolerance check for approximate aggregates (no hash oracle is
possible across engines' different sketches)."""

from __future__ import annotations

from level2_to_cassandra_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    rows = all_queries()["q_agg_approx"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / max(
            r.exact_customers, 1
        )
        assert rel_err <= 0.05, (
            f"{r.o_orderstatus}: approx={r.approx_customers} "
            f"exact={r.exact_customers}"
        )


def test_hll_sketch_merge_within_error_bound(spark):
    rows = all_queries()["q_agg_hll_sketch"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / max(
            r.exact_customers, 1
        )
        # lgK=12 → standard error ≈ 1.04/√2¹² ≈ 1.6%; 5% is > 3σ
        assert rel_err <= 0.05, (
            f"{r.o_orderstatus}: approx={r.approx_customers} "
            f"exact={r.exact_customers}"
        )


def test_hll_union_tracks_one_pass_estimate(spark):
    """Merging per-month sketches must land within the sketch's own
    error band of a single one-pass sketch over all rows.  (Empirically
    the two are NOT bit-identical in Spark's DataSketches binding even
    at equal lgConfigK — the union gadget re-encodes through HLL_8
    while the direct aggregate finalizes as HLL_4, so estimates differ
    by ~1% — but both must stay within the lgK=12 error envelope for
    per-partition sketch + merge to be a safe 100 TB plan.)"""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table

    o = load_table(spark, SF, "orders")
    merged = {
        r.o_orderstatus: r.approx_customers
        for r in all_queries()["q_agg_hll_sketch"].fn(spark, SF).collect()
    }
    direct = {
        r.o_orderstatus: r.one_pass
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("o_custkey"), F.lit(12))
            ).alias("one_pass")
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for status, m in merged.items():
        d = direct[status]
        assert abs(m - d) / max(d, 1) <= 0.05, (status, m, d)


def test_approx_percentile_close_to_exact(spark):
    rows = all_queries()["q_agg_approx_percentile"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        for approx, exact in [
            (r.approx_p50, r.exact_p50), (r.approx_p95, r.exact_p95)
        ]:
            # GK with accuracy=10000 → rank error ≤ 1/10000; translate
            # loosely to a 1% value tolerance on this distribution
            assert abs(approx - exact) <= max(abs(exact) * 0.01, 1e-9), (
                r.l_returnflag, approx, exact,
            )
