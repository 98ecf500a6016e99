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


def test_approx_percentile_close_to_exact(spark):
    rows = all_queries()["q_agg_approx_percentile"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        for approx, exact in zip(r.approx_p, r.exact_p):
            # GK with accuracy=10000 → rank error ≤ 1/10000; translate
            # loosely to a 1% value tolerance on this distribution
            assert abs(approx - exact) <= max(abs(exact) * 0.01, 1e-9), (
                r.l_returnflag, approx, exact,
            )
