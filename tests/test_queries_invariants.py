

def test_drift_psi_nonnegative_and_flag_consistent(spark):
    """PSI is a sum of (p-q)·ln(p/q) terms, each >= 0, so psi >= 0
    identically; the flag must equal psi > 0.2 exactly."""
    from level2_to_cassandra_spark.registry import all_queries
    rows = all_queries()["q_drift_psi"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.psi >= 0.0
        assert r.drift_flag == (r.psi > 0.2)
        assert r.n_ref > 0 and r.n_cur > 0
