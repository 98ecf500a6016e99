

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


def test_max_concurrency_matches_naive_global_sweep(spark):
    """The distributed two-phase sweep (per-day windows + day-level
    prefix offsets) must equal the textbook single-ordered-pass sweep
    computed driver-side — validating the decomposition algebra, not
    just engine-vs-engine agreement."""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    got = {
        r.day: (r.max_concurrent, r.n_starts, r.n_ends)
        for r in all_queries()["q_max_concurrency"].fn(spark, sf).collect()
    }

    # naive sweep: rebuild sessions (same 30-min gap rule) in pandas
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    boundaries = []
    for _, g in ev.groupby("user_id"):
        start = prev = None
        for t in g["ts"]:
            if prev is None or (t - prev).total_seconds() > 1800:
                if start is not None:
                    boundaries += [(start, 1), (prev, -1)]
                start = t
            prev = t
        boundaries += [(start, 1), (prev, -1)]
    boundaries.sort(key=lambda b: (b[0], b[1]))
    run, want = 0, {}
    for t, d in boundaries:
        run += d
        day = t.date()
        mx, ns, ne = want.get(day, (0, 0, 0))
        want[day] = (
            max(mx, run),
            ns + (d == 1),
            ne + (d == -1),
        )
    assert got == want


def test_rollup_partial_merge_exactness_randomized(spark):
    """The q_rollup_cascade claim — DECIMAL partials are EXACTLY
    mergeable under any grouping — checked on adversarial random data:
    full-precision random doubles (not the fixture's tame 2-dp
    values), re-aggregated through a deliberately skewed intermediate
    grouping, must reproduce the direct aggregate bit-for-bit."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(0xC45CADE)
    rows = [
        (i, rng.randrange(7), rng.uniform(-1e6, 1e6) * 10 ** rng.randrange(-3, 4))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, grp int, v double")
    dec = F.col("v").cast("decimal(38,6)")
    direct = {
        r.grp: (r.s, r.n)
        for r in df.groupBy("grp")
        .agg(F.sum(dec).alias("s"), F.count("*").alias("n"))
        .collect()
    }
    # skewed intermediate grouping: id % 13 buckets inside each grp
    partials = df.groupBy("grp", (F.col("id") % 13).alias("b")).agg(
        F.sum(dec).alias("ps"), F.count("*").alias("pn")
    )
    merged = {
        r.grp: (r.s, r.n)
        for r in partials.groupBy("grp")
        .agg(F.sum("ps").alias("s"), F.sum("pn").alias("n"))
        .collect()
    }
    assert merged == direct  # Decimal equality — exact, no tolerance


def test_winsorize_clip_laws(spark):
    """Winsorization laws: the clipped mean lies within the clip
    bounds' effect — |winsorized_mean| <= max(|lo|,|hi|) per group,
    n_clipped is (about) the outer 10% (two 5% tails of n, +-1 for
    interpolation at the boundary), and clipping never moves the mean
    AWAY from the raw mean's median-ward direction more than the raw
    spread allows (winsorized within [min raw, max raw])."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    res = {r.event_type: r
           for r in all_queries()["q_winsorize"].fn(spark, sf).collect()}
    raw = {
        r.event_type: r
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(res) == set(raw)
    for et, r in res.items():
        assert raw[et].lo <= r.winsorized_mean <= raw[et].hi
        assert raw[et].lo <= r.raw_mean <= raw[et].hi
        # two 5% tails; interpolated bounds admit at most ~1 extra per tail
        assert r.n_clipped <= int(0.1 * r.n) + 2
        assert r.n == raw[et].n


def test_max_concurrency_midnight_spanning_sessions(spark, tmp_path):
    """The decomposition's hardest case: sessions CROSSING midnight put
    their +1 and -1 boundaries in different day partitions, so day 2's
    true starting level is nonzero and comes entirely from the prefix
    offset.  Hand-built scenario: 3 users online 23:40-00:20 across
    midnight plus 1 day-2-only user; day 2's peak (4) exceeds day 2's
    within-day sweep max (which starts from 0) — only a correct offset
    can produce it."""
    import datetime as dt

    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.registry import all_queries

    base = dt.datetime(2024, 3, 1, 23, 40)
    rows = []
    eid = 0
    for u in (1, 2, 3):  # 23:40 -> 00:20, one event every 10 min
        for k in range(5):
            rows.append((eid, base + dt.timedelta(minutes=10 * k), u,
                         "view", 1.0, "{}"))
            eid += 1
    # user 4: day-2-only session 00:05 -> 00:12 (two events — a
    # SINGLE-event session is a zero-length [s, e) interval and counts
    # nothing under the pinned closes-before-opens tie-break; user 5
    # pins exactly that degenerate semantic below)
    rows.append((eid, dt.datetime(2024, 3, 2, 0, 5), 4, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, dt.datetime(2024, 3, 2, 0, 12), 4, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, dt.datetime(2024, 3, 2, 0, 7), 5, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf")
    import os
    os.makedirs(sf)
    df.write.parquet(f"{sf}/events.parquet")

    got = {str(r.day): (r.max_concurrent, r.n_starts, r.n_ends)
           for r in all_queries()["q_max_concurrency"].fn(spark, sf)
           .collect()}
    # day 1: users 1-3 all open by 23:40 -> peak 3; 3 starts, 0 ends.
    # day 2 starts at level 3 (the offset — its within-day sweep alone
    # peaks at +1): user 4's real session lifts the peak to 4; user
    # 5's zero-length session (close sorts before open at the same
    # instant) adds nothing.
    assert got == {
        "2024-03-01": (3, 3, 0),
        "2024-03-02": (4, 2, 5),
    }


def test_drift_psi_degenerate_constant_feature(spark, tmp_path):
    """A constant-valued group in the reference window (hi == lo) must
    not NaN-poison the binning: everything collapses into bin 0 and
    PSI reflects only the count imbalance, finite and >= 0."""
    import datetime as dt

    from level2_to_cassandra_spark.registry import all_queries

    rows = []
    for i in range(40):
        ts = dt.datetime(2024, 1, 2) if i < 20 else dt.datetime(2024, 1, 20)
        rows.append((i, ts, 1, "const", 7.0, "{}"))      # constant group
        rows.append((1000 + i, ts, 2, "vary", float(i), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    import os
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.write.parquet(f"{sf}/events.parquet")
    res = {r.event_type: r
           for r in all_queries()["q_drift_psi"].fn(spark, sf).collect()}
    import math
    for r in res.values():
        assert math.isfinite(r.psi) and r.psi >= 0.0
    assert res["const"].n_ref == 20 and res["const"].n_cur == 20


def test_mix_temperature_is_a_sqrt_damped_simplex(spark):
    """Temperature weights must (a) sum to 1 up to the rounding grain,
    (b) order exactly by source size, and (c) damp the head: every
    pairwise weight ratio equals the sqrt of the size ratio (within
    rounding), which is strictly closer to 1 than the raw proportion
    for unequal sources."""
    from level2_to_cassandra_spark.registry import all_queries

    rows = all_queries()["q_mix_temperature"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 1
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    by_n = sorted(rows, key=lambda r: (r.n_docs, r.source))
    weights = [r.weight for r in by_n]
    assert weights == sorted(weights)
    big, small = by_n[-1], by_n[0]
    if big.n_docs > small.n_docs:
        raw = big.n_docs / small.n_docs
        damped = big.weight / small.weight
        assert damped < raw  # temperature < 1 always damps
        assert abs(damped - (big.n_docs / small.n_docs) ** 0.5) < 1e-2
    for r in rows:
        assert abs(r.epoch_docs - r.weight * 100000) < 1.0


def test_hist_equiheight_bins_partition_each_key(spark):
    """Per key: bin counts must sum to the key's (non-NULL, non-NaN)
    row count, differ by at most one row (the NTILE guarantee), and
    the value ranges must be ordered (lo of tile t+1 >= hi of tile
    t — ties may straddle a boundary but never invert it)."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_hist_equiheight"].fn(spark, sf).collect()
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.event_type].append(r)
    assert set(by_key) == set(want)
    for key, bins in by_key.items():
        bins.sort(key=lambda r: r.tile)
        assert sum(b.cnt for b in bins) == want[key]
        sizes = [b.cnt for b in bins]
        assert max(sizes) - min(sizes) <= 1
        # NTILE's exact split: ceil-sized leading buckets
        n, k = want[key], len(bins)
        assert sizes == [
            math.ceil(n / k) if i < n % k else n // k for i in range(k)
        ] if n % k else [n // k] * k
        for prev, cur in zip(bins, bins[1:]):
            assert cur.lo >= prev.hi
            assert cur.lo >= prev.lo and cur.hi >= prev.hi


def test_rank_fusion_rrf_arithmetic_and_leg_union(spark):
    """The fused output must be internally consistent: rrf recomputes
    from its own rank columns (missing leg contributes 0 — full-outer,
    never inner), fused ranks are contiguous from 1 per query, rrf is
    non-increasing along them, and the fixture must exercise BOTH
    single-leg cases (a lexical-only and a vector-only survivor) or
    the full-outer semantics would be vacuously tested."""
    from collections import defaultdict

    from level2_to_cassandra_spark.registry import all_queries

    rows = all_queries()["q_rank_fusion"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    per_q = defaultdict(list)
    for r in rows:
        per_q[r.query_id].append(r)
        got = r.rrf
        want = (1.0 / (60 + r.lex_rank) if r.lex_rank is not None else 0.0) \
            + (1.0 / (60 + r.vec_rank) if r.vec_rank is not None else 0.0)
        # output is the FLOOR half-up rounding of the recomputation
        import math
        assert got == math.floor(want * 1e6 + 0.5) / 1e6
        assert r.lex_rank is not None or r.vec_rank is not None
    assert any(r.lex_rank is None for r in rows)
    assert any(r.vec_rank is None for r in rows)
    assert any(r.lex_rank is not None and r.vec_rank is not None
               for r in rows)
    for q, lst in per_q.items():
        lst.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in lst] == list(range(1, len(lst) + 1))
        assert all(a.rrf >= b.rrf for a, b in zip(lst, lst[1:]))
        assert len(lst) <= 10


def test_ann_recall_laws_and_index_quality(spark):
    """q_ann_recall must satisfy the recall laws — one row per query,
    n_exact = 10 (the fixture has >10 candidates per query),
    0 <= n_hits <= n_exact, recall = n_hits/n_exact at the rounded
    grain — and the evaluated IVF index must actually be good on the
    fixture (mean recall@10 >= 0.5, far above the ~0.02 random-baseline
    expectation), otherwise the metric is measuring a broken index."""
    from level2_to_cassandra_spark.registry import all_queries

    rows = all_queries()["q_ann_recall"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    assert {r.query_id for r in rows} == set(range(5))
    for r in rows:
        assert r.n_exact == 10
        assert 0 <= r.n_hits <= r.n_exact
        assert abs(r.recall - r.n_hits / r.n_exact) < 1e-9
    assert sum(r.recall for r in rows) / len(rows) >= 0.5


def test_ann_ndcg_laws(spark):
    """NDCG laws: the rearrangement inequality makes IDCG the maximum
    DCG any 10-list can score under the same gains, so dcg <= idcg and
    0 <= ndcg <= 1 up to the rounding grain; idcg > 0 on the fixture;
    ndcg recomputes from the emitted dcg/idcg.  (No implication is
    asserted between ndcg == 1 and recall == 1: a missed neighbor
    whose replacement ties at the rounded-4 cosine yields identical
    gains — equal DCG with recall < 1 is legitimate.)"""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_ann_ndcg"].fn(spark, sf).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.idcg > 0
        assert r.dcg <= r.idcg + 1e-6
        assert 0.0 <= r.ndcg <= 1.0 + 1e-6
        want = r.dcg / r.idcg
        assert abs(r.ndcg - want) < 1e-6
    # the fixture index is good: mean NDCG comfortably above random
    assert sum(r.ndcg for r in rows) / len(rows) >= 0.5


def test_window_ewma_normalization_laws(spark):
    """Truncated-EWMA laws: each key's FIRST row (by the query's
    (ts, event_id) order) has ewma == round(value, 6) (no lags exist,
    the normalization cancels); every ewma lies within the min/max of
    the window it averages (a convex combination); and on a constant
    series the ewma equals the constant exactly."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_window_ewma"].fn(spark, sf).collect()
    assert rows
    per_key = defaultdict(list)
    for r in rows:
        per_key[r.event_type].append(r)
    for key, lst in per_key.items():
        lst.sort(key=lambda r: (r.ts, r.event_id))
        assert abs(lst[0].ewma - round(lst[0].value, 6)) < 1e-9, key
        for i, r in enumerate(lst):
            window = [x.value for x in lst[max(0, i - 7): i + 1]]
            assert min(window) - 1e-6 <= r.ewma <= max(window) + 1e-6

    # constant series: ewma == the constant at every position
    const = spark.createDataFrame(
        [(i, "k", float(i), 7.5) for i in range(20)],
        "event_id long, event_type string, tsd double, value double",
    ).select("event_id", "event_type",
             F.col("tsd").cast("timestamp").alias("ts"), "value")
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        const.write.parquet(os.path.join(d, "events.parquet"))
        got = all_queries()["q_window_ewma"].fn(spark, d).collect()
    assert got and all(r.ewma == 7.5 for r in got)


def test_graph_lpa_matches_brute_force_supersteps(spark):
    """q_graph_lpa must equal a driver-side reimplementation of the
    exact spec — 3 synchronous supersteps of neighbor-majority
    relabeling with smallest-label ties, starting from self-labels —
    over the same staged edge list, validating the relational lowering
    (join + count + argmax window) against the textbook loop, not just
    engine-vs-engine agreement."""
    from collections import Counter, defaultdict

    from level2_to_cassandra_spark.queries.graph import (
        _sparsified_supplier_edges,
    )
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    edges = [(r.a, r.b)
             for r in _sparsified_supplier_edges(spark, sf).collect()]
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in nbrs}
    for _ in range(3):
        nxt = {}
        for v, ns in nbrs.items():
            c = Counter(lab[n] for n in ns)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            nxt[v] = best
        lab = nxt
    sizes = Counter(lab.values())
    want = {v: (lab[v], sizes[lab[v]]) for v in lab}

    got = {
        r.node: (r.community_id, r.community_size)
        for r in all_queries()["q_graph_lpa"].fn(spark, sf).collect()
    }
    assert got == want
    # non-degenerate: communities exist and at least one is non-trivial
    assert len(set(l for l, _ in got.values())) > 1
    assert max(s for _, s in got.values()) > 1


def test_drift_ks_matches_brute_force_cdf_sup(spark):
    """q_drift_ks must equal the textbook statistic computed
    driver-side: for each key, D = max over observed values of
    |F_ref(v) - F_cur(v)| with F the empirical CDF over that side's
    (non-NULL, non-NaN) values — validating the distinct-value-grid
    lowering, not just engine-vs-engine agreement.  Plus the KS laws:
    0 <= ks <= 1 and flag == (ks > 0.1)."""
    import datetime as dt
    from collections import defaultdict

    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select("event_type", "value", "ts")
        .collect()
    )
    cut = dt.datetime(2024, 1, 16)
    per = defaultdict(lambda: ([], []))
    for r in rows:
        per[r.event_type][0 if r.ts < cut else 1].append(r.value)
    want = {}
    for key, (ref, cur) in per.items():
        if not ref or not cur:
            continue
        grid = sorted(set(ref) | set(cur))
        sr, sc = sorted(ref), sorted(cur)
        import bisect
        d = max(
            abs(bisect.bisect_right(sr, v) / len(sr)
                - bisect.bisect_right(sc, v) / len(sc))
            for v in grid
        )
        want[key] = (len(ref), len(cur), round(d, 6))

    got = {
        r.event_type: (r.n_ref, r.n_cur, r.ks)
        for r in all_queries()["q_drift_ks"].fn(spark, sf).collect()
    }
    assert set(got) == set(want)
    for key, (nr, nc, d) in want.items():
        gnr, gnc, gks = got[key]
        assert (gnr, gnc) == (nr, nc), key
        assert abs(gks - d) < 1e-9, key
        assert 0.0 <= gks <= 1.0
    flags = {r.event_type: r.drift_flag
             for r in all_queries()["q_drift_ks"].fn(spark, sf).collect()}
    for key, (_, _, d) in want.items():
        assert flags[key] == (got[key][2] > 0.1)


def test_graph_modularity_laws_and_brute_force(spark):
    """q_graph_modularity: per-community integers must satisfy the
    graph identities (Σ intra_edges <= m, Σ degree_sum == 2m, sizes
    sum to |V|), Q = Σ q_contrib must live in [-0.5, 1), and every
    column must equal an independent driver-side recomputation from
    the staged edge relation + the registered LPA labels."""
    from collections import defaultdict

    from level2_to_cassandra_spark.queries.graph import (
        _lpa_labels,
        _sparsified_supplier_edges,
    )
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    edges = [(r.a, r.b) for r in
             _sparsified_supplier_edges(spark, sf).collect()]
    lab = {r.node: r.lab for r in _lpa_labels(spark, sf).collect()}
    m = len(edges)
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    want = defaultdict(lambda: [0, 0, 0])  # size, intra, degsum
    for node, c in lab.items():
        want[c][0] += 1
        want[c][2] += deg[node]
    for a, b in edges:
        if lab[a] == lab[b]:
            want[lab[a]][1] += 1

    rows = all_queries()["q_graph_modularity"].fn(spark, sf).collect()
    assert rows
    got = {r.community_id: r for r in rows}
    assert set(got) == set(want)
    q_total = 0.0
    for c, (size, intra, dsum) in want.items():
        r = got[c]
        assert (r.community_size, r.intra_edges, r.degree_sum) == (
            size, intra, dsum
        ), c
        expect = intra / m - (dsum / (2.0 * m)) ** 2
        assert abs(r.q_contrib - expect) < 1e-6, c
        q_total += r.q_contrib
    assert sum(v[1] for v in want.values()) <= m
    assert sum(v[2] for v in want.values()) == 2 * m
    assert sum(v[0] for v in want.values()) == len(lab)
    assert -0.5 <= q_total < 1.0


def test_quality_gopher_gate_consistency(spark):
    """q_quality_gopher: the composite gate must equal the conjunction
    of its own emitted (rounded) metrics, ratios must sit in their
    ranges, and on the clean fixture text a non-trivial share of docs
    must pass (the rules are gates, not a constant)."""
    from level2_to_cassandra_spark.registry import all_queries

    rows = all_queries()["q_quality_gopher"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    n_pass = 0
    for r in rows:
        assert 0.0 <= r.alpha_frac <= 1.0
        assert r.symbol_ratio >= 0.0
        assert r.n_words >= 1
        want = int(
            50 <= r.n_words <= 100000
            and 3 <= r.mean_word_len <= 10
            and r.alpha_frac >= 0.8
            and r.symbol_ratio <= 0.1
        )
        assert r.pass_gopher == want
        n_pass += want
    assert 0 < n_pass  # fixture text is words — some docs must pass


def test_data_profile_matches_duckdb_battery(spark):
    """q_data_profile: every statistic must equal an independent
    DuckDB recomputation per column (not just the generated oracle —
    independent SQL), and the internal identities must hold
    (n_nulls <= n_rows, n_distinct <= n_rows - n_nulls, min <= max,
    mean within [min, max])."""
    import duckdb

    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_data_profile"].fn(spark, sf).collect()
    assert len(rows) == 4
    con = duckdb.connect()
    for r in rows:
        c = r.column_name
        n, nulls, nd, mn, mx = con.execute(
            f"SELECT COUNT(*), SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 "
            f"END), COUNT(DISTINCT {c}), MIN({c}), MAX({c}) "
            f"FROM '{sf}/lineitem.parquet'"
        ).fetchone()
        assert r.n_rows == n and r.n_nulls == (nulls or 0)
        assert r.n_distinct == nd
        assert r.min_value == mn and r.max_value == mx
        assert r.n_distinct <= r.n_rows - r.n_nulls
        assert r.min_value <= r.mean_value <= r.max_value


def test_outlier_iqr_rows_are_exactly_the_fence_breaches(spark):
    """q_outlier_iqr: the emitted rows must be exactly the rows whose
    rounded value breaches the rounded fence computed driver-side from
    exact interpolated quartiles, with the right side labels."""
    from collections import defaultdict

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select("event_id", "event_type", "value")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append(r)

    def quantile(sorted_vals, q):
        # linear interpolation (quantile_cont / Spark percentile)
        pos = (len(sorted_vals) - 1) * q
        lo, hi = int(pos), min(int(pos) + 1, len(sorted_vals) - 1)
        frac = pos - int(pos)
        return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac

    want = {}
    for key, rs in per.items():
        vals = sorted(r.value for r in rs)
        q1, q3 = quantile(vals, 0.25), quantile(vals, 0.75)
        lo = round(q1 - 1.5 * (q3 - q1), 6)
        hi = round(q3 + 1.5 * (q3 - q1), 6)
        for r in rs:
            rv = round(r.value, 6)
            if rv < lo or rv > hi:
                want[r.event_id] = (key, "low" if rv < lo else "high")

    got = {
        r.event_id: (r.event_type, r.side)
        for r in all_queries()["q_outlier_iqr"].fn(spark, sf).collect()
    }
    assert got == want and got


def test_robust_scale_laws(spark):
    """q_robust_scale: scaling is 1:1 with the filtered scan, the
    median row of each key scales to ~0, and the transform preserves
    order within a key (monotone affine map when MAD > 0)."""
    from collections import defaultdict

    from level2_to_cassandra_spark.registry import all_queries

    rows = all_queries()["q_robust_scale"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        per[r.event_type].append(r)
    for key, rs in per.items():
        zs = [r.robust_z for r in rs]
        if any(z is None for z in zs):
            # MAD 0 — the whole key degenerates to NULL, never a mix
            assert all(z is None for z in zs), key
            continue
        by_value = sorted(rs, key=lambda r: r.value)
        z_sorted = [r.robust_z for r in by_value]
        assert z_sorted == sorted(z_sorted), key  # monotone
        n_neg = sum(1 for z in zs if z < 0)
        n_pos = sum(1 for z in zs if z > 0)
        # median-centering: each side holds at most half the rows
        assert n_neg <= len(zs) / 2 + 1 and n_pos <= len(zs) / 2 + 1


def test_agg_decayed_laws(spark):
    """q_agg_decayed: the decayed weight sum is bounded by the row
    count (each weight <= 1) and positive (the anchor-day rows weigh
    exactly 1); an all-same-day key would make decayed_weight == n."""
    from level2_to_cassandra_spark.registry import all_queries

    rows = all_queries()["q_agg_decayed"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 < r.decayed_weight <= r.n


def test_text_novelty_laws(spark):
    """q_text_novelty: the first (lowest-id) shingled doc scores
    exactly 1.0, Σ n_novel == |distinct corpus shingles|, every
    novelty sits in [0, 1], and n_novel <= n_shingles per doc."""
    from level2_to_cassandra_spark.queries.llm import _shingle_relation
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_text_novelty"].fn(spark, sf).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0 and first.n_novel == first.n_shingles
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert 0 <= r.n_novel <= r.n_shingles
    n_distinct_shingles = (
        _shingle_relation(spark, sf).select("shingle").distinct().count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct_shingles


def test_sample_reservoir_exact_k_per_stratum(spark):
    """q_sample_reservoir: exactly min(K, |stratum|) rows per lang,
    ranks are 1..k dense, and the draw is REPRODUCIBLE (two runs pick
    the identical doc set — the hash-rank discipline's whole point)."""
    from collections import Counter

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.queries.traindata import _RESERVOIR_K
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_sample_reservoir"].fn(spark, sf).collect()
    strata = Counter(
        r.lang for r in load_table(spark, sf, "documents")
        .select("lang").collect()
    )
    got = Counter(r.lang for r in rows)
    assert got == {
        lang: min(_RESERVOIR_K, n) for lang, n in strata.items()
    }
    for lang in got:
        rks = sorted(r.rk for r in rows if r.lang == lang)
        assert rks == list(range(1, got[lang] + 1))
    again = all_queries()["q_sample_reservoir"].fn(spark, sf).collect()
    assert {(r.lang, r.doc_id) for r in again} == {
        (r.lang, r.doc_id) for r in rows
    }


def test_dedup_lines_crafted_corpus_exact(spark, tmp_path):
    """q_dedup_lines on a hand-computed corpus: cross-doc duplicate
    lines keep only the first occurrence, WITHIN-doc repeats keep only
    the first, surviving lines reassemble in original order, and a doc
    made entirely of seen lines emits the empty string."""
    from level2_to_cassandra_spark.registry import all_queries

    la = "a b c d e f g h"          # 8 tokens = one line
    lb = "i j k l m n o p"
    lc = "q r s t u v w x"
    docs = [
        (0, f"{la} {lb}"),           # both novel
        (1, f"{lb} {lc} {lb}"),      # lb seen; lc novel; lb repeat
        (2, f"{la} {lb}"),           # all seen -> empty
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(path)
    rows = {
        r.doc_id: r
        for r in all_queries()["q_dedup_lines"].fn(spark, str(tmp_path))
        .collect()
    }
    assert rows[0].n_lines == 2 and rows[0].n_kept == 2
    assert rows[0].kept_text == f"{la} {lb}"
    assert rows[1].n_lines == 3 and rows[1].n_kept == 1
    assert rows[1].kept_text == lc          # order-preserving survivor
    assert rows[2].n_lines == 2 and rows[2].n_kept == 0
    assert rows[2].kept_text == ""


def test_null_text_both_engines_repetition_and_vote(spark, tmp_path):
    """Review r16: the fixtures carry no NULL-text docs, so the
    NULL-text arms of q_text_repetition and q_quality_vote were never
    hash-exercised — and the repetition oracle's bare COALESCE
    silently diverged from Spark's NULL propagation.  This crafts a
    corpus WITH a NULL-text doc and runs the driver-strict compare on
    both queries: NULL text must yield NULL repetition metrics and a
    zero-vote reject, identically on both engines."""
    import duckdb

    from level2_to_cassandra_spark.registry import all_queries
    from tests.oracle_harness import compare

    body = " ".join(f"w{i % 7}" for i in range(60))  # passes gates
    rows = [(1, body, "en", "src", len(body)),
            (2, None, "en", "src", 0),
            (3, "tiny text", "en", "src", 9)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    for name in ("q_text_repetition", "q_quality_vote"):
        q = all_queries()[name]
        compare(q.fn(spark, str(tmp_path)), con, q.oracle)
    vote = {r.doc_id: r
            for r in all_queries()["q_quality_vote"]
            .fn(spark, str(tmp_path)).collect()}
    assert vote[2].votes == 0 and vote[2].admit == 0
    rep = {r.doc_id: r
           for r in all_queries()["q_text_repetition"]
           .fn(spark, str(tmp_path)).collect()}
    assert rep[2].dup_1gram is None and rep[2].dup_3gram is None


def test_quality_vote_members_consistent(spark):
    """q_quality_vote's three bits must equal the standalone member
    derivations (shared transforms — bit-for-bit), and votes/admit
    must satisfy the integer vote law."""
    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.queries.traindata import (
        _VOTE_REP_MAX,
        _calib_lab,
    )
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    vote = {r.doc_id: r
            for r in all_queries()["q_quality_vote"].fn(spark, sf)
            .collect()}
    gopher = {r.doc_id: r.pass_gopher
              for r in all_queries()["q_quality_gopher"].fn(spark, sf)
              .collect()}
    rep = {r.doc_id: r.dup_3gram
           for r in all_queries()["q_text_repetition"].fn(spark, sf)
           .collect()}
    lab = {r.doc_id: r.score
           for r in _calib_lab(
               load_table(spark, sf, "documents"), keep=("doc_id",)
           ).collect()}
    assert set(vote) == set(gopher)
    for d, r in vote.items():
        assert r.pass_gopher == gopher[d]
        want_rep = 1 if (rep[d] is not None
                         and rep[d] <= _VOTE_REP_MAX) else 0
        assert r.pass_repetition == want_rep
        want_cls = 1 if (lab[d] is not None and lab[d] >= 0) else 0
        assert r.pass_classifier == want_cls
        assert r.votes == (r.pass_gopher + r.pass_classifier
                           + r.pass_repetition)
        assert r.admit == (1 if r.votes >= 2 else 0)


def test_select_budget_is_maximal_quality_prefix(spark):
    """q_select_budget must emit EXACTLY the maximal prefix of the
    (score DESC, doc_id) order whose cumulative token count fits
    ⌊total/4⌋ — recomputed independently in Python."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.traindata import (
        _BUDGET_DENOM,
        _calib_lab,
    )
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: r
           for r in all_queries()["q_select_budget"].fn(spark, sf)
           .collect()}
    docs = load_table(spark, sf, "documents").where(
        F.col("text").isNotNull()
    )
    rows = _calib_lab(docs, keep=("doc_id",)).join(
        docs.select(
            "doc_id", F.size(text.tokens("text")).alias("n")
        ),
        "doc_id",
    ).select("doc_id", "score", "n").collect()
    order = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    budget = sum(r.n for r in rows) // _BUDGET_DENOM
    cum, want = 0, {}
    for r in order:
        if cum + r.n > budget:
            break  # prefix ends at the first overflow
        cum += r.n
        want[r.doc_id] = cum
    assert {d: r.cum_tokens for d, r in got.items()} == want


def test_frontier_interleave_politeness_laws(spark):
    """crawl_pos must be the 1..N permutation of the deduped frontier
    in (host_rank, host, doc_id) order — host_rank non-decreasing
    along the crawl, every host's rank-r URL before any host's
    rank-(r+1), FIFO (doc_id order) within each host."""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_frontier_interleave"].fn(spark, sf).collect()
    assert rows
    assert sorted(r.crawl_pos for r in rows) == list(
        range(1, len(rows) + 1)
    )
    naive = sorted(rows, key=lambda r: (r.host_rank, r.host, r.doc_id))
    assert [r.crawl_pos for r in naive] == list(range(1, len(rows) + 1))
    by_host: dict = {}
    for r in sorted(rows, key=lambda r: r.host_rank):
        by_host.setdefault(r.host, []).append(r.doc_id)
    for docs_in_host in by_host.values():
        assert docs_in_host == sorted(docs_in_host)  # FIFO per host


def test_mix_interleave_stride_laws(spark):
    """pos must be the 1..N permutation of the stride-key order
    (Python recompute), FIFO within each source, and every prefix
    must hold each source's √n_s-proportional share to within the
    stride-scheduling lag bound (±1 appearance per source)."""
    import math

    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_mix_interleave"].fn(spark, sf).collect()
    assert sorted(r.pos for r in rows) == list(range(1, len(rows) + 1))
    # independent recompute of the total order
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    n = {s: len(v) for s, v in by_src.items()}
    want = sorted(
        rows,
        key=lambda r: (r.src_rank / math.sqrt(n[r.source]),
                       r.source, r.doc_id),
    )
    assert [r.pos for r in want] == list(range(1, len(rows) + 1))
    for s, v in by_src.items():          # FIFO within source
        v = sorted(v, key=lambda r: r.src_rank)
        assert [x.doc_id for x in v] == sorted(x.doc_id for x in v)
        assert [x.src_rank for x in v] == list(range(1, len(v) + 1))
    # prefix proportionality: source s's k-th appearance sits at key
    # k/√n_s; in the prefix up to global key K it appears
    # floor(K·√n_s) (±1 for ties) times — check at each quartile
    wsum = sum(math.sqrt(x) for x in n.values())
    N = len(rows)
    order = sorted(rows, key=lambda r: r.pos)
    for frac in (0.25, 0.5, 0.75):
        P = int(N * frac)
        prefix = order[:P]
        for s in n:
            got = sum(1 for r in prefix if r.source == s)
            expected = P * math.sqrt(n[s]) / wsum
            assert abs(got - expected) <= 2, (s, got, expected)


def test_label_agreement_kappa_laws(spark):
    """Each pair's cells must refold exactly from q_quality_vote's
    per-doc gate bits, cells must partition the corpus, and kappa
    must equal the exact-rational Cohen formula recomputed in Python
    (Fraction — no float in the check), half-up rounded at 6."""
    from fractions import Fraction

    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    votes = all_queries()["q_quality_vote"].fn(spark, sf).collect()
    rows = {r.pair: r
            for r in all_queries()["q_label_agreement"].fn(spark, sf)
            .collect()}
    assert len(rows) == 3
    n_docs = len(votes)
    for pair, r in rows.items():
        a, b = pair.split("|")
        cells = {(1, 1): 0, (1, 0): 0, (0, 1): 0, (0, 0): 0}
        for v in votes:
            cells[(v[a], v[b])] += 1
        assert (r.n11, r.n10, r.n01, r.n00) == (
            cells[(1, 1)], cells[(1, 0)], cells[(0, 1)], cells[(0, 0)]
        )
        assert r.n11 + r.n10 + r.n01 + r.n00 == n_docs
        chance = (r.n11 + r.n10) * (r.n11 + r.n01) + (
            (r.n01 + r.n00) * (r.n10 + r.n00)
        )
        denom = n_docs * n_docs - chance
        if denom == 0:
            assert r.kappa is None
        else:
            k = Fraction(n_docs * (r.n11 + r.n00) - chance, denom)
            # FLOOR-form half-up round at 6 on the exact rational
            want = (k * 10**6 + Fraction(1, 2)).__floor__() / 10**6
            assert abs(r.kappa - want) < 1e-12, (pair, r.kappa, want)
        # kappa bounded: p_o, p_e in [0,1] => kappa <= 1
        if r.kappa is not None:
            assert r.kappa <= 1.0


def test_eval_auc_matches_bruteforce_pairs(spark):
    """Per-language AUC must equal the brute-force pairwise
    Mann–Whitney recount over the shared scored relation (ties credit
    1/2 — counted in exact half-units, no float), and the grid
    machinery must agree with a direct per-row recompute of P and
    N."""
    from fractions import Fraction

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.queries.traindata import _calib_lab
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    lab = [
        (r.lang, r.score, r.label)
        for r in _calib_lab(
            load_table(spark, sf, "documents"), keep=("lang",)
        ).collect()
        if r.score is not None
    ]
    got = {r.lang: r
           for r in all_queries()["q_eval_auc"].fn(spark, sf).collect()}
    langs = {l for l, _, _ in lab}
    assert set(got) == langs
    for lang in langs:
        pos = [s for l, s, y in lab if l == lang and y == 1]
        neg = [s for l, s, y in lab if l == lang and y == 0]
        r = got[lang]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        if not pos or not neg:
            assert r.auc is None
            continue
        num2 = sum(
            2 if p > q else (1 if p == q else 0)
            for p in pos for q in neg
        )
        want = Fraction(num2, 2 * len(pos) * len(neg))
        rounded = (want * 10**6 + Fraction(1, 2)).__floor__() / 10**6
        assert abs(r.auc - rounded) < 1e-12, (lang, r.auc, rounded)
        assert 0.0 <= r.auc <= 1.0


def test_dedup_cross_source_folds_fuzzy_pairs(spark):
    """The matrix must be exactly the (unordered source pair) fold of
    q_llm_dedup_fuzzy's pair relation: cell counts refold from the
    collected pairs + a doc_id→source map, n_pairs sums to the pair
    count, and each cell's avg_jaccard equals the integer-millionths
    mean of its member pairs."""
    from fractions import Fraction

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    pairs = all_queries()["q_llm_dedup_fuzzy"].fn(spark, sf).collect()
    assert pairs, "fixture must contain near-dup pairs"
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf, "documents")
        .select("doc_id", "source").collect()
    }
    want: dict = {}
    for p in pairs:
        lo, hi = sorted((src[p.id_a], src[p.id_b]))
        ju = round(Fraction(p.jaccard).limit_denominator(10**9) * 10**6)
        want.setdefault((lo, hi), []).append(int(ju))
    got = {
        (r.src_lo, r.src_hi): r
        for r in all_queries()["q_dedup_cross_source"].fn(spark, sf)
        .collect()
    }
    assert set(got) == set(want)
    assert sum(r.n_pairs for r in got.values()) == len(pairs)
    for cell, jus in want.items():
        r = got[cell]
        assert r.n_pairs == len(jus)
        mean = Fraction(sum(jus), 10**6 * len(jus))
        rounded = (mean * 10**6 + Fraction(1, 2)).__floor__() / 10**6
        assert abs(r.avg_jaccard - rounded) < 1e-12


def test_shard_balance_block_deal_laws(spark):
    """Contiguous-block dealing of a stride-scheduled order: shard
    TOTAL sizes are exactly ⌊N/8⌋ or ⌈N/8⌉, each shard's positions
    are one contiguous global range (block deal — last_pos of shard
    k < first_pos of shard k+1 across all of k's cells), cells
    refold exactly from q_mix_interleave's output, and for every
    source the per-shard doc counts differ by at most 2 across the
    8 shards (two prefix lag bounds — the mixture-inheritance law
    the modulus deal provably VIOLATES on this fixture: equal-weight
    sources have stride #sources, resonating with world 8)."""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    order = all_queries()["q_mix_interleave"].fn(spark, sf).collect()
    cells = all_queries()["q_shard_balance"].fn(spark, sf).collect()
    n = len(order)
    assert sum(c.n_docs for c in cells) == n
    want: dict = {}
    for r in order:
        key = ((r.pos - 1) * 8 // n, r.source)
        lo, hi, cnt = want.get(key, (10**9, -1, 0))
        want[key] = (min(lo, r.pos), max(hi, r.pos), cnt + 1)
    assert {
        (c.shard, c.source): (c.first_pos, c.last_pos, c.n_docs)
        for c in cells
    } == want
    shard_tot: dict = {}
    shard_span: dict = {}
    by_source: dict = {}
    for c in cells:
        shard_tot[c.shard] = shard_tot.get(c.shard, 0) + c.n_docs
        lo, hi = shard_span.get(c.shard, (10**9, -1))
        shard_span[c.shard] = (min(lo, c.first_pos),
                               max(hi, c.last_pos))
        by_source.setdefault(c.source, {})[c.shard] = c.n_docs
    assert set(shard_tot) == set(range(8))
    assert all(t in (n // 8, n // 8 + 1) for t in shard_tot.values())
    for k in range(7):          # contiguity: blocks do not interleave
        assert shard_span[k][1] < shard_span[k + 1][0]
    for source, per_shard in by_source.items():
        counts = [per_shard.get(s, 0) for s in range(8)]
        assert max(counts) - min(counts) <= 2, (source, counts)


def test_packed_line_key_overflow_raises(spark):
    """ADVICE r15: a line_no at or beyond LINE_KEY_SPAN would alias
    the packed first-occurrence key into the next doc_id's range and
    silently mis-attribute first occurrence — the shared key
    expression must RAISE instead (and stay exact below the span)."""
    import pytest

    from level2_to_cassandra_spark.operators import text

    ok = spark.createDataFrame(
        [(7, text.LINE_KEY_SPAN - 1)], "doc_id long, line_no long"
    ).select(text.packed_line_key().alias("k")).collect()
    assert ok[0].k == 7 * text.LINE_KEY_SPAN + text.LINE_KEY_SPAN - 1
    bad = spark.createDataFrame(
        [(7, text.LINE_KEY_SPAN)], "doc_id long, line_no long"
    ).select(text.packed_line_key().alias("k"))
    with pytest.raises(Exception, match="LINE_KEY_SPAN"):
        bad.collect()


def test_dedup_lines_fixture_conservation(spark):
    """On the fixture corpus: every doc keeps <= its line count, the
    kept total equals the number of DISTINCT corpus lines (each
    distinct line survives exactly once), and the lowest-id doc keeps
    exactly its internally-distinct lines."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.llm import _LINE_W
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_dedup_lines"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_lines
    w = text.tokens("text")
    lines = (
        load_table(spark, sf, "documents")
        .select(
            "doc_id", "text",
            F.posexplode(
                F.sequence(F.lit(1), F.size(w), F.lit(_LINE_W))
            ).alias("line_no", "start"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.slice(text.tokens("text"), F.col("start"), _LINE_W), " "
            ).alias("line_text"),
        )
    )
    assert sum(r.n_kept for r in rows) == (
        lines.select("line_text").distinct().count()
    )
    # the lowest-id doc sees an empty prior corpus, so it keeps exactly
    # its internally-distinct lines (a within-doc repeat still drops)
    first = min(rows, key=lambda r: r.doc_id)
    first_distinct = (
        lines.where(F.col("doc_id") == first.doc_id)
        .select("line_text").distinct().count()
    )
    assert first.n_kept == first_distinct


def test_rollup_quantile_bounds_and_merge_laws(spark):
    """q_rollup_quantile: every containment flag holds on the fixture
    (the partial-derived bounds bracket the exact quantile), bounds
    are ordered (lo <= hi, p50_hi <= p95_hi), n conserves the raw row
    count, and the bounds are genuine DATA values (inside the hour's
    raw [min, max])."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_rollup_quantile"].fn(spark, sf).collect()
    assert rows
    ev = load_table(spark, sf, "events")
    raw = {
        (r.hour, r.event_type): r
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        ).collect()
    }
    assert sum(r.n for r in rows) == ev.count()
    for r in rows:
        assert r.p50_within and r.p95_within
        assert r.p50_lo <= r.p50_hi <= r.p95_hi
        assert r.p95_lo <= r.p95_hi
        g = raw[(r.hour, r.event_type)]
        assert r.n == g.n
        for b in (r.p50_lo, r.p50_hi, r.p95_lo, r.p95_hi):
            assert g.lo <= b <= g.hi


def test_rollup_quantile_partials_merge_under_any_grouping(spark):
    """The mergeability claim itself: the hour-level grid histogram
    re-aggregated from MINUTELY partials is identical to the grid
    computed straight from raw rows — counts, per-bin mins and maxes
    (exact equality; min/max/sum of longs never float)."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.queries.timeseries import (
        _QGRID_BINS, _QGRID_W,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("ts", "event_type", "value")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / _QGRID_W), F.lit(0)),
        F.lit(_QGRID_BINS - 1),
    ).cast("long")
    direct = {
        (r.hour, r.event_type, r.bin): (r.nb, r.bmin, r.bmax)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type", bin_.alias("bin"),
        ).agg(
            F.count(F.lit(1)).alias("nb"),
            F.min("value").alias("bmin"),
            F.max("value").alias("bmax"),
        ).collect()
    }
    partials = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute"),
        "event_type", bin_.alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    merged = {
        (r.hour, r.event_type, r.bin): (r.nb, r.bmin, r.bmax)
        for r in partials.groupBy(
            F.date_trunc("hour", "minute").alias("hour"),
            "event_type", "bin",
        ).agg(
            F.sum("pn").alias("nb"),
            F.min("vmin").alias("bmin"),
            F.max("vmax").alias("bmax"),
        ).collect()
    }
    assert merged == direct


def test_classifier_calibration_fold_arithmetic(spark):
    """q_classifier_calibration: bin ids are in 0..9, Σn conserves the
    corpus, frac_pos/mean_p are probabilities, every |gap| re-derives
    from the row's own rounded columns, and the ECE column is constant
    and equals the integer-exact fold of the per-bin rows."""
    import math

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_classifier_calibration"].fn(spark, sf).collect()
    assert rows
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    assert len({r.ece for r in rows}) == 1
    num = den = 0
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.frac_pos <= 1.0
        assert 0.0 < r.mean_p < 1.0
        assert -1.0 <= r.mean_score <= 1.0
        gap = math.floor(abs(r.frac_pos - r.mean_p) * 10000 + 0.5) / 10000
        assert r.abs_gap == gap
        num += r.n * int(math.floor(gap * 10000 + 0.5))
        den += r.n
    ece = math.floor(num / (den * 10000) * 1000000 + 0.5) / 1000000
    assert rows[0].ece == ece


def test_classifier_threshold_curve_laws(spark):
    """q_classifier_threshold: all 10 threshold rows exist, counts are
    non-increasing suffix sums consistent with the calibration's bins,
    recall is monotone non-increasing in t, recall(t=0) == 1, precision
    re-derives from the row's own integers (NULL exactly when nothing
    is predicted positive), and F1 equals the 2tp/(pred+total)
    identity."""
    import math

    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        all_queries()["q_classifier_threshold"].fn(spark, sf).collect(),
        key=lambda r: r.t,
    )
    assert [r.t for r in rows] == list(range(10))
    calib = all_queries()["q_classifier_calibration"].fn(spark, sf).collect()
    n_by_bin = {r.bin: r.n for r in calib}
    total = sum(n_by_bin.values())
    total_pos = rows[0].tp  # t=0 predicts everything positive
    assert rows[0].n_pred_pos == total
    assert rows[0].recall == 1.0
    prev = None
    for r in rows:
        assert r.n_pred_pos == sum(
            n for b, n in n_by_bin.items() if b >= r.t
        )
        assert 0 <= r.tp <= r.n_pred_pos
        if prev is not None:
            assert r.n_pred_pos <= prev.n_pred_pos
            assert r.tp <= prev.tp
        if r.n_pred_pos == 0:
            assert r.precision is None
        else:
            want_p = math.floor(
                r.tp / r.n_pred_pos * 1000000 + 0.5) / 1000000
            assert r.precision == want_p
        want_rec = math.floor(r.tp / total_pos * 1000000 + 0.5) / 1000000
        assert r.recall == want_rec
        denom = r.n_pred_pos + total_pos
        want_f1 = math.floor(2 * r.tp / denom * 1000000 + 0.5) / 1000000
        assert r.f1 == want_f1
        assert abs(r.thr - (-1.0 + r.t * 0.2)) < 1e-12
        prev = r


def test_ann_mrr_laws(spark):
    """q_ann_mrr: rr == 1/first_hit_rank (0 when no hit), rr == 1
    exactly when the top ANN neighbor is exact-relevant, the constant
    mrr column equals the integer-exact fold of the rows, and MRR
    never exceeds recall-weighted 1 (rr <= 1)."""
    import math

    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_ann_mrr"].fn(spark, sf).collect()
    assert rows and len({r.mrr for r in rows}) == 1
    num = 0
    for r in rows:
        if r.first_hit_rank is None:
            assert r.rr == 0.0
        else:
            assert 1 <= r.first_hit_rank <= 10
            want = math.floor(1000000.0 / r.first_hit_rank + 0.5) / 1000000
            assert r.rr == want
        assert 0.0 <= r.rr <= 1.0
        num += int(r.rr * 1000000)
    want_mrr = math.floor(
        num / (len(rows) * 1000000) * 1000000 + 0.5) / 1000000
    assert rows[0].mrr == want_mrr


def test_rollup_quantile_bounds_hold_at_day_grain_too(spark):
    """The 'any coarser grain re-derives from partials' claim beyond
    the registered hour grain, exercised through the SHIPPED helpers
    (operators/rollup.py — a copy of the math here would let a
    day-grain regression in the real code path pass unseen,
    self-review r15): DAY-level p50/p95 bounds built from the same
    minutely grid partials must contain the exact day quantiles.
    Also pins the typo'd-grain guard (date_trunc would otherwise
    return NULL and silently serve one all-time bucket)."""
    import pytest
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.operators.rollup import (
        grid_quantile_bounds,
        minute_grid_partials,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("ts", "event_type", "value")
    partials = minute_grid_partials(ev)
    day_bounds = {
        (r.bucket, r.key): r
        for r in grid_quantile_bounds(partials, grain="day").collect()
    }
    exact = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.percentile("value", F.lit(0.5)).alias("e50"),
        F.percentile("value", F.lit(0.95)).alias("e95"),
    ).collect()
    assert exact
    for r in exact:
        b = day_bounds[(r.day, r.event_type)]
        assert b.p50_lo <= r.e50 <= b.p50_hi, (r.day, r.event_type)
        assert b.p95_lo <= r.e95 <= b.p95_hi, (r.day, r.event_type)
    with pytest.raises(ValueError, match="grain"):
        grid_quantile_bounds(partials, grain="fortnight")


def test_ppl_bucket_terciles_balanced_and_complete(spark):
    """q_quality_ppl_bucket: every scored doc gets a bucket, NTILE
    balance holds per language (tercile sizes differ by <= 1), the
    bucket label is a pure function of the tercile, and head scores
    dominate tail scores within each language."""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_quality_ppl_bucket"].fn(spark, sf).collect()
    assert rows
    n_scored = all_queries()["q_text_bigram_lm"].fn(spark, sf).count()
    assert len(rows) == n_scored
    per_lang: dict[str, list] = {}
    for r in rows:
        assert r.bucket == {1: "head", 2: "middle", 3: "tail"}[r.tercile]
        per_lang.setdefault(r.lang, []).append(r)
    for lang, rs in per_lang.items():
        sizes = [sum(1 for r in rs if r.tercile == t) for t in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        head = [r.avg_lnp for r in rs if r.tercile == 1]
        tail = [r.avg_lnp for r in rs if r.tercile == 3]
        if head and tail:
            assert min(head) >= max(tail), lang


def test_langid_confusion_mass_and_cell_counts(spark):
    """q_langid_confusion: cell counts conserve the corpus (sum n =
    n_docs), recall sums to 1 within each actual language, precision
    sums to 1 within each predicted language, and the cells replay
    exactly from the registered q_text_langid rows."""
    from collections import Counter, defaultdict

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_langid_confusion"].fn(spark, sf).collect()
    assert rows
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    rec: dict[str, float] = defaultdict(float)
    prec: dict[str, float] = defaultdict(float)
    for r in rows:
        rec[r.actual_lang] += r.recall
        prec[r.predicted_lang] += r["precision"]
    for lang, v in rec.items():
        assert abs(v - 1.0) < 1e-4, ("recall", lang, v)
    for lang, v in prec.items():
        assert abs(v - 1.0) < 1e-4, ("precision", lang, v)
    pred = all_queries()["q_text_langid"].fn(spark, sf).collect()
    want = Counter((p.actual_lang, p.predicted_lang) for p in pred)
    got = {(r.actual_lang, r.predicted_lang): r.n for r in rows}
    assert got == dict(want)


def test_sketch_error_panels_and_estimator(spark):
    """q_sketch_error: pairs unique and ordered, panels partition the
    output at the _SKETCH_T boundary, estimates are exact 16ths in
    [0, 1], abs_err recomputes from the emitted columns, and the
    >= 0.8 slice of the cand panel is EXACTLY the q_llm_dedup_fuzzy
    pair set (the eval evaluates the same sketch domain the dedup
    family serves)."""
    from level2_to_cassandra_spark.queries.llm import _SKETCH_T
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_sketch_error"].fn(spark, sf).collect()
    assert rows
    seen = set()
    for r in rows:
        key = (r.id_a, r.id_b)
        assert key not in seen
        seen.add(key)
        assert r.id_a < r.id_b
        assert 0.0 <= r.est_jaccard <= 1.0
        m = r.est_jaccard * 16
        assert abs(m - round(m)) < 1e-9, r
        assert abs(r.abs_err - abs(r.est_jaccard - r.jaccard)) <= 2e-6, r
        if r.panel == "cand":
            assert r.jaccard >= _SKETCH_T
        else:
            assert r.panel == "sample" and r.jaccard < _SKETCH_T
    fuzzy = {
        (r.id_a, r.id_b): r.jaccard
        for r in all_queries()["q_llm_dedup_fuzzy"].fn(spark, sf).collect()
    }
    cand8 = {
        (r.id_a, r.id_b): r.jaccard
        for r in rows
        if r.panel == "cand" and r.jaccard >= 0.8
    }
    assert cand8 == fuzzy


def test_data_profile_approx_ndv_knob(spark):
    """profile_relation(approx_ndv=True) must change ONLY the NDV
    estimator: every other statistic is bit-identical to the exact
    mode, the approx NDV lands within the configured relative error on
    the fixture cardinalities, and the approx plan carries no exact
    count(DISTINCT) state (the whole point of the knob)."""
    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.plans import plan_of
    from level2_to_cassandra_spark.queries.relational import (
        _PROFILE_COLS,
        profile_relation,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    exact = {r.column_name: r
             for r in profile_relation(li, _PROFILE_COLS).collect()}
    approx_df = profile_relation(li, _PROFILE_COLS, approx_ndv=True)
    plan = plan_of(approx_df, "simple")
    assert "approx_count_distinct" in plan
    assert "count(distinct" not in plan.lower()
    approx = {r.column_name: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for c, a in approx.items():
        e = exact[c]
        for f in ("n_rows", "n_nulls", "min_value", "max_value",
                  "total_value", "mean_value"):
            assert a[f] == e[f], (c, f)
        # HLL at rsd=0.05: generous 3-sigma band on the fixture NDVs
        assert abs(a.n_distinct - e.n_distinct) <= max(
            2, 0.15 * e.n_distinct
        ), (c, a.n_distinct, e.n_distinct)


def test_dedup_url_canonical_group_laws(spark):
    """q_dedup_url: every canonical group carries exactly one
    is_canonical=1 row (its minimum doc_id), n_variants equals the
    group size on every member, every doc appears exactly once, and
    the normalizer's variance modes are all LIVE on the fixture (some
    group actually merges >= 2 raw-URL variants, and no canonical URL
    retains scheme/www/uppercase/utm_/fragment artifacts)."""
    from collections import defaultdict

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["q_dedup_url"].fn(spark, sf).collect()
    assert rows
    n_docs = load_table(spark, sf, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    groups = defaultdict(list)
    for r in rows:
        groups[r.canonical_url].append(r)
        assert "://" not in r.canonical_url
        assert not r.canonical_url.startswith("www.")
        host = r.canonical_url.split("/")[0]
        assert host == host.lower()
        assert "utm_" not in r.canonical_url
        assert "#" not in r.canonical_url
    for cu, members in groups.items():
        assert sum(m.is_canonical for m in members) == 1, cu
        lead = min(m.doc_id for m in members)
        for m in members:
            assert m.n_variants == len(members), cu
            assert m.is_canonical == (1 if m.doc_id == lead else 0)
    assert any(
        len({m.url for m in members}) >= 2
        for members in groups.values() if len(members) >= 2
    )
