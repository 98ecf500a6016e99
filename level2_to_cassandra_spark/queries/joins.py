"""Join queries (SURVEY.md §2 B3).

The reference has no joins — its storage layout (per-symbol partitions)
IS its join strategy.  This module supplies the join surface an engine
over those tables needs: inner/outer/semi/anti/broadcast equi-joins, a
non-equi range join, a multiway star join, and the as-of join (the
canonical level-2 query: latest observation at-or-before t per key),
implemented scalably in ``operators/asof.py``.

Scale notes: dimension sides (region/nation, inline band tables) are
explicitly ``broadcast()`` — zero shuffle for the fact side; the as-of
join is a single hash exchange on the key (see asof.py); everything
else is Catalyst-chosen sort-merge/hash with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.operators.asof import asof_join
from level2_to_cassandra_spark.operators.dedup import latest_by_key
from level2_to_cassandra_spark.registry import register


@register(
    "q_join_inner",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           o.o_orderkey, o.o_orderstatus, o.o_totalprice
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 50000
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer; Catalyst picks the physical
    strategy (sort-merge here, broadcast once AQE sees a small side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .where(F.col("o_totalprice") > 50000)
        .select(
            "c_custkey", "c_name", "c_mktsegment",
            "o_orderkey", "o_orderstatus", "o_totalprice",
        )
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON
    clause, NOT the WHERE — the classic outer-join semantics trap)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 150000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
               AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two broadcast dims: nation (25 rows) and
    region (5 rows) are size-invariant in TPC-H, so broadcasting is
    correct at ANY scale factor — the fact table never shuffles for
    the join, only for the final aggregation."""
    c = load_table(spark, sf_dir, "customer")
    n = broadcast(load_table(spark, sf_dir, "nation"))
    r = broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "q_join_right",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_acctbal > 0
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (keep all orders; customer columns NULL where
    the join-side predicate rejects the customer)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (c.c_acctbal > 0), "right"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_join_full",
    oracle="""
    WITH big AS (
        SELECT o_custkey, COUNT(*) AS n_big FROM orders
        WHERE o_totalprice > 180000 GROUP BY o_custkey),
    urgent AS (
        SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
        WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
    SELECT COALESCE(big.o_custkey, urgent.o_custkey) AS custkey,
           big.n_big, urgent.n_urgent
    FROM big FULL JOIN urgent ON big.o_custkey = urgent.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two disjoint-ish aggregates — NULLs on both
    sides exercised."""
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.where(F.col("o_totalprice") > 180000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    b = big.select(F.col("o_custkey").alias("k1"), "n_big")
    u = urgent.select(F.col("o_custkey").alias("k2"), "n_urgent")
    return b.join(u, b.k1 == u.k2, "full").select(
        F.coalesce("k1", "k2").alias("custkey"), "n_big", "n_urgent"
    )


@register(
    "q_sort_nulls",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
    ORDER BY o.o_totalprice ASC NULLS FIRST, c.c_custkey, o.o_orderkey
    LIMIT 50
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering over an outer-join result — the
    nulls-ordering surface of B6; the LIMIT makes the ordering
    semantically load-bearing (it selects which rows survive)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 150000), "left"
    )
    return (
        joined.orderBy(
            F.asc_nulls_first("o_totalprice"),
            F.asc("c_custkey"),
            F.asc("o_orderkey"),
        )
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .limit(50)
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — customers WITH at least one urgent order
    (EXISTS); emits each left row at most once, no right columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — customers with NO orders (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_range",
    oracle="""
    SELECT b.tier, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS tier_total
    FROM orders o
    JOIN (VALUES ('T1', 0.0, 50000.0),
                 ('T2', 50000.0, 100000.0),
                 ('T3', 100000.0, 200000.0),
                 ('T4', 200000.0, 400000.0),
                 ('T5', 400000.0, 1e12)) AS b(tier, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.tier
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join: orders banded into price tiers.
    The band table is broadcast, so the 'join' is a map-side interval
    probe — no shuffle of the fact side at any scale (a shuffled
    non-equi join would be a cartesian disaster at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("T1", 0.0, 50_000.0),
            ("T2", 50_000.0, 100_000.0),
            ("T3", 100_000.0, 200_000.0),
            ("T4", 200_000.0, 400_000.0),
            ("T5", 400_000.0, 1e12),
        ],
        "tier string, lo double, hi double",
    )
    return (
        o.join(
            broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("tier_total"),
        )
    )


@register(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-table star join: fact⋈fact sort-merge joins on
    keys, broadcast for the two constant-size dims, decimal-exact
    revenue aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = broadcast(load_table(spark, sf_dir, "nation"))
    r = broadcast(load_table(spark, sf_dir, "region"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(30,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'),
    views AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view')
        WHERE rn = 1)
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.event_id AS v_event_id,
           v.value    AS v_value,
           v.ts       AS v_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest view at-or-
    before it — the 'latest tick ≤ t' query the reference's
    time-DESC clustering exists for.  Right side deduped per
    (user_id, ts) for determinism; oracle is DuckDB's native ASOF."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = latest_by_key(
        ev.where(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts", "value"
        ),
        keys=["user_id", "ts"],
        order=[F.desc("event_id")],
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        right_cols=["event_id", "value"],
        prefix="v_",
    )


#: Staleness bound for q_join_asof_tolerance: 1 hour, in microseconds
#: (the asof_join tolerance unit for timestamp keys).
_ASOF_TOL_US = 3_600_000_000


@register(
    "q_join_asof_tolerance",
    # Same ASOF core as q_join_asof; the tolerance is a post-match
    # staleness predicate, so the oracle nulls the matched columns
    # where the match is older than the bound — identical semantics
    # to pandas merge_asof(tolerance=...).
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'),
    views AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view')
        WHERE rn = 1),
    matched AS (
        SELECT p.event_id, p.user_id, p.ts, p.value,
               v.event_id AS v_event_id,
               v.value    AS v_value,
               v.ts       AS v_ts
        FROM purchases p
        ASOF LEFT JOIN views v
          ON p.user_id = v.user_id AND v.ts <= p.ts)
    SELECT event_id, user_id, ts, value,
           CASE WHEN fresh THEN v_event_id END AS v_event_id,
           CASE WHEN fresh THEN v_value    END AS v_value,
           CASE WHEN fresh THEN v_ts       END AS v_ts
    FROM (SELECT *,
                 epoch_us(ts) - epoch_us(v_ts) <= {_ASOF_TOL_US} AS fresh
          FROM matched)
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas ``merge_asof``'s
    ``tolerance``): each purchase gets the user's latest view at-or-
    before it ONLY if that view is at most 1 hour old — the form
    every real point-in-time feature join takes (a quote from last
    week must not price today's trade).  Same single-shuffle
    union-merge plan as q_join_asof; the bound is one comparison on
    the matched struct (operators/asof.py), not a different join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = latest_by_key(
        ev.where(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts", "value"
        ),
        keys=["user_id", "ts"],
        order=[F.desc("event_id")],
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        right_cols=["event_id", "value"],
        prefix="v_",
        tolerance=_ASOF_TOL_US,
    )


@register(
    "q_join_asof_nearest",
    # DuckDB has no native nearest ASOF: the oracle materializes the
    # backward and forward candidates with two directional ASOF joins
    # and replays the operator's choice rule (smaller absolute
    # distance, ties to backward — pandas' bdiff <= fdiff).
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'),
    views AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view')
        WHERE rn = 1),
    b AS (
        SELECT p.event_id, p.user_id, p.ts, p.value,
               v.event_id AS be, v.value AS bv, v.ts AS bt
        FROM purchases p
        ASOF LEFT JOIN views v
          ON p.user_id = v.user_id AND v.ts <= p.ts),
    f AS (
        SELECT p.event_id, v.event_id AS fe, v.value AS fv, v.ts AS ft
        FROM purchases p
        ASOF LEFT JOIN views v
          ON p.user_id = v.user_id AND v.ts >= p.ts)
    SELECT b.event_id, b.user_id, b.ts, b.value,
           CASE WHEN use_b THEN be ELSE fe END AS v_event_id,
           CASE WHEN use_b THEN bv ELSE fv END AS v_value,
           CASE WHEN use_b THEN bt ELSE ft END AS v_ts
    FROM (SELECT b.*, f.fe, f.fv, f.ft,
                 be IS NOT NULL AND (fe IS NULL OR
                     epoch_us(b.ts) - epoch_us(bt)
                     <= epoch_us(ft) - epoch_us(b.ts)) AS use_b
          FROM b JOIN f USING (event_id)) AS b
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'):
    each purchase gets the user's CLOSEST view in absolute time,
    before or after, ties to the earlier one — the enrichment shape
    when staleness is symmetric (nearest reference price, closest
    sensor reading).  Both candidate fills are frames over ONE
    partition sort sharing a single WindowExec (operators/asof.py), so
    the plan stays one shuffle + one sort — never two directional
    joins reconciled by a third."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = latest_by_key(
        ev.where(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts", "value"
        ),
        keys=["user_id", "ts"],
        order=[F.desc("event_id")],
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        right_cols=["event_id", "value"],
        prefix="v_",
        direction="nearest",
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (5×5 dims) — the primitive similarity search
    composes with pruning; never used unpruned on fact tables."""
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(r2)
        .where(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


@register(
    "q_join_asof_forward",
    # DuckDB's native ASOF supports both directions via the inequality
    # orientation: v.ts >= p.ts picks the NEAREST following row.
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'),
    views AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view')
        WHERE rn = 1)
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.event_id AS v_event_id,
           v.value    AS v_value,
           v.ts       AS v_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (pandas merge_asof direction='forward'):
    for each purchase, the user's NEXT view at-or-after it — the
    settlement/next-quote lookup shape, mirroring q_join_asof's
    backward fill.  Same union-merge plan (one shuffle, one sort, a
    following-frame `first` running fill — never a range join +
    groupBy-min, which would shuffle twice and explode candidate
    pairs); oracle is DuckDB's native forward ASOF."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = latest_by_key(
        ev.where(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts", "value"
        ),
        keys=["user_id", "ts"],
        order=[F.desc("event_id")],
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        right_cols=["event_id", "value"],
        prefix="v_",
        direction="forward",
    )


#: q_join_interval bin width (seconds).  Correctness never depends on
#: it (sequence() covers every bin an interval touches); it only sets
#: the explode fan-out — ≥ the typical interval length means ≤ 2 bins
#: per interval (fixture sessions are ~1h; measured max 1.1h).
_IV_BIN_SEC = 7200


@register(
    "q_join_interval",
    # The oracle joins intervals by the PLAIN overlap predicate — the
    # binning is invisible to the result, which is the point: it is a
    # physical strategy, not a semantic change.
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         <= 1800 * 1000000
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
    iv AS (SELECT user_id, sid, MIN(ts) AS s, MAX(ts) AS e
           FROM numbered GROUP BY user_id, sid),
    pairs AS (
        SELECT a.user_id AS ua, a.sid AS sa, b.user_id AS ub, b.sid AS sb
        FROM iv a JOIN iv b
          ON a.s <= b.e AND b.s <= a.e AND a.user_id < b.user_id),
    ends AS (SELECT ua AS user_id, sa AS sid FROM pairs
             UNION ALL SELECT ub AS user_id, sb AS sid FROM pairs),
    cnt AS (SELECT user_id, sid, COUNT(*) AS c FROM ends
            GROUP BY user_id, sid)
    SELECT iv.user_id, CAST(iv.sid AS BIGINT) AS session_id,
           CAST(COALESCE(c.c, 0) AS BIGINT) AS n_overlapping
    FROM iv LEFT JOIN cnt c
      ON c.user_id = iv.user_id AND c.sid = iv.sid
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIG-BIG INTERVAL-OVERLAP JOIN via time-bin bucketing: for every
    user session (the q_sessionize intervals), count how many OTHER
    users' sessions overlap it in time — the concurrent-activity
    relation behind collusion/fraud rings, shared-incident
    correlation, and co-presence features.  This completes the join
    family: q_join_range is a BROADCAST band probe (one side tiny),
    the as-of joins match at a point; here BOTH interval sides are
    corpus-scale, where a raw theta-join is a cartesian disaster.

    Scale shape — the standard range-join binning strategy: each
    interval explodes into the fixed-width time bins it touches
    (``sequence`` of bin ids; ≤ 2 bins at the fixture's session
    lengths), the pair search becomes an EQUI-join on the bin id
    (shuffle keyed by bin, never all-pairs), and the exact overlap
    predicate filters within the bin.  A pair sharing several bins is
    emitted ONCE without any distinct: the join keeps only the bin
    containing ``greatest(a.s, b.s)`` — an overlap always covers that
    bin on both sides, so it picks exactly one match per pair.
    Endpoint counting fans each pair to its two sessions with ONE
    explode (never a 2-branch union re-running the join), and
    zero-overlap sessions ride back in on a left join against the
    persisted interval relation.  Work is Σ per-bin n_a·n_b — at
    100 TB the bin key shards the timeline across the cluster, and a
    hot bin (an absolute-time crunch) salts like any other hot key."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            <= 1800 * 1_000_000,
            0,
        ).otherwise(1).alias("new_session"),
    )
    numbered = flagged.withColumn(
        "sid",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    # persisted: feeds both bin-join sides AND the final zero-count
    # left join — three plan branches over the same session-scale
    # staging table (union-branch recompute otherwise)
    iv = (
        numbered.groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .persist()
    )
    binned = iv.select(
        "user_id", "sid", "s", "e",
        F.explode(
            F.sequence(
                F.floor(F.unix_seconds("s") / _IV_BIN_SEC),
                F.floor(F.unix_seconds("e") / _IV_BIN_SEC),
            )
        ).alias("bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e"))
        # dedup-by-construction: keep only the bin that contains the
        # later start — covered by both sides of any overlapping pair
        & (
            F.floor(
                F.greatest(
                    F.unix_seconds("a.s"), F.unix_seconds("b.s")
                ) / _IV_BIN_SEC
            )
            == F.col("a.bin")
        ),
    ).select(
        F.col("a.user_id").alias("ua"), F.col("a.sid").alias("sa"),
        F.col("b.user_id").alias("ub"), F.col("b.sid").alias("sb"),
    )
    ends = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("ua").alias("user_id"),
                         F.col("sa").alias("sid")),
                F.struct(F.col("ub").alias("user_id"),
                         F.col("sb").alias("sid")),
            )
        ).alias("end")
    ).select("end.user_id", "end.sid")
    cnt = ends.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        iv.join(cnt, ["user_id", "sid"], "left")
        .select(
            "user_id",
            F.col("sid").alias("session_id"),
            F.coalesce(F.col("c"), F.lit(0)).alias("n_overlapping"),
        )
    )
