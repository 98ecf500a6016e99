"""Window-function queries (SURVEY.md §2 B5).

The flagship, ``q_window_cumulative``, is the deterministic batch form
of the reference's single stateful computation: per-symbol cumulative
buy/sell volume with a daily reset (reference main.rs:109-130 — state
``HashMap<symbol,(cumbuy,cumsell)>`` updated per tick, zeroed on date
rollover).  Mapping onto the ``events`` fixture per FIXTURES.md:
``user_id ≈ symbol``, ``event_type='purchase' ≈ "B"``, ``'view' ≈ "S"``,
``value ≈ volume``, ``to_date(ts) ≈ epoch_day(time)``.

The daily reset is expressed by folding the day into the window
PARTITION BY key — the deterministic semantics the reference *intends*
(its actual global-last-date reset is arrival-order-dependent; SURVEY.md
§1.4 quirk 2).  At 100 TB this plan is a single hash-partition shuffle
on (user_id, day) followed by an in-partition sort — no global sort, no
driver collection, and the per-(key,day) groups are naturally bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.registry import register

# Rounding scale for double running sums: both engines round identically
# so summation-order jitter cannot flip the driver's value hash.
_SCALE = 4


@register(
    "q_window_cumulative",
    oracle="""
    SELECT
        event_id,
        user_id,
        CAST(ts AS DATE)              AS day,
        event_type,
        value,
        ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
              OVER w, 4)              AS cumbuy,
        ROUND(SUM(CASE WHEN event_type = 'view' THEN value ELSE 0 END)
              OVER w, 4)              AS cumsell,
        ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value
                       WHEN event_type = 'view' THEN -value
                       ELSE 0 END)
              OVER w, 4)              AS cumdelta
    FROM events
    WINDOW w AS (
        PARTITION BY user_id, CAST(ts AS DATE)
        ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key, per-day conditional running sums — the reference's core
    stateful computation (main.rs:122-130) as a deterministic window."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    w = (
        Window.partitionBy("user_id", F.to_date("ts"))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    buy = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))
    sell = F.when(F.col("event_type") == "view", F.col("value")).otherwise(F.lit(0.0))
    delta = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "view", -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    return events.select(
        "event_id",
        "user_id",
        day,
        "event_type",
        "value",
        F.round(F.sum(buy).over(w), _SCALE).alias("cumbuy"),
        F.round(F.sum(sell).over(w), _SCALE).alias("cumsell"),
        F.round(F.sum(delta).over(w), _SCALE).alias("cumdelta"),
    )


@register(
    "q_window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per customer by price."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value)  OVER w                    AS prev_value,
           LEAD(value) OVER w                    AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, value), 4)
                                                 AS delta_prev,
           FIRST_VALUE(value) OVER w             AS first_value_day
    FROM events
    WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first — tick-to-tick delta analog (SURVEY.md B5)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")),
            _SCALE,
        ).alias("delta_prev"),
        F.first("value").over(w).alias("first_value_day"),
    )


@register(
    "q_window_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts, value,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS centered_sum5
    FROM events
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row-frame moving average / centered sum per key."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), _SCALE).alias("ma5"),
        F.round(F.sum("value").over(w.rowsBetween(-2, 2)), _SCALE).alias(
            "centered_sum5"
        ),
    )


@register(
    "q_window_ntile",
    # NTILE is SQL-standard (first (n_rows % k) buckets get the extra
    # row) and both engines implement it; the ORDER BY carries the
    # full (value, event_id) tie-break so bucket boundaries are
    # deterministic.
    oracle="""
    SELECT event_id, event_type, value,
           CAST(NTILE(4) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS BIGINT)
               AS quartile
    FROM events
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartile bucketing per event type (SURVEY.md §2 B5 — the
    equi-DEPTH sibling of q_hist_equiwidth's equi-width bins: rank-
    based buckets, the quantile-bucketing step of length-balanced
    batch packing and score stratification).  One hash exchange (the
    event_type partition) feeding an in-partition sort; ties broken by
    event_id so the bucket edges are engine-invariant.  At unbounded
    per-group cardinality the same semantics come from the
    q_agg_approx_percentile cut points + comparisons instead of a
    per-group sort — the exact form is right while groups fit a
    partition (5 types here)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    return ev.select(
        "event_id", "event_type", "value",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_window_running_distinct",
    # COUNT(DISTINCT) OVER isn't a native window aggregate in Spark;
    # the portable formulation is first-occurrence flags summed by a
    # running frame, which is ALSO how it must be computed at scale
    # (distinct-tracking state per frame would be unbounded).  Pure
    # integer arithmetic; (ts, event_id) makes both orders total.
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS types_seen
    FROM (SELECT user_id, event_id, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    """,
)
def q_window_running_distinct(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Running DISTINCT count per key (SURVEY.md §2 B5 — the
    engagement-breadth window: "how many distinct event types has
    this user produced up to and including this event?").  SQL's
    COUNT(DISTINCT) OVER is unsupported in Spark — and unbounded-
    state in any engine — so the scalable composition is used: flag
    each row that is the FIRST occurrence of its (user, type), then
    run a cumulative SUM of the flags over the user's timeline.

    Scale shape: two Window nodes — (user_id, event_type) for the
    first-seen flag, user_id for the running sum — two key-aligned
    hash exchanges, no join, no distinct-set state (the flag is
    0/1 per row, the running frame is a scalar accumulator)."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id", "event_id", "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
         .alias("first_seen"),
    )
    return flagged.select(
        "user_id", "event_id",
        F.sum("first_seen").over(w_cum).cast("long")
         .alias("types_seen"),
    )


#: Truncated-EWMA spec: alpha = 0.5 (weights 2^-j are EXACT dyadic
#: doubles, so the weighted sums are bit-identical in any IEEE
#: engine), depth 8 lags.  The normalized form
#: ewma_t = Σ_j a^j·x_{t-j} / Σ_j a^j (over the lags that EXIST)
#: cancels the (1-a) factor and unbiases the first rows of each key,
#: the standard pandas ewm(adjust=True) convention.
_EWMA_ALPHA = 0.5
_EWMA_DEPTH = 8


@register(
    "q_window_ewma",
    # LAG(value, j) over the (ts, event_id) total order is
    # engine-identical; the numerator/denominator are FIXED-ORDER
    # left-to-right sums of dyadic-weighted terms, so both engines
    # compute the same double before the ROUND.  NULL/NaN values are
    # excluded up front: a NULL inside the lag window would otherwise
    # need COALESCE legs in every term, and engines order NaN
    # differently.
    oracle="""
    WITH ev AS (
        SELECT event_id, event_type, ts, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
    l AS (
        SELECT event_id, event_type, ts, value,
               {lags}
        FROM ev)
    SELECT event_id, event_type, ts, value,
           (ROUND(({num}) / ({den}), 6) + 0.0) AS ewma
    FROM l
    """.format(
        # Generated from the SAME _EWMA_DEPTH/_EWMA_ALPHA constants as
        # the Spark loop below (ADVICE r13 #2) — editing the constants
        # changes both engines together instead of silently drifting.
        lags=",\n               ".join(
            f"LAG(value, {j}) OVER (PARTITION BY event_type "
            f"ORDER BY ts, event_id) AS x{j}"
            for j in range(1, _EWMA_DEPTH)
        ),
        num="value * 1.0 + " + " + ".join(
            f"CASE WHEN x{j} IS NULL THEN 0.0 ELSE x{j} * "
            f"{_EWMA_ALPHA ** j!r} END"
            for j in range(1, _EWMA_DEPTH)
        ),
        den="1.0 + " + " + ".join(
            f"CASE WHEN x{j} IS NULL THEN 0.0 ELSE {_EWMA_ALPHA ** j!r} END"
            for j in range(1, _EWMA_DEPTH)
        ),
    ),
)
def q_window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EXPONENTIALLY-WEIGHTED moving average per key — the
    smoothing primitive behind metric dashboards and anomaly baselines
    (the recursive y_t = (1-a)x_t + a·y_{t-1} needs a sequential scan;
    truncating at 8 lags with a = 0.5 leaves a weight tail of 2^-8 =
    0.4 % and turns it into a bounded row-frame window — the move that
    makes EWMA distributable).  Normalized over the weights of the
    lags that exist (the pandas ewm(adjust=True) convention), so the
    first rows of each key are unbiased rather than damped toward 0.

    Determinism: alpha 0.5 makes every weight an exact dyadic double;
    numerator and denominator are fixed-order sums written identically
    on both engines over the LAG(value, j) columns of a total
    (ts, event_id) order.  Scale shape: ONE hash exchange on the key
    feeding one window sort — 8 lags ride a single WindowExec, and the
    arithmetic is codegen'd projection work."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lags = {j: F.lag("value", j).over(w) for j in range(1, _EWMA_DEPTH)}
    num = F.col("value") * F.lit(1.0)
    den = F.lit(1.0)
    for j in range(1, _EWMA_DEPTH):
        wj = F.lit(_EWMA_ALPHA ** j)
        num = num + F.when(lags[j].isNull(), F.lit(0.0)).otherwise(
            lags[j] * wj
        )
        den = den + F.when(lags[j].isNull(), F.lit(0.0)).otherwise(wj)
    from level2_to_cassandra_spark.functions import round_signless

    return ev.select(
        "event_id", "event_type", "ts", "value",
        round_signless(num / den, 6).alias("ewma"),
    )
