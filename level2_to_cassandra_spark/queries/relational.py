"""Batch relational core (SURVEY.md §2 B1/B2/B4/B6/B7).

Projection/filter/predicates, grouped & conditional aggregation,
distinct, rollup, dedup, sort/limit/top-k, set ops.  All pure DataFrame
built-ins — Catalyst handles pushdown, pruning, partial aggregation and
TakeOrderedAndProject; no Python executes per-row anywhere here.

Scale notes (100 TB): every groupBy below is a map-side-partial hash
aggregate before its single shuffle; sorts that feed a LIMIT become
TakeOrderedAndProject (no global sort); top-k-per-group shuffles once on
the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import (
    load_table,
    spread_scan,
    staging_dir,
)
from level2_to_cassandra_spark.registry import register

_SCALE = 4


@register(
    "q_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
               AS charged
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_quantity > 10
    """,
)
def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → computed projection; the filter and the 7-column
    read schema reach the parquet scan (PushedFilters in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 10)
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), _SCALE)
            .alias("net_price"),
            # scale 6: the 3-factor product carries exactly ≤6 decimals,
            # so rounding at 6 is decimal-tie-free across engines.
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
            ).alias("charged"),
        )
    )


@register(
    "q_json_scan",
    # Oracle works straight off the parquet view: the JSONL file the
    # Spark side reads is a pure function of events (same projection,
    # same deterministic corruption rule), so the parsed result is
    # expressible without DuckDB ever touching the file.
    oracle="""
    SELECT CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END
               AS event_id,
           CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_type END
               AS event_type,
           CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value,
           CASE WHEN event_id % 97 = 0
                THEN '{"event_id": <truncated' ELSE NULL END AS corrupt_raw
    FROM events
    """,
)
def q_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch JSON-lines scan with explicit schema + per-record corrupt-
    row capture (SURVEY.md §2 B1) — the batch twin of the streaming
    path's dead-letter isolation (streaming/ingest.py::dead_letters;
    reference main.rs:75-107 drops undecodable frames, here they are
    RETAINED with the raw payload for replay).

    The fixture ships parquet only, so the query materializes a JSONL
    derivation of ``events`` first (1-in-97 lines deterministically
    corrupted), then reads it back with ``spark.read.schema(...)
    .json`` in PERMISSIVE mode: parseable lines land typed, corrupt
    lines land whole in ``columnNameOfCorruptRecord`` with every data
    field null.  At scale this is the pattern for raw-log ingestion:
    explicit schema (no sampling pass over 100 TB), per-record error
    isolation, corrupt payloads quarantined not dropped.
    """
    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 97 == 0,
        F.lit('{"event_id": <truncated'),  # structurally invalid JSON
    ).otherwise(
        F.to_json(F.struct("event_id", "event_type", "value"))
    )
    path = staging_dir("l2c_json_scan_")
    ev.select(line.alias("value")).write.mode("overwrite").text(path)
    parsed = (
        spark.read.schema(
            "event_id long, event_type string, value double, "
            "corrupt_raw string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_raw")
        .json(path)
    )
    return parsed.select("event_id", "event_type", "value", "corrupt_raw")


@register(
    "q_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
      AND (o_totalprice < 150000 OR o_orderstatus = 'F')
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / LIKE / IS NULL / boolean-combination predicates
    (the reference's demux, main.rs:75-167, generalized to rich filters)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_totalprice") < 150000) | (F.col("o_orderstatus") == "F"))
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )


@register(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                         AS DECIMAL(30,4))) AS DOUBLE)
               AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                       AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                  AS avg_price,
           ROUND(MIN(l_extendedprice), 4)                  AS min_price,
           ROUND(MAX(l_extendedprice), 4)                  AS max_price,
           COUNT(*)                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (sum/avg/min/max/count);
    Spark's hash aggregate computes map-side partials automatically."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        # Money sums run in exact DECIMAL then cast to double: float sums
        # are summation-order-dependent (Spark and DuckDB differ), decimal
        # sums are exact on both — bit-identical results at any SF.
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,4)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), _SCALE
                ).cast("decimal(30,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), _SCALE).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), _SCALE).alias("avg_price"),
            F.round(F.min("l_extendedprice"), _SCALE).alias("min_price"),
            F.round(F.max("l_extendedprice"), _SCALE).alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_conditional",
    oracle="""
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4)
               AS buy_total,
           ROUND(SUM(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 4)
               AS sell_total,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value
                          WHEN event_type = 'view' THEN -value
                          ELSE 0 END), 4) AS delta,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_buy,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS n_sell
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (pivot-style) aggregation — the final values of the
    reference's cumbuy/cumsell/cumdelta state (main.rs:124-130)."""
    ev = load_table(spark, sf_dir, "events")
    buy = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
    sell = F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0)
    delta = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "view", -F.col("value"))
        .otherwise(0.0)
    )
    return ev.groupBy("user_id").agg(
        F.round(F.sum(buy), _SCALE).alias("buy_total"),
        F.round(F.sum(sell), _SCALE).alias("sell_total"),
        F.round(F.sum(delta), _SCALE).alias("delta"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1))).alias("n_buy"),
        F.count(F.when(F.col("event_type") == "view", F.lit(1))).alias("n_sell"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count-distinct next to a plain count (Spark expands to a
    two-phase distinct aggregate; no extra code needed)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_agg_approx",
    # Verifiable projection (VERDICT r05 #1): sketch estimates differ
    # across engines, so the driver-checked contract is (group, exact
    # value, within-tolerance flag).  The flag is computed SPARK-side
    # from the live HLL++ estimate — the sketch stays fully exercised —
    # while DuckDB recomputes the exact value and asserts the ≤5 %
    # bound holds by emitting TRUE.  A sketch regression flips the
    # boolean and the driver hash catches it.
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_tol
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting (HyperLogLog++, rsd=0.02) checked
    against the exact count.  The sketch (unlike exact distinct) needs
    no per-key shuffle of raw values at scale; the hash-checked output
    is the verifiable projection — exact count + a Spark-computed
    ``within_tol`` (relative error ≤5 %, >2σ headroom at rsd=0.02)
    that the oracle pins to TRUE.  The raw estimate's error band is
    additionally asserted in tests/test_approx.py."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    rel_err = F.abs(
        F.col("approx_customers") - F.col("exact_customers")
    ) / F.greatest(F.col("exact_customers"), F.lit(1)).cast("double")
    return agg.select(
        "o_orderstatus",
        "exact_customers",
        (rel_err <= F.lit(0.05)).alias("within_tol"),
    )


@register(
    "q_agg_approx_percentile",
    # Verifiable projection (VERDICT r05 #1): the GK sketch has no
    # cross-engine hash twin, so the checked contract is the exact
    # interpolated quantile (Spark `percentile` ≡ DuckDB
    # `quantile_cont`, both linear interpolation at rank p·(n−1);
    # rounded to 4 so last-ulp jitter in the interpolation fold cannot
    # flip the hash) plus Spark-computed within-tolerance flags that
    # the oracle pins to TRUE.
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5),  4) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (Greenwald-Khanna, accuracy=10000)
    checked against the exact percentiles.  Unlike exact percentile
    (which buffers every value per group through the shuffle), the GK
    sketch is a bounded-size mergeable summary — the only quantile
    formulation that survives 100 TB groups.  The hash-checked output
    is the verifiable projection: exact p50/p95 plus per-quantile
    ``within_tol`` flags (|approx−exact| ≤ 1 % of exact — loose value
    translation of the ≤1/accuracy rank bound on this distribution)
    that the oracle pins to TRUE; the raw sketch error band is
    additionally asserted in tests/test_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.array(F.lit(0.5), F.lit(0.95))
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", pcts, 10000).alias("approx_p"),
        F.percentile("l_extendedprice", pcts).alias("exact_p"),
    )

    def within(approx, exact):
        return F.abs(approx - exact) <= F.greatest(
            F.abs(exact) * 0.01, F.lit(1e-9)
        )

    # scalar columns, not array cells: the harness canonicalizes via
    # pandas sort_values, which cannot order list-typed cells
    return agg.select(
        "l_returnflag",
        F.round(F.col("exact_p")[0], 4).alias("exact_p50"),
        F.round(F.col("exact_p")[1], 4).alias("exact_p95"),
        within(F.col("approx_p")[0], F.col("exact_p")[0]).alias(
            "p50_within_tol"
        ),
        within(F.col("approx_p")[1], F.col("exact_p")[1]).alias(
            "p95_within_tol"
        ),
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through re-aggregatable bitmap sketches:
    per-(status, month, bucket) bitmaps of customer keys
    (``bitmap_construct_agg``), OR-merged up to status level
    (``bitmap_or_agg``) and counted — the pre-aggregated-cube pattern
    for 100 TB distinct counts.  Unlike ``countDistinct`` (which
    re-shuffles raw keys for every new grouping), the monthly bitmap
    layer is built ONCE and any coarser rollup is a cheap OR-merge of
    fixed-width binary cells; unlike HLL the answer stays exact.  The
    oracle is conventional COUNT(DISTINCT) — passing it proves the
    bitmap path exact, not approximate."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            "o_orderstatus",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
            F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
        )
        .groupBy("o_orderstatus", "month", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bmp"))
    )
    return (
        monthly.groupBy("o_orderstatus", "bucket")
        .agg(F.bitmap_or_agg(F.col("bmp")).alias("bmp"))
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.bitmap_count(F.col("bmp")))
            .cast("bigint")
            .alias("n_customers")
        )
    )


@register(
    "q_agg_hll_sketch",
    # Verifiable projection (VERDICT r05 #1): DataSketches bytes and
    # estimates have no DuckDB twin, so the checked contract is the
    # exact distinct count plus a Spark-computed within-tolerance flag
    # on the MERGED estimate (≤5 % ≈ >3σ at lgK=12) that the oracle
    # pins to TRUE — a merge-path regression flips the boolean.
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_tol
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Apache DataSketches): build one
    HLL per (status, month), union-merge the monthly sketches up to
    status (``hll_union_agg``) and estimate.  This is the streaming/
    incremental twin of :func:`q_agg_bitmap_distinct`: a fixed-size
    (1.5 KB at lgK=12) summary per cell regardless of cardinality, so
    daily partitions sketch independently and any window is a merge —
    no raw-key reshuffle ever.  The hash-checked output is the
    verifiable projection (exact count + ``within_tol`` on the merged
    estimate, pinned TRUE by the oracle); tests/test_approx.py
    additionally asserts the raw error band AND that the merged
    estimate tracks the one-pass estimate within the same band (the
    union re-encodes through HLL_8, so the two are close but not
    bit-identical)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            "o_orderstatus",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            "o_custkey",
        )
        .groupBy("o_orderstatus", "month")
        .agg(F.hll_sketch_agg(F.col("o_custkey"), F.lit(12)).alias("hll"))
    )
    merged = monthly.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias(
            "approx_customers"
        )
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    joined = merged.join(exact, "o_orderstatus")
    rel_err = F.abs(
        F.col("approx_customers") - F.col("exact_customers")
    ) / F.greatest(F.col("exact_customers"), F.lit(1)).cast("double")
    return joined.select(
        "o_orderstatus",
        "exact_customers",
        (rel_err <= F.lit(0.05)).alias("within_tol"),
    )


@register(
    "q_sql_star_revenue",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def q_sql_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query THROUGH THE SQL API (spark.sql over
    registered views) — same Catalyst plan as the DataFrame form; the
    engine's SQL surface is first-class, not a bolt-on."""
    from level2_to_cassandra_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir, only=("customer", "orders", "lineitem"))
    return spark.sql("""
        SELECT o.o_orderkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                             AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate  > TIMESTAMP '1996-01-01'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    """)


@register(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
           COUNT(*)                  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,4)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           FLOOR(stddev_pop(l_extendedprice)  * 10000 + 0.5) / 10000 AS sd_pop,
           FLOOR(stddev_samp(l_extendedprice) * 10000 + 0.5) / 10000 AS sd_samp,
           FLOOR(var_pop(l_extendedprice)     * 100 + 0.5) / 100     AS var_pop,
           FLOOR(corr(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000
               AS corr_pq,
           FLOOR(covar_pop(l_extendedprice, l_quantity) * 10000 + 0.5) / 10000
               AS covar_pq
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance
    (engine-invariant FLOOR rounding — see functions.round_half_up)."""
    from level2_to_cassandra_spark.functions import round_half_up

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_half_up(F.stddev_pop("l_extendedprice"), 4).alias("sd_pop"),
        round_half_up(F.stddev_samp("l_extendedprice"), 4).alias("sd_samp"),
        round_half_up(F.var_pop("l_extendedprice"), 2).alias("var_pop"),
        round_half_up(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        round_half_up(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias(
            "covar_pq"
        ),
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000
               AS median_price,
           FLOOR(quantile_cont(l_extendedprice, 0.9) * 10000 + 0.5) / 10000
               AS p90_price,
           FLOOR(quantile_cont(l_extendedprice, 0.99) * 10000 + 0.5) / 10000
               AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation) — median/p90/p99 per
    group; matches DuckDB quantile_cont semantics, unlike the
    sketch-based approx_percentile (which q_agg_approx covers)."""
    from level2_to_cassandra_spark.functions import round_half_up

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_half_up(
            F.percentile("l_extendedprice", F.lit(0.5)), 4
        ).alias("median_price"),
        round_half_up(
            F.percentile("l_extendedprice", F.lit(0.9)), 4
        ).alias("p90_price"),
        round_half_up(
            F.percentile("l_extendedprice", F.lit(0.99)), 4
        ).alias("p99_price"),
    )


@register(
    "q_agg_pivot",
    oracle="""
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type = 'view'     THEN value ELSE 0 END), 4) AS view,
           ROUND(SUM(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 4) AS click,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS purchase,
           ROUND(SUM(CASE WHEN event_type = 'signup'   THEN value ELSE 0 END), 4) AS signup,
           ROUND(SUM(CASE WHEN event_type = 'error'    THEN value ELSE 0 END), 4) AS error
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): one column per event type.  Pivot values are
    DECLARED, not discovered — at scale an undeclared pivot needs an
    extra distinct-scan job and risks unbounded width."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["view", "click", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), _SCALE))
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^k subtotal combinations)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
        .cast("double")
        .alias("total"),
    )


@register(
    "q_set_ops_all",
    oracle="""
    WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT 'union_all'     AS op, o_custkey
    FROM (SELECT * FROM big UNION ALL SELECT * FROM urgent)
    UNION ALL
    SELECT 'intersect_all' AS op, o_custkey
    FROM (SELECT * FROM big INTERSECT ALL SELECT * FROM urgent)
    UNION ALL
    SELECT 'except_all'    AS op, o_custkey
    FROM (SELECT * FROM big EXCEPT ALL SELECT * FROM urgent)
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (ALL variants — duplicates preserved /
    multiplicity-subtracted), complementing q_set_ops' DISTINCT forms."""
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    parts = [
        big.unionAll(urgent).select(F.lit("union_all").alias("op"), "o_custkey"),
        big.intersectAll(urgent).select(
            F.lit("intersect_all").alias("op"), "o_custkey"
        ),
        big.exceptAll(urgent).select(F.lit("except_all").alias("op"), "o_custkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_subquery_correlated",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_nationkey
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-nation-average customers),
    written as SQL so Catalyst's decorrelation rewrites it into an
    aggregate + join — no per-row re-execution, which is what makes
    correlated subqueries survivable at scale."""
    from level2_to_cassandra_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir, only=("customer",))
    return spark.sql("""
        SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_nationkey
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
    """)


@register(
    "q_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           FLOOR(CUME_DIST()    OVER w * 1000000 + 0.5) / 1000000 AS cume,
           NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_orderstatus
                                            ORDER BY o_totalprice DESC, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING)
               AS second_highest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value per status partition."""
    from level2_to_cassandra_spark.functions import round_half_up

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        round_half_up(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_half_up(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_totalprice", 2).over(w_all).alias("second_highest"),
    )


@register(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: l_returnflag has only 3
    values — a direct groupBy funnels 600k rows/flag through 3 reducers.
    Salting (key, hash%16) spreads the partial aggregation across 48
    reducers, the final pass combines 48 tiny rows.  Identical result
    to the plain GROUP BY oracle; the shape that survives hot keys at
    100 TB (complementing AQE's runtime skew-join splitting)."""
    from level2_to_cassandra_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        key_cols=["l_returnflag"],
        aggs=lambda d: d.agg(
            F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("__sum_qty"),
            F.count(F.lit(1)).alias("__n"),
        ),
        finals=[
            F.sum("__sum_qty").cast("double").alias("sum_qty"),
            F.sum("__n").alias("n"),
        ],
        n_salts=16,
    ).withColumnRenamed("l_returnflag", "flag")


@register(
    "q_join_salted",
    # The oracle is the PLAIN join-then-aggregate: the salt must be
    # invisible in the result, so equality with the unsalted SQL is
    # exactly the correctness claim.
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted equi-join (operators/skew.py::salted_join):
    orders (the big, potentially hot-keyed side) carries a
    deterministic hash salt, customer is replicated n_salts=8 ways,
    and the join runs on (custkey, salt) — each hot customer's orders
    spread over 8 reducers instead of one.  This is the manual tool
    for the skew cases AQE's sort-merge splitting cannot reach
    (replicable-but-not-broadcastable side, known-hot key, salted
    exchange reused downstream); the oracle is the PLAIN join, proving
    the salt changes the physics and not the algebra.  DECIMAL sum →
    double keeps the grouped totals bit-stable across engines."""
    from level2_to_cassandra_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(30,4)").alias("price"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, on=["custkey"], n_salts=8,
                         salt_source="o_orderkey")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("total_price"),
    )


@register(
    "q_merge_upsert",
    # MERGE INTO semantics applied as one full-outer join.  The change
    # set is derived deterministically from the base table (updates:
    # key % 10 = 0, price + 100; deletes: key % 10 = 1; inserts: fresh
    # keys MAX(key)+1+key for key % 100 = 2), so both engines construct
    # the identical CDC batch and the hash verifies the APPLY semantics.
    # +100.0 instead of a multiply avoids a rounding step entirely —
    # the same IEEE add on both engines.  The insert offset is DERIVED
    # (max key + 1, integer-exact on both engines) rather than a fixed
    # 10M constant: o_orderkey reaches ~6M*SF, so a constant collides
    # with real base keys at SF>=2, silently turning inserts into
    # overwrites (ADVICE r09 low #4).
    oracle="""
    WITH off AS (SELECT MAX(o_orderkey) + 1 AS off FROM orders),
    changes AS (
        SELECT o_orderkey AS k, 'U' AS op, o_custkey, o_orderstatus,
               o_totalprice + 100.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, 'D', NULL, NULL, NULL
        FROM orders WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT (SELECT off FROM off) + o_orderkey, 'I', o_custkey,
               o_orderstatus, 1.0
        FROM orders WHERE o_orderkey % 100 = 2)
    SELECT COALESCE(c.k, b.o_orderkey) AS o_orderkey,
           CASE WHEN c.op IN ('U', 'I') THEN c.o_custkey
                ELSE b.o_custkey END AS o_custkey,
           CASE WHEN c.op IN ('U', 'I') THEN c.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IN ('U', 'I') THEN c.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice
    FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.k
    WHERE COALESCE(c.op, 'K') <> 'D'
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC apply): one batch of keyed changes — updates,
    deletes, inserts — applied to a base table in a SINGLE full-outer
    join on the key, the plan every table format's MERGE lowers to
    (matched+U → replace payload, matched+D → drop, unmatched+I →
    add, untouched base rows pass through).  This is the batch twin
    of the streaming keyed-upsert sink's last-write-wins fold
    (streaming/sink.py): same key semantics, expressed as one
    relational operator instead of an incremental log.

    Scale shape: ONE shuffle of each side on the merge key — never a
    per-row lookup loop; at table-format scale the same join runs
    against only the base files whose key ranges the change set
    touches (partition/file pruning), which is exactly what Delta/
    Iceberg MERGE does with this identical logical plan."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    # Change-payload columns are RENAMED (c_*): the batch is derived
    # from base as test scaffolding (a real CDC batch is its own
    # table), and same-lineage names would make the full-outer join's
    # projections ambiguous self-join references.
    upd = base.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("U").alias("op"),
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderstatus").alias("c_orderstatus"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("c_totalprice"),
    )
    dele = base.where(F.col("o_orderkey") % 10 == 1).select(
        F.col("o_orderkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(None).cast("string").alias("c_orderstatus"),
        F.lit(None).cast("double").alias("c_totalprice"),
    )
    # Insert keys sit strictly above every base key at ANY scale:
    # offset = max(o_orderkey) + 1, computed as a broadcast 1-row
    # aggregate (integer-exact; a fixed constant collided with real
    # keys at SF>=2 — ADVICE r09 low #4).
    off = F.broadcast(
        base.agg((F.max("o_orderkey") + F.lit(1)).alias("off"))
    )
    ins = base.where(F.col("o_orderkey") % 100 == 2).crossJoin(off).select(
        (F.col("off") + F.col("o_orderkey")).alias("k"),
        F.lit("I").alias("op"),
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderstatus").alias("c_orderstatus"),
        F.lit(1.0).alias("c_totalprice"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    joined = base.join(changes, F.col("o_orderkey") == F.col("k"),
                       "full_outer")
    changed = F.col("op").isin("U", "I")
    return joined.where(
        F.coalesce(F.col("op"), F.lit("K")) != "D"
    ).select(
        F.coalesce(F.col("k"), F.col("o_orderkey")).alias("o_orderkey"),
        F.when(changed, F.col("c_custkey"))
        .otherwise(F.col("o_custkey")).alias("o_custkey"),
        F.when(changed, F.col("c_orderstatus"))
        .otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(changed, F.col("c_totalprice"))
        .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )


@register(
    "q_dedup_lww",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
        SELECT event_id, user_id, event_type, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    WHERE rn = 1
    """,
)
def q_dedup_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic last-write-wins dedup — the batch semantic of the
    reference's Cassandra upsert key (PRIMARY KEY (symbol,time,price),
    main.rs:87,145): keep the newest row per key."""
    from level2_to_cassandra_spark.operators.dedup import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(
        ev, keys=["user_id", "event_type"], order=[F.desc("ts"), F.desc("event_id")]
    ).select("event_id", "user_id", "event_type", "ts", "value")


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N — Catalyst plans TakeOrderedAndProject (per-partition
    heap + merge at the driver side of the exchange), NOT a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(100)
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window — the 'top book levels per
    symbol' query shape the reference's storage layout serves."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_set_ops",
    oracle="""
    WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT 'union'     AS op, o_custkey FROM (SELECT * FROM big UNION SELECT * FROM urgent)
    UNION ALL
    SELECT 'intersect' AS op, o_custkey FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
    UNION ALL
    SELECT 'except'    AS op, o_custkey FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union(distinct) / intersect / except over two order subsets,
    tagged and unioned so one query exercises all three."""
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    tagged = [
        big.union(urgent).distinct().select(F.lit("union").alias("op"), "o_custkey"),
        big.intersect(urgent).select(F.lit("intersect").alias("op"), "o_custkey"),
        # subtract == EXCEPT (set semantics), matching the SQL oracle
        big.subtract(urgent).select(F.lit("except").alias("op"), "o_custkey"),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


_GROUPING_SETS_SQL = """
    SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rflag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_lstatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus), ())
"""


@register("q_sql_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS through the SQL surface — the general
    form of rollup/cube (q_agg_rollup/q_agg_cube are its prefixes), with
    GROUPING() disambiguating "NULL because aggregated away" from "NULL
    in the data".  Same one-shuffle Expand+HashAggregate plan as rollup:
    the Expand multiplies rows by the set count map-side and partial
    aggregation collapses them before the exchange, so the shuffle
    carries one row per (set, group) per map partition, not per input
    row.  Identical SQL runs on both engines."""
    from level2_to_cassandra_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(_GROUPING_SETS_SQL)


#: q_zorder bit width per dimension (16+16 → 32-bit z-values) and the
#: range-bucket shift (top 6 bits → 64 layout buckets).
_Z_BITS = 16
_Z_BUCKET_SHIFT = 2 * _Z_BITS - 6

#: The interleave as SQL text, shared verbatim by both engines: bit j
#: of each quantized dimension lands at position 2j / 2j+1.  Generated
#: once at import — 32 OR-terms, far below the literal-tree size that
#: stalls Catalyst analysis (see operators/similarity.py::_cb_relation).
_Z_INTERLEAVE_SQL = " | ".join(
    f"(((sa >> {j}) & 1) << {2 * j}) | (((sb >> {j}) & 1) << {2 * j + 1})"
    for j in range(_Z_BITS)
)

#: Quantize → interleave → bucket, as engine-shared SQL fragments.
#: Integer-only math end to end: BIGINT casts make the ×65535 safe at
#: any key range, integer division is exact on both engines (operands
#: are non-negative), and a degenerate range (min = max) pins the
#: coordinate to 0 instead of dividing by zero.
_Z_QUANT_A = """CASE WHEN amx = amn THEN CAST(0 AS BIGINT)
         ELSE ((CAST(l_partkey AS BIGINT) - amn) * 65535) // (amx - amn)
    END AS sa"""
_Z_QUANT_B = """CASE WHEN bmx = bmn THEN CAST(0 AS BIGINT)
         ELSE ((CAST(l_suppkey AS BIGINT) - bmn) * 65535) // (bmx - bmn)
    END AS sb"""


@register(
    "q_zorder",
    # DuckDB replays the identical integer pipeline: min/max bounds,
    # BIGINT quantization, the same generated interleave expression,
    # the same bucket shift.  ``//`` is DuckDB's integer division;
    # Spark spells it ``div`` — same semantics on non-negative ints.
    oracle=f"""
    SELECT l_orderkey, l_linenumber, zval,
           zval >> {_Z_BUCKET_SHIFT} AS zbucket
    FROM (
        SELECT l_orderkey, l_linenumber,
               {_Z_INTERLEAVE_SQL} AS zval
        FROM (
            SELECT l_orderkey, l_linenumber,
                   {_Z_QUANT_A},
                   {_Z_QUANT_B}
            FROM lineitem
            CROSS JOIN (SELECT CAST(MIN(l_partkey) AS BIGINT) AS amn,
                               CAST(MAX(l_partkey) AS BIGINT) AS amx,
                               CAST(MIN(l_suppkey) AS BIGINT) AS bmn,
                               CAST(MAX(l_suppkey) AS BIGINT) AS bmx
                        FROM lineitem)))
    """,
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (l_partkey, l_suppkey) —
    the DATA-LAYOUT operator for multi-dimensional scan pruning at
    100 TB: quantize each dimension to 16 bits against its global
    min/max, interleave the bits into one 32-bit z-value, and derive a
    64-way range bucket from its top bits.  Rows written range-
    partitioned by z sit in files whose per-file min/max statistics
    are tight on BOTH dimensions simultaneously (the space-filling
    curve keeps each z-range a small rectangle), so a predicate on
    EITHER column prunes files — unlike a sort by one column, which
    leaves the other's spans at full width.  The locality effect is
    measured in tests/test_bucketing.py::test_zorder_layout_tightens_
    file_stats; this query emits the keys themselves, oracle-checked
    bit-for-bit.

    Plan shape: one min/max aggregate (1 row, broadcast cross join —
    the same in-plan pattern as q_text_tfidf's N) and a map-side
    integer expression per row; no shuffle at all beyond the
    broadcast.  Everything is integer arithmetic (quantization uses
    BIGINT multiply + integer division), so both engines agree
    exactly — no float rounding conventions needed."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").cast("long").alias("amn"),
        F.max("l_partkey").cast("long").alias("amx"),
        F.min("l_suppkey").cast("long").alias("bmn"),
        F.max("l_suppkey").cast("long").alias("bmx"),
    )
    quant = (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .crossJoin(F.broadcast(bounds))
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            _Z_QUANT_A.replace("//", "div"),
            _Z_QUANT_B.replace("//", "div"),
        )
    )
    z = quant.selectExpr(
        "l_orderkey", "l_linenumber", f"({_Z_INTERLEAVE_SQL}) AS zval"
    )
    return z.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "zval",
        f"(zval >> {_Z_BUCKET_SHIFT}) AS zbucket",
    )


@register(
    "q_csv_scan",
    # Same oracle trick as q_json_scan: the CSV file the Spark side
    # reads is a pure function of events (same projection, same
    # deterministic corruption rule, fixed corrupt-line literal), so
    # the parsed result is expressible straight off the parquet view.
    # Valid rows round-trip exactly: Spark's double→string cast emits
    # the shortest representation, which parses back to the identical
    # double the oracle reads from parquet.  The corrupt line is a
    # FIXED literal (no floats embedded) so both engines agree on the
    # quarantined payload byte-for-byte.
    oracle="""
    SELECT CASE WHEN event_id % 89 = 0 THEN NULL ELSE event_id END
               AS event_id,
           CASE WHEN event_id % 89 = 0 THEN 'corrupt' ELSE event_type END
               AS event_type,
           CASE WHEN event_id % 89 = 0 THEN 0.0 ELSE value END AS value,
           CASE WHEN event_id % 89 = 0
                THEN 'xx,corrupt,0' ELSE NULL END AS corrupt_raw
    FROM events
    """,
)
def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CSV scan with explicit schema + per-record corrupt-row
    capture — the delimited-text sibling of q_json_scan (SURVEY.md §2
    B1), completing the raw-ingest source trio (parquet, JSON lines,
    CSV).  1-in-89 lines are deterministically corrupted with a
    non-numeric first field.  PERMISSIVE CSV semantics differ from
    JSON's whole-record quarantine in a way the oracle pins exactly:
    only the UNPARSEABLE field nulls (event_id here), the remaining
    fields are salvaged ('corrupt', 0.0), and the whole raw line is
    retained in ``columnNameOfCorruptRecord`` for replay — partial
    salvage + quarantined original, the delimited-log ingest
    contract.  Explicit schema as always: no inference pass over
    100 TB."""
    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 89 == 0,
        F.lit("xx,corrupt,0"),  # non-numeric long field → malformed
    ).otherwise(
        # coalesce every field to '' explicitly: concat_ws silently
        # DROPS null args, which would shift column positions (a NULL
        # event_type would move value into the event_type slot).  The
        # fixture carries no NULLs today, but the line builder must
        # not depend on that (ADVICE r06).
        F.concat_ws(
            ",",
            F.coalesce(F.col("event_id").cast("string"), F.lit("")),
            F.coalesce(F.col("event_type"), F.lit("")),
            F.coalesce(F.col("value").cast("string"), F.lit("")),
        )
    )
    path = staging_dir("l2c_csv_scan_")
    ev.select(line.alias("value")).write.mode("overwrite").text(path)
    parsed = (
        spark.read.schema(
            "event_id long, event_type string, value double, "
            "corrupt_raw string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_raw")
        .option("header", "false")
        .csv(path)
    )
    return parsed.select("event_id", "event_type", "value", "corrupt_raw")


@register(
    "q_unpivot",
    # Portable oracle: the UNION ALL expansion IS unpivot's semantics,
    # so no dialect-specific UNPIVOT syntax is relied on.  Values pass
    # through untouched (no arithmetic → no rounding conventions).
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of q_agg_pivot's wide form: four
    measure columns become (metric, value) rows keyed by the line
    identity, the long/tidy layout metric stores and plotting/ML
    feature pipelines ingest.  Spark's native ``unpivot`` expands
    map-side (an Expand node — one output row per (input row,
    measure), no shuffle, no join), which is the only shape that
    matters at 100 TB: melting is a projection, never a self-union
    that re-scans the table once per measure (the ORACLE's UNION ALL
    form does exactly that — fine for DuckDB at check scale, 4×
    the scan cost for a lake table)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q_agg_argmax",
    # The portable argmax formulation: ROW_NUMBER with the FULL
    # tie-break order (price, then orderkey) — exactly the lexical
    # struct-max/min semantics the Spark side aggregates with.  No
    # arg_max/max_by on either engine: both leave ties unspecified.
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_linestatus, l_orderkey, l_extendedprice,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag, l_linestatus
                   ORDER BY l_extendedprice DESC, l_orderkey DESC
               ) AS rmax,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag, l_linestatus
                   ORDER BY l_extendedprice ASC, l_orderkey ASC
               ) AS rmin
        FROM lineitem)
    SELECT mx.l_returnflag, mx.l_linestatus,
           mx.l_orderkey AS top_orderkey,
           mx.l_extendedprice AS top_price,
           mn.l_orderkey AS bot_orderkey,
           mn.l_extendedprice AS bot_price
    FROM (SELECT * FROM ranked WHERE rmax = 1) mx
    JOIN (SELECT * FROM ranked WHERE rmin = 1) mn
      USING (l_returnflag, l_linestatus)
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX/ARGMIN as a hash aggregate (SURVEY.md §2 B4): which
    order carries each (returnflag, linestatus) group's most/least
    expensive line.  The scale-right plan is ``max(struct(price,
    key))`` — struct comparison is lexicographic, so the aggregate
    carries the argument along with the extremum through the PARTIAL
    (map-side) aggregation, one narrow shuffle row per group.  The
    naive formulation is a ROW_NUMBER window (the oracle's — fine for
    a check, but a full sort-shuffle of the table at scale) or
    ``max_by``, whose tie behavior is engine-undefined; embedding the
    key IN the comparison value makes ties deterministic everywhere
    (the same discipline as q_topk_per_group's rank tie-break)."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = F.max(F.struct(F.col("l_extendedprice").alias("p"),
                        F.col("l_orderkey").alias("k")))
    mn = F.min(F.struct(F.col("l_extendedprice").alias("p"),
                        F.col("l_orderkey").alias("k")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(mx.alias("mx"), mn.alias("mn"))
        .select(
            "l_returnflag", "l_linestatus",
            F.col("mx.k").alias("top_orderkey"),
            F.col("mx.p").alias("top_price"),
            F.col("mn.k").alias("bot_orderkey"),
            F.col("mn.p").alias("bot_price"),
        )
    )


@register(
    "q_hist_equiwidth",
    # Bin arithmetic is spelled out (no width_bucket builtin): both
    # engines evaluate the IDENTICAL double expression
    # (x - lo) * 20 / (hi - lo) left-to-right, so floor boundaries
    # agree bit-for-bit; LEAST folds the x = hi row into the last bin.
    oracle="""
    WITH bounds AS (SELECT MIN(l_extendedprice) AS lo,
                           MAX(l_extendedprice) AS hi FROM lineitem),
    b AS (SELECT CASE WHEN hi = lo THEN 0
                      ELSE CAST(LEAST(FLOOR((l_extendedprice - lo) * 20
                                            / (hi - lo)), 19) AS BIGINT)
                 END AS bin,
                 lo, hi
          FROM lineitem CROSS JOIN bounds)
    SELECT bin, cnt, ROUND(lo + bin * (hi - lo) / 20, 4) AS bin_lo
    FROM (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt,
                 MIN(lo) AS lo, MIN(hi) AS hi
          FROM b GROUP BY bin)
    """,
)
def q_hist_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (SURVEY.md §2 B4 — the profiling/quality
    primitive behind length/score distribution dashboards): 20 bins
    between the global min and max of l_extendedprice.  Two-phase
    shape: the bounds are a 1-row aggregate broadcast back over the
    scan (no driver round trip, no second pass semantics — one
    crossJoin of a 1-row relation), then binning is pure map-side
    integer math feeding ONE map-side-combined aggregation over ≤20
    groups.  At 100 TB: two corpus scans total (bounds + binning),
    zero wide shuffles — the same pattern q_zorder uses for its
    normalization bounds."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(F.min("l_extendedprice").alias("lo"),
                    F.max("l_extendedprice").alias("hi"))
    # hi == lo (degenerate single-valued column) would be 0/0 = NaN
    # and lean on engine NaN ordering inside LEAST — collapse to bin 0
    # explicitly on both sides (same guard as q_drift_psi)
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo")) * 20
                    / (F.col("hi") - F.col("lo"))),
            F.lit(19),
        )
    ).cast("long")
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"), "lo", "hi")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
        )
        .select(
            "bin", "cnt",
            F.round(
                F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo"))
                / F.lit(20), 4,
            ).alias("bin_lo"),
        )
    )


@register(
    "q_hist_equiheight",
    # NTILE over a TOTAL order (value, event_id — event_id unique) is
    # deterministic and standard-SQL-identical in both engines:
    # ceil-sized leading buckets, floor-sized tail.  lo/hi are RAW
    # parquet doubles (no arithmetic), cnt an exact integer — nothing
    # here can diverge at any SF.  NULL and NaN values are excluded
    # explicitly: each engine totals-orders them differently, and a
    # quantile bin for "no value" is meaningless anyway.
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               NTILE(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS tile
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value))
    SELECT event_type, CAST(tile AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(value) AS lo, MAX(value) AS hi
    FROM ranked GROUP BY event_type, tile
    """,
)
def q_hist_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-HEIGHT (quantile) histogram: 10 equal-count bins per
    event_type with each bin's bounds — the companion to
    q_hist_equiwidth (equal-WIDTH bins mis-resolve skewed
    distributions; equal-count bins are what query optimizers and
    drift monitors actually store).  NTILE over the (value, event_id)
    total order makes the bin assignment deterministic under ties.

    Scale shape: ONE hash exchange on event_type feeding a window
    sort, then a map-side-combined aggregate over #keys × 10 groups.
    At 100 TB the per-key sort is the honest cost of EXACT quantiles —
    the approximate sibling (q_agg_approx_percentile) is the
    sketch-based scale path; this query is the exact-answer member of
    that pair."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value",
                  F.ntile(10).over(w).cast("long").alias("tile"))
        .groupBy("event_type", "tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "q_agg_mode",
    # Deterministic mode: both engines rank (count DESC, value ASC)
    # and keep rank 1 — never the builtin mode()/any-tie aggregate,
    # whose tie winner is engine-undefined.
    oracle="""
    SELECT l_returnflag, mode_qty, mode_qty_cnt FROM (
        SELECT l_returnflag, l_quantity AS mode_qty,
               CAST(cnt AS BIGINT) AS mode_qty_cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity ASC)
                   AS rn
        FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2))
    WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) per group as two hash aggregates
    (SURVEY.md §2 B4): count per (group, value), then the argmax trick
    from q_agg_argmax — ``max(struct(cnt, -value))`` carries the
    winner through map-side partials, so no per-group sort and no
    window over the raw table.  Ties break to the SMALLEST value
    (negation inside the struct), pinned identically in the oracle's
    ROW_NUMBER form; the builtin ``mode()`` on either engine leaves
    ties undefined and is avoided.  At 100 TB: the first aggregate is
    the only corpus-scale shuffle; the second runs over the
    (group, distinct-value) relation."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = counts.groupBy("l_returnflag").agg(
        F.max(
            F.struct(
                F.col("cnt").alias("c"),
                (-F.col("l_quantity")).alias("negq"),
            )
        ).alias("mx")
    )
    return best.select(
        "l_returnflag",
        (-F.col("mx.negq")).alias("mode_qty"),
        F.col("mx.c").cast("long").alias("mode_qty_cnt"),
    )


@register(
    "q_agg_string",
    # LISTAGG ... WITHIN GROUP (ORDER BY key) — the order key
    # (n_nationkey) is distinct from the emitted value (n_name), the
    # general form of the SQL:2016 ordered string aggregate.
    oracle="""
    SELECT r.r_name AS region,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_nationkey) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_agg_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG / STRING_AGG with
    WITHIN GROUP ORDER BY): per region, its nations joined in
    nationkey order.  Spark 4's builtin ``listagg`` has NO
    deterministic ordering in the DataFrame API, so the engine shape
    is ``array_join(transform(array_sort(collect_list(struct(key,
    val))), x -> x.val))`` — the sort happens per GROUP on the
    already-aggregated array (bounded by group size, the inherent
    contract of any string agg), never a global sort; map-side
    collect_list partials merge like any other aggregate.  The struct
    sort key makes order-by-key ≠ emitted-value work, which
    ``sort_array(collect_list(val))`` alone cannot express."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    joined = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    )
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("n_nationkey").alias("k"),
                            F.col("n_name").alias("v"),
                        )
                    )
                ),
                lambda x: x["v"],
            ),
            ",",
        ).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q_scd2",
    # Timestamps and integers pass through untouched; the window's
    # ORDER BY carries the unique o_orderkey tie-break so both
    # engines assign identical versions when a customer places two
    # orders the same day.
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           CAST(CASE WHEN LEAD(o_orderdate) OVER w IS NULL
                     THEN 1 ELSE 0 END AS INTEGER) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 interval build (SURVEY.md §2
    B5/B12 — the warehouse-dimension operator): turn a change log
    (each order = a new state of its customer) into versioned
    validity intervals — ``valid_from`` = the change timestamp,
    ``valid_to`` = the NEXT change's timestamp (NULL = still
    current), plus a dense version number and an is_current flag.
    This is the point-in-time dimension layout the as-of join family
    (q_join_asof*) probes; building it is one LEAD + ROW_NUMBER pass.

    Scale shape: ONE shuffle on the dimension key (o_custkey); both
    window functions share the same partition/order, so Catalyst
    evaluates them in a single Window node over a single sort — no
    self-join against "the next row", which is the O(n²)-prone
    alternative.  Append-only at 100 TB: new changes re-window only
    the affected keys' partitions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int")
         .alias("is_current"),
    )


@register(
    "q_snapshot_diff",
    # The two snapshots are pure functions of the orders fixture
    # (deterministic modulus rules), so the oracle rebuilds them
    # identically.  The mutation is ``+ 1.0`` with NO rounding —
    # both engines add the same IEEE double to the same parquet
    # value, so the changed-row equality compare is exact.
    oracle="""
    WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus
               FROM orders WHERE o_orderkey % 103 <> 0),
    b AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 97 = 0
                      THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 101 <> 0),
    d AS (SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
                 CASE WHEN a.o_orderkey IS NULL THEN 'added'
                      WHEN b.o_orderkey IS NULL THEN 'deleted'
                      WHEN a.o_totalprice <> b.o_totalprice
                           OR a.o_orderstatus <> b.o_orderstatus
                      THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS key_checksum
    FROM d GROUP BY status
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff (SURVEY.md §2 B3/B12 — the change-data-
    capture primitive): given two keyed snapshots of the same table,
    classify every key as added / deleted / changed / unchanged and
    emit per-status counts plus a key checksum.  This is how lake
    pipelines derive an incremental feed from full dumps — and the
    audit that validates any upsert sink (A10) against its source.
    Snapshot B is built from A by deterministic rules: keys % 101 = 0
    deleted, % 97 = 0 price-mutated, and A withholds keys % 103 = 0
    so B also contains adds.

    Scale shape: ONE full-outer sort-merge join on the snapshot key —
    the canonical diff plan.  At 100 TB both snapshots would be
    bucketed by key on write (tests/test_bucketing.py shows the
    exchange-free variant), making the diff a zero-shuffle zip of
    co-located files; the classification itself is map-side, and the
    4-group aggregate is map-side-combined."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    snap_a = o.filter(F.col("o_orderkey") % 103 != 0)
    snap_b = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0,
               F.col("o_totalprice") + F.lit(1.0))
         .otherwise(F.col("o_totalprice")),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    joined = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    status = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("deleted"))
        .when(
            (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    d = joined.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey"))
         .alias("k"),
        status.alias("status"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("key_checksum"),
    )


@register(
    "q_skew_profile",
    # All the skew statistics derive from INTEGER per-key counts —
    # ratios divide bigints and the salt flag is a pure integer
    # cross-multiplication — so nothing here can float-drift.
    oracle="""
    WITH cu AS (SELECT COUNT(*) AS c FROM events GROUP BY user_id),
         ce AS (SELECT COUNT(*) AS c FROM events GROUP BY event_type),
         su AS (SELECT 'user_id' AS key_name,
                       CAST(SUM(c) AS BIGINT) AS n_rows,
                       CAST(COUNT(*) AS BIGINT) AS n_keys,
                       CAST(MAX(c) AS BIGINT) AS max_per_key,
                       CAST(MIN(c) AS BIGINT) AS min_per_key,
                       FLOOR(CAST(SUM(c) AS DOUBLE) / COUNT(*)
                             * 10000 + 0.5) / 10000 AS avg_per_key,
                       FLOOR(quantile_cont(c, 0.99)
                             * 10000 + 0.5) / 10000 AS p99_per_key,
                       FLOOR(CAST(MAX(c) AS DOUBLE) / SUM(c)
                             * 1000000 + 0.5) / 1000000 AS top_share,
                       FLOOR(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c)
                             * 10000 + 0.5) / 10000 AS skew_ratio,
                       MAX(c) * COUNT(*) > 2 * SUM(c) AS salt_recommended
                FROM cu),
         se AS (SELECT 'event_type' AS key_name,
                       CAST(SUM(c) AS BIGINT) AS n_rows,
                       CAST(COUNT(*) AS BIGINT) AS n_keys,
                       CAST(MAX(c) AS BIGINT) AS max_per_key,
                       CAST(MIN(c) AS BIGINT) AS min_per_key,
                       FLOOR(CAST(SUM(c) AS DOUBLE) / COUNT(*)
                             * 10000 + 0.5) / 10000 AS avg_per_key,
                       FLOOR(quantile_cont(c, 0.99)
                             * 10000 + 0.5) / 10000 AS p99_per_key,
                       FLOOR(CAST(MAX(c) AS DOUBLE) / SUM(c)
                             * 1000000 + 0.5) / 1000000 AS top_share,
                       FLOOR(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c)
                             * 10000 + 0.5) / 10000 AS skew_ratio,
                       MAX(c) * COUNT(*) > 2 * SUM(c) AS salt_recommended
                FROM ce)
    SELECT * FROM su UNION ALL SELECT * FROM se
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew profile (SURVEY.md §2 B4 — the PRE-FLIGHT
    probe that decides whether operators/skew.py's salting or an AQE
    skew-join hint is worth paying for a given key): per-key counts
    summarized into max/min/avg/p99, the heaviest key's row share, the
    skew ratio (max over uniform expectation), and an integer-exact
    salt recommendation (max_per_key > 2x the uniform share).

    At 100 TB this runs BEFORE the expensive join/agg: one map-side-
    combined count per candidate key (the count relation is #keys-
    sized, Zipf-small) plus a single-row stats fold — orders of
    magnitude cheaper than discovering the straggler partition after
    an hour.  The salt flag cross-multiplies bigints (max*n_keys >
    2*n_rows) so the recommendation is reproducible bit-for-bit; at
    unbounded key cardinality the count relation itself is the only
    shuffle and the stats fold stays one row per profiled key.
    """
    from functools import reduce

    ev = load_table(spark, sf_dir, "events")

    def profile(key: str) -> DataFrame:
        counts = ev.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        rh = lambda col, s: F.floor(col * F.lit(float(10 ** s)) + F.lit(0.5)) / F.lit(float(10 ** s))
        return counts.agg(
            F.lit(key).alias("key_name"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_per_key"),
            F.min("c").cast("long").alias("min_per_key"),
            rh(F.sum("c").cast("double") / F.count(F.lit(1)), 4).alias("avg_per_key"),
            rh(F.percentile("c", F.lit(0.99)), 4).alias("p99_per_key"),
            rh(F.max("c").cast("double") / F.sum("c"), 6).alias("top_share"),
            rh(F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"), 4).alias("skew_ratio"),
            (F.max("c") * F.count(F.lit(1)) > 2 * F.sum("c")).alias("salt_recommended"),
        )

    return reduce(DataFrame.unionByName, [profile("user_id"), profile("event_type")])


@register(
    "q_orc_scan",
    # The oracle reads the ORIGINAL parquet view: a hash match proves
    # the ORC round-trip is value-lossless (doubles/longs/strings are
    # carried bit-identically by both columnar formats).
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE value > 100.0
    """,
)
def q_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source scan (SURVEY.md §2 B1 — the third raw-source format
    beside q_json_scan/q_csv_scan): snapshot the events table to ORC,
    then read it back through Spark's native vectorized ORC reader
    with a pushed-down predicate.

    Lakes are rarely single-format: ORC is what Hive/Trino-era
    pipelines hand over, and the engine must scan it with the same
    pushdown/pruning guarantees as parquet.  The plan test pins that
    the `value > 100` predicate reaches the ORC scan as a PushedFilter
    and only the three projected columns are read — at 100 TB the
    filter+projection happening inside the columnar reader (stripe
    statistics skip whole stripes) is the difference between reading
    3 columns of survivors and reading everything.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = staging_dir("l2c_orc_scan_")
    ev.write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .where(F.col("value") > 100.0)
        .select("event_id", "event_type", "value")
    )


@register(
    "q_xml_scan",
    # The oracle reads the ORIGINAL parquet view: a hash match proves
    # the XML round-trip is value-lossless (Spark serializes doubles
    # as their shortest exactly-round-tripping decimal string, and the
    # reader parses them back to the identical bits).
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE value > 100.0
    """,
)
def q_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source scan (SURVEY.md §2 B1 — the fourth raw-source format
    beside q_json_scan/q_csv_scan/q_orc_scan, native since Spark 4
    merged spark-xml): snapshot the events table to element-per-row
    XML, read it back with an EXPLICIT schema (never schema inference,
    which costs a full extra pass at corpus scale), filter, project.

    Scale shape — deliberately different from the columnar scans: XML
    is a row-oriented TEXT format with no stripe statistics, so
    nothing pushes down; the predicate runs as a post-parse filter.
    That is exactly why the honest 100 TB pattern is convert-once —
    an XML drop lands, one schema-explicit pass parses + filters it
    into parquet staging, and every downstream query gets columnar
    pushdown — and this query IS that conversion pass's read side.
    The oracle reads the original parquet, so the hash proves the
    text round-trip lossless (nulls: the writer omits the element,
    the reader restores NULL — identical on both engines)."""
    # spread_scan: the single-file fixture would otherwise stage (and
    # read back) the whole XML snapshot as ONE task — text
    # serialization is the expensive leg, so it must fan out
    ev = spread_scan(
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
    )
    path = staging_dir("l2c_xml_scan_")
    ev.write.mode("overwrite").format("xml").option(
        "rowTag", "event"
    ).save(path)
    return (
        spark.read.format("xml")
        .option("rowTag", "event")
        .schema("event_id long, event_type string, value double")
        .load(path)
        .where(F.col("value") > 100.0)
        .select("event_id", "event_type", "value")
    )


@register(
    "q_quality_checks",
    # Every check is INTEGER arithmetic (counts and count-diffs) so
    # pass/fail is bit-reproducible; the FK probe is a null-flag left
    # join so both engines count orphans identically.
    oracle="""
    WITH a AS (
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT event_id) AS nd,
               SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v_null,
               SUM(CASE WHEN value IS NULL OR value < 0.0
                             OR value > 1000.0 THEN 1 ELSE 0 END) AS v_range,
               SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
                        ('view','click','purchase','signup','error')
                        THEN 1 ELSE 0 END) AS v_set
        FROM events),
    fk AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v
        FROM lineitem l
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          ON l.l_orderkey = o.o_orderkey)
    SELECT 'event_id_unique' AS check_name,
           CAST(n AS BIGINT) AS n_rows,
           CAST(n - nd AS BIGINT) AS n_violations,
           n - nd = 0 AS passed FROM a
    UNION ALL
    SELECT 'user_id_not_null', CAST(n AS BIGINT),
           CAST(v_null AS BIGINT), v_null = 0 FROM a
    UNION ALL
    SELECT 'value_in_range', CAST(n AS BIGINT),
           CAST(v_range AS BIGINT), v_range = 0 FROM a
    UNION ALL
    SELECT 'event_type_in_set', CAST(n AS BIGINT),
           CAST(v_set AS BIGINT), v_set = 0 FROM a
    UNION ALL
    SELECT 'lineitem_fk_orders', CAST(n AS BIGINT),
           CAST(v AS BIGINT), v = 0 FROM fk
    """,
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-validation suite (SURVEY.md §2 B12 — the
    Deequ-style constraint gate every 100 TB ingest runs before
    promoting a batch): uniqueness, non-null, value-range and
    categorical-domain checks over events, plus a referential
    (lineitem→orders) foreign-key probe.

    Scale shape — the part that matters: ALL single-table constraints
    evaluate in ONE scan (one aggregate computes every violation
    counter side by side; the distinct-count shares the same pass via
    Spark's expand), then a 1-row stack fans the counters out into one
    row per check.  Adding a 50th constraint costs one more counter
    column, not another scan.  The FK check is the only join — a
    null-flag left join against the distinct parent keys, the exact
    shape that survives as a shuffle join at any fact size.
    """
    ev = load_table(spark, sf_dir, "events")
    allowed = ("view", "click", "purchase", "signup", "error")
    a = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("nd"),
        F.sum(
            F.when(F.col("user_id").isNull(), 1).otherwise(0)
        ).alias("v_null"),
        F.sum(
            F.when(
                F.col("value").isNull()
                | (F.col("value") < 0.0)
                | (F.col("value") > 1000.0),
                1,
            ).otherwise(0)
        ).alias("v_range"),
        F.sum(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(*allowed),
                1,
            ).otherwise(0)
        ).alias("v_set"),
    )
    single = a.selectExpr(
        """stack(4,
            'event_id_unique',   n, n - nd,
            'user_id_not_null',  n, v_null,
            'value_in_range',    n, v_range,
            'event_type_in_set', n, v_set
        ) AS (check_name, n_rows, n_violations)"""
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    parents = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    fk = li.join(parents, "l_orderkey", "left").agg(
        F.lit("lineitem_fk_orders").alias("check_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias(
            "n_violations"
        ),
    )
    return single.unionByName(fk).select(
        "check_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def _profile_oracle() -> str:
    """One UNION ALL branch per profiled column — each branch is the
    same aggregate battery, generated from the SAME column list as the
    Spark side so the two surfaces cannot drift."""
    branches = []
    for c in _PROFILE_COLS:
        branches.append(f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           MIN({c}) AS min_value,
           MAX({c}) AS max_value,
           FLOOR(CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS total_value
    FROM lineitem""")
    return (
        "WITH p AS (" + "\n    UNION ALL".join(branches) + ")\n"
        "    SELECT column_name, n_rows, n_nulls, n_distinct,\n"
        "           min_value, max_value, total_value,\n"
        "           FLOOR(total_value / (n_rows - n_nulls) * 1000000 + 0.5)\n"
        "               / 1000000 AS mean_value\n"
        "    FROM p"
    )


#: The profiled numeric lineitem columns — shared by the Spark plan
#: and the generated oracle so the two lists cannot diverge.
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def profile_relation(df: DataFrame, cols: tuple[str, ...],
                     approx_ndv: bool = False,
                     rsd: float = 0.05) -> DataFrame:
    """The per-column profile battery behind q_data_profile, with the
    NDV estimator as a REAL knob (VERDICT r14 watch item): exact
    ``count_distinct`` keeps the oracle-replayable default, while
    ``approx_ndv=True`` swaps in ``approx_count_distinct`` (HyperLogLog,
    relative error ``rsd``) — constant aggregation state per branch
    instead of distinct-value-sized, the form to flip on BEFORE a
    high-cardinality column (an id, a timestamp) enters the profiled
    list at 100 TB.  Every other statistic is identical between the
    two modes; tests/test_queries_invariants.py pins that."""
    from functools import reduce

    parts = []
    for c in cols:
        v = F.col("v")
        col1 = df.select(F.col(c).alias("v"))
        stat_aggs = [
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(v.isNull(), 1).otherwise(0))
            .cast("long").alias("n_nulls"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
            (
                F.floor(
                    F.sum(v.cast("decimal(38,6)"))
                    .cast("double") * F.lit(10000.0) + F.lit(0.5)
                ) / F.lit(10000.0)
            ).alias("total_value"),
        ]
        if approx_ndv:
            # approx_count_distinct is an ordinary (HLL) aggregate, so
            # it rides the same map-side-combined 1-row agg — one
            # branch, one pass, constant state.
            stats = col1.agg(
                *stat_aggs,
                F.approx_count_distinct(v, rsd)
                .cast("long").alias("n_distinct"),
            )
        else:
            # Exact NDV SPLIT out of the stats agg (r16, guide §2.3):
            # fused, Spark's single-distinct rewrite keys the FIRST
            # aggregate by v, so every one of the 5 stat buffers
            # (count/nulls/min/max/decimal-sum) rides the distinct-
            # value-keyed exchange once per distinct value.  Split,
            # the stats collapse to map-side partials feeding a 1-row
            # exchange, and the NDV branch shuffles the bare value
            # grid with ZERO aggregate buffers; the two 1-row results
            # re-join by a broadcast nested loop (free).  Measured at
            # sf0.1 (interleaved reps, identical output verified both
            # ways): 1.37-1.43 s → 1.05-1.12 s steady-state for the
            # 4-column battery.
            stats = col1.agg(*stat_aggs)
            ndv = (
                col1.groupBy("v").agg(F.lit(1).alias("__one"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
            )
            stats = stats.crossJoin(F.broadcast(ndv))
        parts.append(
            stats.select(
                "column_name", "n_rows", "n_nulls", "n_distinct",
                "min_value", "max_value", "total_value",
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.withColumn(
        "mean_value",
        F.floor(
            F.col("total_value")
            / (F.col("n_rows") - F.col("n_nulls"))
            * F.lit(1000000.0) + F.lit(0.5)
        ) / F.lit(1000000.0),
    )


@register("q_data_profile", oracle=_profile_oracle())
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-COLUMN DATA PROFILING (SURVEY.md §2 B12 — the completeness/
    cardinality/range summary every ingestion pipeline materializes
    before training): row count, null count, exact distinct count,
    min/max, exact decimal total and derived mean for each profiled
    numeric column, one output row per column.

    Scale shape: one NARROW SINGLE-COLUMN scan per profiled column,
    union'd — k independent aggregate branches, each reading exactly
    one column off the columnar source (plan-pinned).  The tempting
    one-scan form (all statistics in one agg row, reshaped with
    stack()) lowers the k exact distincts through Spark's multi-
    distinct Expand, which multiplies the corpus k× through the
    dedup pre-aggregation — measured 5.7-9.2 s vs 1.4-2.2 s for this
    form at sf0.1 (r14); on a columnar store the extra scans are
    nearly free while the Expand's row multiplication never is.
    Exact NDV state is distinct-value-sized per branch — the
    ``approx_ndv`` knob on :func:`profile_relation` swaps in
    approx_count_distinct (constant HLL state) when a column's
    cardinality outgrows memory; the registered query keeps the exact
    mode so the oracle stays a value check.  Exactness: totals are
    DECIMAL(38,6) sums (float-associativity-free, the
    q_rollup_cascade discipline); the mean derives from the ROUNDED
    total so both engines divide identical doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    return profile_relation(li, _PROFILE_COLS)
