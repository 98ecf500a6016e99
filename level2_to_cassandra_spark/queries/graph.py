"""Graph analytics over event-derived edges (SURVEY.md §2 B12 —
iterative distributed algorithms).

The reference's event stream induces a behavioral graph: event types
are nodes, adjacent-transition counts are weighted edges (the same
lag-window relation q_event_transitions materializes).  PageRank over
that graph is the canonical ITERATIVE fan-out/fan-in workload — each
iteration is one join of the rank vector against the edge relation
plus one destination-keyed aggregate — and exercises the engine shape
that matters at 100 TB: the EDGE relation is the big side (scan-scale,
hash-partitioned by src once, reused every iteration), the RANK vector
is |V|-sized and broadcast.  Connected components (operators/dedup.py)
covers the pointer-jumping family; this covers damped fixed-point
iteration.

Cross-engine determinism: ranks are stabilized with round_half_up at
scale 12 AFTER EVERY ITERATION, so both engines iterate from bit-equal
inputs and per-destination sums (≤|V| doubles) cannot drift across
rounds; the final output rounds to 8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.functions import (
    round_half_up,
    round_half_up_sql,
)
from level2_to_cassandra_spark.registry import register

#: Damping factor (Brin & Page 1998) and fixed iteration count.  The
#: count is FIXED (not convergence-tested) so the oracle can unroll it.
_DAMPING = 0.85
_ITERS = 3

_EDGE_CTES = """
    pairs AS (
        SELECT prev AS src, event_type AS dst
        FROM (SELECT event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events)
        WHERE prev IS NOT NULL),
    edges AS (SELECT src, dst, COUNT(*) AS c FROM pairs GROUP BY src, dst),
    outdeg AS (SELECT src, SUM(c) AS tot FROM edges GROUP BY src),
    w AS (SELECT e.src, e.dst, CAST(e.c AS DOUBLE) / o.tot AS wgt
          FROM edges e JOIN outdeg o USING (src)),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)
"""

_ITER_CTE = """
    r{next} AS (
        SELECT n.node,
               {rounded} AS r
        FROM nodes n
        LEFT JOIN w  ON w.dst = n.node
        LEFT JOIN r{cur} p ON p.node = w.src
        GROUP BY n.node)
"""


def _pagerank_oracle() -> str:
    ctes = [_EDGE_CTES.strip()]
    for i in range(_ITERS):
        step = (
            f"0.15 / (SELECT n FROM nn) "
            f"+ {_DAMPING} * COALESCE(SUM(p.r * w.wgt), 0.0)"
        )
        ctes.append(
            _ITER_CTE.format(
                next=i + 1, cur=i, rounded=round_half_up_sql(step, 12)
            ).strip()
        )
    final = round_half_up_sql("r", 8)
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, {final} AS rank FROM r{_ITERS}"
    )


@register("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank, three fixed iterations, over the event-type
    transition graph (nodes = event types, edge weight = out-
    normalized adjacent-transition count).  The oracle unrolls the
    identical iterations as chained CTEs — an EXACT value check of a
    distributed iterative algorithm, not a tolerance band.

    Scale shape: building the edge relation is the corpus-scale work
    (ONE user_id shuffle for the lag window + one (src,dst) count
    aggregate — identical budget to q_event_transitions); each
    iteration then joins the BROADCAST rank vector (|V| rows) against
    the edge relation and aggregates by dst — at web scale that is
    one dst-keyed shuffle per iteration over an edge relation whose
    src partitioning is built once and reused, never a re-scan of the
    source events.  Dangling mass follows the simplified Brin-Page
    formulation (teleport only), matched exactly by the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w_lag).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
    )
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    outdeg = edges.groupBy("src").agg(F.sum("c").alias("tot"))
    weights = (
        edges.join(outdeg, "src")
        .select(
            "src", "dst",
            (F.col("c").cast("double") / F.col("tot")).alias("wgt"),
        )
        # the |E|-row relation every iteration re-reads: persist once
        .localCheckpoint(eager=False)
    )
    nodes = ev.select(
        F.col("event_type").alias("node")
    ).distinct().localCheckpoint(eager=False)
    n_nodes = F.broadcast(
        nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    ranks = nodes.crossJoin(n_nodes).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_ITERS):
        contrib = (
            weights.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("wgt")).alias("mass"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contrib.withColumnRenamed("dst", "node")),
                "node", "left",
            )
            .crossJoin(n_nodes)
            .select(
                "node",
                round_half_up(
                    F.lit(0.15) / F.col("n")
                    + F.lit(_DAMPING)
                    * F.coalesce(F.col("mass"), F.lit(0.0)),
                    12,
                ).alias("r"),
            )
        )
    return ranks.select("node", round_half_up(F.col("r"), 8).alias("rank"))
