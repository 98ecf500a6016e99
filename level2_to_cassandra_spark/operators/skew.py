"""Skew mitigation: salted two-phase aggregation and salted joins.

Hot grouping keys (few distinct values, or power-law key frequency)
bottleneck a single reducer per key.  Salting splits each key into
``n_salts`` sub-groups for the partial phase, then combines the
partials — the map-side work is identical, the reduce-side hot spot is
spread ``n_salts`` ways.  Spark's own partial aggregation already does
map-side combine; salting additionally parallelizes the REDUCE side,
which matters when per-key state is large (big sums of distinct-ish
values, collect-style aggs) or key cardinality is tiny.

For skewed JOINS the first-choice tool is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory) —
but AQE only splits SORT-MERGE joins whose runtime partition stats
cross its thresholds, so :func:`salted_join` provides the explicit,
deterministic form for the cases AQE cannot reach: a mid-size
replicable side that is too big to broadcast, a hot key known ahead of
time, or a plan where the skewed exchange is reused by a later stage
and must stay salted end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: Sequence[str],
               aggs: Callable[..., DataFrame],
               finals: Sequence[Column],
               n_salts: int = 16,
               salt_source: str | None = None) -> DataFrame:
    """Two-phase aggregation with a salt on the partial phase.

    ``aggs`` maps a grouped frame to partial aggregates (they must be
    combinable: sum/count/min/max); ``finals`` combine the partials in
    the second phase.  ``salt_source`` names a single column to hash
    into the salt; when unspecified the salt hashes ALL non-key columns
    together (deterministic — no RNG state to ship — and immune to any
    one column being low-cardinality or correlated with the key, which
    would silently collapse the salt to a few values and undo the
    mitigation).
    """
    key_cols = list(key_cols)
    salted = df.withColumn(
        "__salt", salt_column(df, key_cols, salt_source, n_salts)
    )
    partial = aggs(salted.groupBy(*key_cols, "__salt"))
    return partial.groupBy(*key_cols).agg(*finals)


def salt_column(df: DataFrame, key_cols: Sequence[str],
                salt_source: str | None, n_salts: int) -> Column:
    """The salt expression used by :func:`salted_agg` — exposed so the
    spread can be asserted directly in tests."""
    if salt_source is not None:
        salt_cols = [F.col(salt_source)]
    else:
        candidates = [c for c in df.columns if c not in key_cols]
        salt_cols = [F.col(c) for c in (candidates or list(key_cols))]
    return F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts))


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                n_salts: int = 16, salt_source: str | None = None,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the BIG (skewed) side, replicate the
    small side ``n_salts`` ways, join on ``on + [salt]`` — each hot
    key's rows land on ``n_salts`` reducers instead of one, and every
    big row still meets exactly the one replica carrying its salt, so
    the result is row-for-row the plain join's.

    The salt is DETERMINISTIC (hash of the big side's non-key columns,
    :func:`salt_column`) — no RNG state to ship to executors, results
    reproducible across retries and replays.  The replication is one
    ``explode`` of a constant n_salts-element array: the small side
    pays a fixed n_salts× fan-out, the big side none, so choose
    n_salts ≈ the skew factor, not larger.

    Only ``inner`` and ``left`` (big side preserved) are supported:
    right/full-outer would surface the replicated small side's
    unmatched rows once PER REPLICA — a correctness trap this guard
    turns into a loud error."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (the big side is "
            f"the preserved side), got {how!r}"
        )
    on = list(on)
    salted_big = big.withColumn(
        "__salt", salt_column(big, on, salt_source, n_salts)
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(
        replicated, on + ["__salt"], how
    ).drop("__salt")
