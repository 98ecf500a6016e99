"""Skew mitigation: salted two-phase aggregation.

Hot grouping keys (few distinct values, or power-law key frequency)
bottleneck a single reducer per key.  Salting splits each key into
``n_salts`` sub-groups for the partial phase, then combines the
partials — the map-side work is identical, the reduce-side hot spot is
spread ``n_salts`` ways.  Spark's own partial aggregation already does
map-side combine; salting additionally parallelizes the REDUCE side,
which matters when per-key state is large (big sums of distinct-ish
values, collect-style aggs) or key cardinality is tiny.

(For skewed JOINS, prefer AQE's skew-join splitting —
``spark.sql.adaptive.skewJoin.enabled`` — which the session factory
turns on; this module covers the aggregation side.)
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
    the second phase.  ``salt_source`` picks the column hashed into the
    salt (defaults to a uniform random-ish spread via ``spark_partition_id``
    + monotonically increasing id would be non-deterministic, so we hash
    the full row's first non-key column when unspecified).
    """
    key_cols = list(key_cols)
    if salt_source is None:
        candidates = [c for c in df.columns if c not in key_cols]
        salt_source = candidates[0] if candidates else key_cols[0]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    )
    partial = aggs(salted.groupBy(*key_cols, "__salt"))
    return partial.groupBy(*key_cols).agg(*finals)
