"""Deduplication operators.

``latest_by_key`` is the batch semantic of the reference sink's keyed
upsert (Cassandra ``PRIMARY KEY (symbol, time, price)`` last-write-wins,
reference main.rs:87,145): deterministic "keep newest row per key" —
unlike ``dropDuplicates`` which keeps an *arbitrary* row.

``exact_dedup`` / ``content_hash`` cover exact content dedup for
training-data pipelines; near-dup (MinHash/SimHash/Jaccard) lives in
this module too.  All operators are single-shuffle: one hash exchange on
the dedup key, no driver collection — the shape that survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(df: DataFrame, keys: Sequence[str],
                  order: Sequence[Column]) -> DataFrame:
    """Keep exactly one row per ``keys`` — the first under ``order``.

    Pass e.g. ``order=[F.desc("ts")]`` for last-write-wins.  Include a
    unique tiebreaker in ``order`` for full determinism.  Plan: one
    shuffle on ``keys`` + in-partition sort + filter (row_number()==1);
    AQE handles skewed keys.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_hash(col: Column | str, bits: int = 256) -> Column:
    """Stable content hash for exact dedup: sha2 (collision-safe at any
    corpus size) — use xxhash64 only for non-adversarial bucketing."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, bits)


def exact_dedup(df: DataFrame, text_col: str = "text",
                tiebreak: Sequence[Column] | None = None) -> DataFrame:
    """Exact-content dedup: group rows by sha2(text), keep the first
    row under ``tiebreak`` (default: ascending natural order of all
    remaining columns is NOT assumed — caller supplies determinism)."""
    order = list(tiebreak) if tiebreak else [F.asc(text_col)]
    return latest_by_key(
        df.withColumn("__h", content_hash(text_col)), ["__h"], order
    ).drop("__h")
