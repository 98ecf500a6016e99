"""Stream-stream joins (SURVEY.md §2 B9).

The reference never joins its two streams — BOOK and TICK are demuxed
and sunk independently (main.rs:75-167) — but the storage layout it
builds (per-symbol, time-clustered) exists exactly so a consumer can
correlate them later.  ``interval_join`` is that correlation done in
the engine itself: events from one stream matched to same-key events
of another within a bounded event-time lookback (e.g. every TICK with
the BOOK updates of the preceding minute, or ad views attributed to a
purchase).

Spark executes this as a watermarked stream-stream inner join: both
sides are hash-partitioned on the join key (co-partitioned state
stores), and the interval condition plus the watermarks bound how long
either side is buffered — state is evicted once the watermark passes
``ts - lookback``, so state size is O(rate × lookback) per key, never
unbounded.  The same helper works on batch frames (watermarks are
skipped), which is what the parity test exploits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  left_ts: str, right_ts: str, lookback: str,
                  watermark: str = "1 hour") -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` with equal ``on`` key
    and ``right_ts`` in ``[left_ts - lookback, left_ts]``.

    ``left``/``right`` may be streaming (watermark applied on both
    sides — required for state eviction in a stream-stream join) or
    batch (identical semantics, no watermark).  Non-key column names
    must be disjoint between the two sides; the shared key column is
    emitted once, from the left side.
    """
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"non-key columns shared between sides: {sorted(overlap)}; "
            "rename before joining"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}")
           >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{on}"))
