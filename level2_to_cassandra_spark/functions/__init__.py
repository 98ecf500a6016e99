"""Engine scalar-function helpers shared across query modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int) -> Column:
    """Cross-engine-deterministic rounding: FLOOR(x·10^s + 0.5)/10^s.

    Spark's ``round`` does HALF_UP on the double's shortest decimal
    representation while DuckDB rounds the binary value — they disagree
    whenever the value's repr ends exactly in '5' at the target scale
    (frequent on synthetic data).  This formula uses only IEEE-754 ops,
    so identical inputs give identical outputs in ANY engine; pair it
    with ``round_half_up_sql`` in oracle SQL.
    """
    p = float(10**scale)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def round_half_up_sql(expr: str, scale: int) -> str:
    """DuckDB-side twin of :func:`round_half_up`."""
    p = 10**scale
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"


def positive_or_none(raw: str | None, name: str) -> int | None:
    """Validate a trigger-cap setting: a positive int, or None/'' for
    unset.  '0' is a truthy STRING, so `int(raw) if raw else None`
    shipped 0 through to the source, where a 0-file/0-offset cap
    silently stops the stream from progressing (ADVICE r07 low).  ONE
    definition shared by the l2wire source and PipelineConfig.from_env
    so the two surfaces cannot drift (self-review r09)."""
    if raw is None or raw == "":
        return None
    value = int(raw)
    if value < 1:
        raise ValueError(f"{name} must be a positive integer, got {raw!r}")
    return value
