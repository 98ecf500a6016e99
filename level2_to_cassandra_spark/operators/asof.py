"""As-of (point-in-time) join — THE level-2 market-data join.

"Latest tick at-or-before t per symbol" is what the reference's
Cassandra layout (partition by symbol, cluster by time DESC,
main.rs:87-88) exists to answer with a 1-row slice; PySpark's
DataFrame API has no native ASOF join, so this implements it as the
union-merge pattern:

    tag left/right → union on (key, time) → one hash partition per key
    → in-partition sort → last(right_payload, ignorenulls) running fill
    → keep left rows

Cost: ONE shuffle on the key columns (both inputs), one sort — the same
shape as a sort-merge join, with no row explosion (contrast a naive
range join + groupBy-max which shuffles twice and explodes candidate
pairs).  At 100 TB this is the only as-of formulation that stays
linear; skewed keys are handled by AQE skew splitting since the window
is per-key.

Ties: right rows at time == left time DO match (backward inclusive,
DuckDB/pandas ``merge_asof`` semantics).  For full determinism when the
right side has duplicate timestamps per key, dedup it first
(``operators.dedup.latest_by_key``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] | None = None,
    prefix: str = "r_",
    strict: bool = False,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join: backward (default), forward, or nearest.

    Backward: for each left row, attach the right row with the
    greatest ``on`` value ≤ (or < if ``strict``) the left's, within
    the same ``by`` group.  ``direction="forward"`` mirrors it (pandas
    ``merge_asof(direction='forward')``): the right row with the
    SMALLEST ``on`` ≥ (or > if ``strict``) the left's — "next quote
    at-or-after t", the fill shape of settlement/next-bar lookups.
    Same union-merge plan either way: one shuffle, one sort, a
    running fill (``last`` over the preceding frame backward,
    ``first`` over the following frame forward).  Right columns come
    back as ``{prefix}{col}`` (the right ``on`` column is included
    automatically); all-NULL when no match.

    ``direction="nearest"`` (pandas ``merge_asof(direction='nearest')``)
    attaches whichever of the backward/forward candidates is closer in
    absolute ``on`` distance, ties to the backward one (pandas'
    bdiff ≤ fdiff rule).  Cost is the SAME single shuffle: non-strict,
    both candidate fills are frames over one partition ordering and
    share a single WindowExec (one sort); ``strict=True`` (exclude
    exact-time matches from both sides) needs the backward fill on the
    mirrored tie ordering, costing a second in-partition sort — still
    never two joins reconciled after the fact.  ``tolerance`` bounds
    the absolute distance of each candidate before the choice.

    ``tolerance`` (pandas ``merge_asof`` semantics): additionally
    require left.on − right.on ≤ tolerance — a match older than the
    staleness bound comes back all-NULL exactly like no match at all.
    Units: MICROSECONDS when ``on`` is a timestamp, the column's own
    units when numeric.  Applied as a post-fill predicate on the
    matched struct, so the plan shape (one shuffle, one sort, running
    fill) is unchanged — the bound costs one comparison per row, not
    a different join strategy.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by]
    if on not in right_cols:
        right_cols = list(right_cols) + [on]

    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
    )
    l = left.select(
        "*",
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    if direction == "nearest":
        return _asof_nearest(left, l, r, on, by, right_cols, prefix,
                             strict, tolerance)
    # Tie handling via the side sort key.  Backward: right rows sort
    # BEFORE left at equal time so the preceding-frame `last` sees
    # them ("<=" matches); strict sorts them after ("<").  Forward is
    # the mirror: right rows sort AFTER left at equal time so the
    # following-frame `first` sees them (">=" matches); strict sorts
    # them before (">").
    if direction == "forward":
        side_order = F.desc("__side") if not strict else F.asc("__side")
        frame = (Window.currentRow, Window.unboundedFollowing)
        fill = F.first
    else:
        side_order = F.asc("__side") if not strict else F.desc("__side")
        frame = (Window.unboundedPreceding, Window.currentRow)
        fill = F.last
    w = (
        Window.partitionBy(*by)
        .orderBy(F.asc("__t"), side_order)
        .rowsBetween(*frame)
    )
    filled = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__match", fill("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance is not None:
        lt, rt = F.col("__t"), F.col(f"__match.{on}")
        if isinstance(left.schema[on].dataType, T.TimestampType):
            lt, rt = F.unix_micros(lt), F.unix_micros(rt)
        diff = (rt - lt) if direction == "forward" else (lt - rt)
        filled = filled.withColumn(
            "__match", F.when(diff <= F.lit(tolerance), F.col("__match"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return filled.select(*out_cols)


def _asof_nearest(left, l, r, on, by, right_cols, prefix,
                  strict, tolerance) -> DataFrame:
    """(internal) the nearest-direction tail of :func:`asof_join`.

    Non-strict: one partition sort carries BOTH candidate fills —
    rights sort before lefts at equal time (backward-inclusive order),
    the preceding-frame ``last`` is the backward candidate, the
    following-frame ``first`` the forward one; different frames over
    the SAME ordering share a single WindowExec, so the plan is one
    shuffle + one sort.  By that ordering the forward candidate is
    always strictly later than the left row (equal-time rights sit in
    the preceding frame), which is exactly right: an equal-time match
    belongs to the backward candidate, whose 0 distance wins every
    choice it is allowed to enter.

    Strict (pandas ``allow_exact_matches=False``) needs BOTH fills to
    skip past equal-time rights and fall back to the next
    strictly-earlier / strictly-later row — a post-filter on the
    non-strict fills cannot do that (nulling an equal-time backward
    candidate loses the strictly-earlier row it shadowed: confirmed
    against pandas, self-review r09), so the backward fill instead
    runs over the MIRRORED tie order (rights after lefts), whose
    preceding frame excludes the equal group by position.  Two
    orderings = two WindowExec + one extra in-partition sort, still
    the single shuffle."""
    order_rights_first = [F.asc("__t"), F.asc("__side")]
    w_fwd = (
        Window.partitionBy(*by).orderBy(*order_rights_first)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if strict:
        # rights sort AFTER lefts at ties: the preceding frame holds
        # only strictly-earlier rights (and w_fwd above already holds
        # only strictly-later ones under rights-first ordering)
        w_back = (
            Window.partitionBy(*by).orderBy(F.asc("__t"), F.desc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w_back = (
            Window.partitionBy(*by).orderBy(*order_rights_first)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    cand = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__b", F.last("__r", ignorenulls=True).over(w_back))
        .withColumn("__f", F.first("__r", ignorenulls=True).over(w_fwd))
        .where(F.col("__side") == 1)
    )
    lt = F.col("__t")
    bt, ft = F.col(f"__b.{on}"), F.col(f"__f.{on}")
    if isinstance(left.schema[on].dataType, T.TimestampType):
        lt, bt, ft = F.unix_micros(lt), F.unix_micros(bt), F.unix_micros(ft)
    if tolerance is not None:
        cand = cand.withColumn(
            "__b", F.when(lt - bt <= F.lit(tolerance), F.col("__b"))
        ).withColumn(
            "__f", F.when(ft - lt <= F.lit(tolerance), F.col("__f"))
        )
    choose_b = F.col("__b").isNotNull() & (
        F.col("__f").isNull() | ((lt - bt) <= (ft - lt))
    )
    matched = cand.withColumn(
        "__match", F.when(choose_b, F.col("__b")).otherwise(F.col("__f"))
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return matched.select(*out_cols)
