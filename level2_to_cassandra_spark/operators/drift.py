"""Distribution-drift scoring against a frozen reference histogram.

q_drift_psi (queries/traindata.py) is the BATCH spec: both windows
live in one table and the whole pipeline — reference bounds, 10
equal-width bins, Laplace-smoothed PSI, 0.2 alarm — replays inside a
single hash-verified query.  Production monitors don't get that
luxury: the reference window is scored ONCE into a small histogram
relation and every incoming batch is compared against it, long after
the reference rows are gone.  This module is that split:

* :func:`reference_cells` — one pass over the reference window →
  the per-(key, bin) histogram WITH the bin bounds and totals it was
  built from (a #keys×10-row relation: broadcast-sized forever);
* :func:`psi_against_reference` — score any batch against it.

The math is character-identical to q_drift_psi (same clipped
equal-width binning off the reference min/max, same +1/+n_bins
Laplace smoothing, same rounded-then-compared alarm), and
tests/test_streaming.py pins parity: splitting the fixture at the
query's date cut and scoring the second half through this module
reproduces the query's per-key psi/flag exactly.  Keeping the
query's inline form untouched preserves its DuckDB-oracle status —
the operator inherits the verification through the parity test (the
fold-form-vs-kernel discipline used across operators/similarity.py).

Scale shape: scoring a batch is one broadcast join of the tiny
reference relation onto the batch scan, one (key, bin) count
aggregate, and a cells-sized fold — nothing grows with batch size
except the map-side binning pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from level2_to_cassandra_spark.functions import round_half_up

#: Fixed bin count — also the Laplace denominator offset, so it is
#: part of the scoring contract, not a tuning knob to vary per call.
N_BINS = 10

#: Conventional PSI alarm threshold (compared against the ROUNDED psi,
#: exactly like q_drift_psi, so a sub-ulp ln() divergence cannot flip
#: the flag).
PSI_ALARM = 0.2


def _bin_expr() -> F.Column:
    """Clipped equal-width bin off reference ``lo``/``hi`` — the same
    expression q_drift_psi inlines (hi == lo collapses to bin 0
    explicitly; out-of-range batch values clip into the edge bins,
    which is how range escapes surface as drift)."""
    return (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * F.lit(float(N_BINS))
                    ),
                    F.lit(0),
                ),
                F.lit(N_BINS - 1),
            )
        )
        .cast("long")
        .alias("bin")
    )


def reference_cells(ref: DataFrame, key_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Freeze the reference window into its scoring histogram:
    ``(key, bin, c_ref, lo, hi, n_ref)`` — one row per OCCUPIED bin
    (absent bins score as zero-count at comparison time).  One scan +
    one broadcast of the per-key bounds back over it; the result is
    #keys × ≤N_BINS rows, small enough to broadcast against every
    future batch."""
    named = ref.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    )
    bounds = named.groupBy("key").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = named.join(F.broadcast(bounds), "key").select(
        "key", "lo", "hi", _bin_expr()
    )
    return (
        binned.groupBy("key", "bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("c_ref"))
        .withColumn(
            "n_ref", F.sum("c_ref").over(Window.partitionBy("key"))
        )
    )


def cluster_reference_cells(labels: DataFrame,
                            cell_col: str = "cell") -> DataFrame:
    """Freeze a labeled cohort into its cluster-occupancy histogram:
    ``(cell, c_ref, n_ref)`` — one row per OCCUPIED cell.  This is the
    embedding-space analog of :func:`reference_cells`: the "bins" are
    the cells of a frozen coarse quantizer (e.g. the session's
    materialized k-means label table, queries/llm.py::
    _kmeans_assignment), so no bounds accompany the histogram — the
    quantizer itself is the binning function.  The result is ≤n_cells
    rows: broadcast-sized forever."""
    cells = labels.groupBy(F.col(cell_col).alias("cell")).agg(
        F.count(F.lit(1)).alias("c_ref")
    )
    return cells.withColumn(
        "n_ref", F.sum("c_ref").over(Window.partitionBy())
    )


def psi_against_cluster_reference(batch_labels: DataFrame, ref: DataFrame,
                                  n_cells: int,
                                  cell_col: str = "cell") -> DataFrame:
    """Score one already-quantized batch against a
    :func:`cluster_reference_cells` histogram: per-cell
    ``(cluster_id, c_ref, c_cur, psi_term, psi, drift_flag)`` —
    character-identical algebra to q_drift_embedding (queries/llm.py),
    whose Laplace denominator is the QUANTIZER's cell count
    (``n_cells``), not the occupied-cell count — pass the k the frozen
    quantizer was built with.  Cells occupied on only one side
    contribute their smoothed term (full outer, zero-filled), exactly
    like the query's single-aggregate cells relation; a cell empty in
    BOTH cohorts contributes nothing there and nothing here."""
    bcells = batch_labels.groupBy(F.col(cell_col).alias("cell")).agg(
        F.count(F.lit(1)).alias("c_cur")
    )
    rcells = ref.select("cell", "c_ref")
    w = Window.partitionBy()
    cells = (
        rcells.join(
            bcells,
            rcells["cell"].eqNullSafe(bcells["cell"]),
            "full_outer",
        )
        .select(
            F.coalesce(rcells["cell"], bcells["cell"]).alias("cell"),
            F.coalesce(rcells["c_ref"], F.lit(0)).alias("c_ref"),
            F.coalesce(bcells["c_cur"], F.lit(0)).alias("c_cur"),
        )
        .withColumn("n_ref", F.sum("c_ref").over(w))
        .withColumn("n_cur", F.sum("c_cur").over(w))
    )
    k = float(n_cells)
    p_cur = (F.col("c_cur").cast("double") + F.lit(1.0)) / (
        F.col("n_cur").cast("double") + F.lit(k)
    )
    p_ref = (F.col("c_ref").cast("double") + F.lit(1.0)) / (
        F.col("n_ref").cast("double") + F.lit(k)
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    psi = round_half_up(F.sum(term).over(w), 6)
    return cells.select(
        F.col("cell").cast("long").alias("cluster_id"),
        F.col("c_ref").cast("long").alias("c_ref"),
        F.col("c_cur").cast("long").alias("c_cur"),
        round_half_up(term, 6).alias("psi_term"),
        psi.alias("psi"),
        (psi > F.lit(PSI_ALARM)).alias("drift_flag"),
    )


def psi_against_reference(batch: DataFrame, ref: DataFrame,
                          key_col: str = "event_type",
                          value_col: str = "value") -> DataFrame:
    """Score one batch against a :func:`reference_cells` histogram:
    ``(key, n_ref, n_batch, psi, drift_flag)`` per reference key.

    Bins occupied on only one side still contribute their smoothed
    term (full-outer on (key, bin), zero-filled counts) — identical
    cell algebra to q_drift_psi's single-aggregate form.  NULL values
    bin to a NULL bin, and q_drift_psi's groupBy treats that NULL bin
    as ONE cell across both windows — so the bin leg of the join is
    NULL-SAFE equality (a plain ``=`` would keep the ref-side and
    batch-side NULL cells apart and double their smoothed terms).
    NULL KEYS are different (ADVICE r11): the batch spec's bounds join
    is an inner equi-join USING (event_type), so NULL-key rows never
    reach its cell relation — they are DROPPED, not scored as a group
    (SQL ``NULL = NULL`` is not true).  This twin's inner key joins
    (here and in :func:`reference_cells`) drop them through the same
    shape, which IS batch parity — pinned by
    test_drift_operator_parity_with_null_keys.  Keys absent from the
    reference are not scored (there is no distribution to compare
    against); keys absent from the batch score with an empty current
    histogram, which is itself maximal drift signal."""
    kb = ref.select("key", "lo", "hi", "n_ref").distinct()
    bcells = (
        batch.select(
            F.col(key_col).alias("key"), F.col(value_col).alias("value")
        )
        .join(F.broadcast(kb), "key")
        .select("key", _bin_expr())
        .groupBy("key", "bin")
        .agg(F.count(F.lit(1)).alias("c_cur"))
    )
    rcells = ref.select("key", "bin", "c_ref")
    cells = (
        rcells.join(
            bcells,
            (rcells["key"] == bcells["key"])
            & rcells["bin"].eqNullSafe(bcells["bin"]),
            "full_outer",
        )
        .select(
            F.coalesce(rcells["key"], bcells["key"]).alias("key"),
            F.coalesce(rcells["c_ref"], F.lit(0)).alias("c_ref"),
            F.coalesce(bcells["c_cur"], F.lit(0)).alias("c_cur"),
        )
        .join(F.broadcast(kb.select("key", "n_ref")), "key")
        .withColumn(
            "n_cur",
            F.sum("c_cur").over(Window.partitionBy("key")),
        )
    )
    p_cur = (F.col("c_cur").cast("double") + F.lit(1.0)) / (
        F.col("n_cur").cast("double") + F.lit(float(N_BINS))
    )
    p_ref = (F.col("c_ref").cast("double") + F.lit(1.0)) / (
        F.col("n_ref").cast("double") + F.lit(float(N_BINS))
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    psi = round_half_up(F.sum(term), 6)
    return (
        cells.groupBy("key", "n_ref", "n_cur")
        .agg(
            psi.alias("psi"),
        )
        .select(
            "key",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_batch"),
            "psi",
            (F.col("psi") > F.lit(PSI_ALARM)).alias("drift_flag"),
        )
    )


#: Conventional KS alarm threshold — compared against the ROUNDED
#: statistic exactly like q_drift_ks (queries/traindata.py), which is
#: the hash-verified BATCH spec this split replays.
KS_ALARM = 0.1


def ks_reference_dist(ref: DataFrame, key_col: str = "event_type",
                      value_col: str = "value") -> DataFrame:
    """Freeze the reference window into its exact VALUE DISTRIBUTION:
    ``(key, value, n_ref_v)`` — one row per distinct (key, value) with
    its reference count.  The KS analog of :func:`reference_cells`:
    where PSI freezes 10 bins, exact KS must keep every distinct value
    (the grid is value-cardinality-bounded — the tf-postings scale
    class, same honesty note as q_drift_ks's docstring).  NULL/NaN
    values are excluded exactly as in the batch spec.  Per-key totals
    are NOT materialized here — :func:`ks_against_reference` derives
    them in its final aggregate anyway, and a totals window would cost
    an extra key exchange over the grid at build time for a column the
    scorer discards (self-review r14)."""
    named = ref.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    ).where(F.col("value").isNotNull() & ~F.isnan("value"))
    return named.groupBy("key", "value").agg(
        F.count(F.lit(1)).alias("n_ref_v")
    )


def ks_against_reference(batch: DataFrame, ref: DataFrame,
                         key_col: str = "event_type",
                         value_col: str = "value") -> DataFrame:
    """Exact Kolmogorov-Smirnov of one batch against a
    :func:`ks_reference_dist` grid: ``(key, n_ref, n_batch, ks,
    drift_flag)`` per key present in BOTH windows (the q_drift_ks
    omission rule — no distribution, no comparison).

    Algebra character-identical to the batch spec: the batch collapses
    to ITS distinct-value counts (one batch-scale aggregate), full-
    outer-merges with the frozen grid on (key, value) — zero-filled,
    so each side's CDF steps only at its own values but is EVALUATED
    at the union grid, which is exactly where the sup lives — then one
    cumulative window + max per key.  The key leg of the merge is
    NULL-SAFE (the batch spec's groupBy keeps a NULL key as one
    group); values are non-NULL by the shared filter, so plain
    equality is exact there.  Per batch the added work is one
    (key, value) aggregate + union-grid-sized window arithmetic —
    nothing grows with batch size except the map-side pass."""
    bdist = (
        batch.select(
            F.col(key_col).alias("key"), F.col(value_col).alias("value")
        )
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("key", "value")
        .agg(F.count(F.lit(1)).alias("n_cur_v"))
    )
    rdist = ref.select("key", "value", "n_ref_v")
    grid = (
        rdist.join(
            bdist,
            rdist["key"].eqNullSafe(bdist["key"])
            & (rdist["value"] == bdist["value"]),
            "full_outer",
        )
        .select(
            F.coalesce(rdist["key"], bdist["key"]).alias("key"),
            F.coalesce(rdist["value"], bdist["value"]).alias("value"),
            F.coalesce(rdist["n_ref_v"], F.lit(0)).alias("n_ref_v"),
            F.coalesce(bdist["n_cur_v"], F.lit(0)).alias("n_cur_v"),
        )
    )
    w_cum = (
        Window.partitionBy("key")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("key")
    # NULLIF mirrors the batch spec's one-sided-key guard: a key in
    # only one window is omitted by the final filter, but ANSI mode
    # would throw DIVIDE_BY_ZERO on the ratio first (r14 null-key
    # parity test); NULL ratios fold away inside MAX.
    f_ref = (
        F.sum("n_ref_v").over(w_cum).cast("double")
        / F.nullif(F.sum("n_ref_v").over(w_tot), F.lit(0))
    )
    f_cur = (
        F.sum("n_cur_v").over(w_cum).cast("double")
        / F.nullif(F.sum("n_cur_v").over(w_tot), F.lit(0))
    )
    from level2_to_cassandra_spark.functions import round_signless

    ks = round_signless(F.max(F.abs(F.col("f_ref") - F.col("f_cur"))), 6)
    return (
        grid.select(
            "key", "n_ref_v", "n_cur_v",
            f_ref.alias("f_ref"), f_cur.alias("f_cur"),
        )
        .groupBy("key")
        .agg(
            F.sum("n_ref_v").cast("long").alias("n_ref"),
            F.sum("n_cur_v").cast("long").alias("n_batch"),
            ks.alias("ks"),
            (ks > F.lit(KS_ALARM)).alias("drift_flag"),
        )
        .where((F.col("n_ref") > 0) & (F.col("n_batch") > 0))
    )
