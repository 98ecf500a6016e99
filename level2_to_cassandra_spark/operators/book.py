"""Order-book snapshot analytics over exploded level rows.

The reference flattens each BOOK payload into per-level rows
(symbol, price, time, volume, type — main.rs:75-104, the relation its
Cassandra ``{topic}_book`` tables store) and stops there; these
operators compute the metrics a market-data consumer actually derives
from that relation: best bid/ask, spread, mid, volume imbalance and
the volume-weighted microprice, per (symbol, time) snapshot.

Shape: pure conditional aggregation — ONE shuffle on the snapshot key,
map-side partial aggregation, no join, no window — so the same
expression runs identically over the batch relation and a streaming
``groupBy`` (it is a streaming-supported aggregate; the optional
``top_k`` depth cut adds a ranking window and is therefore batch-only,
matching how depth-limited analytics are computed from stored
snapshots rather than in-flight).  Best-level volumes ride a
``max(struct(price, volume))`` / ``min(struct(...))`` pair, so no
second pass re-visits the best price's row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def book_snapshot_metrics(book: DataFrame, top_k: int | None = None,
                          bid_label: str = "bid",
                          ask_label: str = "ask") -> DataFrame:
    """Per-(symbol, time) snapshot metrics from per-level book rows.

    Input columns: ``symbol, time, price, volume, type`` (``type``
    matched case-insensitively against ``bid_label``/``ask_label``
    after the ingest path's BOOK_TYPE_ prefix strip; other types are
    ignored).  Output per snapshot:

    * ``best_bid`` / ``best_ask`` — max bid price / min ask price
      (NULL when that side is empty);
    * ``bid_vol`` / ``ask_vol`` — summed volume per side (across the
      ``top_k`` best levels when given, else the whole side);
    * ``bid_levels`` / ``ask_levels`` — level counts;
    * ``spread`` = best_ask − best_bid, ``mid`` = their midpoint;
    * ``imbalance`` = bid_vol / (bid_vol + ask_vol) — 1.0 means all
      resting volume is bids (NULL only when both sides are empty,
      which cannot occur: such snapshots produce no rows at all);
    * ``microprice`` — the best-level volume-weighted mid
      (ask_vol₀·bid₀ + bid_vol₀·ask₀) / (bid_vol₀ + ask_vol₀), the
      standard short-horizon fair-price estimator; NULL if either
      side is empty or both best-level volumes are zero.

    Duplicate price levels: volumes sum; for the best-level volume the
    struct extremum keeps the larger volume among rows tied at the
    best price (bids) / the smaller (asks) — a deterministic rule that
    matters only for malformed feeds that repeat a price level.

    ``top_k``: depth cut — keep only each side's ``top_k`` best price
    levels (bids descending, asks ascending; ties broken by volume
    then arbitrary-but-deterministic input order is NOT relied on:
    rank orders by (signed price, volume)).  Batch-only (adds one
    ranking window over the same snapshot key)."""
    side = F.lower(F.col("type"))
    is_bid = side == bid_label.lower()
    df = book.where(side.isin(bid_label.lower(), ask_label.lower()))
    if top_k is not None:
        # one window, both sides: ordering by the SIGNED price puts the
        # best level first for bids (-price asc) and asks (price asc)
        best_first = F.when(is_bid, -F.col("price")).otherwise(
            F.col("price")
        )
        rk = F.row_number().over(
            Window.partitionBy(F.col("symbol"), F.col("time"), side)
            .orderBy(best_first.asc(), F.col("volume").desc())
        )
        df = df.withColumn("__rk", rk).where(F.col("__rk") <= top_k)
    bid_price = F.when(is_bid, F.col("price"))
    ask_price = F.when(~is_bid, F.col("price"))
    agg = df.groupBy("symbol", "time").agg(
        F.max(bid_price).alias("best_bid"),
        F.min(ask_price).alias("best_ask"),
        F.sum(F.when(is_bid, F.col("volume")).otherwise(F.lit(0.0)))
        .alias("bid_vol"),
        F.sum(F.when(~is_bid, F.col("volume")).otherwise(F.lit(0.0)))
        .alias("ask_vol"),
        F.count(F.when(is_bid, F.lit(1))).alias("bid_levels"),
        F.count(F.when(~is_bid, F.lit(1))).alias("ask_levels"),
        # best-level volumes without a second pass: the struct extremum
        # on (price, volume) carries the best price's volume along
        F.max(F.when(is_bid, F.struct(F.col("price"), F.col("volume"))))
        .alias("__bb"),
        F.min(F.when(~is_bid, F.struct(F.col("price"), F.col("volume"))))
        .alias("__ba"),
    )
    bb_vol = F.col("__bb.volume")
    ba_vol = F.col("__ba.volume")
    micro_den = bb_vol + ba_vol
    return agg.select(
        "symbol",
        "time",
        "best_bid",
        "best_ask",
        "bid_vol",
        "ask_vol",
        "bid_levels",
        "ask_levels",
        (F.col("best_ask") - F.col("best_bid")).alias("spread"),
        ((F.col("best_bid") + F.col("best_ask")) / 2).alias("mid"),
        (F.col("bid_vol") / (F.col("bid_vol") + F.col("ask_vol")))
        .alias("imbalance"),
        F.when(
            micro_den > 0,
            (ba_vol * F.col("best_bid") + bb_vol * F.col("best_ask"))
            / micro_den,
        ).alias("microprice"),
    )
