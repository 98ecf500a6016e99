"""Order-book snapshot analytics (operators/book.py): hand-computed
correctness, one-sided/degenerate books, the top-k depth cut, and
stream/batch parity (the aggregate is a streaming-supported
conditional agg — same expression, same results)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from level2_to_cassandra_spark.operators.book import book_snapshot_metrics

ROWS = [
    # symbol, time, price, volume, type — snapshot 1: two-sided book
    ("EURUSD", "t1", 1.10, 5.0, "BID"),
    ("EURUSD", "t1", 1.09, 3.0, "bid"),
    ("EURUSD", "t1", 1.12, 2.0, "ASK"),
    ("EURUSD", "t1", 1.13, 4.0, "ask"),
    # snapshot 2: bids only
    ("EURUSD", "t2", 1.11, 7.0, "bid"),
    # snapshot 3: another symbol, equal best-price bid rows (dup level)
    ("GBPUSD", "t1", 2.00, 1.0, "bid"),
    ("GBPUSD", "t1", 2.00, 6.0, "bid"),
    ("GBPUSD", "t1", 2.10, 8.0, "ask"),
    # ignored side label
    ("GBPUSD", "t1", 9.99, 9.0, "unknown"),
]
SCHEMA = "symbol string, time string, price double, volume double, type string"


def _metrics_map(df):
    return {(r.symbol, r.time): r.asDict() for r in df.collect()}


def test_book_metrics_hand_computed(spark):
    got = _metrics_map(
        book_snapshot_metrics(spark.createDataFrame(ROWS, SCHEMA))
    )
    m = got[("EURUSD", "t1")]
    assert m["best_bid"] == 1.10 and m["best_ask"] == 1.12
    assert m["bid_vol"] == 8.0 and m["ask_vol"] == 6.0
    assert m["bid_levels"] == 2 and m["ask_levels"] == 2
    assert abs(m["spread"] - 0.02) < 1e-12
    assert abs(m["mid"] - 1.11) < 1e-12
    assert abs(m["imbalance"] - 8.0 / 14.0) < 1e-12
    # microprice from BEST-level volumes: (2*1.10 + 5*1.12) / 7
    assert abs(m["microprice"] - (2 * 1.10 + 5 * 1.12) / 7) < 1e-12

    one_sided = got[("EURUSD", "t2")]
    assert one_sided["best_bid"] == 1.11 and one_sided["best_ask"] is None
    assert one_sided["spread"] is None and one_sided["mid"] is None
    assert one_sided["imbalance"] == 1.0
    assert one_sided["microprice"] is None

    dup = got[("GBPUSD", "t1")]
    # duplicate best-price rows: volumes SUM, best-level keeps larger
    assert dup["best_bid"] == 2.00 and dup["bid_vol"] == 7.0
    assert abs(dup["microprice"] - (8 * 2.00 + 6 * 2.10) / 14) < 1e-12
    # unknown side label ignored entirely
    assert dup["ask_vol"] == 8.0 and dup["ask_levels"] == 1


def test_book_metrics_top_k_depth_cut(spark):
    rows = [
        ("S", "t", 10.0, 1.0, "bid"),
        ("S", "t", 9.0, 2.0, "bid"),
        ("S", "t", 8.0, 4.0, "bid"),   # cut at top_k=2
        ("S", "t", 11.0, 3.0, "ask"),
        ("S", "t", 12.0, 5.0, "ask"),
        ("S", "t", 13.0, 7.0, "ask"),  # cut
    ]
    m = _metrics_map(
        book_snapshot_metrics(spark.createDataFrame(rows, SCHEMA), top_k=2)
    )[("S", "t")]
    assert m["bid_vol"] == 3.0 and m["ask_vol"] == 8.0
    assert m["bid_levels"] == 2 and m["ask_levels"] == 2
    assert m["best_bid"] == 10.0 and m["best_ask"] == 11.0


def test_book_metrics_stream_batch_parity(spark, tmp_path):
    src = tmp_path / "book_rows"
    src.mkdir()
    (src / "rows.jsonl").write_text("\n".join(
        json.dumps(dict(zip(
            ("symbol", "time", "price", "volume", "type"), r
        ))) for r in ROWS
    ))
    batch = _metrics_map(
        book_snapshot_metrics(spark.read.schema(SCHEMA).json(str(src)))
    )
    stream = book_snapshot_metrics(
        spark.readStream.schema(SCHEMA).json(str(src))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("book_metrics_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    got = _metrics_map(spark.table("book_metrics_sink"))
    assert got == batch


def test_book_metrics_invariants_random_books(spark):
    """Random two-sided books: imbalance ∈ [0,1]; the microprice is a
    convex combination of best bid and best ask so it lies inside
    [best_bid, best_ask]; spread = ask − bid; level counts conserve."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    for snap in range(20):
        n_bid, n_ask = rng.randint(1, 6), rng.randint(1, 6)
        base = 100 + rng.rand() * 10
        for i in range(n_bid):
            rows.append(("S", f"t{snap}", round(base - 0.01 * (i + 1), 4),
                         float(rng.randint(1, 50)), "bid"))
        for i in range(n_ask):
            rows.append(("S", f"t{snap}", round(base + 0.01 * (i + 1), 4),
                         float(rng.randint(1, 50)), "ask"))
    df = spark.createDataFrame(rows, SCHEMA)
    out = book_snapshot_metrics(df).collect()
    assert len(out) == 20
    per_snap = {}
    for r in rows:
        k = r[1]
        per_snap.setdefault(k, [0, 0])[0 if r[4] == "bid" else 1] += 1
    for m in out:
        assert 0.0 <= m.imbalance <= 1.0
        assert m.best_bid < m.best_ask
        assert abs(m.spread - (m.best_ask - m.best_bid)) < 1e-9
        assert m.best_bid - 1e-9 <= m.microprice <= m.best_ask + 1e-9
        assert (m.bid_levels, m.ask_levels) == tuple(per_snap[m.time])
