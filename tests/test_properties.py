"""Property-based spot checks (SURVEY.md §5.2.5, hypothesis):
cumulative-sum invariants, dedup idempotence, as-of join laws —
random tick streams through the REAL batch pipeline code.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from level2_to_cassandra_spark.sources import ENVELOPE_WITH_SEQ
from level2_to_cassandra_spark.streaming.pipeline import (
    PipelineConfig,
    tick_rows_batch,
)
from level2_to_cassandra_spark.streaming.sink import upsert_dedup

DAY = 86400
BASE = 1704067200  # 2024-01-01 UTC

ticks_strategy = st.lists(
    st.tuples(
        st.sampled_from(["AAA", "BBB", "CCC"]),          # symbol
        st.integers(min_value=0, max_value=3 * DAY - 1),  # offset seconds
        st.integers(min_value=1, max_value=100),          # volume
        st.sampled_from(["B", "S", "X"]),                 # type
    ),
    min_size=1,
    max_size=40,
)


def _envelope(spark, ticks):
    rows = []
    for i, (sym, off, vol, ttype) in enumerate(ticks):
        payload = json.dumps(
            {"symbol": sym, "bid": 1.0, "price": float(100 + i), "ask": 1.1,
             "time": BASE + off, "volume": vol, "type": ttype}
        )
        rows.append(("t", "TICK", payload, i))
    return spark.createDataFrame(rows, ENVELOPE_WITH_SEQ)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ticks=ticks_strategy)
def test_cumsum_invariants(spark, ticks):
    cfg = PipelineConfig(mode="tick", out_path="", checkpoint="")
    out = tick_rows_batch(_envelope(spark, ticks), cfg)
    rows = out.withColumn("day", F.to_date("time")).collect()
    # 1) delta ≡ buy − sell on every emitted row
    for r in rows:
        assert r.cumdelta == r.cumbuy - r.cumsell
    # 2) per-(symbol, day) monotonicity in event order
    per_key: dict = {}
    for r in sorted(rows, key=lambda r: (r.symbol, str(r.day), r.time, r["seq"])):
        k = (r.symbol, str(r.day))
        pb, ps = per_key.get(k, (0, 0))
        assert r.cumbuy >= pb and r.cumsell >= ps
        per_key[k] = (r.cumbuy, r.cumsell)
    # 3) final state equals the straightforward per-key totals
    for (sym, day), (cb, cs) in per_key.items():
        want_b = sum(
            v for (s, off, v, t) in ticks
            if s == sym and t == "B" and _day_of(off) == day
        )
        want_s = sum(
            v for (s, off, v, t) in ticks
            if s == sym and t == "S" and _day_of(off) == day
        )
        assert cb == want_b and cs == want_s


def _day_of(off: int) -> str:
    import datetime

    return str(
        datetime.datetime.fromtimestamp(BASE + off, datetime.UTC).date()
    )


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ticks=ticks_strategy)
def test_upsert_dedup_idempotent(spark, ticks):
    cfg = PipelineConfig(mode="tick", out_path="", checkpoint="")
    out = tick_rows_batch(_envelope(spark, ticks), cfg)
    once = upsert_dedup(out)
    twice = upsert_dedup(once)
    a = sorted(map(str, once.collect()))
    b = sorted(map(str, twice.collect()))
    assert a == b
    # keys unique after dedup
    keys = [(r.symbol, str(r.time), r.price) for r in once.collect()]
    assert len(keys) == len(set(keys))
