"""Sink reconciliation — the audit an at-least-once pipeline owes its
operators (SURVEY.md §2 A10/A11 adjacent).

The ingest contract is at-least-once delivery into an idempotent keyed
sink: correct by design, but "by design" is not "verified".  This
module replays a capture through the BATCH pipeline (the semantics
oracle the parity tests already trust) and diffs the result against
the live sink table, key by key:

* **missing**  — expected key absent from the sink (lost write);
* **extra**    — sink key the capture never produced (corruption,
  foreign writer, replay of a different capture);
* **mismatch** — key present on both sides with different payload
  (partial write, non-LWW interference);
* **matched**  — identical.

Scale shape: ONE full-outer join on the upsert key — the exact
q_snapshot_diff shape, exchange-free when both sides are bucketed by
key — plus a null-safe column fold; ``since``/``until`` event-time
bounds push into both scans so a nightly job reconciles yesterday's
partition, not the table's history.

The reference daemon (main.rs) has no equivalent: its only correctness
signal is the absence of an eprintln.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from level2_to_cassandra_spark.sources import file_envelope_batch
from level2_to_cassandra_spark.streaming.pipeline import (
    PipelineConfig,
    build_batch_pipeline,
)
from level2_to_cassandra_spark.streaming.schemas import UPSERT_KEY
from level2_to_cassandra_spark.streaming.sink import read_sink_latest


def _bounded(df: DataFrame, since, until) -> DataFrame:
    if since is not None:
        df = df.where(F.col("time") >= F.lit(since))
    if until is not None:
        df = df.where(F.col("time") < F.lit(until))
    return df


def reconcile_diff(
    expected: DataFrame, actual: DataFrame
) -> DataFrame:
    """Row-level diff of two keyed relations: one full-outer join on
    ``UPSERT_KEY``, each row classified missing/extra/mismatch/matched.
    Payload comparison is a null-safe fold over the non-key columns
    both sides share."""
    key = list(UPSERT_KEY)
    common = [
        c for c in expected.columns
        if c in set(actual.columns) and c not in key
    ]
    e = expected.select(
        *key, F.struct(*common).alias("_e"), F.lit(1).alias("_he")
    )
    a = actual.select(
        *key, F.struct(*common).alias("_a"), F.lit(1).alias("_ha")
    )
    j = e.join(a, key, "full_outer")
    payload_eq = reduce(
        lambda x, y: x & y,
        [
            F.col(f"_e.{c}").eqNullSafe(F.col(f"_a.{c}"))
            for c in common
        ],
        F.lit(True),
    )
    status = (
        F.when(F.col("_ha").isNull(), "missing")
        .when(F.col("_he").isNull(), "extra")
        .when(payload_eq, "matched")
        .otherwise("mismatch")
    )
    return j.select(*key, status.alias("status"), "_e", "_a")


def reconcile_sink(
    spark: SparkSession,
    capture_path: str,
    cfg: PipelineConfig,
    suffix: str,
    source: str = "file",
    since=None,
    until=None,
) -> dict:
    """Replay ``capture_path`` through the batch pipeline and diff the
    ``suffix`` sink table against it.  ``source`` matches the daemon's
    bounded sources: ``file`` (JSONL envelopes) or ``wire`` (raw
    multipart captures via the l2wire batch reader).  Returns integer
    counters plus ``ok`` (True iff every expected key matched and
    nothing foreign is present)."""
    if source == "wire":
        from level2_to_cassandra_spark.sources.wire import (
            register_wire_source,
        )

        register_wire_source(spark)
        env = spark.read.format("l2wire").load(capture_path)
    else:
        env = file_envelope_batch(spark, capture_path)
    expected = _bounded(build_batch_pipeline(env, cfg)[suffix], since, until)
    actual = _bounded(
        read_sink_latest(spark, cfg.out_path, suffix), since, until
    )
    counts = {
        r["status"]: r["n"]
        for r in reconcile_diff(expected, actual)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = {
        s: int(counts.get(s, 0))
        for s in ("matched", "missing", "extra", "mismatch")
    }
    out["ok"] = out["missing"] == 0 and out["extra"] == 0 and (
        out["mismatch"] == 0
    )
    return out
