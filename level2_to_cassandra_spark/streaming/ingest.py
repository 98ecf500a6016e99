"""Ingest transformations: demux → decode → flatten → project.

Pure DataFrame→DataFrame functions; identical code paths for batch and
streaming inputs (stream/batch parity by construction).  Everything is
JVM built-ins (`from_json`, `explode`, `regexp_replace`, timestamp
conversion) — whole-stage codegen end to end, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from level2_to_cassandra_spark.streaming.schemas import (
    BOOK_PAYLOAD_SCHEMA,
    TICK_PAYLOAD_SCHEMA,
)

#: Message-type tags (reference match arms, main.rs:76,106).
BOOK, TICK = "BOOK", "TICK"

# The reference's serde structs have NO Option fields (main.rs:40-60):
# a payload missing any field fails the whole message (the `?` at
# main.rs:77,107).  from_json is PERMISSIVE (all-null struct on bad
# input), so validity = every required field non-null.

_TICK_FIELDS = ("symbol", "bid", "price", "ask", "time", "volume", "type")
_BOOK_FIELDS = ("symbol", "price", "time", "volume", "type")


def _tick_valid(parsed):
    cond = F.lit(True)
    for f in _TICK_FIELDS:
        cond = cond & parsed.getField(f).isNotNull()
    return cond


def _book_valid(levels):
    def level_ok(level):
        cond = F.lit(True)
        for f in _BOOK_FIELDS:
            cond = cond & level.getField(f).isNotNull()
        return cond

    return levels.isNotNull() & F.forall(levels, level_ok)


def demux(envelope: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split the envelope stream by msg_type → (book, tick, other).

    The reference silently drops unknown tags (``_ => ()``,
    main.rs:167); we keep the semantic but return the residual stream so the
    pipeline can surface a drop counter instead of pure silence
    (SURVEY.md §1.4 quirk 5).
    """
    book = envelope.where(F.col("msg_type") == BOOK)
    tick = envelope.where(F.col("msg_type") == TICK)
    other = envelope.where(
        ~F.col("msg_type").isin(BOOK, TICK) | F.col("msg_type").isNull()
    )
    return book, tick, other


def parse_book(book_raw: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """BOOK payload (JSON array of levels) → one row per level.

    Mirrors serde ``Vec<BookData>`` decode + the per-level insert loop
    (main.rs:77, 95-104): from_json(Array) → explode.  Malformed JSON
    parses to NULL and is isolated (per-message error handling,
    main.rs:224-229) — use :func:`dead_letters` to observe them.
    Transforms applied per level:

    * ``BOOK_TYPE_`` prefix stripped from the type (all occurrences,
      ``str::replace`` semantics — main.rs:62-64);
    * epoch-seconds → proper timestamp (fixes §1.4 quirk 1).
    """
    parsed = book_raw.withColumn(
        "__levels", F.from_json("payload", BOOK_PAYLOAD_SCHEMA)
    )
    level = F.explode("__levels").alias("level")
    return (
        parsed.where(_book_valid(F.col("__levels")))
        .select("topic", *extra_cols, level)
        .select(
            "topic",
            *extra_cols,
            F.col("level.symbol").alias("symbol"),
            F.col("level.price").alias("price"),
            F.timestamp_seconds(F.col("level.time")).alias("time"),
            F.col("level.volume").alias("volume"),
            F.regexp_replace(F.col("level.type"), "BOOK_TYPE_", "").alias(
                "order_type"
            ),
        )
    )


def parse_tick(tick_raw: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """TICK payload (single JSON object) → one typed row
    (serde decode, main.rs:107; epoch-seconds conversion per §1.4)."""
    parsed = tick_raw.withColumn(
        "__tick", F.from_json("payload", TICK_PAYLOAD_SCHEMA)
    )
    return (
        parsed.where(_tick_valid(F.col("__tick")))
        .select(
            "topic",
            *extra_cols,
            F.col("__tick.symbol").alias("symbol"),
            F.col("__tick.bid").alias("bid"),
            F.col("__tick.price").alias("price"),
            F.col("__tick.ask").alias("ask"),
            F.timestamp_seconds(F.col("__tick.time")).alias("time"),
            F.col("__tick.volume").alias("volume"),
            F.col("__tick.type").alias("trade_type"),
        )
    )


def observe_ingest(envelope: DataFrame, observation="l2c_ingest") -> DataFrame:
    """Attach ingest accounting metrics to the envelope stream — the
    engine's answer to the reference's SILENT drop of unknown message
    types (``_ => ()``, main.rs:167; SURVEY.md §1.4 quirk 5).

    Uses ``DataFrame.observe``: metrics ride the existing plan (no
    second scan).  Pass a ``pyspark.sql.Observation`` for batch
    (read via ``obs.get``) or a string name for streaming (read via
    ``StreamingQueryProgress.observedMetrics[name]``).  Counted:
    total messages, BOOK/TICK tagged, unknown-tag drops, malformed
    TICK payloads.
    """
    unknown = (~F.col("msg_type").isin(BOOK, TICK)) | F.col("msg_type").isNull()
    bad_tick = (F.col("msg_type") == TICK) & ~_tick_valid(
        F.from_json("payload", TICK_PAYLOAD_SCHEMA)
    )
    return envelope.observe(
        observation,
        F.count(F.lit(1)).alias("n_messages"),
        F.count(F.when(F.col("msg_type") == BOOK, 1)).alias("n_book"),
        F.count(F.when(F.col("msg_type") == TICK, 1)).alias("n_tick"),
        F.count(F.when(unknown, 1)).alias("n_unknown_dropped"),
        F.count(F.when(bad_tick, 1)).alias("n_malformed_tick"),
    )


def dead_letters(df: DataFrame, kind: str) -> DataFrame:
    """Rows whose payload fails to decode (malformed JSON or missing
    required fields) — the reference logs and continues
    (main.rs:224-229); we surface them as a side stream."""
    if kind == TICK:
        bad = ~_tick_valid(F.from_json("payload", TICK_PAYLOAD_SCHEMA))
    elif kind == BOOK:
        bad = ~_book_valid(F.from_json("payload", BOOK_PAYLOAD_SCHEMA))
    else:
        raise ValueError(f"kind must be {BOOK!r} or {TICK!r}")
    return df.where(bad).select("topic", "msg_type", "payload")
