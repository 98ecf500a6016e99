"""Envelope sources.

The reference's only source is a ZMQ SUB socket with CURVE auth
(main.rs:186-206).  The engine abstracts the source behind one
envelope schema — ``(topic, msg_type, payload [, seq])`` — produced
by:

* Kafka (production; see ``streaming.pipeline.kafka_envelope``) — ZMQ
  multipart frames map onto topic/key/value; CURVE auth maps to
  SSL/SASL options;
* JSONL files (CI / replay) — batch and streaming readers below, with
  a ``seq`` column standing in for the broker offset;
* rate source (load-generation smoke tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_WITH_SEQ = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("msg_type", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def file_envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    """Bounded JSONL envelope read (explicit schema — never inferred)."""
    return spark.read.schema(ENVELOPE_WITH_SEQ).json(path)


def file_envelope_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming JSONL envelope source; ``max_files_per_trigger=1``
    forces one micro-batch per file, exercising cross-batch state."""
    reader = spark.readStream.schema(ENVELOPE_WITH_SEQ)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def rate_envelope(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic TICK load from the rate source — smoke/throughput
    testing without a broker."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("SYM"), (F.col("value") % 5).cast("string")).alias("symbol"),
            (F.rand() * 100).alias("bid"),
            (F.rand() * 100 + 0.05).alias("price"),
            (F.rand() * 100 + 0.1).alias("ask"),
            F.unix_timestamp("timestamp").alias("time"),
            (F.col("value") % 97 + 1).cast("int").alias("volume"),
            F.when(F.col("value") % 2 == 0, "B").otherwise("S").alias("type"),
        )
    )
    return rate.select(
        F.lit("ratetopic").alias("topic"),
        F.lit("TICK").alias("msg_type"),
        payload.alias("payload"),
        F.col("value").alias("seq"),
    )
