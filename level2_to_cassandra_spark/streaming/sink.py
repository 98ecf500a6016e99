"""Sinks: keyed-upsert writes with the reference's table naming and
physical layout contract.

The reference upserts per row into Cassandra ``{keyspace}.{topic}_book``
/ ``{topic}_tick`` with PRIMARY KEY (symbol, time, price), clustering
time DESC (main.rs:80-92, 133-152) — last-write-wins on the key, data
laid out for per-symbol newest-first scans.

Here the CI-testable default sink is parquet with the same semantics:

* last-write-wins dedup on the upsert key, ordered by an explicit
  write sequence (micro-batch id + in-batch ``seq`` when the source
  provides one, e.g. a Kafka offset) — "last" must be a real ordering,
  not an accident of file layout;
* ``partitionBy(topic)`` + ``repartition(symbol)`` +
  ``sortWithinPartitions(time DESC)`` — the file-layout equivalent of
  the Cassandra partition/clustering contract (main.rs:87-88);
* dynamic per-topic routing falls out of partitionBy (the reference's
  DDL-per-topic, main.rs:90,148, becomes directory-per-topic).

A Cassandra connector sink (`org.apache.spark.sql.cassandra`) sits
behind the same interface for production, selected by config; the
connector's writes are idempotent upserts on the same key, so
at-least-once delivery from checkpointed Structured Streaming becomes
effectively-once end to end (strictly stronger than the reference's
at-most-once ZMQ SUB — SURVEY.md §1.4 quirk 3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from level2_to_cassandra_spark.operators.dedup import latest_by_key
from level2_to_cassandra_spark.streaming.schemas import UPSERT_KEY

#: Internal column recording write order across micro-batches.
BATCH_COL = "__batch_id"


def _write_order(df: DataFrame) -> list:
    """Newest-first ordering for last-write-wins: batch id desc, then
    the source sequence column (Kafka offset / test seq) if present."""
    order = []
    if BATCH_COL in df.columns:
        order.append(F.desc(BATCH_COL))
    if "seq" in df.columns:
        order.append(F.desc("seq"))
    return order or [F.desc(c) for c in UPSERT_KEY]


def upsert_dedup(df: DataFrame, key: Sequence[str] = UPSERT_KEY) -> DataFrame:
    """Collapse to one row per upsert key, last write wins — what
    re-INSERTing the same (symbol,time,price) does in Cassandra."""
    return latest_by_key(df, keys=list(key), order=_write_order(df))


def write_upsert_parquet(df: DataFrame, path: str, table_suffix: str,
                         batch_id: int = 0) -> None:
    """Write one micro-batch (or batch) with the reference's layout
    contract.  ``table_suffix`` ∈ {book, tick} mirrors the reference's
    ``{topic}_book`` / ``{topic}_tick`` naming; parquet append with
    in-batch key-dedup, cross-batch dedup happens at read."""
    (
        upsert_dedup(df.withColumn(BATCH_COL, F.lit(batch_id)))
        .repartition("topic", "symbol")
        .sortWithinPartitions(F.desc("time"))
        .write.mode("append")
        .partitionBy("topic")
        .parquet(f"{path}/{table_suffix}")
    )


def foreach_batch_upsert(path: str, table_suffix: str):
    """foreachBatch callback factory for writeStream."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        write_upsert_parquet(batch_df, path, table_suffix, batch_id)

    return _write


def cassandra_writer_options(keyspace: str, topic: str, table_suffix: str,
                             connector: dict[str, str] | None = None,
                             ) -> dict[str, str]:
    """Option dict for a spark-cassandra-connector write: the
    reference's table naming ``{keyspace}.{topic}_{suffix}``
    (main.rs:90,148) plus connection/auth options from
    ``PipelineConfig.cassandra`` (CASSANDRA_HOST/USERNAME/PASSWORD,
    main.rs:177-179).  Split out from the writer so CI can assert the
    assembled options without a live cluster."""
    opts = {"keyspace": keyspace, "table": f"{topic}_{table_suffix}"}
    opts.update(connector or {})
    return opts


def write_upsert_cassandra(df: DataFrame, keyspace: str, topic: str,
                           table_suffix: str,
                           connector: dict[str, str] | None = None) -> None:
    """Production sink: spark-cassandra-connector upsert into
    ``{keyspace}.{topic}_{table_suffix}`` — the reference's exact table
    naming (main.rs:90,148) and key semantics (connector writes are
    per-key upserts, so Cassandra's last-write-wins replaces the
    in-batch dedup).  Requires the connector package on the classpath
    (``--packages com.datastax.spark:spark-cassandra-connector_2.13``)
    and a reachable cluster; selected via PipelineConfig, never used in
    CI (the parquet sink above is the test double with identical
    semantics)."""
    (
        df.drop(BATCH_COL, "topic")
        .write.format("org.apache.spark.sql.cassandra")
        .mode("append")
        .options(
            **cassandra_writer_options(keyspace, topic, table_suffix, connector)
        )
        .save()
    )


#: Hard ceiling on distinct topics a micro-batch may route to.  The
#: reference subscribes a FIXED, config-enumerated topic list
#: (main.rs: one SUB socket per configured topic), so topic
#: cardinality is operator-bounded by design — this guard turns a
#: corrupt/unbounded topic column (which would make the per-batch
#: driver collect and the table fan-out unbounded) into a loud error
#: instead of a silent driver OOM.
MAX_SINK_TOPICS = 1000


def foreach_batch_cassandra(keyspace: str, table_suffix: str,
                            connector: dict[str, str] | None = None):
    """foreachBatch callback for the Cassandra sink: dynamic per-topic
    routing (one table per topic, the reference's DDL-per-topic
    semantics) — topics in a micro-batch are few, so the driver-side
    loop is over table names, never rows.  The collect is provably
    bounded: at most ``MAX_SINK_TOPICS + 1`` topic rows are ever
    pulled to the driver, and exceeding the ceiling raises."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        deduped = upsert_dedup(batch_df.withColumn(BATCH_COL, F.lit(batch_id)))
        topics = [
            r.topic
            for r in deduped.select("topic").distinct()
            .limit(MAX_SINK_TOPICS + 1).collect()
        ]
        if len(topics) > MAX_SINK_TOPICS:
            raise ValueError(
                f"micro-batch routes to more than {MAX_SINK_TOPICS} "
                "distinct topics — topic column is unbounded or corrupt "
                "(reference topics are a fixed config list)"
            )
        for topic in topics:
            write_upsert_cassandra(
                deduped.where(F.col("topic") == topic),
                keyspace, topic, table_suffix, connector,
            )

    return _write


def read_sink_latest(spark, path: str, table_suffix: str) -> DataFrame:
    """Read a sink directory back applying last-write-wins across ALL
    appended batches — the query-side completion of upsert semantics
    (later batches shadow earlier rows with the same key)."""
    df = spark.read.parquet(f"{path}/{table_suffix}")
    return upsert_dedup(df).drop(BATCH_COL)


def compact_sink(spark, path: str, table_suffix: str) -> int:
    """Rewrite a sink table down to each key's WINNING row — the
    maintenance operation the append-only upsert layout needs: every
    micro-batch appends files, so without compaction the read-side
    last-write-wins window pays for the table's entire write history
    (at 100 TB: unbounded shadowed rows + small-file explosion).

    Correctness across the swap: the winner keeps its ORIGINAL
    ``__batch_id``/``seq`` columns through the rewrite, and streaming
    batch ids continue monotonically from the checkpoint (pinned by
    tests/test_streaming.py::test_pipeline_checkpoint_restart_
    incremental), so batches appended AFTER a compaction still shadow
    compacted rows under the same ``_write_order`` — compaction is
    invisible to readers except in cost.  The rewrite re-applies the
    layout contract (repartition by (topic, symbol), time-descending
    within partitions, directory-partitioned by topic).

    Swap discipline: the compacted table is fully written and
    validated at a side path first, then moved into place — on a
    local filesystem via delete+rename, which is NOT atomic for
    concurrent readers; a production deployment does the same swap as
    a partition/version flip in its table format (Delta/Iceberg
    REPLACE), which is exactly what this operator's two-phase shape
    maps onto.  Returns the surviving row count."""
    import os
    import shutil

    src = f"{path}/{table_suffix}"
    tmp = f"{path}/{table_suffix}__compacting"
    before = upsert_dedup(spark.read.parquet(src))
    (
        before.repartition("topic", "symbol")
        .sortWithinPartitions(F.desc("time"))
        .write.mode("overwrite")
        .partitionBy("topic")
        .parquet(tmp)
    )
    # validate the materialized rewrite before touching the source
    n = spark.read.parquet(tmp).count()
    if n != before.count():
        raise RuntimeError(
            f"compaction row-count mismatch for {src}: rewrite={n}"
        )
    shutil.rmtree(src)
    os.rename(tmp, src)
    return n
