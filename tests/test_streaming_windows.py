"""Windowed streaming analytics (SURVEY.md §2 B9) verified by
stream/batch parity: the same events through a file stream +
window()/session_window() must equal the batch computation
(q_time_bucket_agg / q_sessionize shapes) on identical data.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from level2_to_cassandra_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def events_jsonl(spark, tmp_path_factory):
    """events (sf0.001) re-serialized as JSONL so the file streaming
    source can replay them as a bounded stream."""
    d = tmp_path_factory.mktemp("events_stream")
    rows = (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        .collect()
    )
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        (d / f"part-{i:03d}.jsonl").write_text(
            "\n".join(json.dumps(r.asDict()) for r in chunk)
        )
    return str(d)


def _stream(spark, path):
    return spark.readStream.schema(EVENT_SCHEMA).json(path)


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_tumbling_window_parity(spark, events_jsonl):
    stream = _stream(spark, events_jsonl)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    _run_to_memory(agg, "tumbling")
    got = {
        (str(r.window.start.date()), r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    want = {
        (str(r.day), r.event_type): (r.n, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_sliding_window_parity(spark, events_jsonl):
    stream = _stream(spark, events_jsonl)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_to_memory(agg, "sliding")
    got = {
        (str(r.window.start), r.user_id): r.n
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    # Batch equivalent: each event belongs to the window starting at
    # its truncated hour and the one starting an hour earlier.
    ev = load_table(spark, SF, "events")
    exploded = ev.select(
        "user_id",
        F.explode(
            F.array(
                F.date_trunc("hour", "ts"),
                F.date_trunc("hour", "ts") - F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("win_start"),
    )
    want = {
        (str(r.win_start), r.user_id): r.n
        for r in exploded.groupBy("win_start", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_sliding_window_query_stream_parity(spark, events_jsonl):
    """q_window_sliding IS the streaming computation: the registered
    batch query (1 h windows every 30 min) must equal the same
    window() aggregate run through the file stream — so its DuckDB
    oracle transitively verifies the streaming path too."""
    from level2_to_cassandra_spark.registry import all_queries

    stream = _stream(spark, events_jsonl)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "total_value")
    )
    _run_to_memory(agg, "sliding_q")
    got = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM sliding_q").collect()
    }
    want = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in all_queries()["q_window_sliding"].fn(spark, SF).collect()
    }
    assert got == want


def test_stream_static_join_parity(spark, events_jsonl):
    """Stream-static join (B9): a streaming source joined against a
    STATIC dimension (the standard enrichment shape — Spark broadcasts
    or rescans the static side per micro-batch, no state, no
    watermark needed) must equal the identical batch join.  The
    dimension is derived deterministically so both sides construct
    the same table."""
    ev = load_table(spark, SF, "events")
    dim = (
        ev.select("user_id").distinct()
        .withColumn("segment", F.col("user_id") % 3)
    )
    stream = _stream(spark, events_jsonl)
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    _run_to_memory(agg, "stream_static")
    got = {
        (r.segment, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM stream_static").collect()
    }
    want = {
        (r.segment, r.event_type): (r.n, r.total_value)
        for r in ev.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join_parity(spark, events_jsonl):
    """Watermarked stream-stream interval join (B9): views attributed
    to same-user purchases within a 24 h lookback, streamed from two
    independent file sources, must equal the identical batch join."""
    from level2_to_cassandra_spark.streaming.joins import interval_join

    def split_sides(df):
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        views = df.where(F.col("event_type") == "view").select(
            F.col("user_id").alias("user_id_r"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        # interval_join keys both sides on the same column name
        return purchases, views.withColumnRenamed("user_id_r", "user_id")

    # Watermark wider than the fixture's 30-day span: state eviction
    # can never drop a match even if the source splits the files across
    # micro-batches (the watermark advances between batches, and the
    # fixture rows are NOT time-ordered across files).
    sp, sv = split_sides(_stream(spark, events_jsonl))
    joined = interval_join(
        sp, sv, on="user_id", left_ts="purchase_ts", right_ts="view_ts",
        lookback="24 hours", watermark="31 days",
    ).select("purchase_id", "view_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM ssjoin").collect()
    }
    bp, bv = split_sides(load_table(spark, SF, "events"))
    want = {
        (r.purchase_id, r.view_id)
        for r in interval_join(
            bp, bv, on="user_id", left_ts="purchase_ts",
            right_ts="view_ts", lookback="24 hours",
        ).select("purchase_id", "view_id").collect()
    }
    assert len(want) > 0
    assert got == want


def test_interval_join_rejects_column_overlap(spark):
    from level2_to_cassandra_spark.streaming.joins import interval_join

    df = spark.range(1).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("ts"),
        F.lit(1).alias("v"),
    )
    with pytest.raises(ValueError, match="shared between sides"):
        interval_join(df, df, on="k", left_ts="ts", right_ts="ts",
                      lookback="1 hour")


def test_session_window_parity(spark, events_jsonl):
    stream = _stream(spark, events_jsonl)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    _run_to_memory(agg, "sessions")
    got = {
        (str(r.session_window.start), r.user_id): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # Batch oracle: the q_sessionize gap logic on the same data.
    from level2_to_cassandra_spark.registry import all_queries

    sess = all_queries()["q_sessionize"].fn(spark, SF)
    want = {
        (str(r.session_start), r.user_id): (r.n_events, r.total_value)
        for r in sess.collect()
    }
    assert got == want


def test_rollup_cascade_stream_partials_parity(spark, events_jsonl):
    """Streaming continuous aggregate: the minutely PARTIALS maintained
    by a streaming window aggregation, re-aggregated to hourly finals
    in batch, must equal q_rollup_cascade run straight over the same
    rows — i.e. the stored-partial maintenance loop (stream keeps the
    fine grain up to date, coarse grains re-aggregate partials) loses
    nothing vs recomputing from raw.
    """
    from level2_to_cassandra_spark.registry import all_queries
    from level2_to_cassandra_spark.functions import round_half_up

    stream = _stream(spark, events_jsonl)
    partials = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("psum"),
            F.min("value").alias("pmin"),
            F.max("value").alias("pmax"),
        )
    )
    _run_to_memory(partials, "rollup_partials")
    stored = spark.table("rollup_partials")
    total = round_half_up(F.sum("psum").cast("double"), 4)
    n = F.sum("pn").cast("long")
    finals = stored.groupBy(
        F.date_trunc("hour", F.col("window.start")).alias("hour"),
        "event_type",
    ).agg(
        n.alias("n"),
        total.alias("total_value"),
        F.min("pmin").alias("min_value"),
        F.max("pmax").alias("max_value"),
        round_half_up(total / n, 6).alias("avg_value"),
    )
    batch = all_queries()["q_rollup_cascade"].fn(spark, SF)
    key = lambda r: (r.hour, r.event_type)
    got = {key(r): (r.n, r.total_value, r.min_value, r.max_value, r.avg_value)
           for r in finals.collect()}
    want = {key(r): (r.n, r.total_value, r.min_value, r.max_value, r.avg_value)
            for r in batch.collect()}
    assert got == want
