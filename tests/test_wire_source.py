"""The ``l2wire`` Python Data Source (sources/wire.py): batch and
streaming reads of multipart wire-capture files, per-file partitioning,
frame-error isolation, and compatibility with the ingest demux."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from level2_to_cassandra_spark.sources.wire import (
    WIRE_SCHEMA,
    register_wire_source,
)


def _write_capture(path, lines):
    path.write_text("".join(line + "\n" for line in lines), encoding="utf-8")


@pytest.fixture()
def capture_dir(tmp_path):
    d = tmp_path / "capture"
    d.mkdir()
    tick = json.dumps(
        {"symbol": "EURUSD", "bid": 1.09, "price": 1.1, "ask": 1.11,
         "time": 1700000000, "volume": 5, "type": "B"}
    )
    book = json.dumps(
        [{"symbol": "EURUSD", "price": 1.1, "time": 1700000000,
          "volume": 3, "type": "BOOK_TYPE_BID"}]
    )
    _write_capture(
        d / "000.cap",
        [f"eurusd\tTICK\t{tick}", f"eurusd\tBOOK\t{book}"],
    )
    _write_capture(
        d / "001.cap",
        [f"eurusd\tTICK\t{tick}", "no-tabs-in-this-line"],
    )
    return d


def test_batch_read_partitions_and_rows(spark, capture_dir):
    register_wire_source(spark)
    df = spark.read.format("l2wire").load(str(capture_dir))
    assert [f.name for f in df.schema.fields] == [
        "topic", "msg_type", "payload", "seq"]
    rows = df.collect()
    assert len(rows) == 4
    # one partition per capture file
    assert df.rdd.getNumPartitions() == 2
    # frame-count error surfaces as a NULL-typed row, not an exception
    bad = [r for r in rows if r.msg_type is None]
    assert len(bad) == 1 and bad[0].payload == "no-tabs-in-this-line"
    # seq restarts per capture file (the per-file offset)
    assert sorted(r.seq for r in rows) == [0, 0, 1, 1]


def test_batch_read_feeds_demux(spark, capture_dir):
    from level2_to_cassandra_spark.streaming import ingest

    register_wire_source(spark)
    df = spark.read.format("l2wire").load(str(capture_dir))
    book_raw, tick_raw, other = ingest.demux(df)
    ticks = ingest.parse_tick(tick_raw)
    books = ingest.parse_book(book_raw)
    assert ticks.count() == 2
    assert books.count() == 1
    assert books.select("order_type").first()[0] == "BID"  # prefix stripped
    assert other.count() == 1  # the frame-error line


def test_stream_read_availablenow_matches_batch(spark, capture_dir):
    register_wire_source(spark)
    stream = (
        spark.readStream.format("l2wire")
        .load(str(capture_dir))
        .withColumn("src", F.lit("stream"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wire_stream_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT topic, msg_type, payload, seq FROM wire_stream_sink"
    ).collect()
    want = spark.read.format("l2wire").load(str(capture_dir)).collect()
    key = lambda t: tuple("" if v is None else str(v) for v in t)
    assert sorted(map(tuple, got), key=key) == sorted(
        map(tuple, want), key=key)


def test_stream_offsets_replay_between(spark, capture_dir):
    from level2_to_cassandra_spark.sources.wire import _WireStreamReader

    r = _WireStreamReader(str(capture_dir))
    start = r.initialOffset()
    rows, end = r.read(start)
    assert end == {"files": 2}
    assert len(list(rows)) == 4
    # deterministic replay of the first file only
    replay = list(r.readBetweenOffsets({"files": 0}, {"files": 1}))
    assert len(replay) == 2 and all(t[0] == "eurusd" for t in replay)


def test_schema_constant_matches_source(spark, capture_dir):
    register_wire_source(spark)
    df = spark.read.format("l2wire").load(str(capture_dir))
    assert df.schema == spark.createDataFrame([], WIRE_SCHEMA).schema
