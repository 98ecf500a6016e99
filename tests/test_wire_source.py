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


def test_wire_stream_rejects_nonpositive_cap(tmp_path):
    """maxFilesPerTrigger='0' used to slip through `int(cap) if cap`
    as a 0-file cap that silently froze the stream (ADVICE r07 low) —
    now any cap < 1 fails fast at reader construction, and '' is
    treated as unset like the built-in file sources do."""
    import pytest

    from level2_to_cassandra_spark.sources.wire import WireDataSource

    for bad in ("0", "-3"):
        ds = WireDataSource(
            {"path": str(tmp_path), "maxFilesPerTrigger": bad}
        )
        with pytest.raises(ValueError, match="positive"):
            ds.simpleStreamReader(None)

    ds = WireDataSource({"path": str(tmp_path), "maxFilesPerTrigger": ""})
    assert ds.simpleStreamReader(None).max_files_per_trigger is None
    ds = WireDataSource({"path": str(tmp_path), "maxFilesPerTrigger": "2"})
    assert ds.simpleStreamReader(None).max_files_per_trigger == 2


def test_wire_stream_max_files_per_trigger(spark, tmp_path):
    """maxFilesPerTrigger caps each micro-batch at N capture files
    under CONTINUOUS micro-batching — the deployment mode the cap is
    for.  (Under availableNow the simple stream reader snapshots the
    first capped batch as "all available" and stops, so the daemon
    applies the cap only without --drain; __main__.py.)"""
    import json as _json

    d = tmp_path / "cap"
    d.mkdir()
    for i in range(3):
        (d / f"{i:03d}.cap").write_text(
            f"t{i}\tTICK\t" + _json.dumps(
                {"symbol": f"S{i}", "bid": 1.0, "price": 1.0, "ask": 1.0,
                 "time": 1700000000 + i, "volume": 1, "type": "B"}
            ) + "\n"
        )
    register_wire_source(spark)
    stream = (
        spark.readStream.format("l2wire")
        .option("maxFilesPerTrigger", "1")
        .load(str(d))
    )
    seen_batches = []

    def record(batch_df, batch_id):
        seen_batches.append((batch_id, batch_df.count()))

    import time as _time

    q = (
        stream.writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 120
        while sum(n for _, n in seen_batches) < 3:
            assert _time.time() < deadline, f"timed out: {seen_batches}"
            _time.sleep(0.5)
    finally:
        q.stop()
    assert sum(n for _, n in seen_batches) == 3
    assert all(n <= 1 for _, n in seen_batches)         # cap respected
    assert len([n for _, n in seen_batches if n]) == 3  # one file per batch
