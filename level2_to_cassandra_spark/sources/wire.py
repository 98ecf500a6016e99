"""Wire-format capture files as a first-class Spark data source.

The reference's transport is a ZeroMQ SUB socket delivering multipart
frames ``[topic, msg_type, payload]`` (main.rs:219-222).  This module
packages that wire format as a registered Spark source — batch
``spark.read.format("l2wire").load(dir)`` and streaming
``spark.readStream.format("l2wire")`` — via the Python Data Source API
(``pyspark.sql.datasource``, Spark ≥ 4.0), reading *capture files*: one
record per line, the three frames tab-separated.  serde_json's compact
encoding escapes control characters, so a JSON payload never contains a
literal tab/newline and the framing is unambiguous.

Lines that do not carry three frames surface as ``(NULL, NULL, raw
line, seq)`` rather than failing the read — the downstream demux routes
them to dead letters, preserving the reference's per-message error
isolation (main.rs:224-229) at the source boundary.

Scale/role notes:

* Batch reads parallelize one :class:`~pyspark.sql.datasource.InputPartition`
  per capture file — the natural split for append-only captures; a
  cluster reads N files N-wide.  Rows cross into the JVM through the
  runtime's Arrow batching, but this is still the EXTENSIBILITY path,
  not the hot path: production ingest stays on the JVM Kafka source
  (``streaming/pipeline.py``); this API is for transports Spark has no
  connector for (e.g. the ZMQ socket itself, where pyzmq is available —
  a prod reader would connect per-partition instead of opening files).
* The streaming half is a :class:`SimpleDataSourceStreamReader` whose
  offset is ``{"files": <count of fully-consumed capture files>}`` over
  the lexicographic file order — append-only replay with exactly-once
  re-reads via ``readBetweenOffsets``.  Driver-side prefetch is the
  documented cost of the simple reader; captures are bounded replay
  input, the live path is Kafka.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

WIRE_SCHEMA = "topic string, msg_type string, payload string, seq bigint"


def _capture_files(path: str) -> list[str]:
    """Capture files under ``path`` (or ``path`` itself), lexicographic
    — the append-only capture order."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
    return [path]


def _parse_lines(fname: str) -> Iterator[tuple]:
    """(topic, msg_type, payload, seq) per line; frame-count errors
    surface as rows, never exceptions (A11 at the source boundary)."""
    with open(fname, encoding="utf-8") as fh:
        for seq, line in enumerate(fh):
            line = line.rstrip("\n")
            if not line:
                continue
            frames = line.split("\t", 2)
            if len(frames) == 3:
                yield frames[0], frames[1], frames[2], seq
            else:
                yield None, None, line, seq


class _WireFilePartition(InputPartition):
    def __init__(self, fname: str):
        self.fname = fname


class _WireBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self) -> list[InputPartition]:
        return [_WireFilePartition(f) for f in _capture_files(self.path)]

    def read(self, partition: _WireFilePartition) -> Iterator[tuple]:
        return _parse_lines(partition.fname)


class _WireStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch replay over an append-only capture directory.

    Offsets count fully-consumed files: files are treated as immutable
    once present (the capture convention — writers create-then-rename),
    so ``readBetweenOffsets(a, b)`` replays exactly the files
    ``[a, b)`` and recovery is deterministic.
    """

    def __init__(self, path: str, max_files_per_trigger: int | None = None):
        self.path = path
        self.max_files_per_trigger = max_files_per_trigger

    def initialOffset(self) -> dict:
        return {"files": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = _capture_files(self.path)
        done = start["files"]
        # maxFilesPerTrigger caps the micro-batch (the memory bound of
        # everything downstream — sink write, metrics cache, state
        # update); a backlog then drains over several triggers instead
        # of one giant batch, exactly like Spark's file source.
        until = len(files)
        if self.max_files_per_trigger is not None:
            until = min(until, done + self.max_files_per_trigger)
        # A list, not a generator: the runtime's prefetch cache
        # copy.copy()s the returned iterator (datasource_internal), and
        # generators are not copyable.  The simple reader is
        # driver-side-materialized by contract, so this adds nothing.
        rows = [row for f in files[done:until] for row in _parse_lines(f)]
        return rows, {"files": until}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = _capture_files(self.path)
        for f in files[start["files"]: end["files"]]:
            yield from _parse_lines(f)


class WireDataSource(DataSource):
    """``l2wire``: the reference's multipart wire format as a Spark
    source (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "l2wire"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("l2wire requires a path: .load(<capture dir>)")
        return path

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WireBatchReader(self._path())

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        from level2_to_cassandra_spark.functions import positive_or_none

        # shared validation with PipelineConfig.from_env: '0' used to
        # slip through `int(cap) if cap` as a 0-file cap that silently
        # froze the stream (ADVICE r07 low)
        cap = positive_or_none(
            self.options.get("maxFilesPerTrigger"), "maxFilesPerTrigger"
        )
        return _WireStreamReader(self._path(), cap)


def register_wire_source(spark) -> None:
    """Idempotently register ``l2wire`` on the session."""
    spark.dataSource.register(WireDataSource)
