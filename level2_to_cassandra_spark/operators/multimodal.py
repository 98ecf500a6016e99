"""Multimodal column plumbing (SURVEY.md §2 B11).

Images/audio/video ride through the engine as opaque ``binary``
columns with a typed metadata struct — the schema pattern that scales:
content bytes never become shuffle keys, metadata is columnar and
prunable, and per-item decode work happens in Arrow-batched
``mapInPandas`` where a real decoder (PIL/ffmpeg/torchaudio) would be
invoked per batch.

Those decoder libraries are NOT available in this environment, so the
decode kernels below are deterministic fakes (byte histograms, byte
slicing) behind the same signatures — clearly marked.  The Spark-side
plumbing (schema, batching, partitioning, UDF shapes) is real and
tested in tests/test_llm_ops.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every binary payload.
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text",
                  mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a text corpus as (content: binary, meta: struct) rows —
    the ingestion shape for any multimodal asset (here the bytes are
    the utf-8 text; for real assets they come from
    ``spark.read.format("binaryFile")`` with identical downstream
    schema)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE of an image/audio feature extractor.

    A real implementation decodes the payload (PIL.Image.open /
    torchaudio.load) and runs a feature head; neither library exists
    in this container.  Stand-in: a 16-bin byte histogram normalized
    by length — deterministic, shape-compatible, and sensitive to
    content so tests can assert real data flow.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    n = float(len(payload))
    return [h / n for h in hist]


def extract_features(assets: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas``: each pandas batch holds many assets; a real
    decoder amortizes model/codec setup per batch (the pattern that
    matters at scale), then emits fixed-dim feature vectors.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": [
                        _fake_decode_features(bytes(c)) for c in pdf["content"]
                    ],
                }
            )

    return assets.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, n_frames: int = 4,
                 frame_bytes: int = 32) -> DataFrame:
    """'Video' frame sampling as deterministic byte slicing: n equally
    spaced fixed-size windows over the payload (a real implementation
    seeks keyframes via ffmpeg).  Pure JVM (`substring` on binary) —
    no Python needed even for the fake."""
    frames = F.array(
        *[
            F.substring(
                F.col("content"),
                (F.greatest(F.col("meta.n_bytes") - frame_bytes, F.lit(0)) * i
                 / max(n_frames - 1, 1)).cast("int") + 1,
                frame_bytes,
            )
            for i in range(n_frames)
        ]
    )
    return assets.select("doc_id", "meta", frames.alias("frames"))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", METADATA_SCHEMA),
    ]
)


def _nn_resize(payload: bytes, width: int, height: int,
               src_width: int | None) -> bytes:
    """Nearest-neighbor resample of a raw single-channel byte grid.

    No codec needed: the payload IS the pixel buffer (the shape a real
    pipeline gets after the decode stage, e.g. a raw Y-plane).  When
    ``src_width`` is unknown the grid is laid out square-ish
    (ceil(√n) columns, zero-padded final row) — deterministic, so
    tests can compute expected pixels independently.
    """
    import math

    import numpy as np

    n = len(payload)
    if n == 0:
        return bytes(width * height)
    sw = src_width or math.ceil(math.sqrt(n))
    sh = math.ceil(n / sw)
    grid = np.zeros(sw * sh, dtype=np.uint8)
    grid[:n] = np.frombuffer(payload, dtype=np.uint8)
    grid = grid.reshape(sh, sw)
    rows = (np.arange(height) * sh) // height
    cols = (np.arange(width) * sw) // width
    return grid[np.ix_(rows, cols)].tobytes()


def resize_image(assets: DataFrame, width: int, height: int,
                 src_width: int | None = None) -> DataFrame:
    """Image resize (binary in / binary out) via Arrow-batched
    ``mapInPandas`` — the mapInPandas contract a codec-backed kernel
    (PIL/OpenCV, absent here) drops into unchanged.  The resampling
    itself is REAL (pure-numpy nearest neighbor over the raw byte
    grid); only the format decode is out of scope without a codec.
    Metadata is recomputed for the resized payload (n_bytes, md5)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                _nn_resize(bytes(c), width, height, src_width)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": out,
                    "meta": [
                        {
                            "mime": m["mime"],
                            "n_bytes": len(b),
                            "checksum": hashlib.md5(b).hexdigest(),
                        }
                        for m, b in zip(pdf["meta"], out)
                    ],
                }
            )

    return assets.select("doc_id", "content", "meta").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )
