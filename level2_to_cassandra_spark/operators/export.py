"""Training-shard export: materialize a deterministic epoch shuffle as
ready-to-stream parquet shards.

The query twin (queries/traindata.py::q_shuffle_epoch) verifies the
permutation itself against DuckDB; this module is the WRITE path — the
step that turns the permutation into the physical layout a training
loader consumes: one directory per shard, rows inside each file already
in stream order, so an epoch is "read shard directories in any
assignment, stream each file top to bottom" with zero sorting at load
time.  The same layout discipline as the ingest sink's per-topic
partitioning (streaming/sink.py, reference main.rs:87-88), applied to
the corpus-export side.

No reference counterpart (the reference is an ingest daemon); cites the
fixture schema only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Hex-nibble alphabet shared with the q_shuffle_epoch oracle: Spark
#: ``instr`` and DuckDB ``strpos`` are both 1-based, so nibble value =
#: position − 1 on either engine.
NIBBLES = "0123456789abcdef"


def epoch_permutation(docs: DataFrame, seed: str,
                      id_col: str = "doc_id") -> DataFrame:
    """Append ``shard_id`` (first md5 nibble of the seed-keyed hash —
    16 uniform shards) and ``pos`` (dense 1..n rank of the full hash
    within the shard) to ``docs``.  Reproducible: the permutation is a
    pure function of (seed, id), so re-runs and other engines agree
    bit-for-bit.  Scale shape: NO global sort — the rank window runs
    per shard; a single global ``row_number`` would funnel the corpus
    through one partition."""
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    keyed = docs.withColumn("__h", h).withColumn(
        "shard_id",
        F.expr(
            f"cast(instr('{NIBBLES}', substring(__h, 1, 1)) - 1 as bigint)"
        ),
    )
    w = Window.partitionBy("shard_id").orderBy("__h", id_col)
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def export_shards(docs: DataFrame, path: str, seed: str,
                  id_col: str = "doc_id") -> None:
    """Write ``docs`` as training shards under ``path``: directory
    partition per ``shard_id``, every file internally sorted by
    ``pos`` (``repartition(shard_id)`` + ``sortWithinPartitions`` —
    one shuffle, no global sort, exactly the partitioned-sorted write
    contract the ingest sink uses for per-symbol time order).  A
    loader streams each file top-to-bottom and gets the epoch order;
    re-running the export with the same seed rewrites byte-identical
    shard contents.

    The in-partition sort leads with ``shard_id``: the partitioned
    writer REQUIRES rows clustered by the partition column and inserts
    its own shard_id sort if the data isn't already sorted that way —
    and a writer-inserted sort only promises order on shard_id, so
    under spill-merge the pos order within a shard could interleave.
    Sorting (shard_id, pos) ourselves satisfies the writer's
    requirement (no second sort) AND guarantees the per-file pos
    contract."""
    (
        epoch_permutation(docs, seed, id_col)
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def export_manifest(spark, path: str) -> dict:
    """Write ``{path}/_manifest.json`` describing the exported shards —
    the inventory a training loader (or a resume-from-step scheduler)
    reads INSTEAD of listing and opening parquet footers across the
    whole tree: per-shard row counts + position bounds, total rows,
    shard count.

    Derived from the written files themselves (one parquet scan of the
    export, aggregated per shard), so the manifest cannot drift from
    the data; re-running after a re-export rewrites it.  The underscore
    prefix keeps directory-globbing parquet readers away (same
    convention as the ingest metrics table).  Returns the manifest
    dict."""
    import json
    import os

    rows = (
        spark.read.parquet(path)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
        .collect()
    )
    shards = {
        str(r.shard_id): {
            "n_rows": int(r.n_rows),
            "min_pos": int(r.min_pos),
            "max_pos": int(r.max_pos),
        }
        for r in sorted(rows, key=lambda r: r.shard_id)
    }
    manifest = {
        "format": "l2c-shard-export/1",
        "n_shards": len(shards),
        "n_rows": sum(s["n_rows"] for s in shards.values()),
        "shards": shards,
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_export(spark, path: str) -> dict:
    """The loader-side integrity gate: recount the written shards and
    compare against ``_manifest.json``.  Returns ``{"ok": bool,
    "mismatches": [shard_id, ...]}`` — a training job refuses to start
    on ``ok=False`` instead of silently training on a torn or
    partially rewritten export.  One parquet scan (counts + pos
    bounds), the same aggregate the manifest was derived from."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    # recompute without rewriting the manifest file
    rows = (
        spark.read.parquet(path)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
        .collect()
    )
    seen = {
        str(r.shard_id): {"n_rows": int(r.n_rows),
                          "min_pos": int(r.min_pos),
                          "max_pos": int(r.max_pos)}
        for r in rows
    }
    mismatches = sorted(
        set(manifest["shards"]) ^ set(seen)
        | {s for s in set(manifest["shards"]) & set(seen)
           if manifest["shards"][s] != seen[s]}
    )
    return {"ok": not mismatches, "mismatches": mismatches}
