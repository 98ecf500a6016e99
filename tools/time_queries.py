#!/usr/bin/env python
"""Time individual queries in isolation with the noop sink.

Usage: python tools/time_queries.py [-r REPS] query [query ...]

Same session/staging discipline as bench.py (tiny-SF plan warmup,
staging prewarm for the named queries, per-rep clearCache), but only
for the named queries — the fast inner loop for optimization work.
Prints per-rep seconds, min and median per query.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR",
                              "/root/testdata/sf0.001")

    from bench import _staging_builders
    from level2_to_cassandra_spark.session import get_spark
    from level2_to_cassandra_spark.registry import all_queries

    spark = get_spark(
        app_name="l2c-time-queries",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # session warmups (JVM, Python workers) — identical to bench.py
    qs["q_sort_limit"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.range(10_000, numPartitions=int(
        spark.sparkContext.defaultParallelism)
    ).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop").mode("overwrite").save()
    for name in names:
        if os.path.isdir(warm_dir):
            try:
                qs[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"warmup {name} failed: {e}", file=sys.stderr)
            spark.catalog.clearCache()
    for label, (builder, consumers) in _staging_builders().items():
        if not (consumers & set(names)):
            continue
        t0 = time.perf_counter()
        builder(spark, sf_dir)
        print(f"staging {label}: {time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
        spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in samples.items():
        fmt = " ".join(f"{t:.3f}" for t in ts)
        print(f"{name:32s} min={min(ts):.3f} med="
              f"{statistics.median(ts):.3f}  [{fmt}]")
    spark.stop()


if __name__ == "__main__":
    main()
