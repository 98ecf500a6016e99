#!/usr/bin/env python
"""Interleaved same-session A/B of the r17 spread_scan additions to
the scan->project text/quality queries: the OFF variant monkeypatches
the query modules' spread_scan binding to identity, reproducing the
pre-change single-task plans.

Usage: python tools/ab_spreadscan.py [-r REPS] query [query ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def set_variant(on: bool) -> None:
    from level2_to_cassandra_spark import catalog
    from level2_to_cassandra_spark.queries import llm, traindata
    fn = catalog.spread_scan if on else (lambda df, *a, **k: df)
    llm.spread_scan = fn
    traindata.spread_scan = fn


def main() -> None:
    args = sys.argv[1:]
    reps = 5
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
        app_name="l2c-ab-spreadscan",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    qs["q_sort_limit"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.range(10_000, numPartitions=int(
        spark.sparkContext.defaultParallelism)
    ).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop").mode("overwrite").save()
    for label, (builder, consumers) in _staging_builders().items():
        if not (consumers & set(names)):
            continue
        builder(spark, sf_dir)
        spark.catalog.clearCache()
    for variant in (True, False):
        set_variant(variant)
        for name in names:
            if os.path.isdir(warm_dir):
                try:
                    qs[name].fn(spark, warm_dir).write.format(
                        "noop").mode("overwrite").save()
                except Exception as e:  # noqa: BLE001
                    print(f"warmup {name} failed: {e}", file=sys.stderr)
                spark.catalog.clearCache()
        for name in names:  # sf0.1 JIT burn
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            spark.catalog.clearCache()

    samples: dict[tuple[str, bool], list[float]] = {}
    for _ in range(reps):
        for variant in (True, False):
            set_variant(variant)
            for name in names:
                t0 = time.perf_counter()
                qs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples.setdefault((name, variant), []).append(
                    time.perf_counter() - t0)
                spark.catalog.clearCache()
    set_variant(True)

    for name in names:
        on = samples[(name, True)]
        off = samples[(name, False)]
        print(f"{name:30s} ON  min={min(on):.3f} med="
              f"{statistics.median(on):.3f} {[round(t, 3) for t in on]}")
        print(f"{'':30s} OFF min={min(off):.3f} med="
              f"{statistics.median(off):.3f} {[round(t, 3) for t in off]}")


if __name__ == "__main__":
    main()
