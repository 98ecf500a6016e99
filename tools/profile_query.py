#!/usr/bin/env python
"""Per-stage profile of one or more queries — the guide §1 empirical
loop without the (disabled) UI: run each named query with event
logging on, then print per-stage executor run time, task count and the
stage's callsite name, so the expensive operator is identifiable.

Usage: python tools/profile_query.py [-r REPS] query [query ...]

Same session/staging discipline as tools/time_queries.py (bench.py's
inner loop): tiny-SF plan warmup, staging prewarm for the named
queries, per-rep clearCache.  Reported stage times are summed across
reps for stability; divide by REPS mentally.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
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
    log_dir = tempfile.mkdtemp(prefix="l2c_profile_")

    from bench import _staging_builders
    from level2_to_cassandra_spark.session import get_spark
    from level2_to_cassandra_spark.registry import all_queries

    spark = get_spark(
        app_name="l2c-profile",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.driver.memory": "16g",
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.dir": f"file://{log_dir}"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

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

    walls: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    spark.stop()

    # parse the event log: per-description, per-stage
    desc_of_stage: dict[int, str] = {}
    stages: dict[int, dict] = {}
    files = [p for p in Path(log_dir).rglob("events_*") if p.is_file()]
    for entry in files:
        with open(entry, errors="replace") as fh:
            for line in fh:
                if line.startswith('{"Event":"SparkListenerJobStart"'):
                    ev = json.loads(line)
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    if not desc.startswith("profile:"):
                        continue
                    for sid in ev.get("Stage IDs", []):
                        desc_of_stage.setdefault(sid, desc[8:])
    for entry in files:
        with open(entry, errors="replace") as fh:
            for line in fh:
                if line.startswith(
                        '{"Event":"SparkListenerStageCompleted"'):
                    ev = json.loads(line)
                    info = ev.get("Stage Info", {})
                    sid = info.get("Stage ID")
                    if sid not in desc_of_stage or sid in stages:
                        continue
                    run = cpu = srt = srb = swb = rows_in = 0
                    for acc in info.get("Accumulables", []):
                        nm = acc.get("Name")
                        if nm == "internal.metrics.executorRunTime":
                            run = acc.get("Value", 0)
                        elif nm == "internal.metrics.executorCpuTime":
                            cpu = acc.get("Value", 0) // 1_000_000
                        elif nm == ("internal.metrics.shuffle.read"
                                    ".fetchWaitTime"):
                            srt = acc.get("Value", 0)
                        elif nm == ("internal.metrics.shuffle.read"
                                    ".totalBytesRead"):
                            srb = acc.get("Value", 0)
                        elif nm == ("internal.metrics.shuffle.write"
                                    ".bytesWritten"):
                            swb = acc.get("Value", 0)
                        elif nm == "internal.metrics.input.recordsRead":
                            rows_in = acc.get("Value", 0)
                    stages[sid] = {
                        "q": desc_of_stage[sid],
                        "run_ms": run, "cpu_ms": cpu,
                        "fetchwait_ms": srt,
                        "sh_read_mb": round(srb / 1e6, 1),
                        "sh_write_mb": round(swb / 1e6, 1),
                        "rows_in": rows_in,
                        "tasks": info.get("Number of Tasks", 0),
                        "name": info.get("Stage Name", "")[:90],
                        "wall_ms": None,
                    }
                    st = info.get("Submission Time")
                    ct = info.get("Completion Time")
                    if st and ct:
                        stages[sid]["wall_ms"] = ct - st

    for name in names:
        print(f"\n=== {name}: walls "
              f"{[round(w, 3) for w in walls[name]]} "
              f"(sum of stage numbers below covers all {reps} reps)")
        rows = [s for s in stages.values() if s["q"] == name]
        rows.sort(key=lambda s: -s["run_ms"])
        tot = sum(s["run_ms"] for s in rows)
        print(f"  total executor run {tot} ms over {len(rows)} stages")
        for s in rows[:14]:
            print(f"  run={s['run_ms']:>6} cpu={s['cpu_ms']:>6} "
                  f"wall={s['wall_ms']} fw={s['fetchwait_ms']:>4} "
                  f"shR={s['sh_read_mb']:>6} shW={s['sh_write_mb']:>6} "
                  f"t={s['tasks']:>3} in={s['rows_in']:>9} {s['name']}")


if __name__ == "__main__":
    main()
