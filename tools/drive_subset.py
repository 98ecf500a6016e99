#!/usr/bin/env python
"""Oracle-check a subset of queries — the inner correctness loop for
optimization work.  Same harness as tools/drive_contract.py (vanilla
session, non-UTC host TZ, sf0.01 DuckDB oracle), but only for the
names given on the command line.  Usage:

    python tools/drive_subset.py [--sf DIR] query [query ...]
"""
import os
import sys
import time
import traceback

os.environ["TZ"] = "America/New_York"
time.tzset()

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]

spark = (
    SparkSession.builder.master("local[4]")
    .appName("drive-subset")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402

import duckdb  # noqa: E402

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF}/{t}.parquet')"
    )

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
fails = []
t0 = time.time()
for name in args:
    try:
        sdf = qs[name](spark, SF)
        compare(sdf, con, oracles[name])
        print(f"{name:30s} OK")
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print(f"{name:30s} FAIL: {e}")
        traceback.print_exc(limit=3)
print(f"--- {len(args)} queries, {len(fails)} failures "
      f"({time.time() - t0:.0f}s): {fails}")
sys.exit(1 if fails else 0)
