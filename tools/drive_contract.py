"""Simulate the grading driver: vanilla SparkSession + DuckDB oracle
comparison of every __spark_entry__ query at sf0.01."""
import os, sys, time, traceback

os.environ["TZ"] = "America/New_York"
time.tzset()

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("drive-contract")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod
from tests.oracle_harness import compare  # noqa: E402

import duckdb

SF = "/root/testdata/sf0.01"

# 1. entry() twice (re-entrancy), rows >= 0
df = entrymod.entry(spark)
n = df.count()
assert n >= 0, n
df2 = entrymod.entry(spark)
assert df2.count() == n
print(f"entry(): {n} rows OK")

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
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF)
        sql = oracles.get(name)
        if sql is None:
            cnt = sdf.count()
            print(f"{name:30s} rows-only: {cnt} rows")
            continue
        compare(sdf, con, sql)
        print(f"{name:30s} OK")
    except Exception as e:
        fails.append(name)
        print(f"{name:30s} FAIL: {e}")
        traceback.print_exc(limit=3)
print(f"--- {len(qs)} queries, {len(fails)} failures "
      f"({time.time()-t0:.0f}s): {fails}")
sys.exit(1 if fails else 0)
