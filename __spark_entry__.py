"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``level2_to_cassandra_spark.registry``: every engine
capability is declared there as a named query (Spark callable + DuckDB
oracle SQL).  See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from level2_to_cassandra_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's core stateful
    computation (per-key per-day conditional cumulative sums,
    main.rs:109-130) as a deterministic batch window."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return registry.all_queries()["q_window_cumulative"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    return registry.oracle_sqls()
