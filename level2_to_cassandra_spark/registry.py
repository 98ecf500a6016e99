"""Central query registry.

Every engine capability that the driver harness checks is declared here
as a named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) an equivalent ANSI SQL string that DuckDB runs
as the correctness oracle.  ``__spark_entry__.py`` exposes this registry
verbatim.

Conventions (they keep the driver's order-insensitive value-hash
comparison honest):

* every computed/aggregate column is aliased IDENTICALLY in the Spark
  code and the oracle SQL;
* integer-sum results are cast to BIGINT on both sides (DuckDB SUM(int)
  is HUGEINT, Spark is LONG — casts make schemas agree);
* double aggregates are rounded to a fixed scale on both sides so
  summation-order float jitter cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Name → Query, importing all query modules on first use."""
    _ensure_loaded()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    # Import for side effects: each module registers its queries.
    from level2_to_cassandra_spark.queries import (  # noqa: F401
        relational,
        scalars,
        windows,
        joins,
        llm,
        timeseries,
    )

    _loaded = True
