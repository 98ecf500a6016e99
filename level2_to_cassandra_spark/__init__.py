"""level2_to_cassandra_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``ejtraderLabs/level2-to-cassandra`` (a Rust ZeroMQ→Cassandra level-2
market-data ingester, see /root/reference) as an idiomatic Apache Spark
engine:

* the reference's streaming ETL semantics (demux, JSON decode, flatten,
  stateful per-symbol daily-reset cumulative volume, keyed upsert sink)
  as Structured Streaming pipelines (``streaming/``);
* the query surface its Cassandra storage layout exists to serve
  (per-key time-series analytics) plus a complete batch relational
  surface (``queries/``, ``operators/``);
* large-scale training-data pipeline operators: dedup (exact / MinHash /
  SimHash / n-gram Jaccard / embedding), similarity search, text
  analysis, multimodal column plumbing (``operators/``).

Everything is DataFrame/SQL-first so Catalyst + Tungsten own the
physical plan; Python is confined to Arrow-vectorized pandas UDFs where
built-ins genuinely cannot express the semantics.
"""

from level2_to_cassandra_spark.session import get_spark
from level2_to_cassandra_spark.catalog import load_table, TABLES

__all__ = ["get_spark", "load_table", "TABLES"]

__version__ = "0.1.0"
