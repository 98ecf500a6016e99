"""Query modules. Each module registers named queries (Spark fn +
DuckDB oracle SQL) into ``level2_to_cassandra_spark.registry``."""
