"""B10 UDF-surface tests: grouped-map applyInPandas parity with the
JVM window formulation, and config surface checks."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.functions.udfs import zscore_per_group
from level2_to_cassandra_spark.streaming.pipeline import PipelineConfig

SF = "/root/testdata/sf0.001"


def test_zscore_applyinpandas_matches_window(spark):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    got = {
        r.event_id: r.zscore
        for r in zscore_per_group(ev, "user_id", "value").collect()
    }
    w = Window.partitionBy("user_id")
    jvm = ev.select(
        "event_id",
        (
            (F.col("value") - F.avg("value").over(w))
            / F.stddev_pop("value").over(w)
        ).alias("zscore"),
    )
    want = {r.event_id: r.zscore for r in jvm.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_pipeline_config_from_env():
    cfg = PipelineConfig.from_env(
        {
            "APP_MODE": "tick",
            "TOPIC": "btcusd",
            "API_ADDRESS": "broker:9092",
            "CASSANDRA_KEYSPACE": "/data/ticks",
        }
    )
    assert cfg.mode == "tick"
    assert cfg.topic_filter == "btcusd"
    assert cfg.out_path == "/data/ticks"
    assert cfg.kafka["kafka.bootstrap.servers"] == "broker:9092"
    with pytest.raises(ValueError):
        PipelineConfig.from_env({"APP_MODE": "bogus"})
