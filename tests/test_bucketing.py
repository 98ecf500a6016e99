"""Bucketed tables co-locate join keys at WRITE time so repeated joins
on that key shuffle neither side — the 100 TB answer to 'we join these
two fact tables every day'.  This test proves the mechanism: a
bucketed lineitem⋈orders join plan contains NO Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.plans import plan_of

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    # warehouse.dir is static — scope the location to the database
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, SF, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bkt.{name}_b")
        )
    yield
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li = spark.table("bkt.lineitem_b")
    # merge hint: at fixture size the planner would broadcast (also
    # shuffle-free but proves nothing about bucketing); at fact⋈fact
    # scale sort-merge is what the planner picks on its own.
    o = spark.table("bkt.orders_b").hint("merge")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    plan = plan_of(joined, "formatted")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join still shuffles:\n" + plan
    )
    # sanity: it is a real join producing rows
    assert joined.count() == load_table(spark, SF, "lineitem").count()


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    li = spark.table("bkt.lineitem_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = plan_of(agg, "formatted")
    assert "Exchange" not in plan, "bucketed agg still shuffles:\n" + plan
