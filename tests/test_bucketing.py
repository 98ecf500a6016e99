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


def test_zorder_layout_tightens_file_stats(spark):
    """The point of q_zorder: range-partitioning rows by their z-value
    yields partitions (→ files at write time) whose min/max spans are
    tight on BOTH interleaved dimensions simultaneously, so a
    predicate on EITHER column prunes most files.  Measured: the mean
    normalized (partkey span × suppkey span) rectangle per partition
    must shrink well below the ~1.0 a key-order layout leaves (each
    orderkey-ordered partition spans nearly the full range of both
    other columns)."""
    # z recomputed inline from the SAME shared SQL fragments the
    # registered query and its oracle use ((l_orderkey, l_linenumber)
    # is not unique in the synthetic fixture, so joining the query's
    # output back would fan out)
    from level2_to_cassandra_spark.queries import relational as rel

    li = load_table(spark, SF, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").cast("long").alias("amn"),
        F.max("l_partkey").cast("long").alias("amx"),
        F.min("l_suppkey").cast("long").alias("bmn"),
        F.max("l_suppkey").cast("long").alias("bmx"),
    )
    joined = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .crossJoin(F.broadcast(bounds))
        .selectExpr(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            rel._Z_QUANT_A.replace("//", "div"),
            rel._Z_QUANT_B.replace("//", "div"),
        )
        .selectExpr(
            "l_orderkey", "l_partkey", "l_suppkey",
            f"({rel._Z_INTERLEAVE_SQL}) AS zval",
        )
    )

    def mean_rect(df):
        parts = (
            df.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("pa"),
                (F.max("l_suppkey") - F.min("l_suppkey")).alias("pb"),
            )
            .collect()
        )
        stats = df.agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("ra"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("rb"),
        ).collect()[0]
        rects = [
            (r.pa / stats.ra) * (r.pb / stats.rb) for r in parts
        ]
        return sum(rects) / len(rects)

    naive = mean_rect(joined.repartitionByRange(8, "l_orderkey"))
    zorder = mean_rect(joined.repartitionByRange(8, "zval"))
    # 8 z-range cells ≈ rectangles covering ~1/8 of the plane each;
    # orderkey ranges span essentially the whole plane per partition
    assert zorder < 0.5 * naive, (zorder, naive)
    assert zorder < 0.5, zorder


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy(day) writes + a day predicate must prune
    at the PartitionFilters level (directory skip — zero IO for other
    days), not as a post-scan data filter.  At 100 TB this is the
    first-order scan reducer for time-ranged queries; z-order /
    bucketing refine WITHIN what partition pruning leaves."""
    ev = load_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    back = spark.read.parquet(path)
    one_day = back.where(F.col("day") == "2024-01-01").select(
        "event_id", "value"
    )
    plan = plan_of(one_day, "formatted")
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "day" in pf
    # fully consumed by pruning: no post-scan Filter operator survives
    assert "(1) Filter" not in plan and "* Filter" not in plan
    assert one_day.count() > 0
