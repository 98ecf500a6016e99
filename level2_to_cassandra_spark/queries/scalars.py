"""Scalar-function families (SURVEY.md §2 B8): string, date/time, math,
array, map/struct, JSON.  One representative query per family, each
oracle-checked against DuckDB.  All JVM built-ins — these stay inside
whole-stage codegen; no Python in the row path.

The string query reproduces the reference's one scalar transform —
stripping the ``BOOK_TYPE_`` prefix from order types (main.rs:62-64) —
generalized across the standard string library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.functions import (
    round_signless,
    round_signless_sql,
)
from level2_to_cassandra_spark.registry import register

_SCALE = 4


@register(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           REPLACE(p_type, 'BRUSHED', '')          AS type_stripped,
           UPPER(p_brand)                          AS brand_upper,
           LOWER(p_name)                           AS name_lower,
           CONCAT(p_brand, ':', p_type)            AS brand_type,
           SUBSTRING(p_name, 1, 5)                 AS name_prefix,
           TRIM(p_name)                            AS name_trim,
           LENGTH(p_name)                          AS name_len,
           CASE WHEN p_type LIKE '%STEEL%' THEN 1 ELSE 0 END AS is_steel,
           REGEXP_REPLACE(p_type, '[AEIOU]', '_', 'g') AS devoweled
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library: replace/upper/lower/concat/substring/trim/length/
    like/regexp_replace (reference's prefix strip, main.rs:62-64,
    generalized)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_type"), F.lit("BRUSHED"), F.lit("")).alias(
            "type_stripped"
        ),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.when(F.col("p_type").like("%STEEL%"), 1).otherwise(0).alias("is_steel"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
    )


@register(
    "q_scalar_datetime",
    oracle="""
    SELECT event_id,
           ts,
           CAST(ts AS DATE)                                    AS day,
           DATE_TRUNC('hour', ts)                              AS hour_bucket,
           EXTRACT(year  FROM ts)::INT                         AS y,
           EXTRACT(month FROM ts)::INT                         AS m,
           EXTRACT(day   FROM ts)::INT                         AS d,
           EXTRACT(hour  FROM ts)::INT                         AS h,
           CAST(FLOOR(epoch(ts)) AS BIGINT)                    AS epoch_s,
           CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400           AS epoch_day,
           DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                                                               AS days_since
    FROM events
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library incl. the reference's epoch-seconds→day rule
    (``time//86400``, main.rs:110) done with proper unit handling
    (SURVEY.md §1.4 quirk 1)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts").cast("long")
    return ev.select(
        "event_id",
        "ts",
        F.to_date("ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        epoch_s.alias("epoch_s"),
        F.floor(epoch_s / 86400).cast("long").alias("epoch_day"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


@register(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net,
           ABS(l_discount - l_tax)                      AS spread,
           FLOOR(l_quantity)::BIGINT                    AS qty_floor,
           CEIL(l_quantity)::BIGINT                     AS qty_ceil,
           ROUND(POWER(l_quantity, 2), 4)               AS qty_sq,
           ROUND(LN(l_extendedprice + 1), 4)            AS log_price,
           ROUND(SQRT(l_extendedprice), 4)              AS sqrt_price,
           CAST(l_quantity AS BIGINT) % 7               AS qty_mod7
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math library: round/abs/floor/ceil/pow/ln/sqrt/mod + arithmetic
    (the reference's delta = buy − sell, main.rs:130, generalized)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # scale 4, not 2: TPC-H net prices carry exactly ≤4 decimals, so
        # rounding at 4 has no decimal ties — Spark (HALF_UP on decimal
        # repr) and DuckDB (nearest on the binary value) agree; at scale
        # 2 the frequent x.xx25/x.xx75 ties diverge between engines.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("spread"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.round(F.pow("l_quantity", F.lit(2)), _SCALE).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), _SCALE).alias("log_price"),
        F.round(F.sqrt("l_extendedprice"), _SCALE).alias("sqrt_price"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@register(
    "q_scalar_array",
    # sign-normalized rounding on every rounded float column: a tiny
    # negative first element / sum / max rounds to -0.0 under DuckDB's
    # sign-preserving ROUND but +0.0 under Spark (the r11
    # q_embed_covariance failure class — first_elem hit it at sf0.1)
    oracle=f"""
    SELECT vec_id,
           label,
           len(embedding)                                   AS dim,
           {round_signless_sql('embedding[1]', 4)}          AS first_elem,
           {round_signless_sql(
               "list_aggregate(embedding, 'sum')", 4)}      AS vec_sum,
           {round_signless_sql(
               "list_aggregate(embedding, 'max')", 4)}      AS vec_max,
           {round_signless_sql('''list_aggregate(
               list_transform(embedding, x -> x * x), 'sum')''', 4)}
                                                            AS sq_norm,
           len(list_filter(embedding, x -> x > 0))          AS n_positive
    FROM embeddings
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library over 64-d embeddings: size/element/aggregate/
    transform/filter — the JVM-side kernels similarity search builds on
    (no UDF: F.aggregate/F.transform run in codegen)."""
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        round_signless(
            F.col("embedding")[0].cast("double"), _SCALE
        ).alias("first_elem"),
        round_signless(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), _SCALE
        ).alias("vec_sum"),
        round_signless(F.array_max(dbl), _SCALE).alias("vec_max"),
        round_signless(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), _SCALE
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "q_scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod10
    FROM events
    WHERE json_valid(props)
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON library over events.props — the reference's serde decode
    (main.rs:77,107) as from_json/get_json_object with explicit schema
    (never inference on a stream, SURVEY.md §1.3)."""
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.withColumn("__p", F.from_json("props", schema))
    return parsed.where(F.col("__p").isNotNull()).select(
        "event_id",
        F.col("__p.k").alias("prop_k"),
        (F.col("__p.k") % 10).alias("k_mod10"),
    )


@register(
    "q_scalar_map",
    oracle="""
    SELECT p_partkey,
           p_brand   AS meta_brand,
           p_type    AS meta_type,
           p_size    AS meta_size,
           CONCAT(p_brand, '|', p_type) AS packed
    FROM part
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/struct round-trip: build a map + struct column, read fields
    back out (oracle checks the extracted scalars — DuckDB views have no
    native map column to compare, so the round-trip IS the test)."""
    p = load_table(spark, sf_dir, "part")
    packed = p.select(
        "p_partkey",
        F.create_map(
            F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
        ).alias("meta"),
        F.named_struct(
            F.lit("size"), F.col("p_size"), F.lit("brand"), F.col("p_brand")
        ).alias("s"),
    )
    return packed.select(
        "p_partkey",
        F.col("meta")["brand"].alias("meta_brand"),
        F.col("meta")["type"].alias("meta_type"),
        F.col("s.size").alias("meta_size"),
        F.concat_ws("|", F.col("s.brand"), F.col("meta")["type"]).alias("packed"),
    )
