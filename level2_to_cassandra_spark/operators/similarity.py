"""Similarity search over embedding columns (SURVEY.md §2 B11).

All kernels are JVM higher-order functions (`zip_with`/`aggregate`) —
codegen'd, Arrow-free, no Python per row.  Two search strategies:

* :func:`brute_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus; one pass over the corpus per batch of
  queries, a ranking window for the top-k cut.  At 100 TB this is the
  baseline that always works: corpus stays partitioned, queries
  broadcast, no corpus×corpus blow-up.
* :func:`lsh_bucketize` — random-hyperplane (sign) LSH: deterministic
  hash-derived planes → n-bit bucket signature.  Candidate pairs only
  form within a bucket (equi-join on the signature — a plain hash
  shuffle), then exact cosine re-ranks.  This is the corpus×corpus
  scale path: candidates ∝ bucket sizes, not N².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential left fold, so results are deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two (float) array columns, in double."""
    da, db = as_double(a), as_double(b)
    return dot(da, db) / (l2_norm(da) * l2_norm(db))


def brute_topk(corpus: DataFrame, queries: DataFrame, k: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_cos: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` is broadcast (must be driver-bounded — a batch of query
    vectors, not a second corpus); self-matches are excluded.  Output:
    (query_id, neighbor_id, cos, rank).

    ``round_cos`` rounds the cosine to that many decimals BEFORE the
    ranking window, making the top-k cut engine-invariant (float
    last-ulp differences can't flip a boundary pair) — callers that
    compare against another engine should rank on the rounded value
    rather than over-fetching and re-ranking.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    cos = cosine(F.col("__qv"), F.col("__cv"))
    if round_cos is not None:
        cos = F.round(cos, round_cos)
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_component(table: int, plane: int, i: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    derived from xxhash64(table, plane, i) — reproducible across
    runs/executors with no RNG state to ship."""
    h = F.xxhash64(F.lit(table), F.lit(plane), i)
    return (F.pmod(h, F.lit(10_000)).cast("double") / 10_000.0) - 0.5


def lsh_bucketize(df: DataFrame, n_planes: int = 4, n_tables: int = 8,
                  vec_col: str = "embedding") -> DataFrame:
    """Append multi-table sign-LSH buckets: one (table, bucket) row per
    input row per table.  A pair at angle θ collides in one table with
    p = (1−θ/π)^n_planes; across L independent tables the capture
    probability is 1−(1−p)^L — n_planes trades candidate volume
    (bucket granularity) against per-table recall, n_tables buys
    recall linearly in work.
    """
    v = as_double(F.col(vec_col))
    entries = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    v,
                    F.transform(v, lambda _, i: _plane_component(t, p, i)),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        entries.append(
            F.struct(F.lit(t).alias("table"), bucket.alias("bucket"))
        )
    return df.withColumn("e", F.explode(F.array(*entries))).select(
        *df.columns, F.col("e.table").alias("table"),
        F.col("e.bucket").alias("bucket")
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_planes: int = 4, n_tables: int = 8) -> DataFrame:
    """Candidate near-duplicate pairs = same bucket in ANY table, with
    exact cosine attached for re-ranking/thresholding.  The join key is
    (table, bucket) — one shuffle; candidate count ∝ Σ bucket² per
    table, never N²."""
    b = lsh_bucketize(df.select(id_col, vec_col), n_planes, n_tables, vec_col)
    left = b.select(
        "table", "bucket",
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
    )
    right = b.select(
        "table", "bucket",
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
    )
    return (
        left.join(right, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb")
        .distinct()  # union across tables
        .select(
            "id_a",
            "id_b",
            cosine(F.col("__va"), F.col("__vb")).alias("cos"),
        )
    )
