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
* :func:`ivf_topk` — IVF (inverted-file) ANN: a deterministic coarse
  quantizer (hash-seeded spherical k-means, one Lloyd step) partitions
  the corpus into cells; each query probes only its ``nprobe`` nearest
  cells and exact cosine re-ranks the survivors.  The query-side scale
  path: per query the scan shrinks from N to ~nprobe·N/n_cells, and at
  cluster scale the corpus is written bucketed by cell so a probe is a
  broadcast join against pre-localized buckets — no corpus shuffle per
  query batch.
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
    table, never N².

    Dataflow (measured 30 s → ~6 s at sf0.1, where a loose threshold
    makes ~40 % of all pairs candidates):

    * the self-join and the across-tables dedup run on NARROW
      (table, bucket, id) rows — the 64-float vectors never enter the
      candidate join or the distinct's shuffle;
    * the cast and the norm are computed ONCE per corpus row below the
      re-attach joins (projections do not collapse through joins — the
      same hoisting as the embed query; an aliased norm inside a
      transform lambda would be inlined by CollapseProject and
      re-evaluated per element), so the per-pair kernel is one fused
      zip-multiply-fold plus a scalar divide instead of cast + zip +
      fold + two norm folds — higher-order functions are interpreted
      per element, so array passes per pair dominate the re-rank;
    * vectors re-attach to the DEDUPLICATED pairs via two hash joins
      (broadcast at small SF by AQE), so each pair's kernel runs
      exactly once.

    The bucketized relation is persisted: it feeds both sides of the
    self-join and ReuseExchange does not match across the alias
    branches."""
    b = lsh_bucketize(
        df.select(id_col, vec_col), n_planes, n_tables, vec_col
    ).select("table", "bucket", F.col(id_col).alias("__id")).persist()
    pairs = (
        b.select("table", "bucket", F.col("__id").alias("id_a"))
        .join(b.select("table", "bucket", F.col("__id").alias("id_b")),
              ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # union across tables — narrow rows only
    )
    v = as_double(F.col(vec_col))
    vecs = df.select(
        F.col(id_col).alias("__id"),
        v.alias("__dv"),
        l2_norm(v).alias("__n"),
    )
    return (
        pairs.join(
            vecs.select(F.col("__id").alias("id_a"),
                        F.col("__dv").alias("__va"),
                        F.col("__n").alias("__na")), "id_a")
        .join(
            vecs.select(F.col("__id").alias("id_b"),
                        F.col("__dv").alias("__vb"),
                        F.col("__n").alias("__nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb"))
            ).alias("cos"),
        )
    )


def _nearest_cell(vec: Column) -> list[Column]:
    """(internal) columns for argmax-by-cosine against the joined
    centroid row: max(struct(cos, cell)) per group is the
    deterministic argmax (ties break to the highest cell id)."""
    return [
        F.max(
            F.struct(
                cosine(vec, F.col("__cv")).alias("__cos"),
                F.col("cell").alias("cell"),
            )
        ).alias("__best")
    ]


def ivf_centroids(corpus: DataFrame, n_cells: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  lloyd_iters: int = 1) -> DataFrame:
    """Deterministic coarse quantizer: (cell, __cv) centroid rows.

    Seeds are the ``n_cells`` corpus vectors with the smallest
    xxhash64(id) — a reproducible pseudo-random sample picked with a
    TakeOrdered top-N (no global sort materialized).  Each Lloyd
    iteration reassigns every vector to its max-cosine centroid
    (spherical k-means) and recomputes cell means element-wise via
    posexplode → avg → re-assemble.  Centroid components are rounded to
    6 decimals so cell-assignment boundaries are stable across
    summation orders (same engine-invariance trick as ``round_cos`` in
    :func:`brute_topk`).  Cells that lose every member vanish — probes
    simply never select them.  The result is n_cells rows of dim
    doubles: always broadcastable."""
    w = Window.orderBy(F.asc("__h"))
    seeds = (
        corpus.select(
            as_double(F.col(vec_col)).alias("__cv"),
            F.xxhash64(F.col(id_col)).alias("__h"),
        )
        .orderBy("__h")
        .limit(n_cells)
        .withColumn("cell", F.row_number().over(w))
        .select("cell", "__cv")
    )
    cent = seeds
    for _ in range(lloyd_iters):
        assigned = (
            corpus.select(as_double(F.col(vec_col)).alias("__v"),
                          F.col(id_col).alias("__id"))
            .crossJoin(F.broadcast(cent))
            .groupBy("__id")
            .agg(*_nearest_cell(F.col("__v")), F.first("__v").alias("__v"))
            .select(F.col("__best.cell").alias("cell"), "__v")
        )
        cent = (
            assigned.select("cell", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("x"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "x"))),
                    lambda s: F.round(s["x"], 6),
                ).alias("__cv")
            )
        )
    return cent


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_cos: int | None = None) -> DataFrame:
    """Approximate top-k cosine neighbors per query via IVF probing.
    Output: (query_id, neighbor_id, cos, rank) — the same contract as
    :func:`brute_topk`, against which recall is tested.

    Scale shape: the centroid relation is n_cells rows (broadcast
    everywhere); the corpus is assigned to cells in ONE pass and joined
    on cell with the probe list (queries × nprobe rows, broadcast by
    AQE).  Per query only ~nprobe/n_cells of the corpus is scanned; at
    cluster scale the assigned corpus is the bucketed-by-cell staging
    table, making repeated query batches zero-shuffle probes."""
    cent = ivf_centroids(corpus, n_cells, id_col, vec_col).persist()
    inv = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("__cvv"),
        )
        .crossJoin(F.broadcast(cent))
        .groupBy("neighbor_id")
        .agg(*_nearest_cell(F.col("__cvv")), F.first("__cvv").alias("__cvv"))
        .select(F.col("__best.cell").alias("cell"), "neighbor_id", "__cvv")
    )
    qcos = cosine(F.col("__qv"), F.col("__cv"))
    wprobe = Window.partitionBy("query_id").orderBy(
        F.desc("__pcos"), F.asc("cell")
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("__qv"),
        )
        .crossJoin(F.broadcast(cent))
        .select("query_id", "__qv", "cell", qcos.alias("__pcos"))
        .withColumn("__pr", F.row_number().over(wprobe))
        .where(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", "cell")
    )
    cos = cosine(F.col("__qv"), F.col("__cvv"))
    if round_cos is not None:
        cos = F.round(cos, round_cos)
    scored = (
        inv.join(probes, "cell")
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
