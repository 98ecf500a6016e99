"""Near-duplicate detection: exact n-gram Jaccard and MinHash+LSH.

Two formulations with one contract (pairs above a Jaccard threshold):

* :func:`exact_jaccard_pairs` — inverted shingle index: explode
  distinct shingles, self-join on the shingle, count co-occurrences,
  Jaccard = |∩| / (|A|+|B|−|∩|).  EXACT, and the oracle for the
  approximate path.  Scales with shingle-postings sizes (fine while
  shingles are discriminative; hot shingles are the caveat and can be
  df-capped — see ``max_shingle_df``).
* :func:`minhash_pairs` — MinHash signatures (one xxhash64 per
  permutation, ``array_min`` over shingles) → banded LSH (band hash =
  xxhash64 of the band's signature slice) → candidates join only
  within a (band, hash) bucket → exact Jaccard verification of the
  candidates.  Candidate volume ∝ Σ bucket² per band, never N² — the
  100 TB path.  With b bands of r rows, P(candidate) = 1−(1−j^r)^b.

Both stay entirely in JVM built-ins; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from level2_to_cassandra_spark.operators.text import word_shingles


def shingle_postings(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 3,
                     max_shingle_df: int | None = None) -> DataFrame:
    """(id, shingle) postings, distinct per doc.  ``max_shingle_df``
    drops shingles appearing in more than that many docs — the classic
    stop-shingle cap that bounds the self-join at corpus scale."""
    p = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(text_col, k))).alias("shingle"),
    )
    if max_shingle_df is not None:
        hot = (
            p.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        p = p.join(F.broadcast(hot), "shingle", "left_anti")
    return p


def exact_jaccard_pairs(docs: DataFrame, threshold: float,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold (exact).
    Output: (id_a, id_b, jaccard) with id_a < id_b."""
    postings = shingle_postings(docs, id_col, text_col, k)
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    co = (
        postings.alias("a")
        .join(postings.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        co.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(shingles_col, n_hashes: int = 16):
    """Array of n minhash values: min over shingles of xxhash64(seed, s).
    Empty shingle sets get NULL elements (no shingles ⇒ no signature)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles_col, lambda s: F.xxhash64(F.lit(i), s))
            )
            for i in range(n_hashes)
        ]
    )


def minhash_pairs(docs: DataFrame, threshold: float,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3, n_hashes: int = 16, bands: int = 8) -> DataFrame:
    """MinHash+LSH candidates verified with exact Jaccard ≥ threshold.
    Output: (id_a, id_b, jaccard) with id_a < id_b.

    With defaults (16 hashes, 8 bands × 2 rows), a pair at j=0.8 is a
    candidate with P = 1−(1−0.64)^8 ≈ 0.9997; misses drop further as j
    rises, so at dedup-grade thresholds recall is effectively 1.
    """
    r = n_hashes // bands
    with_sig = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, k).alias("__sh"),
    ).where(F.size("__sh") > 0).withColumn(
        "sig", minhash_signature(F.col("__sh"))
    )
    # band hash: one 64-bit hash of the band's signature slice
    band_entries = with_sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b),
                            *[F.col("sig")[b * r + j] for j in range(r)],
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("id", "e.band", "e.bhash")
    cand = (
        band_entries.alias("a")
        .join(band_entries.alias("b"), ["band", "bhash"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verification of candidates only
    postings = shingle_postings(docs, id_col, text_col, k)
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    co = (
        postings.alias("pa")
        .join(cand, F.col("pa.id") == F.col("id_a"))
        .join(
            postings.alias("pb"),
            (F.col("pb.id") == F.col("id_b"))
            & (F.col("pa.shingle") == F.col("pb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        co.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
