"""Empirical scaling curves for the bucketed-dedup candidate claims
(VERDICT r08 task #5).

The engine's dedup/similarity operators all argue the same 100 TB
shape in their docstrings: candidate pairs form only inside bounded
buckets (LSH band, hash table bucket, IVF cell, PPJoin prefix), so the
verify-stage join grows ~linearly with the corpus — never N².  These
tests MEASURE that, by counting the candidate-pair relations (counts
only — no verification work) across the fixture scale factors.

Two disciplines make the claim true, and both are part of what is
tested:

* **Resolution scales with the corpus.**  Fixed bucket structures are
  inherently quadratic (N²/#buckets): q_semdedup's docstring says
  "n_cells grows with the corpus so cell sizes stay constant", the
  LSH path adds planes as N grows (buckets = 2^planes per table), and
  MinHash LSH deepens rows-per-band so random collisions don't track
  N².  The cross-SF tests therefore scale the resolution knob exactly
  as the docstrings prescribe and assert the measured growth exponent
  `log(c1/c0) / log(n1/n0)` stays below 1.3.
* **Boilerplate is capped, not joined.**  Exact PPJoin has no
  resolution knob — its candidate volume tracks shingle document
  frequencies, and the fixture's documents are drawn from a FIXED
  template vocabulary, so raw cross-SF dfs grow ∝ N (a synthetic-data
  artifact real corpora don't have: Heaps' law grows the vocabulary).
  The operator's scale mechanism is the stop-shingle df cap, so the
  fuzzy test exercises the MECHANISM: a boilerplate corpus whose
  uncapped candidates are provably quadratic must collapse to a
  bounded relation under the cap (the documented boilerplate recall
  trade), while the real-fixture candidate volume stays a small
  fraction of all-pairs at every SF.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.operators import minhash, similarity

SF_SMALL = "/root/testdata/sf0.01"
SF_LARGE = "/root/testdata/sf0.1"

#: The bucketed-growth bound: exponent 1.0 is perfectly linear, 2.0 is
#: all-pairs; 1.3 leaves room for fixture noise while failing anything
#: that drifts toward quadratic (VERDICT r08 task #5).
MAX_EXPONENT = 1.3


def _exponent(n0: int, c0: int, n1: int, c1: int) -> float:
    """Growth exponent of candidate count c w.r.t. corpus size n."""
    assert n1 > n0 and c0 > 0, (n0, n1, c0)
    return math.log(c1 / c0) / math.log(n1 / n0)


def test_minhash_candidates_scale_linearly(spark):
    """MinHash LSH candidates across sf0.01 → sf0.1 with rows-per-band
    deepened as the corpus grows (16 hashes / r=2 at 500 docs, 32 / r=4
    at 5000): the banded join's candidate count must grow with a
    sub-1.3 exponent.  At fixed r the random-collision rate per pair is
    constant, so candidates would track the planted-duplicate structure
    PLUS an N²·p noise floor — deepening r is the documented knob that
    keeps the noise floor out of the picture."""
    counts = {}
    for sf_dir, n_hashes in ((SF_SMALL, 16), (SF_LARGE, 32)):
        docs = load_table(spark, sf_dir, "documents")
        cand = minhash.minhash_pairs(
            docs, threshold=0.0, k=3, n_hashes=n_hashes, bands=8,
            candidates_only=True,
        )
        counts[sf_dir] = (docs.count(), cand.count())
        spark.catalog.clearCache()
    (n0, c0), (n1, c1) = counts[SF_SMALL], counts[SF_LARGE]
    assert _exponent(n0, c0, n1, c1) < MAX_EXPONENT, counts


def test_embed_lsh_candidates_scale_linearly(spark):
    """Sign-LSH embedding candidates across sf0.01 → sf0.1 with the
    plane count scaling ~log2(N) (buckets per table = 2^planes, so
    bucket POPULATION stays constant): sub-1.3 growth exponent.  This
    is the q_llm_dedup_embed shape with the resolution discipline its
    docstring prescribes for corpus growth."""
    counts = {}
    for sf_dir in (SF_SMALL, SF_LARGE):
        em = load_table(spark, sf_dir, "embeddings")
        n = em.count()
        planes = max(4, round(math.log2(n)) - 4)
        cand = similarity.lsh_candidate_pairs(
            em, n_planes=planes, n_tables=8, scheme="rademacher", dim=64,
        )
        counts[sf_dir] = (n, cand.count())
        spark.catalog.clearCache()
    (n0, c0), (n1, c1) = counts[SF_SMALL], counts[SF_LARGE]
    assert _exponent(n0, c0, n1, c1) < MAX_EXPONENT, counts


def test_semdedup_candidates_scale_linearly(spark):
    """q_semdedup's within-cell pair volume (Σ cell_size·(cell_size−1)/2
    over the IVF assignment — counted straight off the cell histogram,
    no pair join executed) across sf0.01 → sf0.1 with n_cells ∝ N, the
    exact discipline the query docstring claims for 100 TB: sub-1.3
    growth exponent."""
    counts = {}
    for sf_dir in (SF_SMALL, SF_LARGE):
        em = load_table(spark, sf_dir, "embeddings")
        n = em.count()
        seeds = similarity.ivf_seeds(em, n_cells=max(4, n // 32),
                                     scheme="portable")
        assigned = similarity.ivf_assign_np(em, seeds, round_assign=6)
        pairs = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.sum(F.expr("sz * (sz - 1) / 2")).alias("p"))
            .collect()[0][0]
        )
        counts[sf_dir] = (n, int(pairs))
        spark.catalog.clearCache()
    (n0, c0), (n1, c1) = counts[SF_SMALL], counts[SF_LARGE]
    assert _exponent(n0, c0, n1, c1) < MAX_EXPONENT, counts


def test_fuzzy_candidates_bounded_on_fixture(spark):
    """q_llm_dedup_fuzzy's candidate relation (PPJoin prefix+positional
    +length filters, corpus-relative stop-shingle cap) must stay a
    vanishing fraction of the all-pairs join at every fixture SF —
    the 'bucketed, never all-pairs' claim measured directly.  A raw
    cross-SF exponent is NOT asserted here: the fixture draws text
    from a fixed template vocabulary, so shingle dfs grow ∝ N between
    corpora (real corpora grow vocabulary instead — Heaps' law); the
    operator's own scale mechanism is covered by the cap test below."""
    for sf_dir in (SF_SMALL, SF_LARGE):
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()
        cand = minhash.exact_jaccard_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            candidates_only=True,
        ).count()
        all_pairs = n * (n - 1) / 2
        assert cand < 0.01 * all_pairs, (sf_dir, n, cand)
        spark.catalog.clearCache()


def test_fuzzy_df_cap_linearizes_boilerplate(spark):
    """The exact-Jaccard scale mechanism, exercised where it bites: a
    corpus of 95 %-boilerplate documents (20 shared header words + one
    unique tail word, J = 0.9 for every pair) whose prefix windows are
    forced onto corpus-hot shingles.  Uncapped, the candidate relation
    IS all-pairs — n(n−1)/2 exactly, measured quadratic — because the
    output itself is quadratic.  With max_shingle_df, hot shingles
    leave candidate generation and the relation collapses to the
    documented boilerplate recall trade: bounded ≤ n (measured growth
    exponent far under the 1.3 bound), which is what keeps the join
    alive when 100 TB of web text shares the same footer."""
    header = ("terms of service apply to all content on this site and "
              "by continuing you accept the full agreement as published")

    def corpus(n):
        rows = [(i, f"{header} w{i}") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    measured = []
    for n in (100, 400):
        uncapped = minhash.exact_jaccard_pairs(
            corpus(n), threshold=0.79, candidates_only=True,
        ).count()
        capped = minhash.exact_jaccard_pairs(
            corpus(n), threshold=0.79, max_shingle_df=16,
            candidates_only=True,
        ).count()
        assert uncapped == n * (n - 1) // 2  # provably quadratic input
        measured.append((n, uncapped, capped))
        spark.catalog.clearCache()
    (n0, _, cap0), (n1, _, cap1) = measured
    # capped relation must not grow quadratically: allow at most
    # linear-with-slack (cap0/cap1 are 0 on this corpus — every pair
    # is boilerplate-carried, the documented trade)
    assert cap1 <= max(2 * cap0 * (n1 // n0), n1), measured


def test_fuzzy_candidates_only_matches_verified_support(spark):
    """candidates_only is a PROBE of the same plan, not a fork: every
    verified q_llm_dedup_fuzzy pair must appear in the candidate
    relation (lossless filters), pinning the probe to the operator it
    measures."""
    docs = load_table(spark, SF_SMALL, "documents")
    cand = {
        (r.id_a, r.id_b)
        for r in minhash.exact_jaccard_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            candidates_only=True,
        ).collect()
    }
    verified = {
        (r.id_a, r.id_b)
        for r in minhash.exact_jaccard_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
        ).where(F.round(F.col("jaccard"), 6) >= 0.8).collect()
    }
    assert verified <= cand
    spark.catalog.clearCache()


def test_containment_candidates_bounded_on_fixture(spark):
    """q_text_containment's candidate relation (asymmetric prefix
    filter + container-size + positional bounds, corpus-relative
    stop-shingle cap) must stay a vanishing fraction of the
    DIRECTIONAL all-pairs join (n·(n−1)) at every fixture SF — the
    measured values are 0.02 % at sf0.01 and 0.73 % at sf0.1.  Like
    the fuzzy test above, no raw cross-SF exponent is asserted: the
    fixture's fixed template vocabulary grows shingle dfs ∝ N (real
    corpora grow vocabulary — Heaps' law), and the operator's scale
    mechanism under boilerplate is the same stop-shingle cap exercised
    by test_fuzzy_df_cap_linearizes_boilerplate (shared cap code
    path)."""
    for sf_dir in (SF_SMALL, SF_LARGE):
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()
        cand = minhash.containment_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            candidates_only=True,
        ).count()
        assert cand < 0.01 * n * (n - 1), (sf_dir, n, cand)
        spark.catalog.clearCache()


def test_boilerplate_hot_set_bounded_at_every_sf(spark):
    """q_text_boilerplate's broadcast claim rests on the hot-set bound:
    under the corpus-relative cut (df >= max(5, ceil(n_docs/500))) a
    hot shingle needs n_docs/500 supporting docs, so the hot set can
    never exceed 500 x (total 3-gram postings / n_docs) ~ 500 x
    avg-grams-per-doc entries AT ANY corpus size — the quantity that
    makes the scoring join broadcastable forever.  Measure the actual
    hot set at both fixture SFs against the bound (fixture readings:
    ~150-190 at sf0.001/0.01, ~13k at sf0.1 — both far under the
    ~30k bound)."""
    import math

    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.llm import (
        _BOILER_DENOM,
        _BOILER_FLOOR,
    )

    for sf_dir in (SF_SMALL, SF_LARGE):
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        g = docs.select(
            "doc_id", F.explode(text.word_shingles("text", 3)).alias("g3")
        )
        total_postings = g.select("doc_id", "g3").distinct().count()
        k = max(_BOILER_FLOOR, math.ceil(n_docs / _BOILER_DENOM))
        hot = (
            g.select("doc_id", "g3").distinct()
            .groupBy("g3").agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") >= k)
            .count()
        )
        bound = _BOILER_DENOM * (total_postings / n_docs)
        assert hot <= bound, (sf_dir, hot, bound)
        # and the bound itself is broadcast-scale (docs have bounded
        # gram budgets — the quantity is avg grams/doc, not corpus)
        assert bound < 1_000_000, (sf_dir, bound)
        spark.catalog.clearCache()
