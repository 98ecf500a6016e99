"""Real BPE merge-loop training (operators/bpe.py) vs a pure-python
reference formulation, plus the tokenizer invariants: lossless
round-trip, monotone compression, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from level2_to_cassandra_spark.catalog import load_table
from level2_to_cassandra_spark.operators import bpe

SF = "/root/testdata/sf0.001"

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest newest"),
    (2, "newest widest widest widest"),
    (3, "low lower lowest"),
]


def _pure_python_train(texts: list[str], n: int) -> list[tuple[str, str]]:
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    return bpe.train_merges_on_counts(counts, n)


def _pure_python_apply(text: str, merges) -> list[str]:
    out: list[str] = []
    for w in text.split():
        syms = list(w)
        for a, b in merges:
            syms = bpe._merge_word(syms, a, b)
        out.extend(syms)
    return out


def test_bpe_train_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = bpe.bpe_train(docs, n_merges=10)
    want = _pure_python_train([t for _, t in CORPUS], 10)
    assert got == want
    # classic Sennrich example: 'newest'-family pairs dominate early
    assert ("e", "s") in got or ("es", "t") in got or ("e", "st") in got


def test_bpe_apply_matches_reference_and_roundtrips(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe.bpe_train(docs, n_merges=8)
    rows = {r.doc_id: (list(r.tokens), r.n_tokens)
            for r in bpe.bpe_apply(docs, merges).collect()}
    for doc_id, text in CORPUS:
        toks, n = rows[doc_id]
        assert toks == _pure_python_apply(text, merges)
        assert n == len(toks)
        # no end-of-word marker → concatenation is the exact text
        # without spaces
        assert "".join(toks) == text.replace(" ", "")


def test_bpe_compression_monotone_and_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    m_small = bpe.bpe_train(docs, n_merges=5)
    m_big = bpe.bpe_train(docs, n_merges=30)
    assert m_big[:5] == m_small          # prefix property of the loop
    assert bpe.bpe_train(docs, n_merges=30) == m_big  # deterministic
    n_char = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("n")
    ).collect()[0].n
    n5 = bpe.bpe_apply(docs, m_small).agg(F.sum("n_tokens")).collect()[0][0]
    n30 = bpe.bpe_apply(docs, m_big).agg(F.sum("n_tokens")).collect()[0][0]
    assert n30 <= n5 <= n_char           # more merges, fewer tokens
    assert n30 < n_char                  # and they genuinely compress


def test_bpe_train_guard(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="MAX_TRAIN_WORDS"):
        bpe.bpe_train(docs, n_merges=2,
                      max_words=bpe.MAX_TRAIN_WORDS + 1)


def test_distributed_train_matches_reference(spark):
    """bpe_train_distributed must reproduce the reference merge loop
    EXACTLY (same merges, same order, incl. count-tie lexicographic
    break) — on the toy corpus and on real fixture text — and must
    keep working past a cap the driver-side path refuses (the
    unbounded-vocabulary case, VERDICT r06 #3)."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    want = _pure_python_train([t for _, t in CORPUS], 7)
    got = bpe.bpe_train_distributed(docs, n_merges=7,
                                    checkpoint_every=3)
    assert got == want

    # real text, full (uncut) vocabulary as the reference table
    real = load_table(spark, SF, "documents").limit(20)
    counts = {
        r.word: r.cnt for r in bpe.bpe_word_freq(real).collect()
    }
    want_real = bpe.train_merges_on_counts(counts, 4)
    got_real = bpe.bpe_train_distributed(real, n_merges=4)
    assert got_real == want_real

    # early termination: fewer pairs than requested merges
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    assert bpe.bpe_train_distributed(tiny, n_merges=5) == \
        bpe.train_merges_on_counts({"ab": 2}, 5)


def test_distributed_train_works_past_driver_cap(spark, monkeypatch):
    """Where bpe_train fail-fasts (vocabulary slice over the driver
    ceiling), the distributed loop still trains — and still matches
    the reference spec on the SAME corpus."""
    import pytest

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    monkeypatch.setattr(bpe, "MAX_TRAIN_WORDS", 3)
    with pytest.raises(ValueError, match="MAX_TRAIN_WORDS"):
        bpe.bpe_train(docs, n_merges=5, max_words=4)
    want = _pure_python_train([t for _, t in CORPUS], 4)
    assert bpe.bpe_train_distributed(docs, n_merges=4) == want
