"""Byte-pair-encoding subword tokenization — real merge-loop training
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units"), not the regex approximation
q_text_tokens_bpe registers for oracle checking.

Scale shape (the part that matters at 100 TB):

* ``bpe_word_freq`` is the corpus-scale pass — ONE map-side-combined
  aggregation collapsing the corpus to its word-frequency table, the
  classic sufficient statistic for BPE training.  Zipf makes this
  relation tiny relative to the corpus (counts, not occurrences).
* ``bpe_train`` runs the merge loop on the BOUNDED top-``max_words``
  slice of that table (deterministic count-desc/word-asc cut — the
  same discipline as q_vocab_coverage's vocab cut; a fail-fast guard
  errors on an over-limit request instead of melting the driver).
  Training on the head of the frequency table is what production
  tokenizer trainers do; the tail's mass is negligible by Zipf.  A
  fully distributed loop (pair-count agg + argmax collect + fold
  re-merge per iteration, localCheckpoint every few iterations like
  operators/dedup.py::connected_components) handles the unbounded
  case at ~2 jobs per merge; it is deliberately not the default —
  50 merges = 100 scheduler round trips to recompute what a bounded
  table answers in milliseconds.
* ``bpe_apply`` is the corpus-scale APPLY — one Arrow-batched
  ``mapInPandas`` pass tokenizing every document against the frozen,
  rank-ordered merge list (broadcast in the closure: ≤ n_merges
  pairs).  This is the standard per-word merge loop; batching amortizes
  the Python boundary exactly like the PQ/LSH kernels.

Merge semantics (pinned by the pure-python parity test): symbols start
as single characters; each round merges the highest-count adjacent
pair (ties: lexicographically smallest pair) left-to-right
non-overlapping in every word; words are whitespace tokens, no
end-of-word marker, so concatenating a word's subwords reproduces the
word exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fail-fast ceiling on the driver-side word-frequency slice
#: (mirrors similarity.MAX_QUERY_BATCH).
MAX_TRAIN_WORDS = 200_000


def bpe_word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus collapsed to its word-frequency table —
    one explode + one map-side-combined aggregation, the only
    corpus-scale pass in training."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """One merge applied left-to-right non-overlapping."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges_on_counts(word_counts: dict[str, int],
                           n_merges: int) -> list[tuple[str, str]]:
    """The reference merge loop on an in-memory frequency table —
    shared by :func:`bpe_train` and the parity test's pure-python
    formulation, so the distributed path is tested against exactly
    this spec."""
    vocab = {w: (list(w), c) for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        # highest count, ties → lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            w: (_merge_word(syms, *best), cnt)
            for w, (syms, cnt) in vocab.items()
        }
    return merges


def bpe_train(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text",
              max_words: int = MAX_TRAIN_WORDS) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges: distributed word-frequency pass,
    bounded deterministic head cut (count desc, word asc), then the
    reference merge loop on that table.  Returns the rank-ordered
    merge list — the frozen artifact :func:`bpe_apply` broadcasts."""
    if max_words > MAX_TRAIN_WORDS:
        raise ValueError(
            f"max_words={max_words} exceeds MAX_TRAIN_WORDS="
            f"{MAX_TRAIN_WORDS}: the merge loop is driver-side on this "
            "slice — raise the ceiling deliberately or use a "
            "distributed loop for unbounded vocabularies"
        )
    rows = (
        bpe_word_freq(docs, text_col)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return train_merges_on_counts(
        {r["word"]: r["cnt"] for r in rows}, n_merges
    )


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Tokenize every document against a frozen merge list: one
    Arrow-batched pass, merges applied per word in rank order (the
    standard BPE apply loop).  Output (id, tokens array, n_tokens)."""
    import pandas as pd

    ranked = list(merges)

    def tokenize_text(text: str) -> list[str]:
        out: list[str] = []
        for word in text.split():
            syms = list(word)
            for a, b in ranked:
                if len(syms) < 2:
                    break
                syms = _merge_word(syms, a, b)
            out.extend(syms)
        return out

    def gen(it):
        for pdf in it:
            toks = [
                tokenize_text(t) if isinstance(t, str) else []
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "tokens": toks,
                "n_tokens": [len(t) for t in toks],
            })

    return docs.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, tokens array<string>, n_tokens long"
    )


def bpe_train_distributed(docs: DataFrame, n_merges: int = 50,
                          text_col: str = "text",
                          checkpoint_every: int = 8,
                          ) -> list[tuple[str, str]]:
    """The UNBOUNDED-vocabulary merge loop (VERDICT r06 #3): same spec
    as :func:`train_merges_on_counts`, but the word-frequency state
    never leaves the cluster — only the per-iteration argmax row (one
    pair) is collected.  Use when the vocabulary genuinely exceeds
    :data:`MAX_TRAIN_WORDS` (multilingual/byte-noise corpora at
    100 TB); :func:`bpe_train`'s bounded head cut stays the fast
    default (this loop costs ~2 scheduler round trips per merge).

    Per iteration:

    1. adjacent-pair counts — map-side ``transform``+``explode`` over
       the symbol arrays, one map-side-combined agg weighted by word
       count (ALL adjacent pairs incl. overlaps, matching the
       reference loop);
    2. argmax — ``orderBy(count desc, pair asc).limit(1)`` is a
       TakeOrdered (no global sort), one driver row;
    3. re-merge — one Arrow pass folding the winning pair into the
       symbol arrays (left-to-right non-overlapping, the exact
       :func:`_merge_word` kernel), pre-filtered to words that even
       contain both symbols.

    State is persisted per iteration and ``localCheckpoint``-ed every
    ``checkpoint_every`` merges to stop lineage/plan growth — the same
    discipline as operators/dedup.py::connected_components.  Parity
    with the in-memory reference loop is pinned by
    tests/test_bpe.py::test_distributed_train_matches_reference."""
    import pandas as pd

    state = bpe_word_freq(docs, text_col).select(
        "cnt", F.split(F.col("word"), "").alias("syms")
    ).persist()
    state.count()
    merges: list[tuple[str, str]] = []
    try:
        for it in range(n_merges):
            pair_counts = (
                state.select(
                    "cnt",
                    F.explode(
                        F.transform(
                            # first n-1 symbols; slice len 0 → [] →
                            # explode drops 1-symbol words
                            F.slice(F.col("syms"), 1,
                                    F.size("syms") - 1),
                            # 2nd lambda arg IS the element index
                            lambda s, i: F.struct(
                                s.alias("a"),
                                F.col("syms")[i + 1].alias("b"),
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("cnt").alias("total"))
            )
            best = (
                pair_counts.orderBy(F.desc("total"), F.asc("a"),
                                    F.asc("b"))
                .limit(1).collect()
            )
            if not best:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))

            def gen(batches, a=a, b=b):
                for pdf in batches:
                    pdf["syms"] = [
                        _merge_word(list(s), a, b) for s in pdf["syms"]
                    ]
                    yield pdf

            touched = F.array_contains("syms", a) & F.array_contains(
                "syms", b)
            new_state = (
                state.where(touched)
                .select("cnt", "syms")
                .mapInPandas(gen, schema="cnt bigint, syms array<string>")
                .unionByName(state.where(~touched).select("cnt", "syms"))
            )
            if (it + 1) % checkpoint_every == 0:
                new_state = new_state.localCheckpoint(eager=True)
            else:
                new_state = new_state.persist()
                new_state.count()
            state.unpersist()
            state = new_state
    finally:
        state.unpersist()
    return merges
