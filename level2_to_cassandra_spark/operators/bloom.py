"""Bloom side-filter for the streaming seen-store probes.

DESIGN NOTE (VERDICT r15 gap #5 / task #4 — bounded seen-store
probes).  The admit-family monitors (line dedup, URL-frontier dedup)
keep an EXACT append-only seen store and anti-join every micro-batch
against it.  That is correct at any scale, but the probe reads the
whole store per batch: at crawl scale (billions of distinct keys) the
per-batch IO is store-sized even when the batch holds nothing new.  A
Bloom SIDE-FILE bounds it:

* keys whose Bloom probe MISSES are DEFINITELY FRESH — they skip the
  exact anti-join entirely;
* only the maybe-seen remainder (true duplicates + the false-positive
  fraction ε) probes the exact store, so the anti-join input shrinks
  from |batch| to ~|batch ∩ store| + ε·|batch|.

Correctness is unchanged BY CONSTRUCTION:

* a false positive merely falls through to the exact anti-join, which
  gives the authoritative answer;
* a false negative cannot occur for stored keys because a batch's
  Bloom partial is written BEFORE its store append (``bloom ⊇ store``
  under every crash point — a key with Bloom bits but no store row is
  re-scored by the exact join as fresh, exactly the store's verdict);
* replay needs no batch filtering on the Bloom side: a crashed
  attempt's own Bloom rows can only route its keys to the exact join,
  whose ``batch_id < bid`` store filter already encodes the replay
  contract.

MIGRATION / SIDE-FILE LOSS (review r16).  A store that predates the
side-file (or whose ``/bloom`` directory was deleted whole) holds keys
with no Bloom bits — skipping their anti-join would re-admit them.
The wrappers handle the DETECTABLE form: an EMPTY Bloom journal next
to the store falls back to the exact full-batch probe (the pre-Bloom
path, correct against any store) AND backfills a partial covering the
whole store's keys, so ``bloom ⊇ store`` holds from the first
post-migration batch onward (the backfill runs once ever and is a
no-op on a true batch 0).  PARTIAL side-file loss — individual batch
files surgically removed from ``/bloom`` while ``/seen`` keeps the
matching keys — is NOT detectable from row counts alone and is out of
contract: the ``/bloom`` directory is an integral part of the store;
restore or delete it as a unit (deleting it whole is always safe —
the next batch detects emptiness, exact-probes, and re-backfills).

REPRESENTATION.  The filter is an m-bit array held as ``m/64`` LONG
words.  The side-file is APPEND-ONLY (the journal discipline every
monitor store follows): each batch appends its fresh keys' OR-partial
``(word_idx, word, batch_id)`` rows, and readers OR-fold per word —
bitwise OR is idempotent, commutative and associative, so replayed or
duplicated partials merge to the identical array.  The fold collapses
to ONE row carrying the dense array, which rides a broadcast onto the
batch; the probe itself is pure map-side JVM expression work (k
xxhash64 + element_at + mask per key — no shuffle, no Python).

SIZING.  fpp ≈ (1 − e^(−k·n/m))^k.  The defaults (m = 2²⁰ bits =
128 KiB, k = 4) hold ε < 1 % up to n ≈ 10⁷ distinct keys — far past
any single store generation this repo's fixtures produce; at crawl
scale the store (and its Bloom) would rotate in key-hash-partitioned
generations, each with its own side-file, probed by partition — the
same layout, sharded.  A saturated filter degrades GRACEFULLY: more
keys fall through to the exact join (the pre-Bloom behavior), never
a wrong answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default filter geometry — see SIZING above
N_BITS = 1 << 20
N_HASHES = 4

#: side-file schema: OR-partial words per batch (append-only journal)
BLOOM_SCHEMA = "word_idx long, word long, batch_id long"


def journal_subdir(n_bits: int | None = None,
                   n_hashes: int | None = None) -> str:
    """GEOMETRY-VERSIONED journal subdirectory name (review r16, 2nd
    pass): partial words are meaningless under a different (n_bits,
    n_hashes), and the flat schema cannot detect a mismatch — so the
    geometry IS the path.  A resized filter lands in a FRESH empty
    subdir, the empty-journal fallback exact-probes that batch and
    the whole-store backfill rebuilds the filter under the new
    geometry automatically; the old subdir is simply never read again
    (orphaned bytes, reclaimable at leisure — never wrong bits).
    Geometry resolves at CALL time from the module constants (not
    def-time defaults) so an operator override before stream start —
    and the resize test — take effect everywhere consistently."""
    return (f"g{N_BITS if n_bits is None else n_bits}"
            f"x{N_HASHES if n_hashes is None else n_hashes}")


class BloomCache:
    """PER-STREAM in-memory fold of one Bloom journal (review r16,
    2nd pass: re-folding the append-only journal from parquet every
    micro-batch pays O(rows-so-far) per batch — the cache folds ONCE
    per stream lifetime, then ORs each batch's own partial in as it
    is written, which is exact because this wrapper instance is the
    journal's ONLY writer — the same single-writer contract the seen
    store itself carries).  A restart simply re-folds; a crashed
    attempt's extra journal rows OR in idempotently."""

    def __init__(self, n_bits: int | None = None,
                 n_hashes: int | None = None) -> None:
        # call-time resolution — see journal_subdir
        self.n_bits = N_BITS if n_bits is None else n_bits
        self.n_hashes = N_HASHES if n_hashes is None else n_hashes
        self.words: list[int] | None = None

    def ensure(self, journal: DataFrame) -> None:
        """Fold the on-disk journal once (first batch / restart
        recovery); no-op afterwards."""
        if self.words is None:
            row = bloom_relation(
                journal.sparkSession, journal, self.n_bits
            ).first()
            self.words = list(row.bloom)

    @property
    def empty(self) -> bool:
        """True while NO bit is set — batch 0, a pre-side-file store,
        a wholly lost /bloom dir, or a geometry change (fresh subdir):
        all fall back to the exact full-batch probe + backfill."""
        return not any(self.words)

    def one_row(self, spark: SparkSession) -> DataFrame:
        """The 1-row dense-array relation the probe broadcasts."""
        return spark.createDataFrame(
            [(self.words,)], "bloom array<long>"
        )

    def apply(self, partial_rows) -> None:
        """OR a written partial's rows into the cached array."""
        for r in partial_rows:
            self.words[r.word_idx] |= r.word


def probe_unseen(cache: BloomCache, batch: DataFrame, key_col: str,
                 seen: DataFrame) -> DataFrame:
    """The Bloom-bounded unseen-key derivation shared by the admit
    wrappers: keys whose probe misses are definitely fresh and skip
    the exact anti-join against ``seen`` (a relation keyed by
    ``key_col``); only the maybe-seen remainder pays it.  An EMPTY
    filter (see :meth:`BloomCache.empty`) degrades to the exact
    full-batch probe — the pre-Bloom path, correct against any
    store."""
    if cache.empty:
        return batch.join(seen, key_col, "left_anti")
    probed = bloom_maybe_seen(
        batch, key_col, cache.one_row(batch.sparkSession),
        cache.n_bits, cache.n_hashes,
    )
    return (
        probed.where(F.col("__maybe_seen"))
        .drop("__maybe_seen")
        .join(seen, key_col, "left_anti")
        .unionByName(
            probed.where(~F.col("__maybe_seen")).drop("__maybe_seen")
        )
    )


def append_partial(cache: BloomCache, journal_path: str,
                   fresh_keys: DataFrame, key_col: str,
                   store_keys: DataFrame, batch_id: int) -> None:
    """The per-batch Bloom maintenance step shared by the admit
    wrappers (review r16, 2nd pass: formerly two copy-pasted stanzas
    with a redundant ``.distinct()`` — the OR fold is duplicate-
    idempotent, so no dedup shuffle is needed): compute the
    OR-partial over the batch's fresh keys — plus the WHOLE store's
    keys while the filter is empty (the one-time migration backfill;
    a no-op union on a true batch 0) — write it to the journal, and
    OR it into the stream's cache.  MUST run BEFORE the caller's
    store append (``bloom ⊇ store`` under every crash point)."""
    to_bloom = fresh_keys
    if cache.empty:
        to_bloom = to_bloom.unionByName(
            store_keys.select(F.col(store_keys.columns[0]).alias(key_col))
        )
    rows = bloom_partial(
        to_bloom, key_col, cache.n_bits, cache.n_hashes
    ).collect()
    if rows:
        fresh_keys.sparkSession.createDataFrame(
            [(r.word_idx, r.word, int(batch_id)) for r in rows],
            BLOOM_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(journal_path)
        cache.apply(rows)


def _pos(key_col: str, i: int, n_bits: int):
    """Bit position of hash i for ``key_col`` — xxhash64 seeded by the
    hash index, masked to the table size (a power of two, so the mask
    keeps the low bits and the result is non-negative)."""
    return F.xxhash64(F.lit(i), F.col(key_col)).bitwiseAND(F.lit(n_bits - 1))


def bloom_partial(keys: DataFrame, key_col: str,
                  n_bits: int = N_BITS,
                  n_hashes: int = N_HASHES) -> DataFrame:
    """The OR-partial ``(word_idx, word)`` rows covering every key in
    ``keys`` — at most ``n_bits/64`` rows regardless of key count (one
    per touched word).  Append these to the side-file journal in the
    same action discipline as the store append (bloom BEFORE store)."""
    positions = keys.select(
        F.explode(
            F.array(*[_pos(key_col, i, n_bits) for i in range(n_hashes)])
        ).alias("__pos")
    )
    return (
        positions.select(
            F.expr("CAST(shiftright(__pos, 6) AS BIGINT)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST((__pos % 64) AS INT))"
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__mask)").alias("word"))
    )


def bloom_relation(spark: SparkSession, journal: DataFrame,
                   n_bits: int = N_BITS) -> DataFrame:
    """Fold the OR-partial journal into the ONE-ROW dense-array
    relation ``(bloom: array<long>)`` the probe broadcasts.  An empty
    journal folds to the all-zero array (every probe misses →
    everything definitely fresh — the correct batch-0 state).  OR is
    idempotent, so replay-duplicated partial rows change nothing."""
    n_words = n_bits // 64
    folded = journal.groupBy("word_idx").agg(
        F.expr("bit_or(word)").alias("word")
    )
    return folded.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("word_idx").cast("int").alias("k"),
                    F.col("word").alias("v"),
                )
            )
        ).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0))
            .cast("long"),
        ).alias("bloom")
    )


def bloom_maybe_seen(batch: DataFrame, key_col: str,
                     bloom_one_row: DataFrame,
                     n_bits: int = N_BITS,
                     n_hashes: int = N_HASHES):
    """``batch`` + a ``__maybe_seen`` boolean: True iff every one of
    the key's ``n_hashes`` bits is set in the broadcast filter.  False
    means DEFINITELY fresh (Bloom's no-false-negative guarantee, which
    holds here because partials are written before store appends).
    Pure map-side: k hashes + k array lookups per row, no shuffle.

    Reserved names: ``bloom``, ``__maybe_seen`` and the ``__p{i}``
    probe columns may not collide with batch payload columns — raises
    a named ValueError at build time, CASEFOLDED (the gopher_stats /
    _calib_lab passthrough discipline, review r16: a payload 'bloom'
    column would otherwise die with AMBIGUOUS_REFERENCE on the first
    micro-batch)."""
    reserved = {"bloom", "__maybe_seen"} | {
        f"__p{i}" for i in range(n_hashes)
    }
    clash = {c for c in batch.columns if c.lower() in reserved}
    if clash:
        raise ValueError(
            "bloom_maybe_seen reserved columns collide with batch "
            f"payload columns: {sorted(clash)} — rename them upstream"
        )
    out = batch.crossJoin(F.broadcast(bloom_one_row))
    for i in range(n_hashes):
        out = out.withColumn(f"__p{i}", _pos(key_col, i, n_bits))
    hit = None
    for i in range(n_hashes):
        h = F.expr(
            f"(element_at(bloom, CAST(shiftright(__p{i}, 6) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST((__p{i} % 64) AS INT)))"
            " != 0"
        )
        hit = h if hit is None else (hit & h)
    keep = [c for c in batch.columns]
    return out.select(*keep, hit.alias("__maybe_seen"))
