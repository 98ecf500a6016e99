"""Property tests for the training-pipeline operators
(queries/traindata.py, operators/dedup.py::connected_components).

The oracle harness already value-checks each query against DuckDB at
sf0.001; these tests pin the INVARIANTS on adversarial inputs the
fixtures don't contain (multi-hop chains, singleton edges, pathological
chunk lengths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from level2_to_cassandra_spark.operators.dedup import connected_components


def _uf_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Plain union-find ground truth: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # one long chain: diameter >> 1 forces multiple iterations
        [(i, i + 1) for i in range(20)],
        # two components + a singleton pair
        [(1, 2), (2, 3), (10, 11), (5, 6), (6, 5)],
        # star with the center NOT the minimum
        [(100, i) for i in range(5)],
        # duplicate and reversed edges
        [(3, 7), (7, 3), (3, 7), (7, 9)],
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r.node: r.label for r in connected_components(df).collect()
    }
    assert got == _uf_reference(edges)


def test_connected_components_chain_converges_within_max_iter(spark):
    # a 40-node chain needs ~log-ish rounds under doubling propagation;
    # plain min propagation needs up to diameter rounds — make sure the
    # default budget covers a deeper-than-typical component rather than
    # silently returning unconverged labels
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.label for r in connected_components(df, max_iter=50).collect()}
    assert set(got.values()) == {0}


def test_chunking_reconstructs_documents(spark):
    """Non-overlap strides concatenated must reconstruct every doc:
    chunking may duplicate tokens across chunk boundaries but can never
    drop or reorder them."""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    q = all_queries()["q_chunk_docs"]
    chunks = q.fn(spark, sf)
    stride, size = 6, 8
    # keep the first `stride` tokens of every chunk (the non-overlap
    # prefix) except the last chunk, which contributes everything
    w = F.split(F.col("chunk_text"), " ")
    last = F.max("chunk_idx").over(Window.partitionBy("doc_id"))
    rebuilt = (
        chunks.withColumn("__last", last)
        .withColumn(
            "__part",
            F.when(F.col("chunk_idx") == F.col("__last"), w).otherwise(
                F.slice(w, 1, stride)
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "__part"))
                        ),
                        lambda s: s["__part"],
                    )
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    bad = (
        rebuilt.join(docs, "doc_id")
        .where(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_pack_sequences_conservation(spark):
    """Packing must conserve documents and tokens exactly: Σ n_docs =
    corpus size, Σ total_tokens = Σ per-doc token counts."""
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    packed = all_queries()["q_pack_sequences"].fn(spark, sf)
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).first()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = docs.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.split("text", " "))).alias("toks"),
    ).first()
    assert (agg.docs, agg.toks) == (want.docs, want.toks)


def test_pack_efficiency_recomputes_from_pack_output(spark):
    """q_pack_efficiency must equal an independent Python recompute
    over q_pack_sequences' (oracle-checked) bin output — exact integer
    fields and the two single-division ratios — and conserve tokens
    corpus-wide."""
    from level2_to_cassandra_spark.queries.traindata import _CTX_TOKENS
    from level2_to_cassandra_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    bins = all_queries()["q_pack_sequences"].fn(spark, sf).collect()
    eff = {r.bucket: r
           for r in all_queries()["q_pack_efficiency"].fn(spark, sf)
           .collect()}
    by_bucket: dict[str, list[int]] = {}
    for r in bins:
        by_bucket.setdefault(r.bucket, []).append(r.total_tokens)
    assert set(eff) == set(by_bucket)
    def half_up6(x: float) -> float:
        # Spark F.round is HALF_UP; builtin round() is banker's —
        # they disagree on exact decimal ties (review r16, 2nd pass)
        import math
        return math.floor(x * 1e6 + 0.5) / 1e6

    for bucket, toks in by_bucket.items():
        r = eff[bucket]
        total = sum(toks)
        lb = -(-total // _CTX_TOKENS)
        assert r.n_bins == len(toks)
        assert r.total_tokens == total
        assert r.lb_bins == lb
        assert r.pad_tokens == sum(max(_CTX_TOKENS - t, 0) for t in toks)
        assert r.util == half_up6(total / (len(toks) * _CTX_TOKENS))
        assert r.efficiency == half_up6(lb / len(toks))
        # no lb<=n_bins assert: an overflow doc (>ctx tokens) occupies
        # ONE bin but raises the split-assuming bound — efficiency > 1
        # is a legitimate reading on overflow-heavy corpora


def test_contamination_exact_duplicate_across_split_is_flagged(spark):
    """A doc whose text also appears verbatim in the other split must
    surface with contam_frac == 1.0 (every shingle shared)."""
    from level2_to_cassandra_spark.queries.traindata import q_contamination

    # build a tiny corpus where doc 1 (train: md5('1') starts 'c4')
    # and doc 5 (eval: md5('5') starts 'e4') share identical text
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (5, "alpha beta gamma delta epsilon zeta"),
        (2, "totally different words here entirely now"),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
            f"{d}/documents.parquet"
        )
        out = {r.doc_id: r for r in q_contamination(spark, d).collect()}
    # sanity: the pair really straddles the split boundary
    import hashlib

    assert hashlib.md5(b"1").hexdigest()[:2] < "cd"      # train
    assert hashlib.md5(b"5").hexdigest()[:2] >= "cd"     # eval
    assert 5 in out and out[5].contam_frac == 1.0


def test_bigram_lm_scores_are_valid_log_probs(spark):
    """Add-one smoothing keeps every probability in (0, 1], so each
    doc's mean log-prob is ≤ 0; bigram count is token count − 1."""
    from level2_to_cassandra_spark.queries.traindata import q_text_bigram_lm
    from tests.conftest import SF_SMOKE

    rows = q_text_bigram_lm(spark, SF_SMOKE).collect()
    assert rows
    docs = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    for r in rows:
        assert r.avg_lnp <= 0.0
        assert r.n_bigrams == docs[r.doc_id] - 1


def test_bigram_lm_repetitive_doc_scores_higher(spark):
    """A doc made of one repeated bigram must out-score (higher mean
    log-prob) a doc of corpus-unique bigrams — the property the
    perplexity filter relies on."""
    import tempfile

    from level2_to_cassandra_spark.queries.traindata import q_text_bigram_lm

    rows = [(1, "a b " * 50 + "a b"), (2, "q w e r t y u i o p")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
            f"{d}/documents.parquet"
        )
        out = {r.doc_id: r.avg_lnp for r in q_text_bigram_lm(spark, d).collect()}
    assert out[1] > out[2]


def test_vocab_coverage_bounds_and_known_tokens(spark):
    """oov_rate ∈ [0,1], n_in_vocab ≤ n_tokens, and a doc written
    entirely in top-frequency tokens has oov_rate 0."""
    from level2_to_cassandra_spark.queries.traindata import q_vocab_coverage
    from tests.conftest import SF_SMOKE

    rows = q_vocab_coverage(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.n_in_vocab <= r.n_tokens
    # vocab=20 < the fixture's 31 distinct tokens: the cut is live, so
    # BOTH branches must be non-degenerate — some OOV mass exists and
    # the top-20 still cover the majority of token occurrences
    total = sum(r.n_tokens for r in rows)
    oov = sum(r.n_tokens - r.n_in_vocab for r in rows)
    assert 0 < oov / total < 0.5


def test_classifier_score_bounds_and_plan(spark):
    """±1 bucket weights bound the mean score to [-1,1] and the sigmoid
    to (0,1); the plan must be shuffle-free (map-only inference)."""
    from level2_to_cassandra_spark.queries.traindata import q_classifier_score
    from tests.conftest import SF_SMOKE

    from level2_to_cassandra_spark.plans import plan_of

    df = q_classifier_score(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.score <= 1.0
        assert 0.0 < r.p_keep < 1.0
    # r17: inference stays map-only — the single allowed exchange is
    # the round-robin scan spread (catalog.spread_scan; a one-split
    # fixture scan otherwise runs the whole scoring fold in ONE task,
    # measured 0.72 -> 0.29 s), never a keyed shuffle.
    # (post-collect the AQE plan text repeats the Final and Initial
    # plans, so the one exchange appears up to twice)
    plan = plan_of(df, "simple")
    assert plan.count("Exchange roundrobin") <= 2
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_tokenize_ids_roundtrip(spark):
    """ids_json must parse to exactly n_tokens ids; every non-zero id
    decodes back to the original token via the induced vocabulary, and
    id 0 appears only (and non-vacuously — asserted) for tokens
    outside the top-20 vocab."""
    import json

    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.traindata import (
        _TOKENIZE_VOCAB, q_tokenize_ids,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # rebuild the vocabulary exactly as the query does
    counts = {}
    for r in docs.select(F.explode(text.tokens("text")).alias("t")).collect():
        counts[r.t] = counts.get(r.t, 0) + 1
    vocab = sorted(counts, key=lambda t: (-counts[t], t))[:_TOKENIZE_VOCAB]
    id_of = {t: i + 1 for i, t in enumerate(vocab)}
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    out = q_tokenize_ids(spark, SF_SMOKE).collect()
    assert len(out) == len(texts)
    saw_oov = False
    for r in out:
        ids = json.loads(r.ids_json)
        toks = texts[r.doc_id]
        assert r.n_tokens == len(toks) == len(ids)
        for tok, i in zip(toks, ids):
            assert i == id_of.get(tok, 0)
            saw_oov = saw_oov or i == 0
    assert saw_oov, "fixture never exercised the OOV branch"


def test_corpus_pipeline_covers_exactly_admitted_docs(spark):
    """The end-to-end pipeline must emit chunks for EXACTLY the docs
    the curation funnel admits, with per-doc chunk counts matching the
    stride convention and id sequences reconstructing to the doc's
    token count."""
    import json

    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.queries.llm import curate_flags
    from level2_to_cassandra_spark.queries.traindata import (
        _CHUNK_SIZE, _CHUNK_STRIDE, q_corpus_pipeline,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    admitted = {
        r.doc_id: len(r.text.split(" "))
        for r in curate_flags(docs, keep=("text",))
        .where(F.col("admit") == 1).collect()
    }
    assert admitted  # funnel admits something on the fixture
    out = q_corpus_pipeline(spark, SF_SMOKE).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(admitted)
    for doc_id, rows in per_doc.items():
        n = admitted[doc_id]
        # starts at 1, step stride, while start <= n
        assert len(rows) == len(range(1, n + 1, _CHUNK_STRIDE))
        rows = sorted(rows, key=lambda r: r.chunk_idx)
        for r in rows:
            assert len(json.loads(r.ids_json)) == r.n_ids
        # stride-prefixes of all but the last chunk + the whole last
        # chunk reconstruct the doc exactly: no id lost or invented
        assert (len(rows) - 1) * _CHUNK_STRIDE + rows[-1].n_ids == n


def test_funnel_monotone_and_retention_cohort_identity(spark):
    """Funnel stages can only shrink (each stage conditions on the
    previous); retention at offset 0 must equal the cohort size
    (every user is active in their own first week)."""
    from level2_to_cassandra_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    qs = all_queries()
    stages = {r.stage_idx: r.n_users
              for r in qs["q_funnel"].fn(spark, SF_SMOKE).collect()}
    assert stages[1] >= stages[2] >= stages[3] >= 0
    assert stages[1] > 0  # fixture has views

    ret = qs["q_retention"].fn(spark, SF_SMOKE).collect()
    week0 = {r.cohort_week: r.n_users for r in ret if r.week_offset == 0}
    # load_table, not a raw read: events is the table whose ts unit has
    # drifted across fixture eras, and the truth computation must see
    # the same normalized timestamps the query does
    from level2_to_cassandra_spark.catalog import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMOKE, "events")
    truth = {
        r.cohort_week: r.n for r in events.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date")
             .alias("cohort_week"))
        .groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert week0 == truth


# ---------------------------------------------------------------------------
# q_shuffle_epoch / q_length_buckets invariants (r05)
# ---------------------------------------------------------------------------


def test_shuffle_epoch_is_a_permutation(spark):
    """Every document appears exactly once; (shard_id, pos) is a dense
    1..n numbering inside each shard; shard ids stay in [0, 16)."""
    from level2_to_cassandra_spark.queries.traindata import (
        _N_SHARDS,
        q_shuffle_epoch,
    )
    from tests.conftest import SF_SMOKE

    out = q_shuffle_epoch(spark, SF_SMOKE).cache()
    try:
        n_docs = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
        )
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        bad_shard = out.where(
            (F.col("shard_id") < 0) | (F.col("shard_id") >= _N_SHARDS)
        )
        assert bad_shard.count() == 0
        per_shard = out.groupBy("shard_id").agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("nd"),
        )
        assert per_shard.where(
            (F.col("lo") != 1)
            | (F.col("hi") != F.col("n"))
            | (F.col("nd") != F.col("n"))
        ).count() == 0
    finally:
        out.unpersist()


def test_shuffle_epoch_deterministic_and_seed_sensitive(spark):
    """Re-running yields the identical permutation (the whole point of
    hash-keyed shuffling); changing the seed string moves documents."""
    from level2_to_cassandra_spark.queries import traindata
    from tests.conftest import SF_SMOKE

    a = traindata.q_shuffle_epoch(spark, SF_SMOKE)
    b = traindata.q_shuffle_epoch(spark, SF_SMOKE)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # seed sensitivity: patch the module seed, expect a different map
    old = traindata._EPOCH_SEED
    traindata._EPOCH_SEED = "ep8"
    try:
        c = traindata.q_shuffle_epoch(spark, SF_SMOKE)
        assert c.exceptAll(a).count() > 0
    finally:
        traindata._EPOCH_SEED = old


def test_length_buckets_conserve_docs_and_bound_waste(spark):
    from level2_to_cassandra_spark.queries.traindata import (
        _LEN_BUCKETS,
        q_length_buckets,
    )
    from tests.conftest import SF_SMOKE

    rows = q_length_buckets(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    allowed = set(_LEN_BUCKETS) | {2 * _LEN_BUCKETS[-1]}
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.bucket_cap in allowed
        assert 0.0 <= r.pad_waste < 1.0
        assert r.sum_tokens <= r.n_docs * r.bucket_cap


def test_export_shards_layout_and_stream_order(spark, tmp_path):
    """export_shards materializes the q_shuffle_epoch permutation as
    the physical training-shard contract: one directory per shard_id,
    every parquet file internally sorted by pos, per-shard doc sets
    identical to the query twin's assignment."""
    import pathlib

    import pyarrow.parquet as pq

    from level2_to_cassandra_spark.operators.export import export_shards
    from level2_to_cassandra_spark.queries.traindata import (
        _EPOCH_SEED,
        q_shuffle_epoch,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "shards")
    export_shards(docs, path, _EPOCH_SEED)

    dirs = {p.name for p in pathlib.Path(path).iterdir()
            if p.is_dir() and p.name.startswith("shard_id=")}
    assert dirs, "no shard directories written"
    assert dirs <= {f"shard_id={i}" for i in range(16)}

    want = {}
    for r in q_shuffle_epoch(spark, SF_SMOKE).collect():
        want.setdefault(r.shard_id, {})[r.doc_id] = r.pos

    got_docs = 0
    for d in sorted(pathlib.Path(path).glob("shard_id=*")):
        shard = int(d.name.split("=")[1])
        ids_in_shard = set()
        for f in sorted(d.glob("*.parquet")):
            t = pq.read_table(f, columns=["doc_id", "pos"])
            pos = t["pos"].to_pylist()
            assert pos == sorted(pos), f"{f} not pos-sorted"
            for doc_id, p in zip(t["doc_id"].to_pylist(), pos):
                assert want[shard][doc_id] == p
                ids_in_shard.add(doc_id)
        assert ids_in_shard == set(want[shard])
        got_docs += len(ids_in_shard)
    assert got_docs == docs.count()


def test_export_manifest_matches_written_shards(spark, tmp_path):
    """_manifest.json must inventory exactly what was written: per-
    shard counts summing to the corpus, dense 1..n position bounds,
    and stability across a same-seed re-export."""
    import json
    import pathlib

    from level2_to_cassandra_spark.operators.export import (
        export_manifest,
        export_shards,
    )
    from level2_to_cassandra_spark.queries.traindata import _EPOCH_SEED
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "shards")
    export_shards(docs, path, _EPOCH_SEED)
    m = export_manifest(spark, path)

    assert m == json.loads((pathlib.Path(path) / "_manifest.json")
                           .read_text())
    assert m["n_rows"] == docs.count()
    assert m["n_shards"] == len(m["shards"]) > 0
    for s in m["shards"].values():
        assert (s["min_pos"], s["max_pos"]) == (1, s["n_rows"])  # dense

    # same-seed re-export → identical manifest (determinism contract)
    export_shards(docs, path, _EPOCH_SEED)
    assert export_manifest(spark, path) == m


def test_verify_export_detects_torn_shard(spark, tmp_path):
    """verify_export: clean export verifies ok; deleting a shard file
    (a torn export) is detected with the shard named."""
    import pathlib

    from level2_to_cassandra_spark.operators.export import (
        export_manifest,
        export_shards,
        verify_export,
    )
    from level2_to_cassandra_spark.queries.traindata import _EPOCH_SEED
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "shards")
    export_shards(docs, path, _EPOCH_SEED)
    export_manifest(spark, path)
    assert verify_export(spark, path) == {"ok": True, "mismatches": []}

    victim = sorted(pathlib.Path(path).glob("shard_id=*/*.parquet"))[0]
    shard = victim.parent.name.split("=")[1]
    victim.unlink()
    r = verify_export(spark, path)
    assert not r["ok"] and shard in r["mismatches"]


def test_importance_resample_prefers_target_like_docs(spark):
    """q_importance_resample: exactly _DSIR_TOPK dense-ranked rows,
    deterministic across runs, and the scorer behaves like DSIR — the
    in-domain seed docs' mean importance log-weight must exceed the
    out-of-domain mean (a doc is by construction more likely under a
    model trained on its own source's vocabulary)."""
    from level2_to_cassandra_spark.queries.traindata import (
        _DSIR_TARGET_SOURCE,
        _DSIR_TOPK,
        q_importance_resample,
    )

    from tests.conftest import SF_SMOKE as SF

    out = q_importance_resample(spark, SF).collect()
    assert len(out) == _DSIR_TOPK
    assert sorted(r.rk for r in out) == list(range(1, _DSIR_TOPK + 1))
    keys = [r.race_key for r in sorted(out, key=lambda r: r.rk)]
    assert keys == sorted(keys, reverse=True)
    rerun = q_importance_resample(spark, SF).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, rerun))

    # scorer sanity on the full corpus: rebuild per-doc weights via the
    # registered DuckDB oracle and compare in-domain vs out means
    import duckdb

    from level2_to_cassandra_spark.registry import all_queries

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    sql = all_queries()["q_importance_resample"].oracle
    # strip the top-k cut: score every doc
    full = con.execute(
        sql.replace(f"WHERE rk <= {_DSIR_TOPK}", "")
    ).fetchall()
    srcs = {r[0]: r[1] for r in con.execute(
        "SELECT doc_id, source FROM documents").fetchall()}
    tgt = [lw for d, lw, *_ in full if srcs[d] == _DSIR_TARGET_SOURCE]
    other = [lw for d, lw, *_ in full if srcs[d] != _DSIR_TARGET_SOURCE]
    assert sum(tgt) / len(tgt) > sum(other) / len(other)


def test_bigram_lm_staging_matches_inline_train(spark):
    """r16: the staged bigram-LM relation (_bigram_lm_relation) must
    hold EXACTLY the integers the previous inline train computed —
    per-bigram count, per-context total, vocabulary size — since the
    scoring join consumes them as-is."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.traindata import (
        _bigram_lm_relation,
    )
    from tests.conftest import SF_SMOKE

    staged = _bigram_lm_relation(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    bg = docs.select(
        F.explode(text.word_shingles("text", 2)).alias("ngram")
    )
    model = (
        bg.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__w1", F.split("ngram", " ")[0])
    )
    ctx = model.groupBy("__w1").agg(F.sum("__c").alias("__cw"))
    v = (
        docs.select(F.explode(text.tokens("text")).alias("__t"))
        .agg(F.countDistinct("__t"))
        .first()[0]
    )
    inline = (
        model.join(ctx, "__w1")
        .withColumn("__v", F.lit(v))
        .select("ngram", "__w1", "__c", "__cw", "__v")
    )
    assert sorted(staged.columns) == sorted(inline.columns)
    assert staged.exceptAll(inline).count() == 0
    assert inline.exceptAll(staged).count() == 0


def test_unigram_lm_staging_matches_inline_train(spark):
    """r16: the staged DSIR unigram models must hold exactly the
    inline-train integers (per-token corpus/target counts + totals)."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.traindata import (
        _DSIR_TARGET_SOURCE,
        _unigram_lm_relation,
    )
    from tests.conftest import SF_SMOKE

    staged = _unigram_lm_relation(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        "source", F.explode(text.tokens("text")).alias("t")
    )
    model = toks.groupBy("t").agg(
        F.count(F.lit(1)).alias("__ca"),
        F.sum(
            F.when(F.col("source") == _DSIR_TARGET_SOURCE, 1).otherwise(0)
        ).alias("__ct"),
    )
    nt, na, v = model.agg(
        F.sum("__ct"), F.sum("__ca"), F.count(F.lit(1))
    ).first()
    inline = model.select(
        "t", "__ca", "__ct",
        F.lit(nt).alias("__nt"), F.lit(na).alias("__na"),
        F.lit(v).alias("__v"),
    )
    assert staged.exceptAll(inline).count() == 0
    assert inline.exceptAll(staged).count() == 0


def test_vocab_induction_tf_identical_to_occurrence_stream(spark):
    """r16: vocabulary induced off the staged tf relation must equal
    the occurrence-stream induction (Σ tf per term IS the occurrence
    count), ids included — q_tokenize_ids and q_vocab_coverage depend
    on this equality."""
    from pyspark.sql import functions as F

    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.operators import text
    from level2_to_cassandra_spark.queries.traindata import (
        _induce_vocab,
        _induce_vocab_tf,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    tok = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("t")
    )
    a = sorted(map(tuple, _induce_vocab(tok).collect()))
    b = sorted(map(tuple, _induce_vocab_tf(spark, SF_SMOKE).collect()))
    assert a == b
