"""Deduplication operators.

``latest_by_key`` is the batch semantic of the reference sink's keyed
upsert (Cassandra ``PRIMARY KEY (symbol, time, price)`` last-write-wins,
reference main.rs:87,145): deterministic "keep newest row per key" —
unlike ``dropDuplicates`` which keeps an *arbitrary* row.

``exact_dedup`` / ``content_hash`` cover exact content dedup for
training-data pipelines; near-dup (MinHash/SimHash/Jaccard) lives in
this module too.  All operators are single-shuffle: one hash exchange on
the dedup key, no driver collection — the shape that survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(df: DataFrame, keys: Sequence[str],
                  order: Sequence[Column]) -> DataFrame:
    """Keep exactly one row per ``keys`` — the first under ``order``.

    Pass e.g. ``order=[F.desc("ts")]`` for last-write-wins.  Include a
    unique tiebreaker in ``order`` for full determinism.  Plan: one
    shuffle on ``keys`` + in-partition sort + filter (row_number()==1);
    AQE handles skewed keys.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_hash(col: Column | str, bits: int = 256) -> Column:
    """Stable content hash for exact dedup: sha2 (collision-safe at any
    corpus size) — use xxhash64 only for non-adversarial bucketing."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, bits)


def exact_dedup(df: DataFrame, text_col: str = "text",
                tiebreak: Sequence[Column] | None = None) -> DataFrame:
    """Exact-content dedup: group rows by sha2(text), keep the first
    row under ``tiebreak`` (default: ascending natural order of all
    remaining columns is NOT assumed — caller supplies determinism)."""
    order = list(tiebreak) if tiebreak else [F.asc(text_col)]
    return latest_by_key(
        df.withColumn("__h", content_hash(text_col)), ["__h"], order
    ).drop("__h")


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 20) -> DataFrame:
    """Connected components of an undirected pair graph by iterative
    min-label propagation: every node's label converges to the minimum
    node id reachable from it.  Output: ``(node, label)`` for every
    node appearing in ``edges`` — ``label`` is the component's
    canonical (minimum) id.

    This is the step that turns near-duplicate PAIRS into dedup
    DECISIONS: duplicate relations are not transitive-closed by the
    pair join (A~B, B~C but A≁C), so a pipeline that drops "the second
    doc of every pair" over-deletes; grouping pairs into components and
    keeping one canonical doc per component is the standard semantic
    (the reference has no analog — pairs come from
    :mod:`operators.minhash`).

    Scale shape: each iteration is two equi-joins over NARROW 2-column
    relations — (1) one-hop min propagation along edges, (2) a pointer
    jump ``label ← label(label)`` (valid because labels are
    monotonically non-increasing node ids of the same component, so
    ``label(label)`` always exists and never increases) — giving
    O(log diameter) convergence instead of O(diameter).  All shuffles
    are on node ids, never on document content.  The per-iteration
    convergence probe is a ``limit(1).count()`` on CHANGED labels — a
    driver action per *iteration* (bounded by ``max_iter``), never per
    row.  Each iteration's result is ``localCheckpoint``ed: an eager
    materialization that TRUNCATES lineage — without it the logical
    plan nests the whole previous iteration several times over and the
    driver dies planning a 2^iterations-node tree long before any
    executor runs.  At cluster scale use a reliable ``checkpoint``
    (checkpoint dir) instead so the truncated lineage also survives
    executor loss.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
        .persist()
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["s"] == labels["node"])
            .select(F.col("d").alias("node"), F.col("label"))
        )
        stepped = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("label"), F.col("label").alias("__l2")
                ),
                "label",
            )
            .select("node", F.col("__l2").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def foreach_batch_incremental_dedup(admitted_path: str, store_path: str,
                                    text_col: str = "text",
                                    id_col: str = "doc_id"):
    """``foreachBatch`` sink factory: STREAMING incremental corpus
    dedup — the micro-batch twin of q_dedup_incremental (queries/
    llm.py), which verifies the same admit rule against DuckDB in
    batch form.  Per micro-batch: keep the first-of-content row
    (lowest ``id_col`` per sha2(text)), LEFT ANTI join against the
    hash staging table at ``store_path``, append the admitted rows to
    ``admitted_path`` and ONLY THEN their hashes to the store — so a
    replayed batch (foreachBatch is at-least-once) re-admits rather
    than silently dropping rows whose hashes landed before a crash;
    duplicate admitted rows are reconciled by the same content-hash
    dedup downstream, duplicate store hashes are harmless (the anti
    join is set-semantics).

    Admit rule across the stream: a document is admitted iff its
    content has never been seen in any earlier micro-batch, and it has
    the lowest id among same-content rows of its own batch —
    first-arrival-batch wins, exactly the sequential generalization of
    the batch query's new-vs-seen split.

    Scale shape per batch: one shuffle on the 256-bit content hash
    (fixed-width key) + an anti join against the store, which in
    production is bucketed by hash so the corpus side never
    re-shuffles; the store grows by admitted hashes only.  NULL-text
    rows are dropped (same reasoning as the batch twin: sha2(NULL) is
    NULL and can never anti-match)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = (
            batch_df.where(F.col(text_col).isNotNull())
            .withColumn("__h", content_hash(text_col))
        )
        first = latest_by_key(batch, ["__h"], [F.asc(id_col)])
        # no .distinct(): LEFT ANTI is set-semantics on the build side
        # already, and a distinct would shuffle the whole ever-growing
        # store every micro-batch.  Empty-store classification lives in
        # _read_store_or_none (shared with the multimodal admit sink).
        seen = _read_store_or_none(spark, store_path)
        admitted = (
            first.join(seen.select("__h"), "__h", "left_anti")
            if seen is not None else first
        )
        # rows BEFORE hashes — replay-safe ordering (see docstring)
        admitted.persist()
        try:
            admitted.drop("__h").write.mode("append").parquet(admitted_path)
            admitted.select("__h").write.mode("append").parquet(store_path)
        finally:
            admitted.unpersist()

    return fn


def is_empty_store_error(e: "AnalysisException") -> bool:
    """True iff an AnalysisException means "this store holds nothing
    yet" — THE shared classifier for every store/journal reader (the
    admit sinks here, the monitor journal readers in
    streaming/monitor.py), so the condition set cannot drift between
    copies (self-review r13).

    Classify by the STRUCTURED error condition (a message substring
    match could be spoofed by a path that happens to contain the error
    name).  Empty-store conditions mean "nothing seen yet":
    PATH_NOT_FOUND is the true first batch; UNABLE_TO_INFER_SCHEMA is
    the directory a crash left with no readable footer (e.g. died
    between the rows write and the store write) — retrying the read
    can never succeed there.  Everything else (permissions, transient
    FS, corrupt footer on a populated store) is NOT empty and must
    propagate — swallowing it would silently misreport real state."""
    try:
        cond = e.getCondition() or ""
    except Exception:  # noqa: BLE001 — legacy error without condition
        cond = ""
    return cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def _read_store_or_none(spark, path: str):
    """Read a staging-store parquet dir, or None if it does not hold
    data yet — shared by both incremental-admit sinks.  Empty-store
    classification via :func:`is_empty_store_error`; on the
    crash-torn-directory condition, re-admitting is exactly the
    documented at-least-once replay behavior.  Everything else
    re-raises to fail the batch for retry — swallowing it would
    silently re-admit already-seen content."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if not is_empty_store_error(e):
            raise
        return None


def seed_multimodal_store(assets: DataFrame, store_path: str,
                          text_col: str = "text", id_col: str = "doc_id",
                          vec_col: str = "embedding",
                          n_planes: int = 6, n_tables: int = 8,
                          dim: int = 64) -> None:
    """Bootstrap the multimodal admit store from an already-ingested
    corpus: ``{store}/hashes`` (distinct content hashes — the exact
    leg's anti-join side), ``{store}/buckets`` (every seen vector's
    sign-LSH (table, bucket) rows — the near-dup probe index) and
    ``{store}/vecs`` (id → vector, for the exact cosine re-rank).
    ALL seen rows seed the bucket/vector legs — duplicate-content
    history is still history, and the batch spec's embedding leg scans
    the UNFILTERED embeddings table, so a NULL-text asset's vector
    must still reject near-dups (only the HASH leg drops NULL text:
    sha2(NULL) can never anti-match, mirroring the batch spec's
    ``d.text IS NOT NULL`` on the documents side alone).  At
    production scale each of these is a bucketed staging table; here
    they are the parquet twins."""
    from level2_to_cassandra_spark.operators import similarity

    assets.where(F.col(text_col).isNotNull()).select(
        content_hash(text_col).alias("__h")
    ).distinct().write.mode("overwrite").parquet(f"{store_path}/hashes")
    similarity.lsh_buckets_np(
        assets, id_col, vec_col, n_planes, n_tables, dim=dim,
        scheme="rademacher",
    ).select("table", "bucket", F.col(id_col).alias("__sid")).write.mode(
        "overwrite"
    ).parquet(f"{store_path}/buckets")
    assets.select(
        F.col(id_col).alias("__sid"), F.col(vec_col).alias("__sv")
    ).write.mode("overwrite").parquet(f"{store_path}/vecs")


def foreach_batch_multimodal_admit(admitted_path: str, store_path: str,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   vec_col: str = "embedding",
                                   n_planes: int = 6, n_tables: int = 8,
                                   dim: int = 64,
                                   threshold: float = 0.35):
    """``foreachBatch`` sink factory: STREAMING cross-modal incremental
    admit — the micro-batch twin of q_dedup_incremental_multimodal
    (queries/llm.py), which hash-verifies the same admit rule against
    DuckDB in batch form.  Per micro-batch of (id, text, vector)
    assets:

    * EXACT leg — keep the first-of-content row (lowest id per
      sha2(text)), LEFT ANTI against ``{store}/hashes``;
    * EMBEDDING leg — sign-LSH bucketize the exact survivors (ONE
      Arrow matmul pass, the same Rademacher planes as
      q_llm_dedup_embed), equi-join ``{store}/buckets`` on
      (table, bucket), re-rank candidates with the exact rounded
      cosine against ``{store}/vecs``, and reject survivors with any
      seen neighbor at cos ≥ ``threshold``;
    * append admitted rows, THEN bucket and vector rows, THEN hashes —
      the hash store must land LAST: it is what gates re-admission on
      replay (foreachBatch is at-least-once), so every store entry a
      replay will NOT rebuild has to be durable before the batch can
      be classified as seen.  A crash anywhere earlier re-admits the
      batch and rewrites everything (duplicate admitted rows are
      reconciled by content-hash downstream; duplicate bucket/vector
      rows are harmless — the candidate probe and the reject list are
      set-semantics).  Hashes-before-buckets would instead leave a
      PERMANENT near-dup blind spot: the replay would anti-join the
      batch away while its vectors never reach the store.

    Admitted batches GROW the store, so a later micro-batch's
    near-dup of an earlier admitted doc is rejected — first-arrival
    wins across the stream, the sequential generalization of the batch
    query's new-vs-seen split.

    Scale shape per batch: one content-hash shuffle + anti join (store
    side bucketed by hash in production), one map-side bucketize pass,
    and a candidate join bounded by batch × bucket occupancy — the
    batch never joins the corpus, only its bucket collisions."""
    from level2_to_cassandra_spark.operators import similarity

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = (
            batch_df.where(F.col(text_col).isNotNull())
            .withColumn("__h", content_hash(text_col))
        )
        first = latest_by_key(batch, ["__h"], [F.asc(id_col)])
        seen_h = _read_store_or_none(spark, f"{store_path}/hashes")
        if seen_h is not None:
            first = first.join(seen_h.select("__h"), "__h", "left_anti")
        # the survivors feed the bucketize pass, the candidate probe
        # AND the three writes — one cache, trigger-bounded.  The
        # bucket rows are ALSO persisted: the store-append write reuses
        # them (semi-joined down to the admitted ids) instead of paying
        # the Arrow matmul kernel a second time per micro-batch.
        first.persist()
        bkts = similarity.lsh_buckets_np(
            first, id_col, vec_col, n_planes, n_tables, dim=dim,
            scheme="rademacher",
        ).select("table", "bucket", F.col(id_col).alias("__nid")).persist()
        try:
            seen_b = _read_store_or_none(spark, f"{store_path}/buckets")
            seen_v = _read_store_or_none(spark, f"{store_path}/vecs")
            admitted = first
            if seen_b is not None and seen_v is not None:
                # __nid != __sid: a crash-replay AFTER the bucket/vector
                # writes re-presents this batch's own rows as "seen";
                # without the guard every replayed doc self-rejects at
                # cos 1.0 and — since rejection skips the hashes append
                # — the batch would classify as seen on the NEXT replay
                # too, silently losing it from the admitted output (and
                # its hash from the exact gate) forever.
                cand = (
                    bkts.join(seen_b, ["table", "bucket"])
                    .where(F.col("__nid") != F.col("__sid"))
                    .select("__nid", "__sid")
                    .distinct()
                )
                nv = similarity.as_double(F.col(vec_col))
                sv = similarity.as_double(F.col("__sv"))
                pairs = (
                    cand.join(
                        first.select(
                            F.col(id_col).alias("__nid"), F.col(vec_col)
                        ),
                        "__nid",
                    )
                    .join(seen_v, "__sid")
                    .select(
                        "__nid",
                        (
                            similarity.dot(nv, sv)
                            / (similarity.l2_norm(nv)
                               * similarity.l2_norm(sv))
                        ).alias("__cos"),
                    )
                )
                rejected = (
                    pairs.where(F.round(F.col("__cos"), 4) >= threshold)
                    .select(F.col("__nid").alias(id_col))
                    .distinct()
                )
                admitted = first.join(rejected, id_col, "left_anti")
            admitted.persist()
            try:
                admitted.drop("__h").write.mode("append").parquet(
                    admitted_path
                )
                # the probe pass's bucket rows, cut to the admitted ids
                # — identical rows to re-bucketizing `admitted`, for
                # zero extra kernel passes
                bkts.join(
                    admitted.select(F.col(id_col).alias("__nid")),
                    "__nid",
                    "left_semi",
                ).select(
                    "table", "bucket", F.col("__nid").alias("__sid")
                ).write.mode("append").parquet(f"{store_path}/buckets")
                admitted.select(
                    F.col(id_col).alias("__sid"),
                    F.col(vec_col).alias("__sv"),
                ).write.mode("append").parquet(f"{store_path}/vecs")
                # hashes LAST — see the ordering note in the docstring
                admitted.select("__h").write.mode("append").parquet(
                    f"{store_path}/hashes"
                )
            finally:
                admitted.unpersist()
        finally:
            first.unpersist()
            bkts.unpersist()

    return fn
