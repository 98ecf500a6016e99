#!/usr/bin/env python
"""A/B experiment: union-form PPJoin verification vs the current
expansion-join form (guide §2.3/§2.4) — NOT part of the engine.

Current verify (operators/minhash.py::_verify_jaccard and the
containment_pairs tail): cand ⋈ postings on the inner id (expansion:
|cand| × |inner postings| rows), second SMJ on (outer id, shingle)
against postings, then a pair-keyed count.  Two big exchanges + two
sorts.

Union form measured here: attach pair ids to BOTH sides' postings with
two joins keyed by doc id (the postings exchange is identical in both
branches → ReusedExchange), union, then ONE hash aggregate per
(pair, shingle) followed by a pair-keyed sum:
    inter(a,b) = Σ_shingle (cnt − 1)   with cnt ∈ {1, 2}
No sorts, one big exchange keyed (pair, shingle).

Run: python tools/exp_verify_union.py [-r REPS]
Times q_text_containment's exact parameters (threshold 0.79,
max_shingle_frac 0.01) and the symmetric jaccard form at
q_llm_dedup_fuzzy's threshold (0.79), both off the staged
postings/ranked index, interleaved reps, and verifies identical
output (exceptAll both ways) before timing.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def union_verify_containment(postings: DataFrame,
                             cand: DataFrame) -> DataFrame:
    hits_in = postings.join(
        cand, postings["id"] == cand["inner_id"]
    ).select("inner_id", "outer_id", "n_inner", "shingle")
    hits_out = postings.join(
        cand, postings["id"] == cand["outer_id"]
    ).select("inner_id", "outer_id", "n_inner", "shingle")
    per_sh = (
        hits_in.unionByName(hits_out)
        .groupBy("inner_id", "outer_id", "n_inner", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    co = per_sh.groupBy("inner_id", "outer_id", "n_inner").agg(
        F.sum(F.col("c") - F.lit(1)).alias("inter")
    )
    return co.select(
        "inner_id",
        "outer_id",
        (F.col("inter").cast("double") / F.col("n_inner"))
        .alias("containment"),
    )


def union_verify_jaccard(postings: DataFrame, cand: DataFrame) -> DataFrame:
    hits_a = postings.join(
        cand, postings["id"] == cand["id_a"]
    ).select("id_a", "id_b", "na", "nb", "shingle")
    hits_b = postings.join(
        cand, postings["id"] == cand["id_b"]
    ).select("id_a", "id_b", "na", "nb", "shingle")
    per_sh = (
        hits_a.unionByName(hits_b)
        .groupBy("id_a", "id_b", "na", "nb", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    co = per_sh.groupBy("id_a", "id_b", "na", "nb").agg(
        F.sum(F.col("c") - F.lit(1)).alias("inter")
    )
    return co.select(
        "id_a",
        "id_b",
        (
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
        ).alias("jaccard"),
    )


def main() -> None:
    reps = 4
    args = sys.argv[1:]
    if args and args[0] == "-r":
        reps = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from level2_to_cassandra_spark.operators import minhash
    from level2_to_cassandra_spark.queries import llm
    from level2_to_cassandra_spark.catalog import load_table
    from level2_to_cassandra_spark.session import get_spark

    spark = get_spark(
        app_name="l2c-exp-verify-union",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    postings = llm._shingle_relation(spark, sf_dir)
    ranked = llm._shingle_index_relation(spark, sf_dir)

    def cont_current() -> DataFrame:
        return minhash.containment_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            postings=postings, ranked=ranked,
        )

    def cont_union() -> DataFrame:
        cand = minhash.containment_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            postings=postings, ranked=ranked, candidates_only=True,
        )
        return union_verify_containment(postings, cand).where(
            F.col("containment") >= 0.79
        )

    def jac_current() -> DataFrame:
        return minhash.exact_jaccard_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            postings=postings, ranked=ranked,
        )

    def jac_union() -> DataFrame:
        cand = minhash.exact_jaccard_pairs(
            docs, threshold=0.79, k=3, max_shingle_frac=0.01,
            postings=postings, ranked=ranked, candidates_only=True,
        )
        return union_verify_jaccard(postings, cand).where(
            F.col("jaccard") >= 0.79
        )

    variants = {
        "cont_current": cont_current,
        "cont_union": cont_union,
        "jac_current": jac_current,
        "jac_union": jac_union,
    }

    # correctness first: identical rows both ways
    for name_a, name_b in [("cont_current", "cont_union"),
                           ("jac_current", "jac_union")]:
        a, b = variants[name_a](), variants[name_b]()
        d1 = a.exceptAll(b).count()
        d2 = b.exceptAll(a).count()
        print(f"parity {name_a} vs {name_b}: exceptAll {d1}/{d2}")
        assert d1 == 0 and d2 == 0, "output mismatch — do not adopt"
        spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"exp:{name}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in samples.items():
        fmt = " ".join(f"{t:.3f}" for t in ts)
        print(f"{name:16s} min={min(ts):.3f} med="
              f"{statistics.median(ts):.3f}  [{fmt}]")
    spark.stop()


if __name__ == "__main__":
    main()
