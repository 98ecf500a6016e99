"""UDF surface (SURVEY.md §2 B10): the three sanctioned ways Python
enters the engine, each Arrow-batched — scalar pandas UDF, grouped-map
``applyInPandas``, and a Python UDTF.  Row-at-a-time ``F.udf`` is
deliberately ABSENT: tests/test_plans.py bans BatchEvalPython from
every query plan.

Everything here exists because the kernel genuinely needs Python
(numpy vector math over whole batches, table-generating logic); pure
relational work stays in level2_to_cassandra_spark.queries as JVM
built-ins.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def cosine_to_ones(emb: pd.Series) -> pd.Series:
    """Vectorized cosine similarity against the all-ones vector —
    the scalar-pandas-UDF pattern: one numpy matrix op per Arrow
    batch, ~10-100× a row-at-a-time Python UDF."""
    m = np.stack(emb.to_numpy()).astype("float64")
    q = np.ones(m.shape[1])
    dots = m @ q
    norms = np.linalg.norm(m, axis=1) * np.linalg.norm(q)
    return pd.Series(dots / norms)


def zscore_per_group(df: DataFrame, group_col: str, value_col: str,
                     out_col: str = "zscore") -> DataFrame:
    """Grouped-map applyInPandas: per-group standardization (the
    per-symbol analytics escape hatch).  Output keeps all input
    columns + the score; deterministic (pure function of the group)."""
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=0)
        pdf = pdf.copy()
        pdf[out_col] = (v - v.mean()) / sd if sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(standardize, schema=schema)


def trimmed_mean_udaf(lo: float = 0.25, hi: float = 0.75):
    """Grouped-agg pandas UDF (the GROUPED_AGG form of B10): exact
    per-group trimmed mean — average of the values between the ``lo``
    and ``hi`` quantiles (inclusive; linear-interpolated quantiles, the
    ``quantile_cont`` definition).  Genuinely needs Python: Spark has
    no exact trimmed-mean aggregate (``percentile_approx`` is a sketch,
    and the relational formulation costs an extra join back against
    per-group quantiles), while the kernel is one sorted numpy pass
    over the group's Arrow batch."""

    @pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        x = v.to_numpy(dtype="float64")
        ql, qh = np.quantile(x, [lo, hi])  # linear = quantile_cont
        return float(x[(x >= ql) & (x <= qh)].mean())

    return trimmed_mean


def tokenizer_udtf():
    """Python UDTF: explode text into (pos, token) rows — the
    table-generating form (Spark ≥ 3.5).  Returned lazily so merely
    importing this module never fails on older runtimes."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class Tokenize:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    return Tokenize
