"""Local replica of the driver's DuckDB-oracle comparison.

For each registered query: run the Spark DataFrame and the oracle SQL
on the same parquet fixtures, then compare row count, column-name set,
and order-insensitive values (columns sorted by name, rows sorted by
all columns, tolerant float compare).  Anything that fails here would
fail the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values to comparable form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(_canon_cell)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            # nullable ints → float-safe int64 representation
            df[c] = s.astype("Int64")
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return str(v)


_TYPE_FAMILY = (
    ("datetime", "timestamp"), ("int", "int"), ("float", "float"),
    ("bool", "bool"), ("object", "object"),
)


def _family(dtype) -> str:
    s = str(dtype).lower()
    for key, fam in _TYPE_FAMILY:
        if key in s:
            return fam
    return "object"


def _exact_int_width(spark_df, want_pd) -> None:
    """Driver may compare schemas by exact type: Spark INT where DuckDB
    yields BIGINT is a latent mismatch even when values agree."""
    duck_dtypes = {c: str(want_pd[c].dtype) for c in want_pd.columns}
    for f in spark_df.schema.fields:
        d = duck_dtypes.get(f.name)
        if d is None:
            continue
        if f.dataType.simpleString() == "int" and "int64" in d:
            raise AssertionError(
                f"column {f.name!r}: Spark INT vs oracle BIGINT — cast the "
                "Spark side to long"
            )
        if f.dataType.simpleString() == "bigint" and d == "int32":
            raise AssertionError(
                f"column {f.name!r}: Spark BIGINT vs oracle INTEGER — align"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            float_tol: float = 1e-6) -> None:
    got_raw = spark_df.toPandas()
    want_raw = con.sql(sql).df()
    _exact_int_width(spark_df, want_raw)
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert len(got) == len(want), (
        f"row count mismatch: spark={len(got)} oracle={len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = pd.to_numeric(g, errors="coerce")
            wa = pd.to_numeric(w, errors="coerce")
            bad = ~(
                (ga.isna() & wa.isna())
                | ((ga - wa).abs() <= float_tol + float_tol * wa.abs())
            )
            assert not bad.any(), (
                f"value mismatch in float col {c!r}: "
                f"{list(zip(ga[bad].head(5), wa[bad].head(5)))}"
            )
        else:
            gs = g.astype(str).where(~g.isna(), "<NA>")
            ws = w.astype(str).where(~w.isna(), "<NA>")
            bad = gs != ws
            assert not bad.any(), (
                f"value mismatch in col {c!r}: "
                f"{list(zip(gs[bad].head(5), ws[bad].head(5)))}"
            )


def is_float_close(a: float, b: float, tol: float = 1e-6) -> bool:
    if a is None or b is None:
        return a is b
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)
