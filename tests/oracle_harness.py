"""Local replica of the driver's correctness gate: run a registered Spark
plan and its DuckDB oracle on the same parquet tables, compare row count,
column names, and order-insensitive values (floats with tolerance)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, na_position="first").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            bad = [
                (x, y)
                for x, y in zip(a[c], b[c])
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9))
                )
            ]
            assert not bad, f"{name}: float col {c} mismatches (first 3): {bad[:3]}"
        else:
            av, bv = a[c].tolist(), b[c].tolist()
            mism = [(x, y) for x, y in zip(av, bv) if (x != y and not (pd.isna(x) and pd.isna(y)))]
            assert not mism, f"{name}: col {c} mismatches (first 3): {mism[:3]}"


def run_pair(spark, sf_dir: str, name: str, fn, oracle: str) -> None:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    compare(spark_pdf, duck_pdf, name)
