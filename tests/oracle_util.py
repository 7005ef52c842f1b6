"""Local replica of the driver's Spark-vs-DuckDB oracle compare.

Order-insensitive: both results are converted to pandas, columns sorted
by name, rows sorted by all columns, values normalized (floats rounded,
timestamps to ISO strings) and compared. This lets tests catch
schema/value drift before the driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: round(v, 6)
                if isinstance(v, float) and not math.isnan(v)
                else (str(v) if v is not None else None)
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
