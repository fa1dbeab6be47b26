"""Spark-vs-DuckDB comparison harness mimicking the driver's correctness
gate: run the Spark query and the oracle SQL on the same parquet tables,
sort columns by name and rows by all columns, and compare values
(exactly for ints/strings/timestamps, to 9dp for floats — the queries
themselves round anything float-bearing to 6dp)."""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from slowfast_feature_extractor_spark.sources.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) < 1e-9
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, datetime) and isinstance(b, datetime):
        return a == b
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(
    spark: SparkSession, sf_dir: str, query_fn, oracle: str, max_report: int = 5
) -> tuple[bool, str]:
    got = _canon(query_fn(spark, sf_dir).toPandas())
    con = duckdb_con(sf_dir)
    want = _canon(con.sql(oracle).df())
    con.close()

    if sorted(got.columns) != sorted(want.columns):
        return False, f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"row count mismatch: spark={len(got)} oracle={len(want)}"
    diffs = []
    for c in got.columns:
        ga, wa = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(ga, wa)):
            if not _values_equal(a, b):
                diffs.append(f"col={c} row={i}: spark={a!r} oracle={b!r}")
                if len(diffs) >= max_report:
                    return False, "; ".join(diffs)
    if diffs:
        return False, "; ".join(diffs)
    return True, f"ok ({len(got)} rows)"
