"""Timestamp arithmetic helpers that work for both TIMESTAMP and
TIMESTAMP_NTZ columns (parquet files without tz metadata load as NTZ in
Spark 4). The session timezone is pinned to UTC (session.py), so the
NTZ→TZ cast is the identity and ``unix_micros`` gives exact integer
microseconds — the same value DuckDB's ``epoch_us`` computes, which the
cross-engine oracles rely on."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column) -> Column:
    """Exact epoch microseconds (long) for TIMESTAMP or TIMESTAMP_NTZ."""
    return F.unix_micros(col.cast("timestamp"))


def epoch_seconds(col: Column) -> Column:
    """Epoch seconds as double (micros / 1e6, exact for realistic
    ranges)."""
    return epoch_us(col).cast("double") / F.lit(1000000.0)
