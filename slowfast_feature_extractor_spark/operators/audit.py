"""Leakage audit: prove every feature row used only strictly-earlier
inputs (the north rule's zero-temporal-leakage requirement).

The instrumented window operators already emit ``max_input_ts`` (the
latest contributing timestamp); the audit is then a pure filter —
violations are rows where ``max_input_ts >= ts``. Running it as a
DataFrame keeps the audit distributed and cheap (no collect), and the
count lands in the pipeline's metrics alongside the checkpoint ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def leakage_violations(
    features: DataFrame,
    ts: str = "warc_ts",
    bound_col: str = "max_input_ts",
) -> DataFrame:
    """Rows whose contributing-input bound is NOT strictly earlier than
    the row timestamp. Empty result == zero leakage."""
    return features.filter(
        F.col(bound_col).isNotNull() & (F.col(bound_col) >= F.col(ts))
    )


def assert_no_leakage(features: DataFrame, ts: str = "warc_ts",
                      bound_col: str = "max_input_ts") -> int:
    """Raise if any row leaks; return the number of audited rows.
    ONE pass over the relation: total and violation counts come from a
    single aggregate (two separate .count() calls would scan and decode
    the full feature output twice per backfill run)."""
    total, bad = features.agg(
        F.count(F.lit(1)),
        F.count(
            F.when(F.col(bound_col).isNotNull() & (F.col(bound_col) >= F.col(ts)), 1)
        ),
    ).first()
    if bad:
        raise AssertionError(f"temporal leakage: {bad} rows with {bound_col} >= {ts}")
    return int(total)
