"""Observability for streaming late-data policy.

The reference silently loses segments that arrive after a task buffer
was force-flushed (reference/just_test_v1.py:858-896). The engine's
policy is drop-WITH-metric, via two mechanisms:

- the custom applyInPandasWithState operators (sessionize, dual-rate)
  drop beyond-watermark rows INSIDE the operator (Spark does not
  pre-filter late input for arbitrary stateful ops — measured: a late
  row reaches the operator with numRowsDroppedByWatermark still 0) and
  count them in the accumulator from :func:`make_late_counter`;
- built-in stateful operators (windowed/streaming aggregations) report
  drops in the progress counter
  ``stateOperators[].numRowsDroppedByWatermark``, exposed by
  :func:`late_drop_count`.
"""

from __future__ import annotations

from typing import Any


def make_late_counter(spark):
    """A Spark accumulator for the in-operator late-drop counts of the
    applyInPandasWithState operators (streaming_sessionize /
    streaming_dual_rate take it as ``late_counter``). Read ``.value`` on
    the driver after (or between) micro-batches."""
    return spark.sparkContext.accumulator(0)


def _ops(progress: Any) -> list:
    if progress is None:
        return []
    if isinstance(progress, dict):
        return progress.get("stateOperators", []) or []
    return progress["stateOperators"] or []


def late_drop_count(query) -> int:
    """Total input rows dropped as too-late (beyond the watermark)
    across the query's recorded progress — the observable version of the
    reference's silent post-flush loss."""
    total = 0
    for p in query.recentProgress:
        for op in _ops(p):
            total += int(op.get("numRowsDroppedByWatermark", 0) or 0)
    return total


def state_metrics(query) -> dict[str, int]:
    """Aggregate state-operator counters over recent progress:
    late drops, total state rows (last batch), rows updated."""
    out = {"late_dropped": 0, "rows_updated": 0, "state_rows": 0}
    for p in query.recentProgress:
        for op in _ops(p):
            out["late_dropped"] += int(op.get("numRowsDroppedByWatermark", 0) or 0)
            out["rows_updated"] += int(op.get("numRowsUpdated", 0) or 0)
            out["state_rows"] = int(op.get("numRowsTotal", 0) or 0)
    return out
