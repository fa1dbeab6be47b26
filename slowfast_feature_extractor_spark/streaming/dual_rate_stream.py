"""Streaming dual-rate point-in-time features.

The batch engine computes fast/slow trailing-window features per entity
(operators/windows.dual_rate_features); this is the same semantics over
Structured Streaming with engine-managed state: per entity the state
holds the last ``slow_rows`` (ts, measure) pairs, every arriving event
is featurized against the state BEFORE being appended (strictly-earlier
inputs only — the zero-leakage rule holds in flight), and the watermark
bounds state for entities that go quiet.

Ordering: within a micro-batch rows are sorted by ts; across batches
beyond-watermark rows are dropped with observable counts in two layers
(see streaming/metrics.py: engine pre-filter vs the one-batch-lagged
watermark + in-operator drop for the lag window), and anything
late-but-within-watermark is featurized against state as-of arrival —
the same policy the reference's streaming buffer applies
(reference/just_test_v1.py:858-872 processes in arrival order).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from slowfast_feature_extractor_spark.streaming.metrics import drop_late


def make_dual_rate_fn(
    entity: str,
    ts: str,
    measure: str,
    fast_rows: int,
    slow_rows: int,
    late_counter=None,
):
    """Build the applyInPandasWithState function (module-level so the
    timeout/late-batch state machine is unit-testable with a fake
    GroupState)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        k = key[0]
        if state.exists:
            st_ts, st_v, total_hist = state.get
            hist_ts, hist_v = list(st_ts), list(st_v)
            total_hist = int(total_hist)
        else:
            hist_ts, hist_v, total_hist = [], [], 0
        rows = pd.concat(list(pdfs))
        rows = drop_late(rows, ts, state, late_counter)
        if not len(rows):
            # re-arm the eviction timeout (Spark clears it per invocation);
            # without this an entity fed only lag-window late rows keeps
            # its state forever (ADVICE r2).
            if state.exists:
                timeout_ms = max(hist_ts) // 1000 + 3_600_000
                if timeout_ms <= state.getCurrentWatermarkMs():
                    # watermark already past the eviction point: the engine
                    # rejects below-watermark timeouts — evict now
                    # (timeout would only remove() anyway; ADVICE r3).
                    state.remove()
                else:
                    state.setTimeoutTimestamp(timeout_ms)
            return
        rows = rows.sort_values(ts)
        out = {c: [] for c in (ts, "fast_avg", "fast_cnt", "slow_avg", "slow_cnt", "n_hist_rows")}
        for t, v in zip(rows[ts], rows[measure]):
            fast = hist_v[-fast_rows:]
            slow = hist_v[-slow_rows:]
            out[ts].append(pd.Timestamp(t))
            out["fast_avg"].append(sum(fast) / len(fast) if fast else None)
            out["fast_cnt"].append(len(fast))
            out["slow_avg"].append(sum(slow) / len(slow) if slow else None)
            out["slow_cnt"].append(len(slow))
            out["n_hist_rows"].append(total_hist)
            hist_ts.append(int(pd.Timestamp(t).value // 1000))
            hist_v.append(float(v))
            total_hist += 1
        # keep only what future windows can reach (bounded state)
        hist_ts, hist_v = hist_ts[-slow_rows:], hist_v[-slow_rows:]
        state.update((hist_ts, hist_v, total_hist))
        state.setTimeoutTimestamp(max(hist_ts) // 1000 + 3_600_000)
        res = pd.DataFrame(out)
        res.insert(0, entity, k)
        yield res

    return fn


def streaming_dual_rate(
    events: DataFrame,
    entity: str = "url",
    ts: str = "warc_ts",
    measure: str = "value",
    fast_rows: int = 8,
    slow_rows: int = 64,
    watermark: str = "10 seconds",
    late_counter=None,
) -> DataFrame:
    """event stream → feature stream
    (entity, ts, fast_avg, fast_cnt, slow_avg, slow_cnt, n_hist_rows).

    Eager validation (the bounded-state guarantee depends on it):
    ``slow_rows`` must be >= ``fast_rows`` >= 1 — ``slow_rows=0`` would
    make the state-truncation slice ``[-0:]`` a NO-OP (unbounded state
    growth), and ``fast_rows > slow_rows`` would silently cap the fast
    window at the truncated history length. The entity column's type is
    taken from the input schema, not hardcoded."""
    if not (1 <= fast_rows <= slow_rows):
        raise ValueError(
            f"need 1 <= fast_rows <= slow_rows, got fast={fast_rows} "
            f"slow={slow_rows} (slow_rows=0 would unbound the state store)"
        )
    entity_type = events.schema[entity].dataType.simpleString()
    out_schema = (
        f"{entity} {entity_type}, {ts} timestamp, fast_avg double, "
        "fast_cnt long, slow_avg double, slow_cnt long, n_hist_rows long"
    )
    state_schema = "ts_us array<long>, vals array<double>, n_total long"
    fn = make_dual_rate_fn(entity, ts, measure, fast_rows, slow_rows, late_counter)

    stream = events.withColumn(ts, F.col(ts).cast("timestamp")).withWatermark(
        ts, watermark
    )
    return stream.groupBy(entity).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
