"""Structured-Streaming sessionization with stateful timeout flush.

The reference's task buffer is a hand-rolled stateful streaming operator:
per-key buffers accumulate segments, a staleness counter forces a flush
after ``max_wait_batches`` (reference/just_test_v1.py:600-658,858-872),
and end-of-input flushes the remainder (reference/just_test_v1.py:887-896).

This is the same semantics expressed on Spark's engine-managed state:

- key = entity, state = the open session (start, end, n, sum);
- an event whose gap from the session end exceeds ``gap_seconds`` closes
  the session (emitted) and opens a new one;
- the watermark plays the staleness counter's role: when event time
  passes ``session_end + gap``, the state times out and the open session
  is flushed (the reference's force-flush);
- late events are dropped with an observable count in two layers
  (streaming/metrics.py): the engine pre-filters rows behind its
  one-batch-lagged watermark (progress counter), and rows inside that
  lag window are dropped INSIDE the operator (accumulator) — without
  the in-operator layer a lag-window event would merge into a NEWER
  session. The reference silently loses post-flush segments; here the
  loss is explicit, bounded, and counted.

Batch parity: emitted sessions equal ``operators.sessionize`` output for
all sessions that are *closed* by data or timeout (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from slowfast_feature_extractor_spark.streaming.metrics import drop_late


def make_sessionize_fn(entity: str, ts: str, measure: str, gap_us: int, late_counter=None):
    """Build the applyInPandasWithState function (module-level so the
    timeout/late-batch state machine is unit-testable with a fake
    GroupState — see tests/test_streaming.py)."""

    def _emit(key: Any, start_us: int, end_us: int, n: int, s: float) -> pd.DataFrame:
        return pd.DataFrame(
            {
                entity: [key],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_revisits": [n],
                "measure_sum": [s],
            }
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.hasTimedOut:  # staleness flush (the reference's force-flush)
            start_us, end_us, n, s = state.get
            state.remove()
            yield _emit(k, start_us, end_us, n, s)
            return

        rows = pd.concat(list(pdfs))
        # drop-with-metric: lag-window late rows never touch state
        # (layer 2 of streaming/metrics.py; the engine pre-filters the
        # rest and counts them in numRowsDroppedByWatermark)
        rows = drop_late(rows, ts, state, late_counter)
        if not len(rows):
            # Spark clears the pending timeout on every invocation of the
            # state function; an all-late batch must RE-ARM it from stored
            # state or the open session would never staleness-flush
            # (ADVICE r2: bounded-state guarantee broke on this path).
            if state.exists:
                start_us, end_us, n, s = state.get
                timeout_ms = (end_us + gap_us) // 1000
                if timeout_ms <= state.getCurrentWatermarkMs():
                    # the watermark already passed the flush point: the
                    # engine rejects a below-watermark timeout
                    # (PySparkValueError), and the timeout's own semantics
                    # say this session is due — flush it now (ADVICE r3).
                    state.remove()
                    yield _emit(k, start_us, end_us, n, s)
                else:
                    state.setTimeoutTimestamp(timeout_ms)
            return
        rows = rows.sort_values(ts)
        cur = list(state.get) if state.exists else None
        out = []
        for t, v in zip(rows[ts], rows[measure]):
            t_us = int(pd.Timestamp(t).value // 1000)
            v = float(v) if v is not None and not pd.isna(v) else 0.0
            if cur is None:
                cur = [t_us, t_us, 1, v]
            elif t_us - cur[1] > gap_us:
                out.append(tuple(cur))
                cur = [t_us, t_us, 1, v]
            else:
                cur[1] = max(cur[1], t_us)
                cur[2] += 1
                cur[3] += v
        state.update(tuple(cur))
        # flush when event time passes session_end + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        for start_us, end_us, n, s in out:
            yield _emit(k, start_us, end_us, n, s)

    return fn


def streaming_sessionize(
    events: DataFrame,
    entity: str = "url",
    ts: str = "warc_ts",
    measure: str = "value",
    gap_seconds: float = 1800.0,
    watermark: str = "10 seconds",
    late_counter=None,
) -> DataFrame:
    """events stream → closed-session stream
    (entity, session_start, session_end, n_revisits, measure_sum).

    ``late_counter``: optional Spark accumulator
    (streaming/metrics.make_late_counter) incremented per dropped
    beyond-watermark row."""
    gap_us = int(gap_seconds * 1_000_000)
    # entity type from the input schema — hardcoding string broke any
    # integer-keyed stream at Arrow conversion time
    entity_type = events.schema[entity].dataType.simpleString()
    out_schema = (
        f"{entity} {entity_type}, session_start timestamp, "
        "session_end timestamp, n_revisits long, measure_sum double"
    )
    state_schema = "start_us long, end_us long, n long, s double"
    fn = make_sessionize_fn(entity, ts, measure, gap_us, late_counter)

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
