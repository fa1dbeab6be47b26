"""Streaming sessionize: closed sessions from the stateful streaming
operator match the batch sessionizer on the same input (SURVEY.md §2.9)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.sessionize import (
    session_features,
    sessionize,
)
from slowfast_feature_extractor_spark.streaming.sessionize_stream import (
    streaming_sessionize,
)

GAP = 1800.0


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """events parquet restaged as a file-stream source."""
    d = tmp_path_factory.mktemp("stream_src")
    src = "/root/testdata/sf0.001/events.parquet"
    shutil.copy(src, d / "events.parquet")
    return str(d)


def test_streaming_matches_batch_closed_sessions(spark, stream_dir, tmp_path):
    ev_batch = spark.read.parquet(stream_dir)
    schema = ev_batch.schema

    stream = spark.readStream.schema(schema).parquet(stream_dir).selectExpr(
        "CAST(user_id AS STRING) AS user_id", "ts", "value"
    )
    out = streaming_sessionize(
        stream, entity="user_id", ts="ts", measure="value", gap_seconds=GAP
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_revisits"],
            round(r["measure_sum"], 6),
        )
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }

    batch = sessionize(
        ev_batch.selectExpr("CAST(user_id AS STRING) AS user_id", "ts", "value"),
        entity="user_id",
        ts="ts",
        gap_seconds=GAP,
    )
    want_all = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_revisits"],
            round(r["measure_sum"], 6),
        )
        for r in session_features(
            batch, entity="user_id", ts="ts", session_col="session_id", measure="value"
        )
        .withColumn("session_start", F.col("session_start").cast("timestamp"))
        .withColumn("session_end", F.col("session_end").cast("timestamp"))
        .collect()
    }

    # Every streamed session must exist in the batch result with identical
    # aggregates (stream-end leaves at most the final open session per
    # entity unflushed — the reference's end-of-input case).
    assert len(got) > 0
    for key, val in got.items():
        assert key in want_all, f"streamed session not in batch: {key}"
        assert want_all[key] == val
    # and the overwhelming majority of batch sessions were emitted
    assert len(got) >= len(want_all) * 0.5


def test_late_drop_metric_counts_beyond_watermark_event(spark, tmp_path):
    """Inject an event far behind the advanced watermark: the operator
    drops it (the reference's silent loss, made explicit) and the drop is
    OBSERVABLE via the late counter — and crucially the late event must
    NOT merge into a newer session (applyInPandasWithState does not
    pre-filter late rows, so without the in-operator drop it would)."""
    import os
    import time

    import pandas as pd

    from slowfast_feature_extractor_spark.streaming.metrics import make_late_counter

    src = tmp_path / "src"
    src.mkdir()

    def put(name, ts_list, mtime):
        pd.DataFrame(
            {"user_id": ["u"] * len(ts_list),
             "ts": [pd.Timestamp(t) for t in ts_list],
             "value": [1.0] * len(ts_list)}
        ).to_parquet(
            src / name, index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        os.utime(src / name, (mtime, mtime))

    t0 = time.time()
    put("1.parquet", ["2024-01-01 00:00:00", "2024-01-01 00:10:00"], t0)
    put("2.parquet", ["2024-01-02 12:00:00"], t0 + 10)  # advances watermark by >1 day
    # batch 3: late vs the CURRENT watermark but the engine filters with
    # its one-batch-LAGGED watermark -> reaches the operator -> layer-2
    # (in-operator) drop, counted in the accumulator
    put("3.parquet", ["2024-01-01 00:20:00"], t0 + 20)
    # batch 4: by now the engine's lagged watermark has caught up ->
    # layer-1 (engine pre-filter) drop, counted in progress
    put("4.parquet", ["2024-01-01 00:30:00"], t0 + 30)

    stream = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    counter = make_late_counter(spark)
    out = streaming_sessionize(
        stream, entity="user_id", ts="ts", measure="value",
        gap_seconds=GAP, watermark="10 seconds", late_counter=counter,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_drop_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    from slowfast_feature_extractor_spark.streaming.metrics import late_drop_count

    assert counter.value == 1  # layer 2: lag-window row dropped in-operator
    assert late_drop_count(q) >= 1  # layer 1: engine pre-filter counted
    # the dropped events contaminated nothing: the first session closed
    # with exactly its two on-time rows
    sessions = {
        (str(r.session_start), str(r.session_end)): r.n_revisits
        for r in spark.sql("SELECT * FROM late_drop_stream").collect()
    }
    assert sessions[("2024-01-01 00:00:00", "2024-01-01 00:10:00")] == 2


class _FakeState:
    """Minimal GroupState double for unit-testing the state functions."""

    def __init__(self, stored=None, watermark_ms=0):
        self._stored = stored
        self._wm = watermark_ms
        self.hasTimedOut = False
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._stored is not None

    @property
    def get(self):
        return self._stored

    def update(self, v):
        self._stored = tuple(v)

    def remove(self):
        self._stored, self.removed = None, True

    def setTimeoutTimestamp(self, ms):
        # faithful to GroupState: the engine raises when the requested
        # timeout is not in the future of the current watermark
        # (pyspark.sql.streaming.state.GroupState.setTimeoutTimestamp).
        if ms <= self._wm:
            raise ValueError(
                f"Timeout timestamp ({ms}) cannot be earlier than the "
                f"current watermark ({self._wm})"
            )
        self.timeout_set = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def _late_only_batch(entity, ts, measure, ts_us):
    import pandas as pd

    return iter(
        [
            pd.DataFrame(
                {
                    entity: ["u1"],
                    ts: [pd.Timestamp(ts_us, unit="us")],
                    measure: [1.0],
                }
            )
        ]
    )


def test_all_late_batch_rearms_sessionize_timeout():
    """ADVICE r2: a batch whose rows are ALL lag-window late must re-arm
    the pending event-time timeout from stored state, or the open
    session never staleness-flushes. The re-arm must stay ABOVE the
    watermark (the engine rejects below-watermark timeouts)."""
    from slowfast_feature_extractor_spark.streaming.sessionize_stream import (
        make_sessionize_fn,
    )

    gap_us = int(GAP * 1_000_000)
    fn = make_sessionize_fn("user_id", "ts", "value", gap_us)
    start_us, end_us = 1_000_000_000, 2_000_000_000
    timeout_ms = (end_us + gap_us) // 1000
    state = _FakeState(
        stored=(start_us, end_us, 3, 9.0),
        watermark_ms=timeout_ms - 1,  # flush point still ahead of watermark
    )
    out = list(fn(("u1",), _late_only_batch("user_id", "ts", "value", 5_000_000), state))
    assert out == []  # nothing emitted, nothing merged
    assert state.get == (start_us, end_us, 3, 9.0)  # state untouched
    assert state.timeout_set == timeout_ms  # re-armed


def test_all_late_batch_flushes_when_watermark_passed_sessionize():
    """ADVICE r3: when the watermark has already passed the flush point,
    re-arming would raise in the real engine (below-watermark timeout) —
    the session is due, so it must flush immediately instead."""
    from slowfast_feature_extractor_spark.streaming.sessionize_stream import (
        make_sessionize_fn,
    )

    gap_us = int(GAP * 1_000_000)
    fn = make_sessionize_fn("user_id", "ts", "value", gap_us)
    start_us, end_us = 1_000_000_000, 2_000_000_000
    state = _FakeState(
        stored=(start_us, end_us, 3, 9.0),
        watermark_ms=10_000_000,  # 10_000s — far past end + gap (3_800s)
    )
    out = list(fn(("u1",), _late_only_batch("user_id", "ts", "value", 5_000_000), state))
    assert len(out) == 1  # the due session flushed
    assert out[0]["n_revisits"].iloc[0] == 3
    assert state.removed and not state.exists
    assert state.timeout_set is None  # no below-watermark re-arm attempted


def test_all_late_batch_rearms_dual_rate_timeout():
    from slowfast_feature_extractor_spark.streaming.dual_rate_stream import (
        make_dual_rate_fn,
    )

    fn = make_dual_rate_fn("user_id", "ts", "value", 2, 4)
    hist_ts = [1_000_000_000, 2_000_000_000]
    timeout_ms = max(hist_ts) // 1000 + 3_600_000
    state = _FakeState(
        stored=(hist_ts, [1.0, 2.0], 2),
        watermark_ms=timeout_ms - 1,  # eviction point still ahead
    )
    out = list(fn(("u1",), _late_only_batch("user_id", "ts", "value", 5_000_000), state))
    assert out == []
    assert state.timeout_set == timeout_ms


def test_all_late_batch_evicts_when_watermark_passed_dual_rate():
    """ADVICE r3: eviction-due state is removed instead of re-armed
    below the watermark (which would raise in the real engine)."""
    from slowfast_feature_extractor_spark.streaming.dual_rate_stream import (
        make_dual_rate_fn,
    )

    fn = make_dual_rate_fn("user_id", "ts", "value", 2, 4)
    hist_ts = [1_000_000_000, 2_000_000_000]
    state = _FakeState(
        stored=(hist_ts, [1.0, 2.0], 2),
        watermark_ms=10_000_000,  # past max(hist)+1h (5_600s)
    )
    out = list(fn(("u1",), _late_only_batch("user_id", "ts", "value", 5_000_000), state))
    assert out == []
    assert state.removed and not state.exists
    assert state.timeout_set is None
