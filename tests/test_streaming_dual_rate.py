"""Streaming dual-rate features match the batch window operator on the
same input (single availableNow batch ⇒ exact parity)."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from slowfast_feature_extractor_spark.operators.windows import dual_rate_features
from slowfast_feature_extractor_spark.streaming.dual_rate_stream import (
    streaming_dual_rate,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dr_stream")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_matches_batch(spark, stream_dir, tmp_path):
    raw_schema = spark.read.parquet(stream_dir).schema
    batch = spark.read.parquet(stream_dir).selectExpr(
        "CAST(user_id AS STRING) AS user_id", "ts", "value"
    )
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir).selectExpr(
        "CAST(user_id AS STRING) AS user_id", "ts", "value"
    )
    out = streaming_dual_rate(
        stream, entity="user_id", ts="ts", measure="value", fast_rows=3, slow_rows=6
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["ts"]): (
            None if r["fast_avg"] is None else round(r["fast_avg"], 6),
            r["fast_cnt"],
            None if r["slow_avg"] is None else round(r["slow_avg"], 6),
            r["slow_cnt"],
            r["n_hist_rows"],
        )
        for r in spark.sql("SELECT * FROM dr_stream").collect()
    }

    want_df = dual_rate_features(
        batch, entity="user_id", ts="ts", measure="value",
        fast_rows=3, slow_rows=6, strict=True,
    ).collect()
    assert len(got) == len(want_df) > 0
    for r in want_df:
        key = (r["user_id"], r["ts"])
        assert key in got
        fa, fc, sa, sc, nh = got[key]
        assert fc == r["fast_cnt"] and sc == r["slow_cnt"] and nh == r["n_hist_rows"]
        if r["fast_avg"] is None:
            assert fa is None
        else:
            assert fa == pytest.approx(round(r["fast_avg"], 6), abs=1e-9)
        if r["slow_avg"] is None:
            assert sa is None
        else:
            assert sa == pytest.approx(round(r["slow_avg"], 6), abs=1e-9)


def test_streaming_dual_rate_validates_window_params(spark):
    import pytest

    from slowfast_feature_extractor_spark.streaming.dual_rate_stream import (
        streaming_dual_rate,
    )

    events = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1.0)], "url string, warc_ts string, value double"
    )
    # slow_rows=0 would make the state-truncation slice a no-op
    with pytest.raises(ValueError, match="slow_rows"):
        streaming_dual_rate(events, slow_rows=0, fast_rows=0)
    with pytest.raises(ValueError, match="fast_rows"):
        streaming_dual_rate(events, fast_rows=128, slow_rows=64)
