"""Sessionize semantics: gap edges (strictly-greater), single-row
sessions, min_rows flush gate, ordered concat."""

from __future__ import annotations

from datetime import datetime, timedelta

from slowfast_feature_extractor_spark.operators.sessionize import (
    session_features,
    sessionize,
)


def test_gap_edges(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1.0),
        ("u", t0 + timedelta(seconds=1800), 2.0),   # gap == 1800: same session
        ("u", t0 + timedelta(seconds=3601), 3.0),   # gap 1801 > 1800: new
        ("v", t0, 4.0),                              # single-row session
    ]
    df = spark.createDataFrame(rows, schema="url string, warc_ts timestamp, value double")
    out = sessionize(df, gap_seconds=1800.0).toPandas().sort_values(["url", "warc_ts"])
    assert out["session_idx"].tolist() == [1, 1, 2, 1]
    assert out["session_id"].tolist() == ["u#1", "u#1", "u#2", "v#1"]


def test_session_features_and_min_rows(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0 + timedelta(seconds=i * 10), float(i), chr(ord("a") + i)) for i in range(4)
    ] + [("u", t0 + timedelta(days=2), 99.0, "z")]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, value double, tag string"
    )
    s = sessionize(df, gap_seconds=3600.0)
    feats = session_features(s, ordered_concat_cols=("tag",)).toPandas()
    big = feats[feats.session_id == "u#1"].iloc[0]
    assert big.n_revisits == 4
    assert big.measure_sum == 0.0 + 1 + 2 + 3
    assert list(big.tag_ordered) == ["a", "b", "c", "d"]  # ts order
    gated = session_features(s, min_rows=4).toPandas()
    assert gated.session_id.tolist() == ["u#1"]  # the straggler is dropped
