"""Window operator semantics vs a literal pandas oracle: strict trailing
frames, boundary nulls, backfill, lag/lead."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from slowfast_feature_extractor_spark.operators.windows import (
    backfill,
    dual_rate_features,
    lag_lead,
    windowed_vector,
)


@pytest.fixture(scope="module")
def series_df(spark):
    rows = []
    t0 = datetime(2024, 1, 1)
    for e in ("x", "y"):
        for i in range(12):
            rows.append((e, t0 + timedelta(hours=i), float((i + 1) * (2 if e == "y" else 1))))
    return spark.createDataFrame(rows, schema="url string, warc_ts timestamp, value double")


def test_dual_rate_strict_matches_pandas(spark, series_df):
    got = (
        dual_rate_features(series_df, fast_rows=3, slow_rows=6, strict=True)
        .toPandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    pdf = series_df.toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    for _, g in pdf.groupby("url"):
        vals = g["value"].tolist()
        for pos, (idx, row) in enumerate(g.iterrows()):
            fast = vals[max(0, pos - 3):pos]
            slow = vals[max(0, pos - 6):pos]
            r = got[(got.url == row.url) & (got.warc_ts == row.warc_ts)].iloc[0]
            assert r.fast_cnt == len(fast) and r.slow_cnt == len(slow)
            if fast:
                assert r.fast_avg == pytest.approx(sum(fast) / len(fast))
                assert r.fast_min == min(fast) and r.fast_max == max(fast)
            else:
                assert pd.isna(r.fast_avg)
            assert r.n_hist_rows == pos
            if pos == 0:
                assert pd.isna(r.max_input_ts)
            else:
                # leakage audit: contributing rows strictly earlier
                assert r.max_input_ts < row.warc_ts


def test_windowed_vector_order_and_strictness(spark, series_df):
    got = windowed_vector(series_df, rows=4, strict=True, out_col="v").toPandas()
    g = got[got.url == "x"].sort_values("warc_ts").reset_index(drop=True)
    assert list(g.loc[0, "v"]) == []  # no history
    assert list(g.loc[1, "v"]) == [1.0]
    assert list(g.loc[5, "v"]) == [2.0, 3.0, 4.0, 5.0]  # oldest→newest, excludes self


def test_backfill_and_lag_lead(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0), None),
        ("a", datetime(2024, 1, 1, 1), 5.0),
        ("a", datetime(2024, 1, 1, 2), None),
        ("a", datetime(2024, 1, 1, 3), None),
        ("a", datetime(2024, 1, 1, 4), 7.0),
    ]
    df = spark.createDataFrame(rows, schema="url string, warc_ts timestamp, value double")
    f = backfill(df).toPandas().sort_values("warc_ts")["value_filled"].tolist()
    assert f[0] is None or pd.isna(f[0])
    assert f[1:] == [5.0, 5.0, 5.0, 7.0]

    ll = lag_lead(df).toPandas().sort_values("warc_ts")
    assert pd.isna(ll.iloc[0]["lag_value_1"])
    assert ll.iloc[2]["lag_value_1"] == 5.0
    assert ll.iloc[3]["lead_value_1"] == 7.0
    assert pd.isna(ll.iloc[4]["lead_value_1"])


def test_duplicate_ts_tiebreak_deterministic(spark):
    """Duplicate (entity, ts) rows: with a tiebreak the ROWS-frame
    results are well-defined and stable across repartitionings."""
    import datetime as dt

    from slowfast_feature_extractor_spark.operators.windows import dual_rate_features

    t = dt.datetime(2024, 1, 1)
    rows = [("u", t, i, float(i)) for i in (3, 1, 2)] + [
        ("u", dt.datetime(2024, 1, 2), 4, 4.0)
    ]
    df = spark.createDataFrame(rows, "e string, ts timestamp, eid long, v double")
    outs = []
    for parts in (1, 7):
        out = dual_rate_features(
            df.repartition(parts), entity="e", ts="ts", measure="v",
            fast_rows=2, slow_rows=3, strict=True, tiebreak="eid",
        )
        outs.append(sorted(
            (r.eid, r.fast_avg, r.fast_cnt, r.slow_cnt) for r in out.collect()
        ))
    assert outs[0] == outs[1]
    by_eid = {r[0]: r for r in outs[0]}
    # eid order within the tied ts is 1,2,3: eid=2 sees history [1]
    assert by_eid[1][2] == 0 and by_eid[2][1] == 1.0 and by_eid[3][1] == 1.5
    assert by_eid[4][1] == 2.5  # last two of the tied trio, in eid order


def test_span_sample_semantics(spark):
    """Centered contiguous-span sampling (reference/hiera_test.py:109-125):
    start=(len-span)//2, fixed stride, clamp-to-last on short inputs,
    empty stays empty."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.windows import span_sample

    rows = [
        (1, list(range(100))),   # long: span 16 centered at 42
        (2, [7]),                # single: all picks clamp to 7
        (3, []),                 # empty
        (4, list(range(10))),    # shorter than span: start 0, clamp tail
    ]
    df = spark.createDataFrame(rows, "id long, arr array<int>")
    got = {
        r.id: r.picked
        for r in df.select(
            "id", span_sample(F.col("arr"), num_frames=8, stride=2).alias("picked")
        ).collect()
    }
    assert got[1] == [42, 44, 46, 48, 50, 52, 54, 56]
    assert got[2] == [7] * 8
    assert got[3] == []
    assert got[4] == [0, 2, 4, 6, 8, 9, 9, 9]
    # align variants
    got_start = df.filter("id = 1").select(
        span_sample(F.col("arr"), 8, 2, align="start").alias("p")
    ).first().p
    got_end = df.filter("id = 1").select(
        span_sample(F.col("arr"), 8, 2, align="end").alias("p")
    ).first().p
    assert got_start == [0, 2, 4, 6, 8, 10, 12, 14]
    assert got_end == [84, 86, 88, 90, 92, 94, 96, 98]


def test_chunk_tokens_edges(spark):
    """Overlap/boundary semantics: window 4 stride 3 over 10 tokens ->
    chunks at 0,3,6,9 (last is a 1-token tail); empty docs yield chunk 0
    with len 0; a doc shorter than one window yields a single short
    chunk."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.windows import chunk_tokens

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, ""),
            (3, "x y"),
        ],
        "id long, text string",
    )
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    out = {
        (r["id"], r["chunk_id"]): (r["chunk"], r["chunk_len"])
        for r in chunk_tokens(df, "id", toks, window=4, stride=3).collect()
    }
    assert out[(1, 0)] == (["a", "b", "c", "d"], 4)
    assert out[(1, 1)] == (["d", "e", "f", "g"], 4)  # 1-token overlap
    assert out[(1, 3)] == (["j"], 1)  # tail chunk, truncated
    assert out[(2, 0)] == ([], 0)  # empty doc still emits chunk 0
    assert out[(3, 0)] == (["x", "y"], 2)
    assert len(out) == 6
    with _pytest.raises(ValueError):
        chunk_tokens(df, "id", toks, window=0, stride=3)


import pytest as _pt
from hypothesis import given, settings
from hypothesis import strategies as st




@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(0, 50),
    window=st.integers(1, 8),
    stride=st.integers(1, 8),
)
def test_chunk_tokens_properties(spark_for_hypothesis, n, window, stride):
    """For ANY (corpus length, window, stride): chunk k is exactly
    toks[k*stride : k*stride+window]; the chunk count is
    floor(max(n-1,0)/stride)+1; and when stride <= window every token
    index is covered by at least one chunk."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.windows import chunk_tokens

    spark = spark_for_hypothesis
    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame([(1, " ".join(toks))], "id long, text string")
    col = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    rows = sorted(
        chunk_tokens(df, "id", col, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert len(rows) == max(n - 1, 0) // stride + 1
    covered = set()
    for r in rows:
        start = r["chunk_id"] * stride
        expect = toks[start : start + window]
        assert r["chunk"] == expect
        assert r["chunk_len"] == len(expect) if n else r["chunk_len"] == 0
        covered.update(range(start, min(start + window, n)))
    if stride <= window:
        assert covered == set(range(n))


def test_chunk_tokens_null_array(spark):
    """A NULL token array counts as 0 tokens: chunk 0 with chunk_len 0
    (NOT chunk_len = window -- least() would skip a NULL n-start)."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.windows import chunk_tokens

    df = spark.createDataFrame([(1,)], "id long")
    null_toks = F.lit(None).cast("array<string>")
    [row] = chunk_tokens(df, "id", null_toks, window=4, stride=3).collect()
    assert (row["chunk_id"], row["chunk"], row["chunk_len"]) == (0, None, 0)
