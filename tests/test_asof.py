"""As-of join unit semantics (SURVEY.md §5 test #4): exact matches,
strict inequality, tolerance, missing history, duplicate timestamps,
inner mode."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from slowfast_feature_extractor_spark.operators.asof_join import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T01:00:00"), 1),
            ("a", _ts("2024-01-01T02:00:00"), 2),
            ("a", _ts("2024-01-01T03:00:00"), 3),
            ("b", _ts("2024-01-01T01:00:00"), 4),  # no right history at all
        ],
        schema="k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:30:00"), 10),
            ("a", _ts("2024-01-01T02:00:00"), 20),  # exact-ts collision with lid=2
        ],
        schema="k string, ts timestamp, rv int",
    )
    return left, right


def _collect(df):
    return {r["lid"]: (r["rv"], r["matched_ts"]) for r in df.collect()}


def test_exact_matches_included(sides):
    left, right = sides
    out = _collect(asof_join(left, right, on="ts", by=("k",), right_cols=["rv"]))
    assert out[1] == (10, _ts("2024-01-01T00:30:00"))
    assert out[2] == (20, _ts("2024-01-01T02:00:00"))  # equal ts visible
    assert out[3] == (20, _ts("2024-01-01T02:00:00"))
    assert out[4] == (None, None)  # left join keeps unmatched


def test_strict_excludes_equal_ts(sides):
    left, right = sides
    out = _collect(
        asof_join(left, right, on="ts", by=("k",), right_cols=["rv"], allow_exact_matches=False)
    )
    assert out[2] == (10, _ts("2024-01-01T00:30:00"))  # equal ts invisible
    assert out[3] == (20, _ts("2024-01-01T02:00:00"))


def test_tolerance(sides):
    left, right = sides
    out = _collect(
        asof_join(left, right, on="ts", by=("k",), right_cols=["rv"], tolerance_seconds=3600)
    )
    assert out[1] == (10, _ts("2024-01-01T00:30:00"))  # 30min old: ok
    assert out[3] == (20, _ts("2024-01-01T02:00:00"))  # 60min: boundary ok
    out2 = _collect(
        asof_join(left, right, on="ts", by=("k",), right_cols=["rv"], tolerance_seconds=1000)
    )
    assert out2[1] == (None, None)  # 1800s > 1000s: nulled


def test_inner(sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by=("k",), right_cols=["rv"], how="inner")
    assert sorted(r["lid"] for r in out.collect()) == [1, 2, 3]


def test_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T05:00:00"), 1)], schema="k string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T04:00:00"), 7),
            ("a", _ts("2024-01-01T04:00:00"), 9),
        ],
        schema="k string, ts timestamp, rv int",
    )
    for _ in range(3):  # deterministic across runs
        out = _collect(asof_join(left, right, on="ts", by=("k",), right_cols=["rv"]))
        assert out[1] == (9, _ts("2024-01-01T04:00:00"))  # max payload wins


def test_column_collision_suffix(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T05:00:00"), 1.0)], schema="k string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T04:00:00"), 2.0)], schema="k string, ts timestamp, v double"
    )
    out = asof_join(left, right, on="ts", by=("k",), right_cols=["v"])
    assert "v_right" in out.columns
    row = out.collect()[0]
    assert row["v"] == 1.0 and row["v_right"] == 2.0


def test_asof_matches_pandas_merge_asof_property(spark):
    """Property parity vs pandas.merge_asof (the semantic the operator
    documents): randomized key/ts layouts incl. duplicate timestamps,
    empty right sides, and exact-tie boundaries, both tie modes."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    for trial in range(6):
        n_l, n_r = rng.randint(1, 40), rng.randint(0, 40)
        keys = ["a", "b", "c"]
        left = pd.DataFrame({
            "k": rng.choice(keys, n_l),
            "ts": pd.to_datetime(rng.randint(0, 50, n_l), unit="s"),
            "lid": np.arange(n_l, dtype="int64"),
        }).sort_values("ts", kind="mergesort").reset_index(drop=True)
        right = pd.DataFrame({
            "k": rng.choice(keys, n_r),
            "ts": pd.to_datetime(rng.randint(0, 50, n_r), unit="s"),
            "rv": rng.randint(0, 1000, n_r).astype("int64"),
        })
        # merge_asof picks the LAST right row among equal (k, ts); make
        # that winner deterministic so both engines agree on ties
        right = (right.sort_values(["k", "ts", "rv"], kind="mergesort")
                 .drop_duplicates(["k", "ts"], keep="last")
                 .sort_values("ts", kind="mergesort").reset_index(drop=True))
        for exact in (True, False):
            want = pd.merge_asof(
                left, right, on="ts", by="k",
                allow_exact_matches=exact, direction="backward",
            )
            got = asof_join(
                spark.createDataFrame(left), spark.createDataFrame(right),
                on="ts", by=("k",), right_cols=["rv"],
                allow_exact_matches=exact, matched_ts_col=None,
            ).toPandas()
            wd = {t.lid: t.rv for t in want.itertuples()}
            gd = {t.lid: t.rv for t in got.itertuples()}
            assert set(wd) == set(gd)
            for lid in wd:
                w, g = wd[lid], gd[lid]
                assert (pd.isna(w) and pd.isna(g)) or w == g, (
                    f"trial={trial} exact={exact} lid={lid}: {w} vs {g}")


def test_asof_inner_keeps_matches_with_null_payload_values(spark):
    from slowfast_feature_extractor_spark.operators.asof_join import asof_join

    left = spark.createDataFrame(
        [("u", 10), ("u", 20)], "url string, ts long"
    )
    right = spark.createDataFrame(
        [("u", 5, None), ("u", 15, 2.0)], "url string, ts long, v double"
    )
    got = {
        r["ts"]: (r["v"], r["matched_ts"])
        for r in asof_join(left, right, on="ts", by=["url"], how="inner").collect()
    }
    # ts=10 matched right ts=5 whose PAYLOAD v is null — a real match,
    # must survive the inner filter
    assert got == {10: (None, 5), 20: (2.0, 15)}
    # and with matched_ts_col=None (the old probe-a-payload-column path)
    got2 = asof_join(
        left, right, on="ts", by=["url"], how="inner", matched_ts_col=None
    ).count()
    assert got2 == 2


def test_asof_ignores_null_right_keys(spark):
    from slowfast_feature_extractor_spark.operators.asof_join import asof_join

    left = spark.createDataFrame([("u", 10)], "url string, ts long")
    right = spark.createDataFrame(
        [("u", None, 99.0), ("u", 3, 1.0)], "url string, ts long, v double"
    )
    rows = asof_join(left, right, on="ts", by=["url"]).collect()
    # the null-ts right row must never be carried as a match
    assert rows[0]["v"] == 1.0 and rows[0]["matched_ts"] == 3


def test_asof_tolerance_on_date_column(spark):
    import datetime as dt

    from slowfast_feature_extractor_spark.operators.asof_join import asof_join

    left = spark.createDataFrame(
        [("u", dt.date(2024, 1, 10))], "url string, d date"
    )
    right = spark.createDataFrame(
        [("u", dt.date(2024, 1, 1), 1.0)], "url string, d date, v double"
    )
    # 9 days back; tolerance 10 days matches, 5 days does not
    ok = asof_join(
        left, right, on="d", by=["url"], tolerance_seconds=10 * 86400.0
    ).collect()
    assert ok[0]["v"] == 1.0
    no = asof_join(
        left, right, on="d", by=["url"], tolerance_seconds=5 * 86400.0
    ).collect()
    assert no[0]["v"] is None


def test_interval_join_buckets_exactly_once(spark):
    """Bucketed range join: events on window boundaries are included
    (closed interval), each (window, event) pair emits exactly once
    even when the window spans several buckets, and the plan is an
    equi-join -- never BroadcastNestedLoopJoin."""
    import datetime as dt

    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.asof_join import interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    wins = spark.createDataFrame(
        [(1, 10, t0, t0 + dt.timedelta(hours=2))],  # spans 3 hour-buckets
        "k long, win_id long, w_start timestamp, w_end timestamp",
    )
    events = spark.createDataFrame(
        [
            (1, t0, 100),                               # on w_start: in
            (1, t0 + dt.timedelta(hours=2), 101),       # on w_end: in
            (1, t0 + dt.timedelta(hours=1), 102),       # middle bucket: in
            (1, t0 + dt.timedelta(hours=2, seconds=1), 103),  # past end: out
            (2, t0 + dt.timedelta(hours=1), 104),       # other key: out
        ],
        "k long, ts timestamp, eid long",
    )
    j = interval_join(wins, events, ["k"], "w_start", "w_end", "ts", 3600)
    got = sorted(r["eid"] for r in j.collect())
    assert got == [100, 101, 102]  # each exactly once, boundaries closed
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    wins=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 300), st.integers(0, 200)),
        min_size=1, max_size=10,
    ),
    evs=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 500)),
        min_size=1, max_size=25,
    ),
)
def test_interval_join_matches_bruteforce(spark_for_hypothesis, wins, evs):
    """For ANY window/event layout (including windows spanning many
    buckets and zero-length windows), the bucketed equi-join emits
    exactly the brute-force closed-interval matches, each once."""
    import datetime as dt

    from slowfast_feature_extractor_spark.operators.asof_join import interval_join

    spark = spark_for_hypothesis
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    w_rows = [
        (k, i, t0 + s * m, t0 + (s + dur) * m)
        for i, (k, s, dur) in enumerate(wins)
    ]
    e_rows = [(k, t0 + s * m, j) for j, (k, s) in enumerate(evs)]
    wdf = spark.createDataFrame(
        w_rows, "k long, win_id long, w_start timestamp, w_end timestamp"
    )
    edf = spark.createDataFrame(e_rows, "k long, ts timestamp, eid long")
    got = {
        (r["win_id"], r["eid"])
        for r in interval_join(
            wdf, edf, ["k"], "w_start", "w_end", "ts", bucket_seconds=3600
        ).collect()
    }
    want = {
        (wi, ej)
        for (wk, wi, ws, we) in w_rows
        for (ek, et, ej) in e_rows
        if wk == ek and ws <= et <= we
    }
    assert got == want
    # exactly-once: the collect above is a set; recount with duplicates
    n = interval_join(
        wdf, edf, ["k"], "w_start", "w_end", "ts", bucket_seconds=3600
    ).count()
    assert n == len(want)
