"""Edge semantics of the table-maintenance operators
(operators/maintenance.py): CDC merge actions, SCD2 interval
boundaries, compaction bin boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators import maintenance as MT


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


def test_cdc_merge_actions(spark):
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [
            # k=1: two upserts — latest (day 2) wins
            (1, _ts(1), 100, "U", 11.0),
            (1, _ts(2), 101, "U", 12.0),
            # k=2: delete tombstone
            (2, _ts(1), 102, "D", None),
            # k=4: new key insert
            (4, _ts(1), 103, "U", 40.0),
            # k=5: tombstone for a key not in base (no-op delete)
            (5, _ts(1), 104, "D", None),
            # k=3 untouched -> unchanged
        ],
        "k long, ts timestamp, eid long, op string, v double",
    )
    out = {
        r["k"]: (r["v"], r["action"])
        for r in MT.cdc_merge(base, changes, ["k"], ["ts", "eid"]).collect()
    }
    assert out[1] == (12.0, "update")
    assert out[2] == (None, "delete")
    assert out[3] == (30.0, "unchanged")
    assert out[4] == (40.0, "insert")
    assert out[5] == (None, "delete")


def test_cdc_merge_same_ts_tiebreak(spark):
    """Equal timestamps: the unique tiebreaker (eid) decides, so the
    compaction is deterministic."""
    base = spark.createDataFrame([(1, 0.0)], "k long, v double")
    changes = spark.createDataFrame(
        [(1, _ts(1), 5, "U", 5.0), (1, _ts(1), 9, "U", 9.0)],
        "k long, ts timestamp, eid long, op string, v double",
    )
    [row] = MT.cdc_merge(base, changes, ["k"], ["ts", "eid"]).collect()
    assert (row["v"], row["action"]) == (9.0, "update")


def test_scd2_interval_boundaries(spark):
    changes = spark.createDataFrame(
        [(1, _ts(1), 100, 1.0), (1, _ts(3), 101, 2.0), (2, _ts(2), 102, 5.0)],
        "k long, ts timestamp, eid long, v double",
    )
    hist = MT.scd2_intervals(changes, ["k"], "ts", "eid", ["v"])
    rows = {(r["k"], r["version"]): r for r in hist.collect()}
    assert rows[(1, 1)]["valid_to"] == _ts(3)
    assert rows[(1, 2)]["valid_to"] is None
    assert rows[(1, 2)]["n_versions"] == 2

    # snapshot exactly AT a version start includes it (valid_from <= T);
    # exactly AT valid_to excludes the closed version (valid_to > T fails)
    snap = MT.scd2_snapshot(hist, _ts(3))
    got = {(r["k"], r["v"]) for r in snap.collect()}
    assert got == {(1, 2.0), (2, 5.0)}

    # before any version for k=2's start but inside k=1 v1
    snap0 = MT.scd2_snapshot(hist, _ts(1, 12))
    assert {(r["k"], r["v"]) for r in snap0.collect()} == {(1, 1.0)}


def test_compaction_plan_bin_boundary(spark):
    """A file joins the bin holding its cumulative predecessor bytes, so
    a bin fills past target before the next opens."""
    files = spark.createDataFrame(
        [("p", i, sz) for i, sz in enumerate([3000, 3000, 3000, 500])],
        "part string, fid long, sz long",
    )
    out = {
        r["bin_id"]: (r["n_files"], r["bytes"], r["first_file"], r["last_file"])
        for r in MT.compaction_plan(files, ["part"], "fid", "sz", 4000).collect()
    }
    # cum_before: 0, 3000, 6000, 9000 -> bins 0, 0, 1, 2
    assert out[0] == (2, 6000, 0, 1)
    assert out[1] == (1, 3000, 2, 2)
    assert out[2] == (1, 500, 3, 3)


def test_compaction_plan_partition_isolation(spark):
    """Bins never span table partitions."""
    files = spark.createDataFrame(
        [("a", 0, 100), ("b", 1, 100)], "part string, fid long, sz long"
    )
    out = MT.compaction_plan(files, ["part"], "fid", "sz", 4000)
    assert out.filter(F.col("bin_id") == 0).count() == 2


def test_zorder_key_interleave(spark):
    """z interleaves bits with x odd / y even: (x=3, y=1) ->
    x bits at positions 1,3 -> 0b1010; y bit at position 0 -> 0b0001;
    z = 0b1011 = 11."""
    df = spark.createDataFrame([(3, 1), (0, 0), (255, 255)], "x long, y long")
    out = [
        r[0]
        for r in df.select(
            MT.zorder_key(F.col("x"), F.col("y"), bits=8)
        ).collect()
    ]
    assert out == [11, 0, 65535]


def test_zorder_sql_matches_jvm(spark):
    """The SQL replay of the Morton interleave is bit-identical to the
    JVM column expression on a dense sample."""
    import duckdb

    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(pts, "x long, y long")
    jvm = sorted(
        tuple(r)
        for r in df.select(
            "x", "y", MT.zorder_key(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    )
    z = MT.zorder_key_sql("x", "y", 8)
    sql = sorted(
        duckdb.connect()
        .execute(
            f"SELECT x, y, ({z}) AS z FROM (SELECT unnest($pts_x) x, unnest($pts_y) y)",
            {"pts_x": [p[0] for p in pts], "pts_y": [p[1] for p in pts]},
        )
        .fetchall()
    )
    assert jvm == sql


def test_zorder_layout_tightness(spark):
    """On a dense 16x16 grid, z-order files (4 rows each) have span <= 1
    in BOTH dims; a single-column sort layout leaves the other dim's
    span at the full domain."""
    grid = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, "x long, y long")
    out = MT.zorder_layout(
        df, F.col("x"), F.col("y"), bits=4, rows_per_file_shift=2
    ).collect()
    assert len(out) == 64  # 256 rows / 4 per file
    for r in out:
        assert r["n_rows"] == 4
        assert r["max_x"] - r["min_x"] <= 1
        assert r["max_y"] - r["min_y"] <= 1


def test_cdc_stream_versions_and_restart(spark, tmp_path):
    """The foreachBatch fold commits one immutable version per batch;
    re-running the drained stream with the same checkpoint processes
    nothing (restart safety), and a crash-replay of the last batch
    (same id, rewound checkpoint) folds into the same predecessor and
    reproduces the same state (idempotent commit)."""
    import shutil

    from slowfast_feature_extractor_spark.streaming import cdc_stream as CS

    src = tmp_path / "src"
    src.mkdir()
    b0 = spark.createDataFrame(
        [(1, _ts(1), 100, "U", 1.0), (2, _ts(1), 101, "U", 2.0)],
        "k long, ts timestamp, eid long, op string, v double",
    )
    b1 = spark.createDataFrame(
        [(1, _ts(2), 102, "U", 9.0), (2, _ts(2), 103, "D", None)],
        "k long, ts timestamp, eid long, op string, v double",
    )
    b0.coalesce(1).write.parquet(str(tmp_path / "t0"))
    b1.coalesce(1).write.parquet(str(tmp_path / "t1"))
    import os

    for i in (0, 1):
        part = next((tmp_path / f"t{i}").glob("*.parquet"))
        dst = src / f"0{i}.parquet"
        shutil.move(str(part), str(dst))
        # the file stream source orders by mtime with undefined ties;
        # the fold is order-sensitive, so pin a total order
        os.utime(dst, (1_700_000_000 + 60 * i,) * 2)

    def run():
        stream = (
            spark.readStream.schema(
                "k long, ts timestamp, eid long, op string, v double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        CS.apply_cdc_stream(
            stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            key_cols=["k"], order_cols=["ts", "eid"], value_cols=["v"],
        )

    run()
    state_dir = str(tmp_path / "state")
    assert CS.latest_state_version(state_dir) == 1
    final = {r["k"]: r["v"] for r in CS.read_state(spark, state_dir).collect()}
    assert final == {1: 9.0}  # k=2 deleted by the tombstone

    # drained restart: same checkpoint, no new files -> no new version
    run()
    assert CS.latest_state_version(state_dir) == 1

    # crash-replay of batch 1: predecessor selection (before=1) ignores
    # the already-committed v1, so refolding b1 reproduces it exactly
    pre = CS.read_state(spark, state_dir, before=1)
    assert {r["k"]: r["v"] for r in pre.collect()} == {1: 1.0, 2: 2.0}


def test_expire_versions(spark, tmp_path):
    """Retention keeps the newest K versions; keep_last < 2 is refused
    (the newest version may be an uncheckpointed commit whose
    crash-replay folds into its PREDECESSOR, so that predecessor must
    survive); expiry leaves state readable."""
    import pytest as _pytest

    from slowfast_feature_extractor_spark.streaming import cdc_stream as CS

    state = tmp_path / "state"
    for v in (0, 1, 2):
        spark.createDataFrame([(v,)], "k long").write.parquet(
            str(state / f"v{v}")
        )
    for bad in (0, 1):
        with _pytest.raises(ValueError):
            CS.expire_versions(str(state), bad)
    assert CS.expire_versions(str(state), 2) == [0]
    assert CS.latest_state_version(str(state)) == 2
    # the replay predecessor (v1) survived: before=2 still resolves
    assert CS.latest_state_version(str(state), before=2) == 1
    [row] = CS.read_state(spark, str(state)).collect()
    assert row["k"] == 2
    # idempotent on an already-trimmed dir; empty dir is a no-op
    assert CS.expire_versions(str(state), 2) == []
    assert CS.expire_versions(str(tmp_path / "nope"), 3) == []


import pytest
from hypothesis import given, settings
from hypothesis import strategies as st




@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_key_invertible_property(spark_for_hypothesis, pts):
    """De-interleaving the Morton key recovers (x, y) exactly for any
    8-bit point set — the key loses no information, so z-sorted
    min/max stats are sound for pruning on either dimension."""
    spark = spark_for_hypothesis
    df = spark.createDataFrame(list(set(pts)), "x long, y long")
    got = df.select(
        "x", "y", MT.zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
    ).collect()
    for r in got:
        x = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(8))
        y = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(8))
        assert (x, y) == (r["x"], r["y"])


@settings(max_examples=10, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(1, 4),          # key
            st.integers(0, 50),         # ts offset (may collide)
            st.booleans(),              # delete?
            st.integers(0, 9),          # value
        ),
        min_size=1,
        max_size=25,
    )
)
def test_cdc_merge_fold_property(spark_for_hypothesis, ops):
    """For ANY op sequence, cdc_merge(base, changes) equals a Python
    fold of the ops in (ts, eid) order: the latest op per key decides
    presence and value; earlier ops are irrelevant."""
    spark = spark_for_hypothesis
    base_rows = [(1, 100.0), (2, 200.0)]
    rows = [
        (k, _ts(1, 0) + dt.timedelta(minutes=off), eid, "D" if d else "U",
         None if d else float(v))
        for eid, (k, off, d, v) in enumerate(ops)
    ]
    base = spark.createDataFrame(base_rows, "k long, v double")
    changes = spark.createDataFrame(
        rows, "k long, ts timestamp, eid long, op string, v double"
    )
    out = {
        r["k"]: (r["v"], r["action"])
        for r in MT.cdc_merge(base, changes, ["k"], ["ts", "eid"]).collect()
    }
    # reference fold: last op per key in (ts, eid) order
    last: dict[int, tuple] = {}
    for k, ts, eid, op, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        last[k] = (op, v)
    base_d = dict(base_rows)
    for k in set(base_d) | set(last):
        if k in last:
            op, v = last[k]
            if op == "D":
                assert out[k] == (None, "delete")
            elif k in base_d:
                assert out[k] == (v, "update")
            else:
                assert out[k] == (v, "insert")
        else:
            assert out[k] == (base_d[k], "unchanged")
    assert set(out) == set(base_d) | set(last)
