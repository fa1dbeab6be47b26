"""Skew robustness: a hot entity with ~100× the revisits of the rest
must produce correct windows and spread across salted buckets."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.windows import dual_rate_features
from slowfast_feature_extractor_spark.plans.featurize import salted_buckets


@pytest.fixture(scope="module")
def skewed(spark):
    t0 = datetime(2024, 1, 1)
    hot = [("hot", t0 + timedelta(minutes=i), float(i)) for i in range(5000)]
    cold = [
        (f"cold{u}", t0 + timedelta(hours=i), float(i))
        for u in range(200)
        for i in range(10)
    ]
    return spark.createDataFrame(
        hot + cold, schema="url string, warc_ts timestamp, value double"
    )


def test_hot_entity_windows_correct(spark, skewed):
    out = dual_rate_features(skewed, fast_rows=8, slow_rows=64, strict=True)
    hot = out.filter(F.col("url") == "hot")
    assert hot.count() == 5000
    # window counts saturate correctly on the hot key
    sat = hot.filter(F.col("slow_cnt") == 64).count()
    assert sat == 5000 - 64
    last = hot.orderBy(F.col("warc_ts").desc()).limit(1).collect()[0]
    # last row's fast window = values 4991..4998
    assert last["fast_avg"] == pytest.approx(sum(range(4991, 4999)) / 8)
    assert last["n_hist_rows"] == 4999


def test_salted_buckets_spread_hot_key(spark, skewed):
    b = salted_buckets(skewed, key="url", buckets=16)
    # deterministic: the same url lands in one bucket per salt...
    per_bucket = b.filter(F.col("url") == "hot").select("bucket").distinct().count()
    assert per_bucket == 1
    # ...but adding the timestamp to the salt spreads the hot entity for
    # embarrassingly-parallel stages (extraction etc.)
    spread = skewed.withColumn(
        "bucket", F.pmod(F.xxhash64("url", "warc_ts"), F.lit(16)).cast("int")
    )
    n = spread.filter(F.col("url") == "hot").select("bucket").distinct().count()
    assert n == 16


def _canon_feats(df, entity):
    cols = [entity, "ts", "event_id"] if "event_id" in df.columns else [entity, "warc_ts"]
    rows = df.collect()
    def key(r):
        return tuple(str(r[c]) for c in cols)
    out = {}
    for r in rows:
        out[key(r)] = tuple(
            r[c] for c in (
                "fast_avg", "fast_sum", "fast_min", "fast_max", "fast_cnt",
                "slow_avg", "slow_sum", "slow_min", "slow_max", "slow_cnt",
                "n_hist_rows", "max_input_ts",
            )
        )
    return out


def test_chunked_windows_equal_single_partition(spark):
    """Range-partition-with-carry == plain entity-partitioned windows,
    exactly, on real fixture data chunked by day."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.skew import (
        dual_rate_features_chunked,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    want = _canon_feats(
        dual_rate_features(
            ev, entity="user_id", ts="ts", measure="value_cents",
            fast_rows=8, slow_rows=64, strict=True, tiebreak="event_id",
        ).select(
            "user_id", "ts", "event_id",
            "fast_avg", "fast_sum", "fast_min", "fast_max", "fast_cnt",
            "slow_avg", "slow_sum", "slow_min", "slow_max", "slow_cnt",
            "n_hist_rows", "max_input_ts",
        ),
        "user_id",
    )
    got = _canon_feats(
        dual_rate_features_chunked(
            ev, entity="user_id", ts="ts", measure="value_cents",
            fast_rows=8, slow_rows=64, strict=True, tiebreak="event_id",
        ),
        "user_id",
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_chunked_windows_split_hot_entity(spark, skewed):
    """The hot entity's window work runs partitioned by (entity, chunk):
    correctness holds and the plan partitions on the chunked key."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.skew import (
        dual_rate_features_chunked,
    )

    out = dual_rate_features_chunked(
        skewed, entity="url", ts="warc_ts", measure="value",
        fast_rows=8, slow_rows=64, strict=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan and "hashpartitioning(url" in plan
    hot = out.filter(F.col("url") == "hot")
    assert hot.filter(F.col("slow_cnt") == 64).count() == 5000 - 64
    last = hot.orderBy(F.col("warc_ts").desc()).limit(1).collect()[0]
    assert last["fast_avg"] == pytest.approx(sum(range(4991, 4999)) / 8)
    assert last["n_hist_rows"] == 4999


@pytest.mark.parametrize("exact", [True, False])
def test_chunked_asof_equals_unchunked(spark, exact):
    """asof_join(chunk=day) == asof_join, exactly, both tie semantics."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.asof_join import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value_cents").alias("view_cents")
    )

    def rows(chunk):
        out = asof_join(
            clicks, views, on="ts", by=("user_id",),
            right_cols=["view_cents"], allow_exact_matches=exact,
            matched_ts_col="view_ts", chunk=chunk,
        )
        return sorted(
            (r.user_id, str(r.ts), r.event_id, str(r.view_ts), r.view_cents)
            for r in out.collect()
        )

    want = rows(None)
    got = rows(F.to_date(F.col("ts")))
    assert len(got) == len(want) > 0
    assert got == want
    # carries matter: some click must match a view from an earlier day
    cross_day = [r for r in rows(F.to_date(F.col("ts")))
                 if r[3] != "None" and r[3][:10] != r[1][:10]]
    assert cross_day, "fixture has no cross-chunk matches; chunk test vacuous"


@pytest.mark.parametrize("chunk_expr", [None, "month"])
def test_sessionize_chunked_exact_parity(spark, chunk_expr):
    """sessionize_chunked == sessionize on every row, any chunking —
    including sessions that span chunk boundaries."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.sessionize import sessionize
    from slowfast_feature_extractor_spark.operators.skew import sessionize_chunked

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    chunk = None if chunk_expr is None else F.date_trunc(chunk_expr, F.col("ts"))
    plain = sessionize(ev, entity="user_id", ts="ts", gap_seconds=1800.0,
                       tiebreak="event_id")
    chunked = sessionize_chunked(ev, entity="user_id", ts="ts", gap_seconds=1800.0,
                                 tiebreak="event_id", chunk=chunk)
    a = {(r["user_id"], r["event_id"]): (r["session_idx"], r["session_id"])
         for r in plain.collect()}
    b = {(r["user_id"], r["event_id"]): (r["session_idx"], r["session_id"])
         for r in chunked.collect()}
    assert a == b
    assert set(chunked.columns) == set(plain.columns)


def test_sessionize_chunked_boundary_session():
    """Crafted case: one session straddles a day-chunk boundary (gap
    below threshold across midnight) — the index must NOT restart."""
    import pandas as pd

    from slowfast_feature_extractor_spark.operators.sessionize import sessionize
    from slowfast_feature_extractor_spark.operators.skew import sessionize_chunked
    from slowfast_feature_extractor_spark.session import get_spark

    spark = get_spark(cpus=4, shuffle_partitions=8)
    rows = [
        ("u1", "2024-01-01 23:50:00", 1),
        ("u1", "2024-01-02 00:05:00", 2),  # 15 min gap, crosses midnight
        ("u1", "2024-01-02 09:00:00", 3),  # new session (gap > 30 min)
        ("u2", "2024-01-01 10:00:00", 4),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))
    plain = {r["event_id"]: r["session_idx"] for r in sessionize(
        df, entity="user_id", ts="ts", gap_seconds=1800.0, tiebreak="event_id").collect()}
    chunked = {r["event_id"]: r["session_idx"] for r in sessionize_chunked(
        df, entity="user_id", ts="ts", gap_seconds=1800.0, tiebreak="event_id").collect()}
    assert plain == chunked
    assert chunked[1] == chunked[2] == 1  # midnight-straddling session intact
    assert chunked[3] == 2


def test_pit_flagship_fully_chunked_parity(spark):
    """The composed skew-path flagship (chunked sessionize + chunked
    dual-rate windows + chunked as-of) equals the plain pipeline
    row-for-row."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.plans.featurize import (
        pit_dual_rate_chunked_from,
        pit_dual_rate_from,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    key = ["user_id", "ts", "event_id"]
    a = pit_dual_rate_from(ev).sort(*key).collect()
    b = pit_dual_rate_chunked_from(ev).sort(*key).collect()
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert ra.asDict() == rb.asDict(), (ra, rb)


def test_pit_flagship_auto_chunk_dispatch(spark):
    """VERDICT r5 #2: the auto flagship engages the chunk-carry
    machinery only above the hot-entity threshold — plain plan (no
    grouped-map python node) on the uniform fixture, chunked plan when
    the threshold is forced down to fixture scale, both value-exact."""
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.plans.featurize import (
        pit_dual_rate_auto,
        pit_dual_rate_from,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )

    def plan(df):
        return df._jdf.queryExecution().toString()

    # the chunk-carry machinery's fingerprint is the __chunk key column
    # (r7: the carry fold is pure JVM — no grouped-map Python node left)
    auto_plain = pit_dual_rate_auto(ev)  # uniform corpus -> plain arm
    assert "__chunk" not in plan(auto_plain)
    auto_chunked = pit_dual_rate_auto(ev, chunk_threshold=2)  # forced skew arm
    assert "__chunk" in plan(auto_chunked)

    key = ["user_id", "ts", "event_id"]
    a = pit_dual_rate_from(ev).sort(*key).collect()
    b = auto_chunked.sort(*key).collect()
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert ra.asDict() == rb.asDict(), (ra, rb)


def test_chunked_dual_rate_parity_with_null_ts_rows(spark):
    """Rows with null ts (null chunk) sort NULLS FIRST in the plain
    operator; the chunked fold must treat the null chunk as the
    entity's EARLIEST chunk (pandas groupby would silently drop it)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.skew import (
        dual_rate_features_chunked,
    )
    from slowfast_feature_extractor_spark.operators.windows import (
        dual_rate_features,
    )

    rows = [("u", None, 1.0), ("u", None, 2.0)] + [
        ("u", dt.datetime(2024, 1, 1 + d, 12, 0, 0), float(d)) for d in range(6)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")
    kw = dict(entity="url", ts="warc_ts", measure="value", fast_rows=2, slow_rows=4)
    plain = dual_rate_features(df, **kw)
    chunked = dual_rate_features_chunked(df, **kw)
    cols = sorted(set(plain.columns) & set(chunked.columns))
    a = sorted((tuple(r) for r in plain.select(*cols).collect()), key=str)
    b = sorted((tuple(r) for r in chunked.select(*cols).collect()), key=str)
    assert a == b


def test_shuffle_partition_count_tolerates_auto(spark):
    """'auto' (AQE-managed platforms; OSS Spark refuses to even set it,
    so a duck-typed session stands in) must not crash plan composition;
    a numeric conf passes through unchanged."""
    from slowfast_feature_extractor_spark.operators.skew import (
        shuffle_partition_count,
    )

    class _Conf:
        def get(self, key, default=None):
            return "auto"

    class _SC:
        defaultParallelism = 8

    class _FakeSpark:
        conf = _Conf()
        sparkContext = _SC()

    assert shuffle_partition_count(_FakeSpark()) == 8
    n = shuffle_partition_count(spark)  # real session: numeric conf
    assert n == int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_sessionize_chunked_resessionize_no_duplicate_columns(spark):
    """Re-sessionizing an already-sessionized frame REPLACES the
    index/session columns (plain-sessionizer parity) instead of
    emitting ambiguous duplicates."""
    import datetime as dt

    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.operators.sessionize import sessionize
    from slowfast_feature_extractor_spark.operators.skew import sessionize_chunked

    rows = [
        ("u", dt.datetime(2024, 1, 1, 0, 0), 1),
        ("u", dt.datetime(2024, 1, 1, 3, 0), 2),
        ("u", dt.datetime(2024, 1, 2, 0, 0), 3),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, event_id long")
    once = sessionize_chunked(
        df, entity="url", ts="warc_ts", gap_seconds=3600.0, tiebreak="event_id"
    )
    again = sessionize_chunked(
        once, entity="url", ts="warc_ts", gap_seconds=7200.0, tiebreak="event_id"
    )
    assert again.columns.count("session_idx") == 1
    assert again.columns.count("session_id") == 1
    plain = sessionize(
        once, entity="url", ts="warc_ts", gap_seconds=7200.0, tiebreak="event_id"
    )
    got = {(r["event_id"], r["session_idx"]) for r in again.collect()}
    want = {(r["event_id"], r["session_idx"]) for r in plain.collect()}
    assert got == want
    # the filter that used to raise AMBIGUOUS_REFERENCE
    assert again.filter(F.col("session_idx") >= 0).count() == 3


def test_chunk_carries_jvm_matches_bruteforce(spark):
    """r7 focused test: the pure-JVM chunk_carries (sorted tail array +
    per-chunk filter/slice) must emit EXACTLY the rows a sequential
    brute-force fold produces — for every (entity, chunk k): copies of
    the last `slow_rows` rows of the entity's history before chunk k,
    relabelled to chunk k. Random dense/sparse entities, deterministic
    seed, unique (entity, ts) keys."""
    import random
    from datetime import datetime, timedelta

    from slowfast_feature_extractor_spark.operators.skew import chunk_carries

    rng = random.Random(7)
    t0 = datetime(2024, 1, 1)
    rows = []
    for u in range(12):
        n = rng.choice([1, 2, 5, 40, 300])
        step_h = rng.choice([1, 7, 26])  # dense..sparse vs day chunks
        for i in range(n):
            rows.append((f"u{u}", t0 + timedelta(hours=i * step_h), float(i)))
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, value double"
    )
    slow_rows = 5
    base = df.withColumn("__chunk", F.to_date(F.col("warc_ts")))
    got = {
        (r["url"], str(r["__chunk"]), str(r["warc_ts"]), r["value"])
        for r in chunk_carries(base, "url", ["warc_ts"], slow_rows).collect()
    }

    # brute force: per entity, iterate chunks ascending; carry = last
    # slow_rows rows of the full prior history
    from collections import defaultdict

    per_ent = defaultdict(list)
    for u, ts, v in rows:
        per_ent[u].append((ts, v))
    want = set()
    for u, evs in per_ent.items():
        evs.sort()
        chunks = sorted({ts.date() for ts, _ in evs})
        for c in chunks:
            prior = [(ts, v) for ts, v in evs if ts.date() < c]
            for ts, v in prior[-slow_rows:]:
                want.add((u, str(c), str(ts), v))
    assert got == want and len(want) > 0
