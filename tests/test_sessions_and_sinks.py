"""Session-granularity featurization vs pandas oracle; partitioned sink
pruning."""

from __future__ import annotations

import numpy as np

from slowfast_feature_extractor_spark.functions.extraction import extract_text
from slowfast_feature_extractor_spark.functions.vector import resample_to_k_np
from slowfast_feature_extractor_spark.plans.featurize import featurize_sessions
from slowfast_feature_extractor_spark.sources.sinks import read_features, write_features

GAP = 30 * 24 * 3600.0


def test_featurize_sessions_matches_oracle(spark, pages_pd, pages_df):
    got = {
        (r["url"], r["session_id"]): r
        for r in featurize_sessions(pages_df, gap_seconds=GAP, vec_len=4).collect()
    }
    df = pages_pd.copy()
    df["measure"] = df["html"].map(lambda h: float(len(extract_text(h))))
    n_sessions = 0
    for url, g in df.sort_values(["url", "warc_ts"]).groupby("url"):
        sid, prev = 0, None
        sessions: dict[int, list] = {}
        for _, row in g.iterrows():
            if prev is None or (row["warc_ts"] - prev).total_seconds() > GAP:
                sid += 1
            prev = row["warc_ts"]
            sessions.setdefault(sid, []).append(row)
        for idx, rows in sessions.items():
            n_sessions += 1
            key = (url, f"{url}#{idx}")
            assert key in got, key
            r = got[key]
            assert r["n_revisits"] == len(rows)
            assert r["session_start"] == rows[0]["warc_ts"].to_pydatetime()
            assert r["session_end"] == rows[-1]["warc_ts"].to_pydatetime()
            want_vec = resample_to_k_np([x["measure"] for x in rows], 4)
            np.testing.assert_allclose(np.array(r["session_vec"]), want_vec, atol=1e-9)
    assert len(got) == n_sessions


def test_partitioned_sink_prunes(spark, pages_df, tmp_path):
    from slowfast_feature_extractor_spark.plans.featurize import featurize_pages

    feats = featurize_pages(pages_df, fast_rows=4, slow_rows=8, fast_len=4, slow_len=2)
    path = str(tmp_path / "features")
    write_features(feats, path, buckets=4)

    allrows = read_features(spark, path)
    assert allrows.count() == pages_df.count()
    days = sorted(r[0] for r in allrows.select("day").distinct().collect())
    mid = days[len(days) // 2]
    pruned = read_features(spark, path, start_day=str(mid))
    assert 0 < pruned.count() < allrows.count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:120]


def test_fp16_sink_roundtrip_allclose(spark, pages_df, tmp_path):
    """Cast-on-write fp16 export (reference's save_as_float16 analog):
    vector columns land as packed binary (half the bytes), read back as
    array<float> allclose to the fp32 originals at fp16 precision."""
    import numpy as np

    from slowfast_feature_extractor_spark.plans.featurize import featurize_pages
    from slowfast_feature_extractor_spark.sources.sinks import (
        read_features,
        write_features,
    )

    feats = featurize_pages(pages_df, fast_rows=4, slow_rows=8, fast_len=4, slow_len=2)
    vec_cols = ("slow_vec", "fast_vec", "fused_vec")
    p32 = str(tmp_path / "f32")
    p16 = str(tmp_path / "f16")
    write_features(feats, p32, buckets=4)
    write_features(feats, p16, buckets=4, half_precision_cols=vec_cols)

    raw16 = spark.read.parquet(p16)
    for c in vec_cols:
        assert dict(raw16.dtypes)[c] == "binary"  # packed on disk
    sz = lambda p: sum(
        f.stat().st_size for f in __import__("pathlib").Path(p).rglob("*.parquet")
    )
    assert sz(p16) < sz(p32)  # the point of the option

    back = read_features(spark, p16, half_precision_cols=vec_cols)
    key = ["url", "warc_ts"]
    a = feats.select(*key, *vec_cols).toPandas().sort_values(key).reset_index(drop=True)
    b = back.select(*key, *vec_cols).toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in vec_cols:
        va = np.array(a[c].tolist(), dtype=np.float64)
        vb = np.array(b[c].tolist(), dtype=np.float64)
        np.testing.assert_allclose(vb, va, rtol=1e-3, atol=1e-3)
        # and the stored values are EXACTLY the fp16 rounding of fp32
        np.testing.assert_array_equal(
            vb, va.astype(np.float16).astype(np.float64)
        )


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.sources.sinks import compact_files

    path = str(tmp_path / "frag")
    # fragment: 64 tiny files
    spark.range(10_000).withColumn("v", F.col("id") * 3).repartition(
        64
    ).write.parquet(path)
    import os

    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) == 64
    before = spark.read.parquet(path).orderBy("id").collect()
    stats = compact_files(spark, path, target_bytes=1 << 30, order_by=["id"])
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1
    after_df = spark.read.parquet(path)
    assert after_df.orderBy("id").collect() == before
    # range clustering: each output file covers a disjoint id range
    # (single file here, so just assert the sort survived the rewrite)
    got = [r["id"] for r in after_df.limit(5).collect()]
    assert got == sorted(got)


def test_compact_files_multi_output_ranges(spark, tmp_path):
    import os

    from slowfast_feature_extractor_spark.sources.sinks import compact_files

    path = str(tmp_path / "frag2")
    spark.range(50_000).repartition(32).write.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    stats = compact_files(spark, path, target_bytes=total // 4 + 1, order_by=["id"])
    assert 2 <= stats["files_after"] <= 6
    # disjoint id ranges per file = range pruning works post-compaction
    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        pf = spark.read.parquet(os.path.join(path, f))
        lo, hi = pf.agg({"id": "min"}).first()[0], pf.agg({"id": "max"}).first()[0]
        ranges.append((lo, hi))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 < l2


def test_compact_files_recovers_from_mid_swap_crash(spark, tmp_path):
    import os

    from slowfast_feature_extractor_spark.sources.sinks import compact_files

    path = str(tmp_path / "crash")
    spark.range(1_000).repartition(8).write.parquet(path)
    # simulate a crash between the two swap renames: data sits in
    # ._compact_old, live path is gone
    os.rename(path, path + "._compact_old")
    stats = compact_files(spark, path, target_bytes=1 << 30, order_by=["id"])
    assert stats["files_before"] == 8
    assert spark.read.parquet(path).count() == 1_000


def test_compact_files_refuses_partitioned_layout(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from slowfast_feature_extractor_spark.sources.sinks import compact_files

    path = str(tmp_path / "hive")
    spark.range(100).withColumn("k", F.col("id") % 3).write.partitionBy(
        "k"
    ).parquet(path)
    with pytest.raises(NotImplementedError):
        compact_files(spark, path)
    # and the refused table is untouched
    assert spark.read.parquet(path).count() == 100
