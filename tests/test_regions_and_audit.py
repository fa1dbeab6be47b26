"""Content-region crop (P10), host-dim broadcast join (J1/P4), leakage
audit, and property-based as-of/window checks over random series."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions.extraction import extract_text
from slowfast_feature_extractor_spark.operators.audit import (
    assert_no_leakage,
    leakage_violations,
)
from slowfast_feature_extractor_spark.operators.regions import (
    apply_content_regions,
    join_host_meta,
)
from slowfast_feature_extractor_spark.operators.windows import dual_rate_features
from slowfast_feature_extractor_spark.sources.pages import (
    gen_host_meta,
    gen_page_regions,
)


def test_content_region_crop(spark, pages_pd, pages_df):
    regions_pd = gen_page_regions(pages_pd)
    regions = spark.createDataFrame(regions_pd)
    out = apply_content_regions(pages_df, regions)
    got = out.select("url", "warc_ts", "html", "html_region").toPandas()
    reg = {(r.url, r.warc_ts): (r.content_start, r.content_end) for r in regions_pd.itertuples()}
    n_cropped = 0
    for r in got.itertuples():
        key = (r.url, r.warc_ts.to_pydatetime())
        if key in reg:
            s, e = reg[key]
            assert bytes(r.html_region) == bytes(r.html)[s:e]
            n_cropped += 1
        else:
            assert bytes(r.html_region) == bytes(r.html)  # full passthrough
    assert 0 < n_cropped < len(got)  # side table deliberately incomplete
    # cropped region still extractable (malformed fragments are fine)
    assert extract_text(bytes(got.iloc[0]["html_region"])) is not None


def test_host_meta_broadcast_join(spark, pages_df):
    meta = spark.createDataFrame(gen_host_meta(n_hosts=6))
    out = join_host_meta(pages_df, meta)
    assert out.count() == pages_df.count()  # every host resolves
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    tiered = join_host_meta(pages_df, meta, keep_tier=1)
    assert 0 < tiered.count() < pages_df.count()
    assert tiered.filter(F.col("crawl_tier") != 1).count() == 0


def test_leakage_audit_catches_violation(spark):
    rows = [
        ("u", datetime(2024, 1, 1, 1), datetime(2024, 1, 1, 0)),   # ok
        ("u", datetime(2024, 1, 1, 2), datetime(2024, 1, 1, 2)),   # equal: leak
        ("u", datetime(2024, 1, 1, 3), datetime(2024, 1, 1, 4)),   # future: leak
        ("u", datetime(2024, 1, 1, 4), None),                       # no history
    ]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, max_input_ts timestamp"
    )
    assert leakage_violations(df).count() == 2
    with pytest.raises(AssertionError, match="temporal leakage"):
        assert_no_leakage(df)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 10_000), st.integers(0, 100)),
        min_size=1,
        max_size=60,
    )
)
def test_dual_rate_never_leaks_property(spark_for_hypothesis, series):
    """Property (SURVEY §5 #3): for ANY series shape, strict dual-rate
    windows satisfy max_input_ts < ts and cnt == min(k, n_earlier)."""
    spark = spark_for_hypothesis
    base = datetime(2024, 1, 1)
    rows, seen = [], set()
    for ent, off_s, val in series:
        ts = base + timedelta(seconds=off_s)
        if (ent, ts) in seen:  # keep (entity, ts) unique for the oracle
            continue
        seen.add((ent, ts))
        rows.append((f"e{ent}", ts, float(val)))
    df = spark.createDataFrame(rows, schema="url string, warc_ts timestamp, value double")
    feats = dual_rate_features(df, fast_rows=3, slow_rows=5, strict=True)
    assert_no_leakage(feats)
    got = feats.toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    for url, g in got.groupby("url"):
        g = g.reset_index(drop=True)
        for i, r in g.iterrows():
            assert r["fast_cnt"] == min(3, i)
            assert r["slow_cnt"] == min(5, i)
            assert r["n_hist_rows"] == i




def test_host_of_handles_pathless_case_and_port(spark):
    from slowfast_feature_extractor_spark.operators.regions import host_of

    df = spark.createDataFrame(
        [
            ("https://example.com",),          # no trailing slash
            ("HTTP://Example.com/x",),         # uppercase scheme
            ("https://example.com:8443/p",),   # port
            ("https://example.com/a/b?q=1",),  # normal
        ],
        "url string",
    )
    got = [r[0] for r in df.select(host_of(F.col("url"))).collect()]
    assert got == ["example.com", "Example.com", "example.com", "example.com"]


def test_content_regions_half_null_range_passes_through(spark):
    import datetime as dt

    from slowfast_feature_extractor_spark.operators.regions import (
        apply_content_regions,
    )

    ts = dt.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("u", ts, bytearray(b"0123456789"))], "url string, warc_ts timestamp, html binary"
    )
    regions = spark.createDataFrame(
        [("u", ts, 2, None)],
        "url string, warc_ts timestamp, content_start int, content_end int",
    )
    out = apply_content_regions(pages, regions).collect()
    # a half-null range must keep the FULL document, not nullify it
    assert bytes(out[0]["html_region"]) == b"0123456789"


def test_join_host_meta_keeps_unmatched_hosts(spark):
    from slowfast_feature_extractor_spark.operators.regions import join_host_meta

    pages = spark.createDataFrame(
        [("https://known.com/a",), ("https://new-host.com/b",)], "url string"
    )
    meta = spark.createDataFrame(
        [("known.com", 1)], "host string, crawl_tier int"
    )
    out = {r["host"]: r["crawl_tier"] for r in join_host_meta(pages, meta).collect()}
    # enrichment tolerates a host missing from the dimension
    assert out == {"known.com": 1, "new-host.com": None}
    # with the tier predicate the unmatched row drops (old inner shape)
    assert join_host_meta(pages, meta, keep_tier=1).count() == 1
