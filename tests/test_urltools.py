"""URL canonicalization + corpus-split operators (web-pipeline r4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions import urltools as UT


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"]
        for r in df.select(UT.canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            # case + www + default port + trailing slash + fragment
            "HTTP://WWW.Ex.COM:80/A/b/#frag",
            "https://ex.com:443/x",
            # non-default port survives
            "https://ex.com:8443/x",
            # tracking params dropped, rest sorted; empty query elided
            "https://ex.com/p?utm_source=a&id=9&b=2&ref=rss",
            "https://ex.com/p?utm_campaign=x",
            # bare host -> '/'
            "https://ex.com",
            "https://ex.com/?gclid=1&fbclid=2",
        ],
    )
    assert got == [
        "http://ex.com/A/b",
        "https://ex.com/x",
        "https://ex.com:8443/x",
        "https://ex.com/p?b=2&id=9",
        "https://ex.com/p",
        "https://ex.com/",
        "https://ex.com/",
    ]


def test_synth_url_roundtrips_to_one_key_per_doc(spark):
    # messy variants of the same doc collapse: the canonical url is a
    # pure function of (doc_id, source) with all noise removed
    df = spark.createDataFrame(
        [(i, "src0") for i in range(60)], ["doc_id", "source"]
    ).select(
        "doc_id",
        UT.synth_url(F.col("doc_id"), F.col("source")).alias("url"),
    )
    out = df.select(
        "doc_id", UT.canonicalize_url(F.col("url")).alias("c")
    ).collect()
    for r in out:
        c = r["c"]
        assert c.startswith("http://src0.example.com/Archive/") or c.startswith(
            "https://src0.example.com/Archive/"
        ), c
        assert "utm_" not in c and "#" not in c and "ref=" not in c
        assert ":80" not in c and ":443" not in c
        assert not c.endswith("/") or c.endswith(".com/")
        # id param (when present) survived the filter
        if r["doc_id"] % 7 != 0:
            assert f"?id={r['doc_id'] % 97}" in c, c


def test_hash_split_is_deterministic_and_leakage_safe(spark):
    from conftest import SF_TINY
    from slowfast_feature_extractor_spark.plans.queries import q_hash_split

    a = {tuple(r) for r in q_hash_split(spark, SF_TINY).collect()}
    b = {tuple(r) for r in q_hash_split(spark, SF_TINY).collect()}
    assert a == b  # same split every run — no rand()
    splits = {r[0] for r in a}
    assert splits <= {"train", "validation", "test"}
    n = {s: sum(r[2] for r in a if r[0] == s) for s in splits}
    total = sum(n.values())
    assert 0.85 < n.get("train", 0) / total < 0.95


def test_stratified_sample_topk(spark):
    from conftest import SF_TINY
    from slowfast_feature_extractor_spark.plans.queries import q_stratified_sample

    rows = q_stratified_sample(spark, SF_TINY).collect()
    per_src: dict[str, list[int]] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["rk"])
    for src, rks in per_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), src
        assert len(rks) <= 16
