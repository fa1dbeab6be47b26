"""Spark-native synthetic generators: determinism, monotone timestamps,
extractable HTML."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions.extraction import extract_text
from slowfast_feature_extractor_spark.sources.synth import (
    synth_embeddings,
    synth_events,
    synth_pages,
)


def test_pages_deterministic_and_monotone(spark):
    a = synth_pages(spark, n_urls=50, revisits=6).orderBy("url", "warc_ts").collect()
    b = synth_pages(spark, n_urls=50, revisits=6).orderBy("url", "warc_ts").collect()
    assert a == b  # same args ⇒ identical table
    assert len(a) == 300
    last = {}
    for r in a:
        if r["url"] in last:
            assert r["warc_ts"] > last[r["url"]], "warc_ts must be monotone per url"
        last[r["url"]] = r["warc_ts"]
    t = extract_text(bytes(a[0]["html"]))
    assert t and "&amp;" not in t and "<p>" not in t  # tags gone, entities decoded
    assert " & " in t and "<end>" in t  # decoded entity text survives


def test_events_shape(spark):
    ev = synth_events(spark, n_users=20, events_per_user=10)
    assert ev.count() == 200
    r = ev.agg(F.countDistinct("event_type"), F.min("value"), F.max("user_id")).collect()[0]
    assert r[0] == 5 and r[1] >= 0 and r[2] == 19
    cents = ev.filter(F.round(F.col("value") * 100).cast("long") != F.col("value_cents"))
    assert cents.count() == 0


def test_embeddings_shape(spark):
    e = synth_embeddings(spark, n=100, dim=16)
    rows = e.collect()
    assert len(rows) == 100 and all(len(r["embedding"]) == 16 for r in rows)
    flat = [x for r in rows for x in r["embedding"]]
    assert min(flat) >= -1.0 and max(flat) <= 1.0


def test_bytes_conf_suffix_parsing():
    """ADVICE r3: Spark accepts both '128m' and '128mb' spellings
    (JavaUtils.byteStringAs); the split estimator must parse both or it
    silently falls back to the eager partition probe."""
    from slowfast_feature_extractor_spark.sources.tables import _bytes_conf

    class _Conf(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    for raw, want in (
        ("134217728", 134217728),
        ("128m", 128 * 1024**2),
        ("128mb", 128 * 1024**2),
        ("1gb", 1024**3),
        ("64KB", 64 * 1024),
        ("2tb", 2 * 1024**4),
        ("512b", 512),
        ("4194304b", 4194304),
    ):
        assert _bytes_conf(_Conf(k=raw), "k", 0) == want, raw
