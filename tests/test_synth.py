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
