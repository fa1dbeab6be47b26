"""Heavy-hitters sketch (operators/sketch.py): exactness vs a naive
groupBy under default AND adversarially tiny Arrow batches, candidate
pruning actually happening, null handling, and param validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.sketch import heavy_hitters


def _zipf_df(spark, n=60_000, n_keys=3_000):
    # key j appears ~ n/(j+1) times (Zipf-ish): few heavy, long tail
    return spark.range(n).select(
        F.concat(
            F.lit("k"),
            F.floor(
                F.pow(F.lit(float(n_keys)), (F.col("id") % 1000) / 1000.0) - 1
            ).cast("long").cast("string"),
        ).alias("k")
    )


def _exact(df, phi):
    n = df.filter(F.col("k").isNotNull()).count()
    rows = (
        df.filter(F.col("k").isNotNull())
        .groupBy("k")
        .count()
        .filter(F.col("count") > n * phi)
        .collect()
    )
    return sorted((r["k"], r["count"]) for r in rows)


def test_heavy_hitters_matches_exact(spark):
    df = _zipf_df(spark)
    got = sorted((r.k, r.cnt) for r in heavy_hitters(df, "k", 0.01).collect())
    assert got == _exact(df, 0.01)
    assert 0 < len(got) < 100  # threshold actually separates head from tail


def test_heavy_hitters_exact_under_tiny_batches(spark):
    """Tiny Arrow batches maximize per-batch pruning loss — the MG
    error bound must still keep every true heavy hitter a candidate."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "97")
    try:
        df = _zipf_df(spark, n=20_000)
        got = sorted((r.k, r.cnt) for r in heavy_hitters(df, "k", 0.02).collect())
        assert got == _exact(df, 0.02)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",)] * 10 + [(None,)] * 90 + [("b",)] * 2, "k string"
    )
    got = {r.k: r.cnt for r in heavy_hitters(df, "k", 0.5).collect()}
    assert got == {"a": 10}  # N=12 non-null; a>6, b=2 fails


def test_heavy_hitters_phi_validation(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    for bad in (0.0, 1.0, -0.2, 3):
        with pytest.raises(ValueError):
            heavy_hitters(df, "k", bad)
