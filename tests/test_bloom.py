"""Broadcast Bloom prefilter (operators/bloom.py): no false negatives,
bounded false positives, oversized-build fallback, and end-to-end
exactness of prefilter + confirm join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.bloom import (
    _might_contain_np,
    bloom_prefilter,
    build_bloom,
)


def test_build_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**60, size=50_000, dtype=np.int64)
    bitset, m, k = build_bloom(members)
    bits = np.frombuffer(bitset, dtype=np.uint8)
    assert _might_contain_np(members, bits, m, k).all()


def test_build_bloom_false_positive_rate():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**60, size=50_000, dtype=np.int64)
    bitset, m, k = build_bloom(members, bits_per_item=16, k=7)
    bits = np.frombuffer(bitset, dtype=np.uint8)
    probes = rng.integers(2**60, 2**62, size=200_000, dtype=np.int64)
    probes = np.setdiff1d(probes, members)
    fp = _might_contain_np(probes, bits, m, k).mean()
    assert fp < 0.005, fp  # 16 bits/item, k=7 → theoretical ~5e-4


def test_build_bloom_sizes_power_of_two():
    for n in (1, 1000, 100_000):
        _, m, _ = build_bloom(np.arange(n, dtype=np.int64))
        assert m & (m - 1) == 0 and m >= 16 * n


@pytest.mark.parametrize("cap,expect_filtered", [(4_000_000, True), (10, False)])
def test_bloom_prefilter_exact_after_confirm(spark, cap, expect_filtered):
    big = spark.range(0, 20_000).select((F.col("id") * 7919).alias("key"))
    small = spark.range(0, 500).select((F.col("id") * 3 * 7919).alias("key"))
    pre = bloom_prefilter(big, "key", small, max_build_rows=cap)
    got = sorted(r.key for r in pre.join(small, "key").collect())
    want = sorted(
        r.key for r in big.join(small, "key").collect()
    )
    assert got == want
    if expect_filtered:
        # the prefilter itself must have dropped ~all non-members
        assert pre.count() < big.count() * 0.05
    else:
        # oversized build side → plain-join fallback, df unchanged
        assert pre is big


def test_bloom_prefilter_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 0)], "id long, key long"
    )
    small = spark.createDataFrame([(100,), (0,)], "key long")
    pre = bloom_prefilter(df, "key", small)
    ids = sorted(r.id for r in pre.join(small, "key").collect())
    assert ids == [1, 3]  # null key never joins; 0 maps like any value
