"""Broadcast Bloom prefilter for membership joins — the BFF/Dolma-style
decontamination pattern.

At 100 TB the expensive side of a decontamination / skip-if-done
membership join is the corpus: shuffling ~10^12 hashed shingles against
a benchmark set that fits in executor memory is pure network cost. The
scale-correct plan is:

1. materialize the SMALL side (benchmark shingle hashes) once, with a
   hard row cap so an oversized build side degrades to the plain join
   instead of a driver OOM (same guard discipline as
   ``knn_bruteforce_blocked``, ``operators/similarity.py``);
2. build a Bloom filter bitset over it on the driver (numpy, one pass);
3. broadcast the bitset via ``SparkContext.broadcast`` — shipped once
   per executor, NOT pickled into every task closure (~19 MiB covers
   10^7 items at 16 bits/item);
4. drop non-members map-side with a vectorized Arrow-batch probe — the
   ~99% of corpus shingles that match nothing never reach a shuffle;
5. the caller confirms survivors with the exact semi/inner join, which
   kills the Bloom's false positives, so downstream results are
   bit-identical to the unfiltered join (and the DuckDB oracle).

Probe scheme: Kirsch–Mitzenmacher double hashing over the caller's
int64 key (already avalanche-mixed md5/xxhash bits everywhere in this
engine), ``idx_i = (h1 + i * h2) mod m`` with ``m`` a power of two, so
membership is k dependent-free masked adds — fully vectorizable.

Reference analog: the skip-if-done ledger membership check
(reference/extract_feature.py's processed-video skip list), generalized
to corpus-scale n-gram decontamination.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / phi


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — NONLINEAR avalanche. Double hashing with
    h1/h2 affine in the key collapses: (1 + i·c) mod 2^p can carry a
    2^j factor for some probe i, shrinking that probe's image to
    m/2^j positions and blowing the FP rate ~100× (measured). The
    xor-shift-multiply rounds break the affine structure."""
    v = v + _GOLDEN
    v ^= v >> np.uint64(30)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(27)
    v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    return v


def _probe_indices(vals: np.ndarray, i: int, m: int) -> np.ndarray:
    """i-th Kirsch–Mitzenmacher probe index for each value (m = 2^p)."""
    v = vals.astype(np.uint64, copy=False)
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ _GOLDEN) | np.uint64(1)  # odd => full period mod 2^p
    return (h1 + np.uint64(i) * h2) & np.uint64(m - 1)


def build_bloom(
    values: np.ndarray, bits_per_item: int = 16, k: int = 7
) -> tuple[bytes, int, int]:
    """One-pass Bloom bitset over int64 keys.

    Returns ``(bitset_bytes, m, k)`` with ``m`` rounded up to a power
    of two (so probes are masked adds, no modulo). 16 bits/item at k=7
    gives a false-positive rate ~5e-4 — the confirm join removes even
    those, so the rate only tunes how much prefilter selectivity is
    kept, never correctness.
    """
    n = max(1, len(values))
    m = 1 << max(10, math.ceil(math.log2(n * bits_per_item)))
    bits = np.zeros(m >> 3, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = _probe_indices(np.asarray(values), i, m)
            np.bitwise_or.at(
                bits, (idx >> np.uint64(3)).astype(np.int64),
                (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
            )
    return bits.tobytes(), m, k


def _might_contain_np(vals: np.ndarray, bits: np.ndarray, m: int, k: int) -> np.ndarray:
    ok = np.ones(len(vals), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = _probe_indices(vals, i, m)
            byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
            ok &= ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
    return ok


def bloom_prefilter(
    df: DataFrame,
    key: str | Column,
    build: DataFrame,
    *,
    bits_per_item: int = 16,
    k: int = 7,
    max_build_rows: int = 4_000_000,
) -> DataFrame:
    """Filter ``df`` to rows whose int64 ``key`` MIGHT be in ``build``'s
    single int64 column — a strict superset of the true members, meant
    to sit in front of the exact confirm join.

    The build side is materialized with ``limit(max_build_rows + 1)``
    — one bounded job, never an unbounded ``collect`` — and when it
    exceeds the cap the function returns ``df`` unchanged (plan falls
    back to the plain join, which Catalyst/AQE still broadcasts or
    sort-merges as appropriate). Caller MUST keep the exact join after
    this filter; the prefilter alone admits false positives.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    pdf = build.limit(max_build_rows + 1).toPandas()
    if len(pdf) > max_build_rows:
        return df  # oversized build side: plain-join fallback, no bloom
    vals = pdf[pdf.columns[0]].to_numpy(dtype=np.int64, na_value=0)
    bitset, m, k = build_bloom(vals, bits_per_item=bits_per_item, k=k)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((bitset, m, k))

    @F.pandas_udf("boolean")
    def _might_contain(s):  # type: ignore[no-untyped-def]
        bitset, m, k = bc.value
        bits = np.frombuffer(bitset, dtype=np.uint8)
        out = _might_contain_np(
            s.to_numpy(dtype=np.int64, na_value=0), bits, m, k
        )
        import pandas as pd

        return pd.Series(out)

    return df.filter(_might_contain(key_col))
