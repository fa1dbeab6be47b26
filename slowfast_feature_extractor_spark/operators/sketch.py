"""Heavy-hitters over an unbounded key domain — sketch-prefiltered,
exact-confirmed.

The naive plan for "keys with frequency > φ·N" is groupBy(key).count()
over every occurrence: at 100 TB of web tokens/URLs that shuffles the
FULL distinct domain (billions of keys, Zipf-skewed) to answer a
question about the few hundred heaviest. The scale-correct plan:

1. **Summarize map-side** (Misra-Gries-shaped): each Arrow batch emits
   its exact key counts MINUS the light tail (count ≤ batch_len·φ/2 is
   dropped). Classic MG error accounting: dropping a per-batch tail of
   ≤ m_i·(φ/2) undercounts any key by at most (φ/2)·N across all
   batches, so every TRUE heavy hitter (f > φ·N > (φ/2)·N) survives in
   at least one batch summary — the candidate set provably contains
   all answers, and its size is O(batches/φ), independent of the
   distinct-key count.
2. **Confirm exactly**: re-count ONLY candidate keys (broadcast
   semi-join on the second scan) and filter by the exact threshold.
   False candidates die here, so the output is bit-identical to the
   naive plan (and the DuckDB oracle) — the sketch tunes shuffle
   volume, never correctness. Same exactness discipline as
   ``bloom_prefilter`` (operators/bloom.py) and
   ``knn_ivf_fullprobe``.

Cost: two map-only scans + a candidate-sized shuffle, vs one scan + a
distinct-domain shuffle. On Zipf-distributed web keys the candidate
set is ~10^4 rows where the domain is ~10^9 — the shuffle disappears.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key: str | Column, phi: float) -> DataFrame:
    """Exact keys of ``df`` with frequency > ``phi`` · total rows,
    as (key, cnt) — computed via batch-summary candidates + exact
    confirm. ``0 < phi < 1``; null keys are ignored (they are not a
    key, mirroring SQL GROUP BY semantics under the oracle's WHERE)."""
    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    key_col = F.col(key) if isinstance(key, str) else key
    keys = df.select(key_col.alias("k")).filter(F.col("k").isNotNull())

    def _summaries(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            vc = pdf["k"].value_counts()
            keep = vc[vc > len(pdf) * (phi / 2.0)]
            yield pd.DataFrame({"k": keep.index, "c": keep.to_numpy()})

    k_type = keys.schema["k"].dataType.simpleString()
    cands = (
        keys.mapInPandas(_summaries, schema=f"k {k_type}, c long")
        .select("k")
        .distinct()
    )
    total = keys.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        keys.join(F.broadcast(cands), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n") * F.lit(phi))
        .select("k", "cnt")
    )
