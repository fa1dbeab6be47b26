"""IVF ANN: determinism and recall vs the exact blocked top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators.similarity import (
    knn_bruteforce_blocked,
    knn_ivf,
)


def _queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_recall_and_determinism(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _queries(emb)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce_blocked(emb, q, k=5).collect()
    }
    a = knn_ivf(emb, q, k=5, n_cells=8, n_probe=4).collect()
    b = knn_ivf(emb, q, k=5, n_cells=8, n_probe=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded => stable
    approx = {(r.query_id, r.neighbor_id) for r in a}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # probing all cells must recover the exact result
    full = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf(emb, q, k=5, n_cells=8, n_probe=8).collect()
    }
    assert full == exact


def test_ivf_sampled_fit_fullprobe_still_exact(spark):
    """Quantizer fitted on a seeded sample: cell boundaries move, but
    probing every cell still recovers the exact top-k (assignment covers
    all rows regardless of where the quantizer trained)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _queries(emb)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce_blocked(emb, q, k=5).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf(emb, q, k=5, n_cells=8, n_probe=8,
                         fit_fraction=0.3).collect()
    }
    assert full == exact
