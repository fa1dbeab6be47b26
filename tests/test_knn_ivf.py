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


def test_ivfpq_exact_on_clustered_fixture(spark):
    """PQ is lossy in general, but when the corpus IS the codebook
    domain — every vector equals one of the 16 seed vectors plus tiny
    jitter in one subspace — ADC must rank same-cluster vectors first.
    Also checks determinism and the (query_id, rank) key shape."""
    import numpy as np

    from slowfast_feature_extractor_spark.operators.similarity import (
        knn_ivfpq,
    )

    rng = np.random.default_rng(11)
    seeds = rng.normal(size=(16, 64)) * 10.0
    rows = []
    for i in range(160):
        base = seeds[i % 16].copy()
        base[(i // 16) % 64] += 0.001 * (i + 1)  # sub-quantization jitter
        rows.append((i, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = knn_ivfpq(emb, q, k=5, m_sub=8, n_codes=16).collect()
    assert len(out) == 20
    for r in out:
        # neighbors of query i must come from cluster i mod 16
        assert r.neighbor_id % 16 == r.query_id % 16, r
        assert r.neighbor_id != r.query_id
    again = knn_ivfpq(emb, q, k=5, m_sub=8, n_codes=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_ivfpq_recall_floor_on_real_fixture(spark):
    """On the generic fixture PQ recall vs exact L2 is modest — random
    isotropic 64-dim vectors against 16 seed codewords are PQ's worst
    case (no cluster structure to exploit) — but top-5 ADC must still
    crush the random baseline (5/499 ~ 0.01): measured 0.22 on the
    seeded fixture, floor set at 0.15."""
    import numpy as np

    from slowfast_feature_extractor_spark.operators.similarity import (
        knn_ivfpq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _queries(emb)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivfpq(emb, q, k=5, m_sub=8, n_codes=16).collect()
    }
    # exact squared-L2 top-5 (PQ's native metric), computed locally
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    exact = set()
    for qid in range(10):
        qv = mat[ids == qid][0]
        d2 = ((mat - qv) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d2, kind="stable") if ids[i] != qid]
        exact |= {(qid, int(ids[i])) for i in order[:5]}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"PQ recall vs exact L2 too low: {recall}"
