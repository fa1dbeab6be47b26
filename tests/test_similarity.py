"""Similarity-search semantics on crafted vectors with known geometry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.operators import similarity as SIM

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
    (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite to 0
    (4, [0.95, 0.05, 0.0, 0.0]),  # even closer to 0
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, schema="vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_knn_bruteforce_order(emb, queries):
    out = SIM.knn_bruteforce(emb, queries, k=4).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [4, 1, 2, 3]
    assert out[0].sim > out[1].sim > out[2].sim > out[3].sim
    assert out[2].sim == 0.0 and out[3].sim == -1.0


def test_knn_lsh_prunes_opposite_bucket(emb, queries):
    out = SIM.knn_lsh(emb, queries, k=4, bits=1).collect()
    ids = {r.neighbor_id for r in out}
    assert 3 not in ids  # negative first dim -> different sign bucket
    assert {4, 1} <= ids


def test_embedding_neardup(emb):
    pairs = {(r.id_a, r.id_b): r.sim for r in
             SIM.embedding_neardup(emb, threshold=0.95).collect()}
    assert (0, 4) in pairs and (0, 1) in pairs and (1, 4) in pairs
    assert all(s >= 0.95 for s in pairs.values())
    assert not any(2 in p or 3 in p for p in pairs)


def test_embedding_neardup_blocked_exact_parity(emb):
    """Distributed block-pair matmul == exact pair join, with the corpus
    forced across multiple blocks (every block-pair branch exercised) and
    no driver collect of the input anywhere in the plan."""
    want = {(r.id_a, r.id_b): r.sim for r in
            SIM.embedding_neardup(emb, threshold=-1.1).collect()}
    got = {(r.id_a, r.id_b): r.sim for r in
           SIM.embedding_neardup_blocked(emb, threshold=-1.1, n_blocks=3).collect()}
    assert got == want and len(got) == 10  # all C(5,2) pairs scored identically


def test_embedding_neardup_blocked_lsh_restricts_to_sign_bucket(emb):
    out = {(r.id_a, r.id_b) for r in
           SIM.embedding_neardup_blocked(emb, threshold=-1.1, bits=1, n_blocks=2).collect()}
    # vec 3 has negative first dim -> its pairs with 0/1/4 cross buckets
    assert (0, 3) not in out and (1, 3) not in out
    assert (0, 4) in out and (0, 1) in out
