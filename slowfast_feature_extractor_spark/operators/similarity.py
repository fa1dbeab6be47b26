"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the corpus — one scan, no shuffle of the corpus, then
a per-query top-k (partial top-k per partition via the window over the
query key). The scale path is sign-LSH bucketing: corpus and queries are
hashed into buckets by the sign pattern of selected dimensions
(axis-aligned random hyperplanes), and only same-bucket pairs are
scored — O(n·q/2^bits) comparisons instead of O(n·q).

Cosine is the sequential F.aggregate fold from functions.vector, so
scores are bit-reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from slowfast_feature_extractor_spark.functions.vector import cosine_similarity


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. Output:
    (query_id, neighbor_id, rank, sim) — sim rounded 6dp; ties broken by
    ascending neighbor id (deterministic)."""
    joined = corpus.crossJoin(F.broadcast(queries))
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.withColumn(
        "sim", F.round(cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "rank",
            "sim",
        )
    )


def sign_bucket(vec_col, bits: int = 4):
    """LSH bucket id from the sign of the first ``bits`` dimensions
    (axis-aligned hyperplanes — deterministic and portable; swap in a
    seeded random-projection matrix for production recall)."""
    b = None
    for j in range(bits):
        t = F.when(F.element_at(vec_col, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        b = t if b is None else b + t
    return b


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: score only same-sign-bucket pairs. Same output
    schema as knn_bruteforce (rank is within-bucket)."""
    c = corpus.withColumn("bucket", sign_bucket(F.col(vec_col), bits))
    q = queries.withColumn("bucket", sign_bucket(F.col(query_vec_col), bits))
    joined = c.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.withColumn(
        "sim", F.round(cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "rank",
            "sim",
        )
    )


def embedding_neardup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold (id_a < id_b).

    ``bits=None`` → exact all-pairs (small corpora / verification);
    ``bits=b`` → sign-LSH blocked (scale path; near-dups at ≥0.95 cosine
    almost always share the sign pattern)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if bits is None:
        pairs = a.crossJoin(b)
    else:
        a = a.withColumn("bucket", sign_bucket(F.col("v_a"), bits))
        b = b.withColumn("bucket", sign_bucket(F.col("v_b"), bits))
        pairs = a.join(b, "bucket")
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_similarity(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
