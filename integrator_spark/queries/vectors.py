"""Similarity search over the embeddings table (SURVEY.md §2.10).

``vec_knn`` is a BASELINE.md headline query: the naive crossJoin plan
measured 26.3 s at sf0.1 — the blocked-matmul plan here produces the
identical result via one broadcast + per-batch BLAS (SURVEY.md §7 G2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.knn import knn_blocked, knn_bruteforce
from ..registry import register

_KNN_ORACLE = """
SELECT a.vec_id,
       b.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
         AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id <> b.vec_id
QUALIFY row_number() OVER (
    PARTITION BY a.vec_id
    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) DESC,
             b.vec_id) = 1
"""


@register("vec_knn", oracle=_KNN_ORACLE, tags=("vector", "knn"))
def vec_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-1 neighbor per vector — broadcast blocked-matmul
    plan (Arrow batches × numpy float64 BLAS), deterministic smallest-id
    tie-break."""
    e = load_table(spark, sf_dir, "embeddings")
    return knn_blocked(e, k=1)


@register("vec_knn_bruteforce", oracle=_KNN_ORACLE, tags=("vector", "knn"))
def vec_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical operator as vec_knn through the pure-DataFrame
    crossJoin + HOF-cosine plan — the O(n²)-shuffle reference
    implementation kept for plan comparison."""
    e = load_table(spark, sf_dir, "embeddings")
    return knn_bruteforce(e, k=1)


@register("vec_ann_lsh", oracle=None, tags=("vector", "knn", "approx"))
def vec_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH bucketing
    (BucketedRandomProjectionLSH on L2-normalized vectors, where
    euclidean distance is monotone in cosine). Rows-only: approximate
    recall is engine-specific. This is the 100 TB path once the
    candidate matrix no longer broadcasts."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", array_to_vector("embedding").alias("raw"))
    normed = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(vecs)
    lsh = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      bucketLength=0.75, numHashTables=4,
                                      seed=42)
    model = lsh.fit(normed)
    # 1.06 in L2 over unit vectors == cosine ~0.44.
    pairs = model.approxSimilarityJoin(normed, normed, 1.06, distCol="l2_dist")
    return (pairs
            .filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
            .select(F.col("datasetA.vec_id").alias("vec_id"),
                    F.col("datasetB.vec_id").alias("neighbor_id"),
                    F.round(F.lit(1.0) - F.col("l2_dist") * F.col("l2_dist") / 2, 6)
                     .alias("approx_cos"))
            .orderBy("vec_id", F.col("approx_cos").desc(), "neighbor_id"))


@register("vec_knn_twosided", oracle=_KNN_ORACLE, tags=("vector", "knn"))
def vec_knn_twosided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact kNN through the two-sided blocked plan (cogrouped
    block-pair matmuls + segmented top-k reduce) — the strategy that
    remains exact when NEITHER side fits an executor's memory."""
    from ..operators.knn import knn_blocked_twosided
    e = load_table(spark, sf_dir, "embeddings")
    return knn_blocked_twosided(e, k=1, n_blocks=4)


_KNN5_ORACLE = """
SELECT a.vec_id,
       b.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
         AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id <> b.vec_id
QUALIFY row_number() OVER (
    PARTITION BY a.vec_id
    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) DESC,
             b.vec_id) <= 5
"""


@register("vec_knn5", oracle=_KNN5_ORACLE, tags=("vector", "knn"))
def vec_knn5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors per vector through the broadcast blocked plan —
    exercises the k>1 partial-sort branch of the operator against the
    oracle (vec_knn covers k=1)."""
    from ..operators.knn import knn_blocked
    e = load_table(spark, sf_dir, "embeddings")
    return knn_blocked(e, k=5)
