"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the verifiable baseline (JVM-side
zip_with/aggregate dot products — no Python); IVF assignment (nearest of
K centroids) is the scale path's partition step: at 100 TB the corpus is
bucketed by centroid so a query probes only its nearest buckets instead
of the full table. Both have exact DuckDB oracles (list_dot_product)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 10
N_CENTROIDS = 8
QUERY_VEC_ID = 0


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k of every vector vs the query vector
    (vec_id = QUERY_VEC_ID), excluding the query itself."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding")
    )
    scored = e.where(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(q))
    return (
        scored.select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


_SQL_TOPK = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 4)
         AS cos
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cos DESC, vec_id
LIMIT {TOP_K}
"""


def _q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (centroids = vec_id < N_CENTROIDS, a deterministic
    codebook). Broadcast the tiny codebook; one narrow pass over the
    corpus — this is the partitioning that makes ANN scale."""
    e = _emb(spark, sf_dir)
    cents = e.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_embedding"),
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cos", cosine(F.col("embedding"), F.col("c_embedding"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", F.round("cos", 4).alias("cos"))
    )


_SQL_IVF = f"""
WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
           FROM embeddings WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(c.cv AS DOUBLE[]), CAST(c.cv AS DOUBLE[])))) AS cos
  FROM embeddings e, c)
SELECT vec_id, centroid_id, round(cos, 4) AS cos
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos DESC, centroid_id) AS rn
      FROM scored)
WHERE rn = 1
"""


def ivf_search(
    spark: SparkSession, sf_dir: str, query_vec_id: int = QUERY_VEC_ID, n_probe: int = 2
) -> DataFrame:
    """Full IVF search path (assign + probe nearest n_probe buckets).
    Demonstrates the scale pattern; top-k correctness vs brute force is
    asserted in tests (recall, not equality — IVF is approximate)."""
    assign = _q_ivf_assign(spark, sf_dir)
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    cents = e.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_embedding")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("cos", cosine(F.col("c_embedding"), F.col("q_embedding")))
        .orderBy(F.col("cos").desc(), F.col("centroid_id"))
        .limit(n_probe)
        .select("centroid_id")
    )
    bucketed = e.join(assign.select("vec_id", "centroid_id"), "vec_id").join(
        F.broadcast(probe), "centroid_id"
    )
    return (
        bucketed.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sim_embedding_topk": _q_embedding_topk,
        "sim_ivf_assign": _q_ivf_assign,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "sim_embedding_topk": _SQL_TOPK,
        "sim_ivf_assign": _SQL_IVF,
    }
