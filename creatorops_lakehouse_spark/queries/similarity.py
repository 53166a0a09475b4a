"""Similarity-search queries over the driver ``embeddings`` table.

Brute-force cosine top-k is oracle-checked against a DuckDB implementation
that mirrors the exact fold order (unnest-with-ordinality join + ordered
SUM is avoided — instead we compare via list_cosine_similarity and round to
a tolerance-absorbing precision, with a unique-id tiebreak on ranking).
LSH ANN and embedding near-dup use engine-specific plane signatures →
rows-only checks, with recall pinned by pytest against the brute-force
baseline (tests/test_similarity.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_neardup_pairs,
)
from creatorops_lakehouse_spark.queries import load, query

N_QUERIES = 8
TOP_K = 5


@query(
    "emb_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.q_vec, c.embedding) AS sim
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(sim, 4) AS cos_sim_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ROUND(sim, 4) DESC, neighbor_id) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim_r, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def emb_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{TOP_K} for the first {N_QUERIES} vectors.

    Ranking happens on ROUND(sim, 4) with neighbor_id tiebreak so both
    engines resolve near-equal similarities identically (their double
    summation orders differ at ~1e-16).
    """
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    from pyspark.sql import Window

    from creatorops_lakehouse_spark.operators.similarity import cosine

    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim_r", "rank")
    )


@query("emb_ann_lsh_topk")  # plane signatures are engine-specific → rows-only
def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (random hyperplanes, exact rerank in
    bucket) — the 100 TB path where |q|×|corpus| brute force is unaffordable."""
    emb = load(spark, sf_dir, "embeddings")
    return ann_lsh_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=TOP_K, n_planes=6
    )


@query("emb_neardup_pairs")  # rows-only (hyperplane buckets)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.9), LSH candidates
    verified exactly."""
    return embedding_neardup_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.9, n_planes=4
    )


@query(
    "emb_label_norm_stats",
    oracle="""
    WITH elems AS (
        SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    )
    SELECT label,
           COUNT(DISTINCT vec_id) AS n_vecs,
           ROUND(SUM(v * v), 2) AS sum_sq,
           ROUND(MAX(abs(v)), 4) AS max_abs
    FROM elems
    GROUP BY 1
    """,
)
def emb_label_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics via element explode + hash aggregate —
    the distributed reduce pattern under IVF coarse quantizer training.
    sum_sq rounds at 2 decimals: cross-engine summation-order error
    (~1e-12) is 10 orders below the rounding grain, and float data makes
    exact half-boundary ties measure-zero."""
    elems = load(spark, sf_dir, "embeddings").select(
        "label", "vec_id", F.explode(F.col("embedding").cast("array<double>")).alias("v")
    )
    return elems.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        F.round(F.sum(F.col("v") * F.col("v")), 2).alias("sum_sq"),
        F.round(F.max(F.abs("v")), 4).alias("max_abs"),
    )


@query("emb_ann_ivf_topk")  # centroids from iterative training → rows-only
def emb_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: Lloyd-trained coarse quantizer partitions the corpus; each
    query probes its 2 nearest cells and exact-reranks inside them — the
    inverted-file scale path (queries touch nprobe/k of the corpus).
    Recall vs brute force pinned in tests/test_similarity.py."""
    from creatorops_lakehouse_spark.operators.similarity import (
        ann_ivf_topk,
        train_ivf_centroids,
    )

    emb = load(spark, sf_dir, "embeddings").persist()
    centroids = train_ivf_centroids(emb, k=8, iters=2, dim=64, sample_mod=5)
    return ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), centroids, k=TOP_K, nprobe=2
    )
