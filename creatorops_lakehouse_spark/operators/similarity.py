"""Similarity search over embedding columns (array<float>).

Two tiers:
- brute-force cosine top-k — exact baseline; query set broadcast against the
  corpus, dot products as zip_with/aggregate expressions (JVM-side), per-query
  top-k via ranking window. Cost O(|queries| × |corpus| × dim) but fully
  distributed and shuffle-light (one window shuffle on query_id).
- LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bit signatures
  bucket the corpus; queries probe only their bucket (plus optional
  multi-probe neighbors), then exact-rerank inside the bucket. Corpus pass is
  one projection; the probe join is an equi-join on bucket id.

Embeddings stay float32 on disk; math is done in double after a one-time
cast (exact widening, deterministic).
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


#: cosine_topk refuses to evaluate more pairs than this unless exact=True —
#: the broadcast nested-loop is the EXACT BASELINE, never the default route
#: for corpus×corpus work (ann_lsh_topk / ann_ivf_topk are the scale paths).
MAX_BRUTEFORCE_PAIRS = 100_000_000


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    max_pairs: int = MAX_BRUTEFORCE_PAIRS,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows
    (self-matches excluded). Queries are broadcast — the corpus is never
    replicated or shuffled for the similarity computation itself.

    Guardrail: this is O(|queries| × |corpus| × dim). Unless ``exact=True``
    is passed, the call counts both sides and refuses when the pair count
    exceeds ``max_pairs`` — a corpus-scale self-join through this operator
    is a plan bug, not a slow query; route it through ann_lsh_topk /
    ann_ivf_topk (candidates + exact rerank) instead."""
    if not exact:
        n_q = queries.count()
        n_c = corpus.count()
        if n_q * n_c > max_pairs:
            raise ValueError(
                f"cosine_topk would evaluate {n_q} × {n_c} = {n_q * n_c:,} "
                f"vector pairs (> max_pairs={max_pairs:,}). This operator is "
                "the exact brute-force baseline; use ann_lsh_topk/ann_ivf_topk "
                "for large inputs, or pass exact=True to force it."
            )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free random hyperplanes (driver-side, tiny)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def auto_planes(n_rows: int, target_bucket: int = 500, lo: int = 4, hi: int = 24) -> int:
    """Hyperplane count sized to the corpus: ~log2(n / target_bucket).

    A FIXED plane count is a scale bug: bucket count stays constant while
    occupancy grows linearly, so within-bucket candidate pairs grow
    QUADRATICALLY with the corpus (measured in tools/scale_rehearsal.py —
    17.6× wall time for 10× data at n_planes=4; 9× faster at 8 planes with
    near-identical true-pair recall). Growing planes with log(n) keeps
    expected bucket occupancy, and therefore per-bucket verify cost,
    constant."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(n_rows / target_bucket, 2.0)))))


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id: bit p set iff vec · plane_p > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec, plane_col) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-bucket join + exact rerank
    inside the bucket. Recall rises with fewer planes (bigger buckets) and
    can be boosted with multi-probe; this is the 100 TB path where
    brute-force |q|×|corpus| is not affordable.

    ``n_planes=None`` sizes the plane count to the corpus (see
    :func:`auto_planes`) — the scale-safe default."""
    if n_planes is None:
        n_planes = auto_planes(corpus.count())
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold), candidates
    from hyperplane buckets (near-identical vectors collide with high
    probability), verified exactly.

    ``n_planes=None`` sizes the plane count to the corpus (see
    :func:`auto_planes`) — the scale-safe default."""
    if n_planes is None:
        n_planes = auto_planes(df.count())
    planes = random_hyperplanes(dim, n_planes, seed)
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    a = sig.select("bucket", F.col("doc_id").alias("a_id"), F.col("vec").alias("a_vec"))
    b = sig.select("bucket", F.col("doc_id").alias("b_id"), F.col("vec").alias("b_vec"))
    return (
        a.join(b, on="bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            cosine(F.col("a_vec"), F.col("b_vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["a_id", "b_id"])
    )


def _nearest_cells_udf(centroids: list[list[float]], nprobe: int = 1):
    """Arrow-batched pandas UDF: nprobe nearest centroid ids per vector.

    Higher-order-function expressions (zip_with/aggregate) are interpreted
    per element in Spark — a k×dim argmin per row built that way costs
    seconds in expression construction and evaluation. One numpy matmul
    per Arrow batch is the documented fast path for similarity math.
    Returns array<int> (length nprobe, nearest first).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # k × d
    c_sq = (C * C).sum(axis=1)  # ‖c‖²

    def _probe(col):
        X = np.asarray(col.tolist(), dtype=np.float64)  # n × d
        # ‖x-c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is row-constant → drop for argmin
        d2 = -2.0 * (X @ C.T) + c_sq
        order = np.argsort(d2, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    # no type hints: `from __future__ import annotations` stringifies them
    # and pyspark's hint inference cannot resolve 'pd.Series' here
    return pandas_udf(_probe, "array<int>")


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest centroid id (vectorized; see _nearest_cells_udf)."""
    return _nearest_cells_udf(centroids, 1)(vec)[0]


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
    dim: int = 64,
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Lloyd k-means as DataFrame aggregations (the IVF coarse quantizer).

    Initialization is deterministic (first k rows by id). Each iteration is
    one assignment projection + one (cluster, dim) hash aggregate; only the
    k×dim centroid matrix ever reaches the driver. ``sample_mod=m`` trains
    on the deterministic 1/m subsample (id % m == 0) — the standard move at
    scale: quantizer quality needs a representative sample, not the corpus.
    """
    vecs = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None and sample_mod > 1:
        vecs = vecs.filter(F.col("_id") % sample_mod == 0)
    vecs = vecs.persist()
    centroids = [
        r.v for r in vecs.orderBy("_id").limit(k).collect()
    ]
    for _ in range(iters):
        assigned = vecs.withColumn("c", _nearest_centroid(F.col("v"), centroids))
        sums = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [list(c) for c in centroids]
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.c, [0.0] * dim)[r.pos] = r.s
            cnt[r.c] = r.n
        for c_id, vals in acc.items():
            new[c_id] = [x / cnt[c_id] for x in vals]
        centroids = new
    return centroids


def _probe_queries(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, q_vec, cell) — one row per (query, probed cell)."""
    q_base = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe = _nearest_cells_udf(centroids, nprobe)
    return q_base.withColumn(
        "cell", F.explode(probe(F.col("q_vec").cast("array<double>")))
    )


def _rerank_topk(sims: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search with inline corpus assignment: each query probes its
    ``nprobe`` nearest cells and exact-reranks inside them.

    This variant recomputes the corpus→cell assignment per call — fine for
    one-shot queries. At 100 TB, build the assignment ONCE with
    :func:`build_ivf_index` and probe it with :func:`ann_ivf_topk_indexed`,
    which prunes the scan to the probed cell partitions."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_centroid(F.col(vec_col).cast("array<double>"), centroids).alias("cell"),
    )
    probed = _probe_queries(queries, centroids, nprobe, id_col, vec_col)
    sims = (
        c.join(F.broadcast(probed), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    return _rerank_topk(sims, k)


def build_ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    spec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign every corpus vector to its nearest centroid and persist the
    assignment as a ``cell``-partitioned table (TableSpec with
    partition_by=("cell",)).

    The 100 TB shape: pay the one Arrow-batched assignment pass at build
    time; every subsequent query batch reads only its nprobe probed cell
    partitions (verified by partition pruning in the scan — see
    tests/test_similarity.py::test_ivf_index_partition_pruning)."""
    from creatorops_lakehouse_spark.sources.tables import write_table

    assert "cell" in spec.partition_by, "IVF index spec must partition by cell"
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        _nearest_centroid(F.col(vec_col).cast("array<double>"), centroids).alias("cell"),
    )
    write_table(assigned, spec, mode="overwrite", dynamic=False)


def ann_ivf_topk_indexed(
    spark,
    spec,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against a persisted cell-partitioned index
    (:func:`build_ivf_index`): probes collect the distinct cell ids of the
    query batch (≤ |queries| × nprobe ints, driver-side tiny) and push them
    into the index scan as a static IN-filter, so partition pruning skips
    every unprobed cell's files before the join."""
    from creatorops_lakehouse_spark.sources.tables import read_table

    probed = _probe_queries(queries, centroids, nprobe, id_col, vec_col).persist()
    cells = [r.cell for r in probed.select("cell").distinct().collect()]
    idx = read_table(spark, spec).filter(F.col("cell").isin(cells))
    sims = (
        idx.join(F.broadcast(probed), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    return _rerank_topk(sims, k)
