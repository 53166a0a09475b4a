"""Similarity-search queries over the driver ``embeddings`` table.

Brute-force cosine top-k is oracle-checked against a DuckDB implementation
that mirrors the exact fold order (unnest-with-ordinality join + ordered
SUM is avoided — instead we compare via list_cosine_similarity and round to
a tolerance-absorbing precision, with a unique-id tiebreak on ranking).
Every oracle cosine CASTs the FLOAT[] column to DOUBLE[]: DuckDB's FLOAT[]
overload accumulates in float32 (measured 1.6e-7 off the double value),
which sits only ~3 decades under the 1e-4 rounding grain — a per-value
boundary-flip probability that compounds across rows into a real flake
rate. The DOUBLE[] overload agrees with Spark's double math to ~4e-16.
LSH ANN and embedding near-dup are hash-checked end-to-end since r10:
the registered rows run the REPLAYABLE configuration (md5-derived
integer planes + int64-quantized vectors — the bucket stage is exact
integer arithmetic both engines compute identically), while the
auto-sized Gaussian operators stay the prod default with recall pinned
by the hash-green verdicts and pytest (tests/test_similarity.py).
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
    WITH q AS (SELECT vec_id AS query_id,
                      CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.q_vec,
                                      CAST(c.embedding AS DOUBLE[])) AS sim
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


def _sql_int_buckets(n_planes: int, n_tables: int, tag: str) -> str:
    """Shared CTE chain: md5-derived integer planes + integer-quantized
    vectors → per-table bucket ids, the DuckDB mirror of
    operators/similarity.py::_int_buckets_udf (exact int64 arithmetic in
    both engines, so buckets match bit-for-bit)."""
    return f"""
    qn AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
        FROM embeddings
    ),
    dims AS (SELECT unnest(range(0, 64)) AS d),
    planes AS (
        SELECT t.t, p.p, d.d,
               CAST(('0x' || substr(md5('{tag}:' || CAST(t.t AS VARCHAR)
                    || ':' || CAST(p.p AS VARCHAR)
                    || ':' || CAST(d.d AS VARCHAR)), 1, 4)) AS BIGINT)
                   - 32768 AS w
        FROM (SELECT unnest(range(0, {n_tables})) AS t) t,
             (SELECT unnest(range(0, {n_planes})) AS p) p,
             dims d
    ),
    posts AS (SELECT vec_id, d.d AS d, q[d.d + 1] AS qd FROM qn, dims d),
    dots AS (
        SELECT po.vec_id, pl.t, pl.p, SUM(pl.w * po.qd) AS dot
        FROM posts po JOIN planes pl ON po.d = pl.d
        GROUP BY 1, 2, 3
    ),
    buckets AS (
        SELECT vec_id, t,
               SUM(CASE WHEN dot > 0
                        THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
        FROM dots GROUP BY 1, 2
    )"""


_SQL_LSH_TOPK_REPLAY = f"""
    WITH {_sql_int_buckets(4, 16, "lshq")},
    cands AS (
        SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM buckets cb JOIN buckets qb
          ON cb.t = qb.t AND cb.bucket = qb.bucket
        WHERE qb.vec_id < {{nq}} AND cb.vec_id <> qb.vec_id
    ),
    sims AS (
        SELECT c.query_id, c.neighbor_id,
               ROUND(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                            CAST(en.embedding AS DOUBLE[])),
                     4) AS cos_sim_r
        FROM cands c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings en ON en.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim_r, rank FROM (
        SELECT query_id, neighbor_id, cos_sim_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim_r DESC, neighbor_id)
                   AS rank
        FROM sims
    ) WHERE rank <= {{k}}
"""


@query(
    "emb_ann_lsh_topk",
    oracle=_SQL_LSH_TOPK_REPLAY.format(nq=N_QUERIES, k=TOP_K),
)
def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH approximate top-k: bucket candidates + exact
    rerank over the deduped set — the 100 TB path where |q|×|corpus|
    brute force is unaffordable.

    Replayable registry configuration (VERDICT r9 item 2): planes are
    md5-derived INTEGERS and vectors quantize to int64, so the bucket
    stage is exact integer arithmetic both engines compute identically —
    the row is hash-checked end-to-end (buckets → candidates → rounded
    rerank → rank). Geometry pinned at 4 planes × 16 tables (a static
    SQL oracle cannot re-derive corpus-sized plane counts); the
    auto-sized Gaussian path (operators/similarity.py::ann_lsh_topk)
    stays the prod default — auto_planes × auto_tables holds the bucket-
    occupancy and recall contracts as the corpus grows (BENCH_NOTES
    finding 2) — and keeps its own hash-green recall verdict
    (emb_ann_lsh_recall_verdict)."""
    from creatorops_lakehouse_spark.operators.similarity import (
        ann_lsh_topk_replayable,
    )

    emb = load(spark, sf_dir, "embeddings")
    return ann_lsh_topk_replayable(
        emb, k=TOP_K, query_pred=lambda c: c < N_QUERIES
    )


def _sql_int_buckets_scaled(
    n_tables: int, tag: str, target: int = 64, lo: int = 4, hi: int = 16
) -> str:
    """Corpus-scaled variant of :func:`_sql_int_buckets`: the plane count
    comes from the same EXACT-INTEGER rule as
    operators/similarity.py::replayable_plane_count (smallest p in
    [lo, hi] with target·2^p ≥ n), expressed as a CASE chain of integer
    comparisons — no log2/ceil floats, so both engines derive the
    identical geometry at ANY corpus size."""
    case = " ".join(
        f"WHEN n <= {target * (1 << p)} THEN {p}" for p in range(lo, hi)
    )
    return f"""
    geom AS (
        SELECT CASE {case} ELSE {hi} END AS np
        FROM (SELECT COUNT(*) AS n FROM embeddings)
    ),
    qn AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
        FROM embeddings
    ),
    dims AS (SELECT unnest(range(0, 64)) AS d),
    planes AS (
        SELECT t.t, p.p, d.d,
               CAST(('0x' || substr(md5('{tag}:' || CAST(t.t AS VARCHAR)
                    || ':' || CAST(p.p AS VARCHAR)
                    || ':' || CAST(d.d AS VARCHAR)), 1, 4)) AS BIGINT)
                   - 32768 AS w
        FROM (SELECT unnest(range(0, {n_tables})) AS t) t,
             (SELECT unnest(range(0, {hi})) AS p) p,
             dims d
        WHERE p.p < (SELECT np FROM geom)
    ),
    posts AS (SELECT vec_id, d.d AS d, q[d.d + 1] AS qd FROM qn, dims d),
    dots AS (
        SELECT po.vec_id, pl.t, pl.p, SUM(pl.w * po.qd) AS dot
        FROM posts po JOIN planes pl ON po.d = pl.d
        GROUP BY 1, 2, 3
    ),
    buckets AS (
        SELECT vec_id, t,
               SUM(CASE WHEN dot > 0
                        THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
        FROM dots GROUP BY 1, 2
    )"""


_SQL_NEARDUP_REPLAY = f"""
    WITH {_sql_int_buckets_scaled(16, "ndq")},
    cands AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM buckets a JOIN buckets b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, cos_sim_r FROM (
        SELECT c.a_id, c.b_id,
               ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])),
                     4) AS cos_sim_r
        FROM cands c
        JOIN embeddings ea ON ea.vec_id = c.a_id
        JOIN embeddings eb ON eb.vec_id = c.b_id
    ) WHERE cos_sim_r >= {{tau}}
"""


@query(
    "emb_neardup_pairs",
    oracle=_SQL_NEARDUP_REPLAY.format(tau="0.45"),
)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket candidates
    verified with exact cosine (rounded to 4 decimals in BOTH engines so
    the threshold filter keeps the identical pair set).

    Replayable registry configuration (VERDICT r9 item 2): md5-integer
    planes + int64-quantized vectors make the candidate set a
    deterministic cross-engine function — hash-checked end-to-end.
    Plane count SCALES with the corpus by an exact-integer rule both
    engines compute (replayable_plane_count ↔ the oracle's CASE chain)
    — the r10 10× sweep measured the earlier PINNED 4-plane geometry at
    39× wall for 10× vectors (quadratic bucket occupancy), the classic
    fixed-plane scale bug. Tables stay 16, so threshold-floor recall
    declines at scale; the recall contract lives on the auto-sized
    Gaussian prod path (operators/similarity.py::embedding_neardup_pairs
    + emb_neardup_recall_verdict).

    τ matches that verdict's threshold: the driver corpus is weakly
    clustered (true neighbors at cos 0.26–0.49), so a production-style
    τ=0.9 finds nothing at any tested scale and the row would prove
    nothing (VERDICT r6 item 4)."""
    from creatorops_lakehouse_spark.operators.similarity import (
        embedding_neardup_pairs_replayable,
    )

    return embedding_neardup_pairs_replayable(
        load(spark, sf_dir, "embeddings"), threshold=NEARDUP_VERDICT_TAU
    )


@query(
    "emb_ann_lsh_prod_parity_verdict",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_twin_rows, TRUE AS parity_ok
    FROM ({_SQL_LSH_TOPK_REPLAY.format(nq=N_QUERIES, k=TOP_K)})
    """,
)
def emb_ann_lsh_prod_parity_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pair-set parity between the BENCHED Gaussian prod ANN row
    (emb_ann_lsh_topk_prod) and the md5-integer replayable twin
    (VERDICT r10 item 1b): the two geometries retrieve overlapping
    top-k id sets — ≥ 60% of the twin's (query, neighbor) pairs must
    appear in the prod result (measured 0.78–0.93 across
    sf0.001/0.01/0.1; both sets are exact-reranked, so divergence is
    candidate-recall differences at the bucket stage, not ranking). The
    oracle recomputes the twin's full top-k in SQL and pins parity_ok;
    a collapsed prod geometry flips the hash-checked boolean."""
    from creatorops_lakehouse_spark.operators.similarity import (
        ann_lsh_topk,
        ann_lsh_topk_replayable,
    )

    emb = load(spark, sf_dir, "embeddings")
    prod = ann_lsh_topk(
        emb, k=TOP_K, cos_floor=0.3, query_pred=lambda c: c < N_QUERIES
    ).select("query_id", "neighbor_id", F.lit(1).alias("_p"))
    twin = ann_lsh_topk_replayable(
        emb, k=TOP_K, query_pred=lambda c: c < N_QUERIES
    ).select("query_id", "neighbor_id", F.lit(1).alias("_t"))
    merged = prod.join(twin, on=["query_id", "neighbor_id"], how="full_outer")
    agg = merged.agg(
        F.count("_t").alias("_n_twin"),
        F.count(
            F.when(F.col("_p").isNotNull() & F.col("_t").isNotNull(), 1)
        ).alias("_n_both"),
    )
    return agg.select(
        F.col("_n_twin").cast("long").alias("n_twin_rows"),
        ((F.col("_n_both") * 10) >= (F.col("_n_twin") * 6)).alias("parity_ok"),
    )


@query(
    "emb_neardup_prod_parity_verdict",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_twin_pairs, TRUE AS parity_ok
    FROM ({_SQL_NEARDUP_REPLAY.format(tau="0.45")})
    """,
)
def emb_neardup_prod_parity_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pair-set parity between the BENCHED Gaussian prod near-dup row
    (emb_neardup_pairs_prod) and the md5-integer replayable twin
    (VERDICT r10 item 1b): IoU of the two verified pair sets ≥ 0.6
    (measured 0.86–0.92 across sf0.001/0.01/0.1 — both are subsets of
    the exact τ-pair set with band-geometry recall < 1, so they differ
    only in which borderline pairs each candidate stage surfaces). The
    oracle recomputes the twin's pair count in SQL and pins parity_ok;
    a broken prod bucket join collapses the IoU and flips the hash."""
    from creatorops_lakehouse_spark.operators.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_replayable,
    )

    emb = load(spark, sf_dir, "embeddings")
    prod = embedding_neardup_pairs(
        emb, threshold=NEARDUP_VERDICT_TAU
    ).select("a_id", "b_id", F.lit(1).alias("_p"))
    twin = embedding_neardup_pairs_replayable(
        emb, threshold=NEARDUP_VERDICT_TAU
    ).select("a_id", "b_id", F.lit(1).alias("_t"))
    merged = prod.join(twin, on=["a_id", "b_id"], how="full_outer")
    agg = merged.agg(
        F.count("_t").alias("_n_twin"),
        F.count(F.lit(1)).alias("_n_union"),
        F.count(
            F.when(F.col("_p").isNotNull() & F.col("_t").isNotNull(), 1)
        ).alias("_n_both"),
    )
    return agg.select(
        F.col("_n_twin").cast("long").alias("n_twin_pairs"),
        ((F.col("_n_both") * 10) >= (F.col("_n_union") * 6)).alias("parity_ok"),
    )


@query("emb_ann_lsh_topk_prod")
def emb_ann_lsh_topk_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION sign-LSH ANN path (Gaussian hyperplanes,
    auto-sized planes × tables from auto_planes/auto_tables — the
    geometry that holds bucket occupancy and recall as the corpus
    grows), registered as a BENCHED row so BENCH_r11+ times the path a
    100 TB deployment would run, not the pinned-geometry md5-integer
    twin (VERDICT r10 item 1b). Rows-only by necessity: Gaussian plane
    weights are not replayable in a SQL oracle; its correctness
    instrument is the hash-green emb_ann_lsh_recall_verdict, which runs
    THIS operator at THIS configuration against the exact brute-force
    top-k."""
    from creatorops_lakehouse_spark.operators.similarity import ann_lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    return ann_lsh_topk(
        emb, k=TOP_K, cos_floor=0.3, query_pred=lambda c: c < N_QUERIES
    ).select(
        "query_id",
        "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim_r"),
        "rank",
    )


@query("emb_neardup_pairs_prod")
def emb_neardup_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION embedding near-dup path (Gaussian hyperplanes,
    auto_planes/auto_tables sizing, grouped in-bucket matmul verify),
    registered as a BENCHED row (VERDICT r10 item 1b — the r10 bench
    timed only the md5-integer replayable twin, whose string buckets and
    quantization cost 2.78× the prod path). Rows-only by necessity
    (Gaussian planes aren't SQL-replayable); correctness is pinned by
    the hash-green emb_neardup_recall_verdict, which runs THIS operator
    at THIS threshold against the exact all-pairs baseline (precision =
    1, recall ≥ 0.6 floors)."""
    from creatorops_lakehouse_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    return embedding_neardup_pairs(
        load(spark, sf_dir, "embeddings"), threshold=NEARDUP_VERDICT_TAU
    ).select("a_id", "b_id", F.round("cos_sim", 4).alias("cos_sim_r"))


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


#: shared exact-top-k CTE chain (identical ranking to
#: emb_cosine_topk_bruteforce: ROUND(sim,4) with neighbor_id tiebreak)
_SQL_EXACT_TOPK = f"""
    q AS (SELECT vec_id AS query_id,
                 CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.q_vec,
                                      CAST(c.embedding AS DOUBLE[])) AS sim
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ROUND(sim, 4) DESC, neighbor_id) AS rank
        FROM sims
    ),
    exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= {TOP_K})
"""


def _ann_recall_verdict(exact: DataFrame, ann: DataFrame, floor: float) -> DataFrame:
    """(n_exact, recall_ok): how much of the exact top-k id set the ANN
    route retrieved. n_exact is SQL-recomputable (deterministic ranking);
    recall_ok is the hash-checked contract — if ANN recall ever drops below
    the declared floor, the Spark side emits FALSE against the oracle's
    literal TRUE and the driver's value hash flags it."""
    merged = exact.select("query_id", "neighbor_id").join(
        ann.select("query_id", "neighbor_id").withColumn("_h", F.lit(1)),
        on=["query_id", "neighbor_id"],
        how="left",
    )
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.count("_h").alias("_n_hits"),
    ).select(
        "n_exact",
        ((F.col("_n_hits") / F.col("n_exact")) >= floor).alias("recall_ok"),
    )


#: (sf_dir → (centroids, index TableSpec)) — the IVF index is built ONCE per
#: corpus and probed by every subsequent call, mirroring the 100 TB
#: operating shape (build amortized over many query batches). The cache key
#: is the corpus path; a changed corpus under the same path needs a fresh
#: session (acceptable for bench/driver runs, which are fresh processes).
_IVF_INDEX_CACHE: dict[str, tuple] = {}


def _reap_stale_ivf_dirs(scratch: str) -> None:
    """Delete ivf_index_* scratch dirs not owned by THIS session's cache —
    prior sessions' indexes are unreachable (the cache is per-process), so
    without this every run leaks one dir per corpus (VERDICT r6 item 5)."""
    import glob as _glob
    import os
    import shutil

    live_roots = {
        os.path.dirname(spec.path) for _, spec in _IVF_INDEX_CACHE.values()
    }
    for d in _glob.glob(os.path.join(scratch, "ivf_index_*")):
        if d not in live_roots:
            shutil.rmtree(d, ignore_errors=True)


def _ivf_index_for(spark: SparkSession, sf_dir: str):
    import os
    import tempfile

    from creatorops_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        train_ivf_centroids,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    if sf_dir not in _IVF_INDEX_CACHE:
        emb = load(spark, sf_dir, "embeddings")
        # quantize_scale: centroids floored to exact 1e-6 units after every
        # Lloyd update — replayable by the DuckDB oracle (emb_ann_ivf_topk
        # is hash-checked end-to-end, training included)
        centroids = train_ivf_centroids(
            emb, k=8, iters=2, dim=64, sample_mod=5, quantize_scale=1_000_000
        )
        # session-scratch under the repo (gitignored), not the system /tmp
        # — everything this engine writes stays inside its own tree
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".scratch",
        )
        os.makedirs(scratch, exist_ok=True)
        _reap_stale_ivf_dirs(scratch)
        root = tempfile.mkdtemp(prefix="ivf_index_", dir=scratch)
        spec = TableSpec("ivf.index", f"{root}/index", ("cell",))
        build_ivf_index(emb, centroids, spec)
        _IVF_INDEX_CACHE[sf_dir] = (centroids, spec)
    return _IVF_INDEX_CACHE[sf_dir]


def _sql_lloyd_iter(i: int) -> str:
    """One unrolled Lloyd iteration (c{i} -> c{i+1}) for the IVF oracle:
    assign every sample vector to its nearest centroid (-2·x·c + ‖c‖²,
    ties to the lowest cell — the stable-argsort contract of
    _nearest_cells_udf), then per-cluster element-wise means floored to
    exact 1e-6 units (the quantize_scale contract of train_ivf_centroids);
    an empty cluster keeps its previous centroid."""
    return f"""
    a{i} AS (
        SELECT id, cell FROM (
            SELECT e.id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.v, c.cv)
                           + list_inner_product(c.cv, c.cv) ASC,
                       c.cell ASC) AS rn
            FROM emb5 e CROSS JOIN c{i} c
        ) WHERE rn = 1
    ),
    mean{i} AS (
        SELECT a.cell, d.dim,
               FLOOR(AVG(e.v[d.dim + 1]) * 1000000) / 1000000 AS cv
        FROM a{i} a JOIN emb5 e USING (id) CROSS JOIN d64 d
        GROUP BY 1, 2
    ),
    c{i + 1} AS (
        SELECT p.cell, COALESCE(m.l, p.cv) AS cv
        FROM c{i} p LEFT JOIN (
            SELECT cell, list(cv ORDER BY dim) AS l FROM mean{i} GROUP BY cell
        ) m USING (cell)
    )"""


#: shared oracle prefix: quantized-Lloyd training replay + full-corpus
#: cell assignment (``cass``) — consumed by the IVF top-k oracle AND the
#: cluster-balanced sampling oracle (same trained quantizer, same
#: stable-argsort assignment contract)
_SQL_IVF_ASSIGN = f"""
    emb5 AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    d64 AS (SELECT unnest(range(0, 64)) AS dim),
    c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell,
               list_transform(v, x -> FLOOR(x * 1000000) / 1000000) AS cv
        FROM (SELECT id, v FROM emb5 ORDER BY id LIMIT 8)
    ),
    {_sql_lloyd_iter(0)},
    {_sql_lloyd_iter(1)},
    corpus AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cass AS (
        SELECT id, v, cell FROM (
            SELECT e.id, e.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.v, c.cv)
                           + list_inner_product(c.cv, c.cv) ASC,
                       c.cell ASC) AS rn
            FROM corpus e CROSS JOIN c2 c
        ) WHERE rn = 1
    )"""

#: probe + exact-rerank CTE chain (consumed by the one-shot IVF top-k
#: oracle AND the incremental-index variant, which wraps extra booleans
#: around the same ``topk``)
_SQL_IVF_PROBE_RERANK = f"""{_SQL_IVF_ASSIGN},
    probes AS (
        SELECT id AS query_id, v AS q_vec, cell FROM (
            SELECT e.id, e.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.v, c.cv)
                           + list_inner_product(c.cv, c.cv) ASC,
                       c.cell ASC) AS rn
            FROM corpus e CROSS JOIN c2 c WHERE e.id < {N_QUERIES}
        ) WHERE rn <= 4
    ),
    sims AS (
        SELECT p.query_id, a.id AS neighbor_id,
               list_cosine_similarity(p.q_vec, a.v) AS cos_sim
        FROM probes p JOIN cass a USING (cell)
        WHERE a.id <> p.query_id
    ),
    topk AS (
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT query_id, neighbor_id, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, neighbor_id)
                       AS rank
            FROM sims
        ) WHERE rank <= {TOP_K}
    )"""

_SQL_IVF_TOPK = f"""{_SQL_IVF_PROBE_RERANK}
    SELECT query_id, neighbor_id, cos_sim, rank FROM topk
"""


@query("emb_ann_ivf_topk", oracle=f"WITH {_SQL_IVF_TOPK}")
def emb_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN against the PERSISTED cell-partitioned index: the coarse
    quantizer is Lloyd-trained on a 1/5 sample, the corpus assignment is
    built once (build_ivf_index) and every query batch probes its 2
    nearest cells with the probed-cell IN-filter pushed into the scan —
    partition pruning skips unprobed cells' files (the build-once/
    probe-many 100 TB shape; pruning asserted in
    tests/test_similarity.py::test_ivf_index_partition_pruning).

    Hash-checked END-TO-END (training included) since round 9: the oracle
    unrolls both Lloyd iterations in SQL over the same 1/5 sample with the
    same lowest-id init, the quantize_scale=1e6 floor making centroid
    arithmetic engine-portable (ulp-level summation differences are
    absorbed by the floor), then replays the corpus assignment, the
    nprobe=4 probe set, and the exact-cosine rerank (pair_cosine is
    bit-identical to DuckDB's list_cosine_similarity) under the
    (cos DESC, neighbor_id ASC) tie-break. Recall vs brute force is
    additionally hash-checked by emb_ann_ivf_recall_verdict.

    Oracle-fidelity bound: train_ivf_centroids runs driver-local Lloyd
    only while the training sample fits local_threshold=100,000 rows and
    switches to the distributed-summation path above it; the SQL replay
    mirrors the LOCAL path's summation order, so the hash gate is
    faithful only below that bound (at 1/5 sampling: corpora ≤ 500k
    vectors). Beyond it the gate would false-alarm on correct output —
    the same class of bound emb_ann_pq_topk guards explicitly."""
    from creatorops_lakehouse_spark.operators.similarity import ann_ivf_topk_indexed

    centroids, spec = _ivf_index_for(spark, sf_dir)
    queries_df = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_QUERIES)
    return ann_ivf_topk_indexed(
        spark, spec, queries_df, centroids, k=TOP_K, nprobe=4
    )


@query(
    "emb_ann_lsh_recall_verdict",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok FROM exact
    """,
)
def emb_ann_lsh_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable LSH ANN recall contract (VERDICT r2 item 5): the
    multi-table LSH top-k must retrieve >= 60% of the exact brute-force
    top-k id set. The oracle recomputes n_exact in SQL (deterministic
    ROUND(sim,4)+id ranking on both engines) and pins recall_ok TRUE; a
    band-geometry regression (lost table, collapsed plane count) flips the
    hash-checked boolean. Same cos_floor=0.3 sizing as the registered
    query (this corpus's top-k neighbors sit at cos 0.26–0.49); measured
    recall 0.85–0.95 across sf0.001/0.01/0.1, so the 0.6 floor has margin
    without being vacuous."""
    emb = load(spark, sf_dir, "embeddings")
    exact = emb_cosine_topk_bruteforce(spark, sf_dir)
    ann = ann_lsh_topk(
        emb, k=TOP_K, cos_floor=0.3, query_pred=lambda c: c < N_QUERIES
    )
    return _ann_recall_verdict(exact, ann, floor=0.6)


@query(
    "emb_ann_ivf_recall_verdict",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok FROM exact
    """,
)
def emb_ann_ivf_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable IVF ANN recall contract: the indexed
    build-once/probe-many route (the same cached index the emb_ann_ivf_topk
    query probes) must retrieve >= 60% of the exact top-k id set at
    nprobe=4 of 8 cells (half the cells pruned; measured recall
    0.725–0.875 across sf0.001/0.01/0.1 on this weakly-clustered corpus).
    Same verdict mechanics as the LSH row."""
    from creatorops_lakehouse_spark.operators.similarity import ann_ivf_topk_indexed

    exact = emb_cosine_topk_bruteforce(spark, sf_dir)
    centroids, spec = _ivf_index_for(spark, sf_dir)
    queries_df = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_QUERIES)
    ann = ann_ivf_topk_indexed(spark, spec, queries_df, centroids, k=TOP_K, nprobe=4)
    return _ann_recall_verdict(exact, ann, floor=0.6)


@query(
    "emb_cluster_balanced_sample",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGN},
    ranked AS (
        SELECT cell, id,
               ROW_NUMBER() OVER (
                   PARTITION BY cell
                   ORDER BY CAST('0x' || substr(sha256(CAST(id AS VARCHAR)),
                                                1, 8) AS BIGINT) % 10000 ASC,
                            id ASC
               ) AS rn
        FROM cass
    ),
    tot AS (SELECT cell, COUNT(*) AS n_cell FROM cass GROUP BY 1)
    SELECT r.cell, t.n_cell,
           COUNT(*) AS n_sampled,
           CAST(SUM(r.id) AS BIGINT) AS sum_vec_id,
           MIN(r.id) AS min_vec_id
    FROM ranked r JOIN tot t USING (cell)
    WHERE r.rn <= 25
    GROUP BY 1, 2
    """,
)
def emb_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling (semantic domain balancing): a
    fixed per-cluster quota drawn from the SAME trained coarse quantizer
    the IVF index uses — the k-means-cells + per-cell-quota recipe that
    training-data curation uses to keep a corpus from being dominated by
    its biggest semantic mode (the embedding-space analogue of the
    metadata-keyed docs_balanced_lang_sample).

    Composition, all previously-gated pieces: cell assignments come
    straight from the PERSISTED IVF index table (build once, sample from
    the assignment for free — no second pass over the vectors), the
    within-cell draw is per_group_sample's (sha-bucket, id) rank —
    engine-portable, stable under corpus growth, quota-exact. Output pins
    per-cell totals AND exact sampled membership (sum/min of ids), so the
    hash catches a wrong assignment, a wrong rank order, or a quota leak.

    Oracle: the shared quantized-Lloyd replay (_SQL_IVF_ASSIGN — training
    included, same fidelity bound as emb_ann_ivf_topk) + the sha-bucket
    rank in SQL. 100 TB: one groupBy on cell + one window keyed by cell;
    cells are quantizer-balanced by construction (a pathological mega-cell
    means the quantizer, not the sampler, needs more centroids)."""
    from creatorops_lakehouse_spark.operators.sampling import per_group_sample
    from creatorops_lakehouse_spark.sources.tables import read_table

    _, spec = _ivf_index_for(spark, sf_dir)
    assigned = read_table(spark, spec).select(
        F.col("neighbor_id").alias("id"), "cell"
    )
    sample = per_group_sample(assigned, "cell", "id", k=25)
    tot = assigned.groupBy("cell").agg(F.count("*").alias("n_cell"))
    return (
        sample.groupBy("cell")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("id").alias("sum_vec_id"),
            F.min("id").alias("min_vec_id"),
        )
        .join(tot, "cell")
        .select("cell", "n_cell", "n_sampled", "sum_vec_id", "min_vec_id")
    )


NEARDUP_VERDICT_TAU = 0.45


@query(
    "emb_neardup_recall_verdict",
    oracle=f"""
    WITH p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])),
                    4) >= {NEARDUP_VERDICT_TAU}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_global_pairs,
           TRUE AS precision_ok, TRUE AS recall_ok
    FROM p
    """,
)
def emb_neardup_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the LSH-banded near-dup route (VERDICT r5
    item 2: the registered emb_neardup_pairs row returns 0 rows at sf0.01 —
    vacuously green — so this companion pins the SAME operator at
    τ={NEARDUP_VERDICT_TAU}, where every tested scale has true pairs).
    Against the in-engine exact all-pairs baseline: every found pair must
    be a true τ-pair (precision_ok — raw cos ≥ τ implies rounded cos ≥ τ
    for grid-aligned τ, so band geometry cannot manufacture a false
    positive) and ≥ 60% of the true τ-pairs must be found (recall_ok;
    auto_planes/auto_tables size the band-OR geometry for 0.9 recall at
    the threshold — the 0.6 floor leaves deterministic margin). The
    oracle recomputes n_global_pairs in SQL and pins both booleans TRUE;
    a collapsed table count or broken bucket join flips the hash."""
    from creatorops_lakehouse_spark.operators.similarity import pair_cosine

    emb = load(spark, sf_dir, "embeddings")
    found = embedding_neardup_pairs(emb, threshold=NEARDUP_VERDICT_TAU).select(
        "a_id", "b_id"
    )
    va = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    vb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    glob = (
        va.crossJoin(vb)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(pair_cosine(F.col("a_vec"), F.col("b_vec")), 4).alias("r"),
        )
        .filter(F.col("r") >= NEARDUP_VERDICT_TAU)
        .select("a_id", "b_id")
    )
    merged = glob.withColumn("_g", F.lit(1)).join(
        found.withColumn("_f", F.lit(1)), on=["a_id", "b_id"], how="full_outer"
    )
    agg = merged.agg(
        F.count("_g").alias("_n_global"),
        F.count(F.when(F.col("_g").isNotNull() & F.col("_f").isNotNull(), 1)).alias(
            "_n_both"
        ),
        F.count(F.when(F.col("_g").isNull(), 1)).alias("_n_false_pos"),
    )
    return agg.select(
        F.col("_n_global").cast("long").alias("n_global_pairs"),
        (F.col("_n_false_pos") == 0).alias("precision_ok"),
        ((F.col("_n_both") / F.col("_n_global")) >= 0.6).alias("recall_ok"),
    )


EMB_DECONTAM_THRESHOLD = 0.4
EMB_EVAL_MOD = 10


@query(
    "emb_decontaminate_eval",
    oracle=f"""
    WITH ev AS (SELECT CAST(embedding AS DOUBLE[]) AS e_vec FROM embeddings
                WHERE vec_id % {EMB_EVAL_MOD} = 0),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS c_vec FROM embeddings
          WHERE vec_id % {EMB_EVAL_MOD} <> 0),
    sims AS (
        SELECT c.vec_id,
               ROUND(list_cosine_similarity(c.c_vec, ev.e_vec), 4) AS r
        FROM c CROSS JOIN ev
    ),
    agg AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN r >= {EMB_DECONTAM_THRESHOLD}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_hits,
               MAX(r) AS max_cos_r
        FROM sims GROUP BY vec_id
    )
    SELECT vec_id, n_eval_hits, max_cos_r FROM agg WHERE n_eval_hits >= 1
    """,
)
def emb_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination (the semantic complement
    of docs_decontaminate_eval's n-gram overlap): corpus vectors whose
    rounded cosine against ANY held-out eval vector (vec_id % {EMB_EVAL_MOD}
    == 0, a deterministic split) reaches {EMB_DECONTAM_THRESHOLD}. The eval
    matrix broadcasts in the Arrow-UDF closure, so the corpus side is one
    shuffle-free projection (operators/decontam.py::embedding_contamination);
    the oracle recomputes every corpus×eval cosine in double and applies
    the identical round-then-compare boundary."""
    from creatorops_lakehouse_spark.operators.decontam import (
        embedding_contamination,
    )

    emb = load(spark, sf_dir, "embeddings")
    return embedding_contamination(
        emb.filter(F.col("vec_id") % EMB_EVAL_MOD != 0),
        emb.filter(F.col("vec_id") % EMB_EVAL_MOD == 0),
        threshold=EMB_DECONTAM_THRESHOLD,
    )


SEMDEDUP_TAU = 0.45
SEMDEDUP_NPROBE = 3

#: sf_dir → dedicated semantic-dedup centroids. The k=8 search index is
#: too coarse for DEDUP cells: with 8 cells, nprobe=2 assignment covers
#: ~1/4 of ALL pairs (measured 1.4M candidates / 9s at sf0.1). Dedup wants
#: constant cell occupancy — k = n/50 cells, nprobe=3 — which cuts the
#: candidate volume ~4× while holding recall ≥ the 0.6 contract
#: (measured 86/100/69% across sf0.001/0.01/0.1).
_SEMDEDUP_CENTROIDS: dict[str, list] = {}


def _semdedup_centroids_for(spark: SparkSession, sf_dir: str):
    from creatorops_lakehouse_spark.operators.similarity import (
        train_ivf_centroids,
    )

    if sf_dir not in _SEMDEDUP_CENTROIDS:
        emb = load(spark, sf_dir, "embeddings")
        k = max(8, emb.count() // 50)
        # iters=1: cell-RESTRICTION quality saturates after one Lloyd pass
        # on this corpus (recall 7/7, 14/14, 101/144 vs 6/7, 14/14, 99/144
        # at iters=2) — dedup cells only need co-location, not a converged
        # quantizer, and one pass halves the training actions.
        # quantize_scale: same oracle-replayable centroid contract as the
        # IVF index (emb_semantic_dedup is hash-checked end-to-end)
        _SEMDEDUP_CENTROIDS[sf_dir] = train_ivf_centroids(
            emb, k=k, iters=1, dim=64, sample_mod=5, quantize_scale=1_000_000
        )
    return _SEMDEDUP_CENTROIDS[sf_dir]


def _semdedup_pairs_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-lifetime VERIFIED semantic pair table — shared by the
    dedup query and the recall verdict (same sticky-cache discipline as
    queries/dedup.py::corpus_trigram_pairs: the pair graph is a corpus
    artifact, not a per-query intermediate)."""
    from creatorops_lakehouse_spark.operators.cache import sticky_persist
    from creatorops_lakehouse_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    return sticky_persist(
        f"semdedup_pairs:{sf_dir}:{SEMDEDUP_TAU}:{SEMDEDUP_NPROBE}",
        lambda: semantic_dedup_pairs(
            load(spark, sf_dir, "embeddings"),
            _semdedup_centroids_for(spark, sf_dir),
            threshold=SEMDEDUP_TAU,
            nprobe=SEMDEDUP_NPROBE,
        ).select("a_id", "b_id"),
    )


_SQL_SEMDEDUP = f"""
    embq AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    emb5 AS (SELECT id, v FROM embq WHERE id % 5 = 0),
    d64 AS (SELECT unnest(range(0, 64)) AS dim),
    kk AS (SELECT GREATEST(8, COUNT(*) // 50) AS k FROM embq),
    c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell,
               list_transform(v, x -> FLOOR(x * 1000000) / 1000000) AS cv
        FROM (SELECT id, v FROM emb5 ORDER BY id LIMIT (SELECT k FROM kk))
    ),
    csq0 AS (SELECT cell, list_inner_product(cv, cv) AS c2 FROM c0),
    a0 AS (
        SELECT id, cell FROM (
            SELECT e.id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.v, c.cv) + s.c2 ASC,
                       c.cell ASC) AS rn
            FROM emb5 e CROSS JOIN c0 c JOIN csq0 s USING (cell)
        ) WHERE rn = 1
    ),
    mean0 AS (
        SELECT a.cell, d.dim,
               FLOOR(AVG(e.v[d.dim + 1]) * 1000000) / 1000000 AS cv
        FROM a0 a JOIN emb5 e USING (id) CROSS JOIN d64 d
        GROUP BY 1, 2
    ),
    c1 AS (
        SELECT p.cell, COALESCE(m.l, p.cv) AS cv
        FROM c0 p LEFT JOIN (
            SELECT cell, list(cv ORDER BY dim) AS l FROM mean0 GROUP BY cell
        ) m USING (cell)
    ),
    csq1 AS (SELECT cell, list_inner_product(cv, cv) AS c2 FROM c1),
    assign3 AS (
        SELECT id, cell FROM (
            SELECT e.id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.v, c.cv) + s.c2 ASC,
                       c.cell ASC) AS rn
            FROM embq e CROSS JOIN c1 c JOIN csq1 s USING (cell)
        ) WHERE rn <= {SEMDEDUP_NPROBE}
    ),
    cand AS (
        SELECT DISTINCT x.id AS a_id, y.id AS b_id
        FROM assign3 x JOIN assign3 y ON x.cell = y.cell AND x.id < y.id
    ),
    pr AS (
        SELECT c.a_id, c.b_id
        FROM cand c JOIN embq a ON a.id = c.a_id JOIN embq b ON b.id = c.b_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= {SEMDEDUP_TAU}
    ),
    sd_edges AS (
        SELECT a_id AS src, b_id AS dst FROM pr
        UNION SELECT b_id, a_id FROM pr
    ),
    sd_reach(src, dst) AS (
        SELECT src, dst FROM sd_edges
        UNION
        SELECT r.src, x.dst FROM sd_reach r JOIN sd_edges x ON r.dst = x.src
    ),
    sd_clusters AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        FROM sd_reach GROUP BY src
    )
    SELECT node AS vec_id, cluster_id FROM sd_clusters WHERE node <> cluster_id
"""


@query("emb_semantic_dedup", oracle=f"WITH RECURSIVE {_SQL_SEMDEDUP}")
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: coarse-quantizer cells
    (dedicated k=n/50 centroids — constant cell occupancy, the dedup
    analogue of auto_planes) restrict the pair search, nprobe=3
    multi-assignment recovers cell-straddling pairs, exact Arrow-verified
    cosine ≥ {SEMDEDUP_TAU} defines the duplicate graph, and connected
    components keep the min-id representative per semantic cluster.
    Returns the DROPPED docs with their cluster id.

    Hash-checked END-TO-END since round 9 (was rows-only): the
    quantize_scale=1e6 centroid floor makes the single Lloyd pass
    engine-portable, so the oracle replays training, the nprobe=3
    multi-assignment, the exact-cosine ROUND(,4) ≥ τ pair verify
    (pair_cosine is bit-identical to list_cosine_similarity), and the CC
    closure (recursive CTE). Pair recall vs the global exact baseline is
    additionally hash-checked by emb_semantic_dedup_verdict."""
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    pairs = _semdedup_pairs_for(spark, sf_dir)
    cc = connected_components(pairs)
    return cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("vec_id"), "cluster_id"
    )


@query(
    "emb_semantic_dedup_verdict",
    oracle=f"""
    WITH p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])),
                    4) >= {SEMDEDUP_TAU}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_global_pairs,
           TRUE AS precision_ok, TRUE AS recall_ok
    FROM p
    """,
)
def emb_semantic_dedup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the cell-restricted semantic-dedup pair
    search: against the in-engine exact all-pairs baseline (Arrow
    pair-cosine over every a<b pair — affordable at audit scale, never the
    operating path), every found pair must be a true τ-pair
    (precision_ok) and ≥ 60% of the true τ-pairs must be found
    (recall_ok; measured 86/100/69% across sf0.001/0.01/0.1 at k=n/50,
    nprobe=3 — cell-straddling losses, the documented SemDeDup tradeoff;
    deterministic per corpus, so the margin cannot flake). The oracle
    recomputes n_global_pairs in SQL and pins both booleans TRUE.
    pair_cosine accumulates as a sequential cumsum fold — bit-identical to
    DuckDB's list_cosine_similarity (operators/similarity.py::
    _pair_cosine_udf), so the hash-checked count cannot flip on a
    summation-order ulp at a ROUND(,4) boundary; zero-norm vectors yield
    -1.0 on both engines."""
    from creatorops_lakehouse_spark.operators.similarity import pair_cosine

    emb = load(spark, sf_dir, "embeddings")
    found = _semdedup_pairs_for(spark, sf_dir)
    va = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    vb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    glob = (
        va.crossJoin(vb)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(pair_cosine(F.col("a_vec"), F.col("b_vec")), 4).alias("r"),
        )
        .filter(F.col("r") >= SEMDEDUP_TAU)
        .select("a_id", "b_id")
    )
    merged = glob.withColumn("_g", F.lit(1)).join(
        found.withColumn("_f", F.lit(1)), on=["a_id", "b_id"], how="full_outer"
    )
    agg = merged.agg(
        F.count("_g").alias("_n_global"),
        F.count(F.when(F.col("_g").isNotNull() & F.col("_f").isNotNull(), 1)).alias(
            "_n_both"
        ),
        F.count(F.when(F.col("_g").isNull(), 1)).alias("_n_false_pos"),
    )
    return agg.select(
        F.col("_n_global").cast("long").alias("n_global_pairs"),
        (F.col("_n_false_pos") == 0).alias("precision_ok"),
        ((F.col("_n_both") / F.col("_n_global")) >= 0.6).alias("recall_ok"),
    )


@query(
    "emb_int8_quantization_stats",
    oracle="""
    WITH q AS (
        SELECT label,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x))) AS scale,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    e AS (
        SELECT label,
               CASE WHEN scale = 0 THEN 0
                    ELSE CAST(ROUND(unnest(v) * 127 / scale, 0) AS BIGINT)
               END AS qi
        FROM q
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_elems,
           CAST(SUM(qi) AS BIGINT) AS sum_q,
           CAST(SUM(qi * qi) AS BIGINT) AS sum_q2,
           CAST(MAX(abs(qi)) AS BIGINT) AS max_abs_q
    FROM e GROUP BY 1
    """,
)
def emb_int8_quantization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization audit (the compression step a
    100 TB embedding store applies before ANN serving): per vector the
    max-abs scale, per element q = round(x·127/scale), aggregated per
    label as exact integer moments (sum, sum of squares, max |q| — 127
    by construction on any non-zero vector). Exercises the higher-order
    array functions (transform → array_max, then explode) as first-class
    operators; the per-element expression math is identical double
    arithmetic on both engines, so the rounded integers agree exactly.
    One projection + one explode + one hash aggregate — no UDFs."""
    emb = load(spark, sf_dir, "embeddings").select(
        "label",
        F.expr(
            "array_max(transform(cast(embedding AS array<double>), x -> abs(x)))"
        ).alias("scale"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    e = emb.select(
        "label",
        F.explode("v").alias("x"),
        "scale",
    ).select(
        "label",
        F.expr(
            "CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(round(x * 127 / scale, 0) AS BIGINT) END"
        ).alias("qi"),
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_elems"),
        F.sum("qi").cast("long").alias("sum_q"),
        F.sum(F.col("qi") * F.col("qi")).cast("long").alias("sum_q2"),
        F.max(F.abs("qi")).cast("long").alias("max_abs_q"),
    )


HARD_NEG_K = 3


@query(
    "emb_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, c.vec_id AS neg_id,
               list_cosine_similarity(q.q_vec,
                                      CAST(c.embedding AS DOUBLE[])) AS sim
        FROM embeddings c CROSS JOIN q
        WHERE c.label <> q.q_label
    ),
    ranked AS (
        SELECT query_id, neg_id, ROUND(sim, 4) AS cos_sim_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ROUND(sim, 4) DESC, neg_id) AS rank
        FROM sims
    )
    SELECT query_id, neg_id, cos_sim_r, rank
    FROM ranked WHERE rank <= {HARD_NEG_K}
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for metric learning: per query vector the
    {HARD_NEG_K} most-similar vectors of a DIFFERENT label — the
    negatives that actually move a contrastive loss (random negatives
    are trivially separable; the hash-drawn events_negative_samples row
    is the cheap complement). Same exact-rerank discipline as the top-k
    queries (ROUND(,4) + id tiebreak so both engines rank identically);
    at corpus scale the candidate set comes from the ANN index instead
    of the broadcast brute force (ann_lsh_topk / IVF — same rerank)."""
    from pyspark.sql import Window

    from creatorops_lakehouse_spark.operators.similarity import cosine

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_vec"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_label") != F.col("q_label"))
        .select(
            "query_id",
            "neg_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r").desc(), F.col("neg_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select("query_id", "neg_id", "cos_sim_r", "rank")
    )


#: (sf_dir → (codebooks, codes DataFrame)) — PQ index built once per corpus
#: and probed by every call, the build-once/probe-many shape (same policy
#: as _IVF_INDEX_CACHE; fresh process per bench/driver run).
_PQ_INDEX_CACHE: dict[str, tuple] = {}


def _pq_index_for(spark: SparkSession, sf_dir: str):
    from creatorops_lakehouse_spark.operators.similarity import (
        build_pq_codes,
        train_pq_codebooks,
    )

    if sf_dir not in _PQ_INDEX_CACHE:
        emb = load(spark, sf_dir, "embeddings")
        # quantize_scale: replayable codebooks (emb_ann_pq_topk is
        # hash-checked end-to-end — see _sql_pq_topk)
        books = train_pq_codebooks(
            emb, m=8, k=32, dim=64, iters=4, quantize_scale=1_000_000
        )
        codes = build_pq_codes(emb, books).persist()
        codes.count()  # materialize once; probes reuse the cached codes
        _PQ_INDEX_CACHE[sf_dir] = (books, codes)
    return _PQ_INDEX_CACHE[sf_dir]


def _sql_pq_topk(m: int = 8, kc: int = 32, iters: int = 4, dim: int = 64) -> str:
    """DuckDB replay of the full PQ route (training → encode → ADC
    shortlist → exact rerank). Structure per subspace j (contiguous
    dim/m slice of the L2-NORMALIZED vector): lowest-id init, ``iters``
    Lloyd updates with the quantize_scale=1e6 floor (train_pq_codebooks'
    replayable-centroid contract), argmin ties to the lowest cell
    (np.argmin first-occurrence ↔ ORDER BY d2, cell). The ADC score is
    Σ_j LUT[j][code_j]; candidates tied at the shortlist boundary share
    all m codes, hence identical scores in BOTH engines, and the
    (score DESC, id ASC) tie-break picks the same rows."""
    dsub = dim // m
    parts = [
        """
    raw AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    nrm AS MATERIALIZED (
        -- norm hoisted into its own projection: a lambda that references
        -- list_inner_product(v, v) re-evaluates it PER ELEMENT (64x)
        SELECT id, list_transform(v, x -> x / nn) AS v FROM (
            SELECT id, v,
                   GREATEST(sqrt(list_inner_product(v, v)), 1e-12) AS nn
            FROM raw
        )
    ),
    d8 AS (SELECT unnest(range(0, %d)) AS dim)""" % dsub
    ]
    score_terms, enc_joins, lut_joins = [], [], []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        parts.append(f"""
    nsub{j} AS MATERIALIZED (SELECT id, v[{lo}:{hi}] AS sv FROM nrm),
    s{j}c0 AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell,
               list_transform(sv, x -> FLOOR(x * 1000000) / 1000000) AS cv
        FROM (SELECT id, sv FROM nsub{j} ORDER BY id LIMIT {kc})
    )""")
        for i in range(iters):
            parts.append(f"""
    s{j}a{i} AS MATERIALIZED (
        SELECT id, cell FROM (
            SELECT e.id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.sv, c.cv)
                           + list_inner_product(c.cv, c.cv) ASC,
                       c.cell ASC) AS rn
            FROM nsub{j} e CROSS JOIN s{j}c{i} c
        ) WHERE rn = 1
    ),
    s{j}m{i} AS MATERIALIZED (
        SELECT a.cell, d.dim, FLOOR(AVG(e.sv[d.dim + 1]) * 1000000) / 1000000 AS cv
        FROM s{j}a{i} a JOIN nsub{j} e USING (id) CROSS JOIN d8 d
        GROUP BY 1, 2
    ),
    s{j}c{i + 1} AS MATERIALIZED (
        SELECT p.cell, COALESCE(mm.l, p.cv) AS cv
        FROM s{j}c{i} p LEFT JOIN (
            SELECT cell, list(cv ORDER BY dim) AS l FROM s{j}m{i} GROUP BY cell
        ) mm USING (cell)
    )""")
        parts.append(f"""
    enc{j} AS MATERIALIZED (
        SELECT id, cell FROM (
            SELECT e.id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.sv, c.cv)
                           + list_inner_product(c.cv, c.cv) ASC,
                       c.cell ASC) AS rn
            FROM nsub{j} e CROSS JOIN s{j}c{iters} c
        ) WHERE rn = 1
    ),
    lut{j} AS MATERIALIZED (
        SELECT q.id AS query_id, c.cell, list_inner_product(q.sv, c.cv) AS ip
        FROM nsub{j} q CROSS JOIN s{j}c{iters} c WHERE q.id < {N_QUERIES}
    )""")
        score_terms.append(f"l{j}.ip")
        enc_joins.append(
            f"JOIN enc{j} e{j} ON e{j}.id = e0.id" if j else "enc0 e0"
        )
        lut_joins.append(
            f"JOIN lut{j} l{j} ON l{j}.query_id = l0.query_id "
            f"AND l{j}.cell = e{j}.cell"
            if j
            else "JOIN lut0 l0 ON l0.cell = e0.cell"
        )
    parts.append(f"""
    sc AS MATERIALIZED (
        SELECT l0.query_id, e0.id AS neighbor_id,
               {' + '.join(score_terms)} AS score_pq
        FROM {' '.join(enc_joins)} {' '.join(lut_joins)}
        WHERE e0.id <> l0.query_id
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score_pq DESC, neighbor_id ASC) AS rn
            FROM sc
        ) WHERE rn <= {TOP_K * 16}
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT s.query_id, s.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
                   ROUND(list_cosine_similarity(q.v, c.v), 4) DESC,
                   s.neighbor_id ASC) AS rank
        FROM shortlist s
        JOIN raw q ON q.id = s.query_id
        JOIN raw c ON c.id = s.neighbor_id
    ) WHERE rank <= {TOP_K}""")
    return "WITH " + ",".join(parts)


@query("emb_ann_pq_topk", oracle=_sql_pq_topk())
def emb_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the third family next to hyperplane LSH
    and IVF): 64-dim vectors compress to 8 subspace codes (16 centroids
    per subspace, Lloyd-trained on the normalized corpus), queries scan
    the CODES with per-query lookup tables (asymmetric distance), and the
    ADC shortlist is exact-cosine reranked. At 10^10 vectors this is the
    memory story — 8 B of code per vector instead of 256 B of float32 —
    and the scan is one Arrow pass over the code table, shuffle-free
    until the tiny shortlist."""
    from creatorops_lakehouse_spark.operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    # oracle-fidelity guard: the DuckDB replay (_sql_pq_topk) trains its
    # codebooks over ALL embeddings, but train_pq_codebooks caps the
    # training sample at sample_cap=100_000 (ORDER BY id LIMIT) — above
    # that the two engines train on different data and the hash gate
    # would report a spurious mismatch on CORRECT output. Refuse rather
    # than false-alarm (the staging-guard pattern, queries/dedup.py).
    n_vec = emb.count()
    if n_vec > 100_000:
        raise ValueError(
            f"emb_ann_pq_topk's hash oracle replays training over the full "
            f"corpus and is only faithful up to train_pq_codebooks' "
            f"sample_cap=100,000 (got {n_vec:,} vectors); call "
            "operators/similarity.py pq_topk directly at scale"
        )
    books, codes = _pq_index_for(spark, sf_dir)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .collect()
    ]
    return pq_topk(codes, queries, books, emb, k=TOP_K, candidate_factor=16)


@query(
    "emb_ann_pq_recall_verdict",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM exact
    """,
)
def emb_ann_pq_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall contract for the PQ route: ≥ 60% of the exact
    cosine top-5 ids must survive 32^8-cell quantization + ADC shortlist +
    exact rerank (same floor discipline as the LSH/IVF verdicts — the
    corpus is weakly clustered, so the floor carries measured margin; a
    collapsed codebook or broken lookup-table indexing flips the hash)."""
    exact = emb_cosine_topk_bruteforce(spark, sf_dir)
    ann = emb_ann_pq_topk(spark, sf_dir)
    return _ann_recall_verdict(exact, ann, floor=0.6)


@query(
    "emb_ann_ivf_incremental_verdict",
    oracle=f"""
    WITH {_SQL_IVF_PROBE_RERANK}
    SELECT query_id, neighbor_id, cos_sim, rank,
           TRUE AS index_equals_fresh
    FROM topk
    """,
)
def emb_ann_ivf_incremental_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL IVF index maintenance under the end-to-end hash
    (operators/similarity.py::append_to_ivf_index): the corpus arrives
    as two batches — build the cell-partitioned index on batch 1
    (vec_id even), APPEND batch 2 (vec_id odd) under the same fixed
    quantizer — then run the identical probed top-k as
    ``emb_ann_ivf_topk`` against the grown index. Because cell
    assignment is a deterministic per-row rule, the appended index's
    content must equal a one-shot build of the full corpus
    (index_equals_fresh — two anti-joins on (neighbor_id, cell) in
    engine), and therefore the top-k matches the SAME Lloyd-replay
    oracle as the one-shot query: a drifted assignment, a dropped
    batch, or an append that landed outside its cell partition flips
    the hash at any SF. This is the rolling-corpus ANN story: admit
    cost ∝ batch (one assignment pass + partitioned append; the
    existing postings are never read), quantizer retrained offline.
    Scratch index deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.similarity import (
        _nearest_centroid,
        ann_ivf_topk_indexed,
        append_to_ivf_index,
        build_ivf_index,
    )
    from creatorops_lakehouse_spark.sources.tables import (
        TableSpec,
        read_table,
    )

    centroids, _ = _ivf_index_for(spark, sf_dir)  # same trained quantizer
    emb = load(spark, sf_dir, "embeddings")
    root = _tempfile.mkdtemp(prefix="snap_ivf_inc_")
    try:
        spec = TableSpec("ivf.inc_index", f"{root}/index", ("cell",))
        build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), centroids, spec)
        append_to_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 1), centroids, spec
        )

        grown = read_table(spark, spec).select("neighbor_id", "cell")
        fresh = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            _nearest_centroid(
                F.col("embedding").cast("array<double>"), centroids
            ).alias("cell"),
        )
        cols = ["neighbor_id", "cell"]
        equals_fresh = (
            grown.join(fresh, cols, "left_anti").count() == 0
            and fresh.join(grown, cols, "left_anti").count() == 0
        )

        queries_df = emb.filter(F.col("vec_id") < N_QUERIES)
        out = ann_ivf_topk_indexed(
            spark, spec, queries_df, centroids, k=TOP_K, nprobe=4
        ).withColumn(
            "index_equals_fresh", F.lit(bool(equals_fresh))
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "query_id long, neighbor_id long, cos_sim double, rank int, "
        "index_equals_fresh boolean",
    )


@query(
    "emb_ann_ivf_delete_verdict",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGN},
    probes AS (
        SELECT id AS query_id, v AS q_vec, cell FROM (
            SELECT e.id, e.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                       -2 * list_inner_product(e.v, c.cv)
                           + list_inner_product(c.cv, c.cv) ASC,
                       c.cell ASC) AS rn
            FROM corpus e CROSS JOIN c2 c WHERE e.id < {N_QUERIES}
        ) WHERE rn <= 4
    ),
    sims AS (
        SELECT p.query_id, a.id AS neighbor_id,
               list_cosine_similarity(p.q_vec, a.v) AS cos_sim
        FROM probes p JOIN cass a USING (cell)
        WHERE a.id <> p.query_id AND a.id % 10 <> 7
    ),
    topk AS (
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT query_id, neighbor_id, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, neighbor_id)
                       AS rank
            FROM sims
        ) WHERE rank <= {TOP_K}
    )
    SELECT query_id, neighbor_id, cos_sim, rank,
           TRUE AS erased_never_returned,
           TRUE AS compacted_equals_fresh,
           TRUE AS post_compact_stable
    FROM topk
    """,
)
def emb_ann_ivf_delete_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE-AWARE rolling IVF index under the end-to-end hash (VERDICT
    r12 item 4, operators/similarity.py::tombstone_ivf_vectors /
    compact_ivf_index): ``append_to_ivf_index`` handles growth; this row
    pins the erasure leg — a vector erased from the corpus (forget-user,
    DV delete on the embeddings table) must never surface from a probe
    OR hold a top-k slot, without rewriting the index.

    Lifecycle: build the cell-partitioned index on the FULL corpus under
    the shared Lloyd quantizer → tombstone every vec_id ≡ 7 (mod 10)
    (an id-set erasure, the forget-user shape) → probed top-k (nprobe=4,
    exact-cosine rerank) → compact. In-engine booleans:
    ``erased_never_returned`` (no returned neighbor carries an erased
    id), ``compacted_equals_fresh`` (after compaction the index content
    equals a fresh build over the survivors — two anti-joins on
    (neighbor_id, cell)), and ``post_compact_stable`` (the probe answers
    identically before and after compaction — the tombstone anti-join
    and the materialized erasure are the same view). The oracle replays
    the SAME Lloyd training + assignment + probe + rerank in SQL with
    the erased ids excluded from the CORPUS side only — a leaked
    tombstoned posting, a short top-k, or a compaction that dropped a
    survivor flips the hash at any SF. Eager verdict harness (excluded
    from bench); scratch index deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.similarity import (
        _nearest_centroid,
        ann_ivf_topk_indexed,
        build_ivf_index,
        compact_ivf_index,
        tombstone_ivf_vectors,
    )
    from creatorops_lakehouse_spark.sources.tables import (
        TableSpec,
        read_table,
    )

    centroids, _ = _ivf_index_for(spark, sf_dir)  # same trained quantizer
    emb = load(spark, sf_dir, "embeddings")
    root = _tempfile.mkdtemp(prefix="snap_ivf_del_")
    try:
        spec = TableSpec("ivf.del_index", f"{root}/index", ("cell",))
        build_ivf_index(emb, centroids, spec)
        tombstone_ivf_vectors(
            emb.filter(F.col("vec_id") % 10 == 7).select("vec_id"), spec
        )
        queries_df = emb.filter(F.col("vec_id") < N_QUERIES)
        pre = ann_ivf_topk_indexed(
            spark, spec, queries_df, centroids, k=TOP_K, nprobe=4
        ).collect()
        erased_never_returned = all(r.neighbor_id % 10 != 7 for r in pre)

        compact_ivf_index(spark, spec)
        survivors = emb.filter(F.col("vec_id") % 10 != 7)
        fresh = survivors.select(
            F.col("vec_id").alias("neighbor_id"),
            _nearest_centroid(
                F.col("embedding").cast("array<double>"), centroids
            ).alias("cell"),
        )
        compacted = read_table(spark, spec).select("neighbor_id", "cell")
        cols = ["neighbor_id", "cell"]
        compacted_equals_fresh = (
            compacted.join(fresh, cols, "left_anti").count() == 0
            and fresh.join(compacted, cols, "left_anti").count() == 0
        )
        post = ann_ivf_topk_indexed(
            spark, spec, queries_df, centroids, k=TOP_K, nprobe=4
        ).collect()
        post_compact_stable = {
            (r.query_id, r.neighbor_id, r.rank) for r in pre
        } == {(r.query_id, r.neighbor_id, r.rank) for r in post}
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        [
            (
                r.query_id, r.neighbor_id, r.cos_sim, r.rank,
                bool(erased_never_returned),
                bool(compacted_equals_fresh),
                bool(post_compact_stable),
            )
            for r in pre
        ],
        "query_id long, neighbor_id long, cos_sim double, rank int, "
        "erased_never_returned boolean, compacted_equals_fresh boolean, "
        "post_compact_stable boolean",
    )
