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


def auto_planes(n_rows: int, target_bucket: int = 500, lo: int = 4, hi: int = 32) -> int:
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


def plane_agreement_prob(cos_threshold: float) -> float:
    """P(one random hyperplane puts two vectors with cos=threshold on the
    same side) = 1 − θ/π (Goemans–Williamson / sign-LSH collision rate)."""
    import math

    return 1.0 - math.acos(max(-1.0, min(1.0, cos_threshold))) / math.pi


def auto_tables(
    n_planes: int,
    cos_threshold: float,
    recall_target: float = 0.9,
    max_tables: int = 32,
) -> int:
    """Hash-table count for a band-OR sign-LSH scheme hitting a recall
    floor: with L independent tables of b planes each, a pair at exactly
    cos=threshold collides in ≥1 table with probability 1 − (1 − p^b)^L
    where p = plane_agreement_prob(threshold). Solve for the smallest L.

    This is the fix for the single-table recall collapse: one table of b
    auto-sized planes has recall p^b, which DROPS as the corpus (and hence
    b) grows — at b=24, p(0.95)^24 ≈ 8%. Band-OR holds recall at the
    target while auto_planes holds per-table bucket occupancy, so candidate
    volume grows as L(b)·n·target_bucket ≈ n^(1+log2(1/p)) — mildly
    superlinear, the honest price of sign-LSH at high thresholds.
    ``max_tables`` caps runaway L for low thresholds/huge corpora; the cap
    is loud (logged), not silent."""
    import math

    p = plane_agreement_prob(cos_threshold) ** n_planes
    if p >= 1.0:
        return 1
    if p <= 0.0:
        return max_tables
    needed = math.ceil(math.log(1.0 - recall_target) / math.log(1.0 - p))
    if needed > max_tables:
        import warnings

        warnings.warn(
            f"auto_tables: {needed} tables needed for recall "
            f"{recall_target} at cos>={cos_threshold} with {n_planes} "
            f"planes; capping at {max_tables} (achieved recall ≈ "
            f"{1.0 - (1.0 - p) ** max_tables:.2f})",
            stacklevel=2,
        )
    return max(1, min(max_tables, needed))


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


def _table_planes(
    dim: int, n_planes: int, n_tables: int, seed: int
) -> list[list[list[float]]]:
    """Independent hyperplane sets, one per hash table (deterministic)."""
    return [
        random_hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)
    ]


def _pair_cosine_udf():
    """Arrow-batched cosine over (a_vec, b_vec) PAIR batches — the
    candidate-verification / rerank seam.

    Same justification as :func:`_lsh_buckets_udf`: the expression-level
    zip_with/aggregate fold is interpreted per element, so verifying a
    candidate set costs ~3 folds × dim interpreted lambda evals per pair
    (measured: ~1.7 s for 250k candidates at dim 64, vs ~0.2 s for the
    batched version).

    Accumulation is ``np.cumsum(..., axis=1)[:, -1]`` — a SEQUENTIAL
    left-to-right double fold, NOT einsum/matmul: numpy's pairwise-summed
    dot differs from the sequential fold in the last ulp, and a cosine one
    ulp from a ROUND(,4) boundary flips hash-checked counts against the
    oracle. The cumsum fold with ``num / (sqrt(na) * sqrt(nb))`` is
    bit-identical to BOTH the expression-level :func:`cosine` fold and
    DuckDB's ``list_cosine_similarity(DOUBLE[], DOUBLE[])`` (verified
    300/300 exact on random vectors, tests/test_similarity.py), so
    pair_cosine is safe for hash-checked exact baselines. Zero-norm
    vectors yield -1.0 on both engines (DuckDB's own zero-vector result —
    never flagged as similar) instead of engine-divergent NaN ordering."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        A = np.asarray(a.tolist(), dtype=np.float64)
        B = np.asarray(b.tolist(), dtype=np.float64)
        num = np.cumsum(A * B, axis=1)[:, -1]
        den = np.sqrt(np.cumsum(A * A, axis=1)[:, -1]) * np.sqrt(
            np.cumsum(B * B, axis=1)[:, -1]
        )
        ok = den > 0.0
        return pd.Series(np.where(ok, num / np.where(ok, den, 1.0), -1.0))

    return pandas_udf(_cos, "double")


def pair_cosine(a: Column, b: Column) -> Column:
    """Vectorized cosine for verification/rerank/baseline paths (see
    :func:`_pair_cosine_udf` — bit-identical to the expression fold and
    the DuckDB oracle; zero-norm → -1.0).

    Marked NON-DETERMINISTIC (r14, guide §4.4): it is deterministic in
    fact, but a threshold filter on the UDF's output column (the
    near-dup verify shape) otherwise gets pushed below the projection
    and Catalyst duplicates the ArrowEvalPython node — every candidate
    pair paid the cosine TWICE (confirmed in
    plans/r14/emb_neardup_pairs_before.txt, nodes 33+36). The marker
    pins one evaluation; output values are unchanged."""
    return _pair_cosine_udf().asNondeterministic()(
        a.cast("array<double>"), b.cast("array<double>")
    )


def _lsh_buckets_udf(tables: list[list[list[float]]]):
    """Arrow-batched pandas UDF: all L table bucket ids per vector in ONE
    numpy matmul (n × L·b plane dots → sign bits → per-table bucket ints).

    This is the third sanctioned Arrow seam (with multimodal decode and IVF
    centroid assignment), and for the same reason: expression-level
    zip_with/aggregate dots are interpreted per element, and L×b of them
    per row builds an expression tree whose codegen/eval cost dominates —
    measured ~18 s flat (data-size-independent) at 17 tables × 4 planes vs
    sub-second for the batched matmul. Sign ties (dot == 0) are
    measure-zero for Gaussian planes, so UDF and expression forms agree."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    L, b = len(tables), len(tables[0])
    P = np.asarray([p for tbl in tables for p in tbl], dtype=np.float64)  # L·b × d
    weights = 1 << np.arange(b, dtype=np.int64)

    def _sig(col):
        X = np.asarray(col.tolist(), dtype=np.float64)  # n × d
        S = (X @ P.T) > 0  # n × L·b sign bits
        buckets = (S.reshape(len(X), L, b) * weights).sum(axis=2)  # n × L
        return pd.Series([row.tolist() for row in buckets])

    return pandas_udf(_sig, "array<long>")


def _bucket_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: list[list[list[float]]],
    out_id: str,
) -> DataFrame:
    """Ids-only (out_id, table, bucket) — one row per (vector, table).

    Scale-critical: only three ints per (row, table) ever enter the bucket
    shuffle; vectors are joined back once per verified candidate (the same
    ids-only discipline as MinHash banding — an earlier single-table
    formulation carried the full vector through the self-join). Signatures
    come from one Arrow-batched matmul (:func:`_lsh_buckets_udf`);
    posexplode's position IS the table index."""
    sig = _lsh_buckets_udf(tables)
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(sig(F.col(vec_col).cast("array<double>"))).alias(
            "table", "bucket"
        ),
    )


def md5_integer_planes(
    dim: int, n_planes: int, n_tables: int, tag: str
) -> list[list[list[int]]]:
    """ENGINE-SHARED integer hyperplanes: coefficient (t, p, d) is the
    first 4 md5 hex chars of ``"{tag}:{t}:{p}:{d}"`` as an int, centered
    (−32768..32767 — a symmetric per-coordinate distribution, a valid
    sign-LSH family). Python hashlib, Spark ``md5``, and DuckDB ``md5``
    agree byte-for-byte, so a SQL oracle derives the IDENTICAL planes
    from the same strings — no float literals to ship, no gauss() order
    to replicate. Used by the replayable registry twins; the Gaussian
    float planes (:func:`random_hyperplanes`) stay the prod default."""
    import hashlib

    return [
        [
            [
                int(
                    hashlib.md5(f"{tag}:{t}:{p}:{d}".encode()).hexdigest()[:4],
                    16,
                )
                - 32768
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def _int_buckets_udf(tables: list[list[list[int]]], scale: int = 1_000_000):
    """Arrow-batched bucket ids over EXACT INTEGER arithmetic: vectors
    quantized to ``floor(v * scale)`` int64, planes already integer
    (:func:`md5_integer_planes`), sign bits from an int64 matmul.

    Why integers: the float Gaussian path's sign boundary (dot ≈ 0) is
    where cross-engine ulp differences could flip a bucket bit — numpy's
    blocked matmul and DuckDB's fold sum in different orders. An integer
    dot is ONE exact value in both engines, so the bucket ids (and hence
    the candidate set and the driver hash) are deterministic across
    engines by construction. |v| < ~9e9/scale stays inside int64 at
    dim 64 with 16-bit plane coefficients."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    L, b = len(tables), len(tables[0])
    P = np.asarray(
        [p for tbl in tables for p in tbl], dtype=np.int64
    )  # L·b × d
    weights = 1 << np.arange(b, dtype=np.int64)

    def _sig(col):
        X = np.asarray(col.tolist(), dtype=np.float64)
        # float64 product then floor — bit-identical to DuckDB's
        # CAST(floor(x * scale) AS BIGINT) on the same double input
        Q = np.floor(X * float(scale)).astype(np.int64)
        S = (Q @ P.T) > 0  # exact int64 dots
        buckets = (S.reshape(len(X), L, b) * weights).sum(axis=2)
        return pd.Series([row.tolist() for row in buckets])

    return pandas_udf(_sig, "array<long>")


def _int_bucket_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: list[list[list[int]]],
    out_id: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Ids-only (out_id, table, bucket) over the integer-exact signature
    (same shuffle discipline as :func:`_bucket_projection`)."""
    sig = _int_buckets_udf(tables, scale)
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(sig(F.col(vec_col).cast("array<double>"))).alias(
            "table", "bucket"
        ),
    )


def ann_lsh_topk_replayable(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 16,
    tag: str = "lshq",
    query_pred=None,
) -> DataFrame:
    """Engine-replayable sign-LSH top-k: md5-derived integer planes +
    integer-quantized vectors (:func:`_int_buckets_udf`) for the bucket
    stage, exact-cosine rerank ROUNDED to 4 decimals with id tie-break —
    the established cross-engine ranking discipline. Every stage is a
    deterministic function both engines compute identically, so the
    registered row is hash-checked end-to-end.

    Geometry is PINNED (not auto-sized): a static SQL oracle cannot
    re-derive corpus-dependent plane counts; the auto-sized Gaussian path
    (:func:`ann_lsh_topk`) remains the prod default and keeps its recall
    verdict. Same ids-only bucket shuffle + broadcast probe shape."""
    tables = md5_integer_planes(64, n_planes, n_tables, tag)
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    cb = scoped_persist(
        _int_bucket_projection(corpus, id_col, vec_col, tables, "neighbor_id")
    )
    qb = cb.filter(query_pred(F.col("neighbor_id"))).select(
        F.col("neighbor_id").alias("query_id"), "table", "bucket"
    )
    cands = (
        cb.join(F.broadcast(qb), on=["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    qv = corpus.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    sims = (
        cands.join(cv, on="neighbor_id")
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(pair_cosine(F.col("q_vec"), F.col("c_vec")), 4).alias(
                "cos_sim_r"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim_r", "rank")
    )


def replayable_plane_count(
    n_rows: int, target_bucket: int = 64, lo: int = 4, hi: int = 16
) -> int:
    """Corpus-scaled plane count by EXACT INTEGER rule — the smallest
    ``p`` in [lo, hi] with ``target_bucket * 2^p >= n_rows`` — so a SQL
    oracle derives the identical geometry with a CASE chain of integer
    comparisons (auto_planes' log2/ceil floats could differ by an ulp at
    the boundaries). Fixed planes are a measured scale bug: occupancy
    grows linearly and within-bucket pairs QUADRATICALLY (the r10 10×
    sweep caught the pinned 4-plane near-dup twin at 39× wall for 10×
    vectors); this rule holds expected occupancy ≈ target_bucket."""
    for p in range(lo, hi):
        if target_bucket * (1 << p) >= n_rows:
            return p
    return hi


def embedding_neardup_pairs_replayable(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 16,
    tag: str = "ndq",
) -> DataFrame:
    """Engine-replayable embedding near-dup pairs: integer-exact bucket
    collisions (see :func:`ann_lsh_topk_replayable`), verified with exact
    cosine rounded to 4 decimals (both engines filter the same rounded
    value, so the pair set is identical).

    ``n_planes=None`` (default) scales the plane count to the corpus by
    :func:`replayable_plane_count` — integer-exact, so the SQL oracle
    re-derives it — keeping candidate volume ~linear instead of the
    quadratic blowup a pinned geometry measured at 10× data. Tables stay
    fixed at 16, so threshold-floor recall DECLINES as planes grow with
    the corpus (band-OR needs more tables at scale — auto_tables); the
    recall CONTRACT lives on the auto-sized Gaussian prod path
    (:func:`embedding_neardup_pairs` + emb_neardup_recall_verdict), and
    the strongest pairs collide first (collision probability rises with
    cosine). This row's contract is oracle-replayability + sub-quadratic
    scaling."""
    if n_planes is None:
        n_planes = replayable_plane_count(df.count())
    tables = md5_integer_planes(64, n_planes, n_tables, tag)
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    b = scoped_persist(
        _int_bucket_projection(df, id_col, vec_col, tables, "vid")
    )
    cands = (
        b.select("table", "bucket", F.col("vid").alias("a_id"))
        .join(
            b.select("table", "bucket", F.col("vid").alias("b_id")),
            on=["table", "bucket"],
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    av = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    bv = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        cands.join(av, on="a_id")
        .join(bv, on="b_id")
        .select(
            "a_id",
            "b_id",
            F.round(pair_cosine(F.col("a_vec"), F.col("b_vec")), 4).alias(
                "cos_sim_r"
            ),
        )
        .filter(F.col("cos_sim_r") >= threshold)
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int | None = None,
    cos_floor: float = 0.8,
    recall_target: float = 0.9,
    seed: int = 42,
    dim: int = 64,
    query_pred=None,
) -> DataFrame:
    """Approximate cosine top-k: band-OR multi-table hyperplane buckets +
    exact rerank over the deduplicated candidate set — the 100 TB path
    where brute-force |q|×|corpus| is not affordable.

    ``n_planes=None`` sizes each table's plane count to the corpus
    (:func:`auto_planes`, constant bucket occupancy); ``n_tables=None``
    sizes the table count so a neighbor at cos ≥ ``cos_floor`` is retrieved
    with probability ≥ ``recall_target`` (:func:`auto_tables`). A single
    auto-sized table is NOT scale-safe: its recall p^b decays as the corpus
    grows b — band-OR holds the recall contract instead.

    When the probe set is a subset of the corpus, pass ``query_pred`` (a
    callable Column → Column predicate over the id column, e.g.
    ``lambda c: c < 8``) instead of ``queries``: the corpus bucket
    projection is computed ONCE and filtered for the probe side — one
    Arrow signature pass and one scan instead of two."""
    if (queries is None) == (query_pred is None):
        raise ValueError("pass exactly one of queries / query_pred")
    if n_planes is None:
        n_planes = auto_planes(corpus.count())
    if n_tables is None:
        n_tables = auto_tables(n_planes, cos_floor, recall_target)
    tables = _table_planes(dim, n_planes, n_tables, seed)
    if query_pred is not None:
        from creatorops_lakehouse_spark.operators.cache import scoped_persist

        queries = corpus.filter(query_pred(F.col(id_col)))
        cb = scoped_persist(
            _bucket_projection(corpus, id_col, vec_col, tables, "neighbor_id")
        )
        qb = cb.filter(query_pred(F.col("neighbor_id"))).select(
            F.col("neighbor_id").alias("query_id"), "table", "bucket"
        )
    else:
        cb = _bucket_projection(corpus, id_col, vec_col, tables, "neighbor_id")
        qb = _bucket_projection(queries, id_col, vec_col, tables, "query_id")
    cands = (
        cb.join(F.broadcast(qb), on=["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    sims = (
        cands.join(cv, on="neighbor_id")
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    return _rerank_topk(sims, k)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int | None = None,
    recall_target: float = 0.9,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold): band-OR
    multi-table hyperplane candidates, deduplicated ids-only, then verified
    with exact cosine (no false positives; recall ≥ ``recall_target`` at
    the threshold by :func:`auto_tables` band geometry).

    ``n_planes=None`` / ``n_tables=None`` auto-size both knobs — the
    scale-safe default (auto_planes pins per-table bucket occupancy,
    auto_tables pins recall; candidate volume then grows ~linearly in the
    corpus instead of quadratically as with any fixed plane count).

    target_bucket=64 (finer than the top-k default of 500): at a HIGH
    cosine threshold the per-plane agreement probability is high, so extra
    planes cost little recall per table while cutting junk candidates
    ~linearly — measured at 10× corpus: 25.1 s (B=500, 5 tables) → 5-7 s
    (B=50-125) with recall IMPROVING (89 997 → 90 000 true pairs), because
    auto_tables re-solves the table count for the finer geometry. A top-k
    search at low cos_floor wants the opposite (coarse buckets), hence the
    different defaults."""
    if n_planes is None:
        n_planes = auto_planes(df.count(), target_bucket=64)
    if n_tables is None:
        n_tables = auto_tables(n_planes, threshold, recall_target)
    tables = _table_planes(dim, n_planes, n_tables, seed)
    sig = _lsh_buckets_udf(tables)
    # vectors ride the bucket shuffle (corpus × n_tables × 512 B for
    # dim-64 doubles) so each (table, bucket) group verifies with ONE
    # in-group matmul — the candidate-pair materialization this replaces
    # joined 2 × dim doubles onto every candidate, occupancy× more bytes
    # at high thresholds where candidates vastly outnumber true pairs.
    assigned = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.posexplode(sig(F.col(vec_col).cast("array<double>"))).alias(
            "table", "bucket"
        ),
    )
    id_type = df.schema[id_col].dataType.simpleString()
    return (
        _grouped_allpairs_verify(assigned, ["table", "bucket"], id_type, threshold)
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
        # stable sort: exact distance ties (possible when two clusters
        # quantize to the same centroid) break to the LOWEST cell id — the
        # tie contract the SQL oracle replays with (d2 ASC, cell ASC)
        order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
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
    local_threshold: int = 100_000,
    quantize_scale: int | None = None,
) -> list[list[float]]:
    """Lloyd k-means over a deterministic sample (the IVF coarse quantizer).

    Initialization is deterministic (first k rows by id). ``sample_mod=m``
    trains on the deterministic 1/m subsample (id % m == 0) — the standard
    move at scale: quantizer quality needs a representative sample, not
    the corpus (faiss trains its coarse quantizers the same way).

    Adaptive execution, same shape as connected_components' local solve:
    - Sample ≤ ``local_threshold`` rows: collect once and run Lloyd in
      numpy on the driver. Each distributed iteration costs a fixed
      multi-stage latency (assignment UDF + posexplode + hash agg +
      collect ≈ seconds) that dwarfs the arithmetic for any sample that
      fits on the driver; the local path is the same algorithm with the
      same init and argmin tie-breaking (np.argmin → lowest id, matching
      argsort order in _nearest_cells_udf).
    - Larger samples: one assignment projection + one (cluster, dim) hash
      aggregate per iteration; only the k×dim centroid matrix ever
      reaches the driver. This is the 100 TB path — a 1e8-vector sample
      never materializes anywhere whole.

    The two paths can differ in the last ulp (numpy mean vs Spark
    sum-then-divide association) — admissible because the quantizer only
    CO-LOCATES candidates; every emitted pair is exact-cosine verified
    downstream, and recall contracts carry measured margins.

    ``quantize_scale=S`` floors every centroid coordinate to exact
    1/S units (floor(x·S)/S — floor, not round: round-half modes differ
    between engines) after initialization and after each Lloyd update.
    Quantized centroids are REPLAYABLE: an external engine re-running the
    same iterations reconstructs bit-identical centroids from the same
    integers, because ulp-level summation differences are absorbed unless
    a mean lands within ~1e-16·S of a quantization boundary. This is what
    lets the DuckDB oracle hash-check the full IVF top-k
    (queries/similarity.py::emb_ann_ivf_topk) and is the right portability
    contract for a persisted index at 100 TB (rebuild anywhere, same
    cells). At S=1e6 the quantizer's co-location quality is untouched.
    """
    import numpy as np

    def _q(arr):
        if quantize_scale is None:
            return arr
        return np.floor(arr * quantize_scale) / quantize_scale

    vecs = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None and sample_mod > 1:
        vecs = vecs.filter(F.col("_id") % sample_mod == 0)
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    head = vecs.orderBy("_id").limit(max(local_threshold + 1, k)).collect()
    if len(head) <= local_threshold:
        X = np.asarray([r.v for r in head], dtype=np.float64)  # sorted by id
        if len(X) == 0:
            return []
        C = _q(X[:k].copy())
        for _ in range(iters):
            d2 = (
                -2.0 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )  # ‖x‖² row-constant → dropped, as in _nearest_cells_udf
            assign = np.argmin(d2, axis=1)
            for c_id in range(len(C)):
                members = X[assign == c_id]
                if len(members):
                    C[c_id] = members.sum(axis=0) / len(members)
            C = _q(C)
        return [row.tolist() for row in C]

    vecs = scoped_persist(vecs)
    centroids = [list(_q(np.asarray(r.v))) for r in head[:k]]
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
        centroids = [list(_q(np.asarray(c))) for c in new]
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
            pair_cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
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


def append_to_ivf_index(
    corpus_batch: DataFrame,
    centroids: list[list[float]],
    spec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Admit a NEW batch of vectors into a persisted IVF index
    (:func:`build_ivf_index`) without touching the existing postings —
    the rolling-corpus form of index maintenance: the quantizer stays
    FIXED (retrain offline when drift warrants, then rebuild), each new
    vector is assigned to its nearest cell by the SAME deterministic
    rule as the build, and the batch appends into the cell partitions.
    Because assignment is per-row, append(b2) after build(b1) is
    byte-equal in content to build(b1 ∪ b2) — probes and partition
    pruning are unaffected. Cost: one Arrow-batched assignment pass over
    the BATCH plus a partitioned append; the existing index is never
    read or rewritten."""
    from creatorops_lakehouse_spark.sources.tables import write_table

    assert "cell" in spec.partition_by, "IVF index spec must partition by cell"
    assigned = corpus_batch.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        _nearest_centroid(F.col(vec_col).cast("array<double>"), centroids).alias("cell"),
    )
    write_table(assigned, spec, mode="append")


def _ivf_tombstone_spec(spec):
    """Sidecar table holding erased vector ids for a persisted IVF index
    (``<index_path>_tombstones``)."""
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    return TableSpec(
        f"{spec.name}_tombstones", spec.path.rstrip("/") + "_tombstones"
    )


def tombstone_ivf_vectors(ids_df: DataFrame, spec, id_col: str = "vec_id") -> None:
    """Erase vectors from a persisted IVF index WITHOUT rewriting it —
    the merge-on-read leg of rolling index maintenance (VERDICT r12
    item 4): ``append_to_ivf_index`` handles growth, this handles the
    forget-user / DV-delete flow. The ids append to a tombstone sidecar
    table; every :func:`ann_ivf_topk_indexed` probe anti-joins its
    postings against it (tombstones are erased ids only — tiny, so the
    anti-join broadcasts), so an erased vector can never be returned or
    hold a top-k slot. ``compact_ivf_index`` materializes the erasure.

    At 100 TB an erasure is one append of ids — the index's cell
    partitions are untouched; probe cost gains one broadcast anti-join
    against a set bounded by erasures since the last compaction."""
    from creatorops_lakehouse_spark.sources.tables import write_table

    write_table(
        ids_df.select(F.col(id_col).alias("neighbor_id")).distinct(),
        _ivf_tombstone_spec(spec),
        mode="append",
    )


def _apply_ivf_tombstones(spark, idx: DataFrame, spec) -> DataFrame:
    import os

    tomb = _ivf_tombstone_spec(spec)
    if not os.path.isdir(tomb.path):
        return idx
    from creatorops_lakehouse_spark.sources.tables import read_table

    return idx.join(
        F.broadcast(read_table(spark, tomb)), "neighbor_id", "left_anti"
    )


def compact_ivf_index(spark, spec) -> None:
    """Materialize the tombstones: rewrite the index minus the erased
    ids (one partitioned overwrite) and drop the tombstone sidecar —
    after this the index content equals :func:`build_ivf_index` over the
    surviving corpus, and probes pay no anti-join. The REORG/purge step
    of the erasure pair, run at maintenance cadence."""
    import os
    import shutil

    from creatorops_lakehouse_spark.sources.tables import (
        read_table,
        write_table,
    )

    tomb = _ivf_tombstone_spec(spec)
    if not os.path.isdir(tomb.path):
        return
    survivors = _apply_ivf_tombstones(spark, read_table(spark, spec), spec)
    # one materialized pass: the overwrite must not read the dirs it
    # replaces mid-write
    survivors = survivors.localCheckpoint(eager=True)
    write_table(survivors, spec, mode="overwrite", dynamic=False)
    shutil.rmtree(tomb.path, ignore_errors=True)


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
    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.tables import read_table

    probed = scoped_persist(_probe_queries(queries, centroids, nprobe, id_col, vec_col))
    cells = [r.cell for r in probed.select("cell").distinct().collect()]
    idx = read_table(spark, spec).filter(F.col("cell").isin(cells))
    # erased vectors (tombstone_ivf_vectors) never surface or hold a
    # top-k slot — the anti-join precedes the rerank
    idx = _apply_ivf_tombstones(spark, idx, spec)
    sims = (
        idx.join(F.broadcast(probed), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    return _rerank_topk(sims, k)


def _grouped_allpairs_verify(
    assigned: DataFrame,
    group_cols: list[str],
    id_type: str,
    keep_floor: float,
) -> DataFrame:
    """Per-group exact all-pairs cosine verification (applyInPandas):
    ``assigned`` carries ``group_cols`` + ``_id`` + ``_v`` (array<double>);
    each group's vectors arrive as one Arrow batch and an in-group matmul
    emits the a<b pairs with cos_sim >= ``keep_floor`` (UNROUNDED
    sequential-cumsum fold — bit-identical to pair_cosine / the expression
    fold / DuckDB's list_cosine_similarity; callers that round apply
    F.round JVM-side and pass a half-step-lowered floor). Zero-norm
    vectors yield -1.0 (never similar). Shuffle volume is corpus ×
    group-multiplicity vectors — occupancy× less than materializing
    candidate pairs and joining vectors onto both sides. Group occupancy
    is bounded by the caller's bucket geometry (constant cell occupancy /
    target_bucket), so the per-group matmul is bounded at any corpus
    size."""
    import numpy as np
    import pandas as pd

    out_schema = f"a_id {id_type}, b_id {id_type}, cos_sim double"

    def _group_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
        ids = pdf["_id"].to_numpy()[order]
        X = np.asarray(pdf["_v"].tolist(), dtype=np.float64)[order]
        norms = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
        # dot products as an explicit left-to-right fold over the dim axis
        # (see _pair_cosine_udf: pairwise-summed matmul differs in the
        # last ulp, which hash-checked ROUND(,4) thresholds can't absorb)
        num = np.zeros((n, n))
        for kk in range(X.shape[1]):
            num += X[:, kk, None] * X[None, :, kk]
        den = norms[:, None] * norms[None, :]
        ok = den > 0.0
        S = np.where(ok, num / np.where(ok, den, 1.0), -1.0)
        ai, bi = np.triu_indices(n, k=1)
        keep = S[ai, bi] >= keep_floor
        return pd.DataFrame(
            {
                "a_id": ids[ai[keep]],
                "b_id": ids[bi[keep]],
                "cos_sim": S[ai[keep], bi[keep]],
            }
        )

    return assigned.groupBy(*group_cols).applyInPandas(_group_pairs, out_schema)


def semantic_dedup_pairs(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.45,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    public): restrict the pair search to vectors sharing a coarse-quantizer
    cell, then verify candidates with exact cosine. Returns
    (a_id, b_id, cos_sim_r) with rounded cosine ≥ ``threshold``.

    Multi-assignment (``nprobe`` nearest cells per vector) recovers pairs
    that straddle a cell boundary — with single assignment the measured
    recall on the weakly-clustered driver corpus drops from ~80% to ~40%.

    Verification is PER-CELL (applyInPandas over cell groups): each cell's
    vectors arrive as one Arrow batch and an in-cell matmul emits only the
    pairs that clear ``threshold``. The earlier shape (ids-only cell
    self-join → dropDuplicates → join both 64-dim vectors back onto every
    candidate pair) shipped candidate_pairs × 2 vectors through the
    shuffle — occupancy× more bytes than this one, which shuffles
    corpus × nprobe vectors once and nothing per candidate. The surviving
    pair set (≥ threshold only) is orders of magnitude smaller than the
    candidate set, so the final dropDuplicates (same pair found via two
    shared cells) is cheap. Cell occupancy is held constant by k = n/50
    (the auto_planes argument), so the per-group matmul is bounded at any
    corpus size; skewed cells are bounded by the same geometry.

    The in-cell cosine accumulates with the same sequential cumsum fold as
    :func:`pair_cosine` — bit-identical to the expression-level fold and
    DuckDB's list_cosine_similarity, so hash-checked precision verdicts
    cannot flip on a summation-order ulp at a ROUND boundary; zero-norm
    vectors yield -1.0 (never similar), as everywhere in this module. The
    UDF emits the UNROUNDED fold (pre-filtered with a 1e-4 safety margin)
    and the threshold ROUND happens JVM-side with F.round — numpy's
    half-even binary rounding disagrees with Spark's shortest-decimal
    HALF_UP at decimal ties, which would create found-pairs the Spark-side
    exact baseline (also F.round) rejects.

    At 100 TB the centroid count scales with the corpus (constant cell
    occupancy) and the quantizer trains on a sample
    (train_ivf_centroids' sample_mod); beyond ~10⁵ cells train
    hierarchically (coarse split, then per-branch Lloyd) — cell assignment
    stays one Arrow matmul per batch either way."""
    probe = _nearest_cells_udf(centroids, nprobe)
    assigned = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.explode(probe(F.col(vec_col).cast("array<double>"))).alias("cell"),
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    margin = 10.0 ** (-round_digits) / 2 + 1e-9  # ROUND can lift by half-step
    return (
        _grouped_allpairs_verify(
            assigned, ["cell"], id_type, threshold - margin
        )
        .select(
            "a_id",
            "b_id",
            F.round(F.col("cos_sim"), round_digits).alias("cos_sim_r"),
        )
        .filter(F.col("cos_sim_r") >= threshold)
        .dropDuplicates(["a_id", "b_id"])
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.45,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus with semantic near-duplicates removed: connected components
    over the verified pair graph, keep the minimum-id representative per
    cluster (deterministic; SemDeDup keeps one representative per
    duplicate group — the id tiebreak makes the choice engine-portable).
    Ids-only anti join — vectors never enter the dedup shuffle."""
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    pairs = semantic_dedup_pairs(
        corpus, centroids, threshold, nprobe, id_col, vec_col
    ).select("a_id", "b_id")
    cc = connected_components(pairs)
    dropped = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(dropped, id_col, "left_anti")


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 4,
    sample_mod: int | None = None,
    sample_cap: int = 100_000,
    quantize_scale: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m``
    contiguous subspaces of dim/m and Lloyd-train ``k`` centroids per
    subspace on a deterministic sample — the third ANN family next to the
    hyperplane LSH and the IVF coarse quantizer, and the one that makes
    10^10-vector search MEMORY-feasible: a 64-dim float32 vector (256 B)
    compresses to m log2(k) bits (8 B at m=8, k=256).

    Training is driver-local numpy over an id-ordered bounded sample
    (``sample_mod`` thins like train_ivf_centroids; ``sample_cap`` hard-
    bounds the collect) — the faiss discipline: PQ codebooks need a
    REPRESENTATIVE sample (10^5 vectors), never the corpus. Vectors are
    L2-NORMALIZED before training and encoding, so the asymmetric-
    distance inner product approximates COSINE directly. Deterministic:
    first-k init, np.argmin lowest-index ties.

    ``k`` auto-caps at the sample size (tiny corpora).

    ``quantize_scale``: same replayable-centroid contract as
    :func:`train_ivf_centroids` — every codebook coordinate floored to
    exact 1/scale units after init and after each Lloyd update, so an
    external engine (the DuckDB oracle for emb_ann_pq_topk) reconstructs
    bit-identical codebooks.
    """
    import numpy as np

    def _q(arr):
        if quantize_scale is None:
            return arr
        return np.floor(arr * quantize_scale) / quantize_scale

    if dim % m != 0:
        raise ValueError(f"PQ: dim {dim} not divisible by m {m}")
    vecs = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None and sample_mod > 1:
        vecs = vecs.filter(F.col("_id") % sample_mod == 0)
    head = vecs.orderBy("_id").limit(sample_cap).collect()
    if not head:
        return []
    X = np.asarray([r.v for r in head], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(k, len(X))
    dsub = dim // m
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = _q(S[:k].copy())
        for _ in range(iters):
            d2 = -2.0 * (S @ C.T) + (C * C).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c_id in range(len(C)):
                members = S[assign == c_id]
                if len(members):
                    C[c_id] = members.sum(axis=0) / len(members)
            C = _q(C)
        books.append([row.tolist() for row in C])
    return books


def _pq_encode_udf(codebooks: list[list[list[float]]]):
    """mapInPandas encoder: normalized vector → m uint8-range codes
    (argmin L2 per subspace, lowest index on ties)."""
    import numpy as np
    import pandas as pd

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)

    def _encode(batches):
        for pdf in batches:
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            dsub = X.shape[1] // m
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                C = B[j]
                d2 = -2.0 * (S @ C.T) + (C * C).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame({"_id": pdf["_id"], "codes": list(codes.tolist())})

    return _encode


def build_pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus to PQ codes: ``(vec_id, codes array<int>)`` —
    one Arrow-batched numpy pass, no shuffle. Persist the result as the
    search index (build-once/probe-many, like build_ivf_index)."""
    src = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    out = src.mapInPandas(
        _pq_encode_udf(codebooks), schema="_id long, codes array<int>"
    )
    return out.select(F.col("_id").alias(id_col), "codes")


def pq_topk(
    corpus_codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    corpus_vecs: DataFrame,
    k: int = 5,
    candidate_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes + exact-cosine rerank.

    Each query precomputes one (m × k_codes) inner-product table against
    the codebooks (driver-side, tiny); scoring the corpus is then pure
    table lookups — ``score(x) = Σ_j dtab[j, code_j(x)]`` — one Arrow
    batch pass over the CODES (8 B/vector), never the raw vectors. Each
    batch emits its local top-``k·candidate_factor`` per query
    (exact for the global top-R: the global best R rows are within the
    union of per-batch best-R), the global ADC top-R candidates are
    exact-cosine reranked against the raw vectors, and ties break
    (ROUND(sim,4) DESC, neighbor_id ASC) like every other top-k here.

    ``queries`` is a collected list of (id, vector) — the probe set is
    bounded by contract (the sanctioned k-row metadata collect); the
    CORPUS side stays distributed end to end.
    """
    import numpy as np
    import pandas as pd

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    qids = [int(q[0]) for q in queries]
    Q = np.asarray([q[1] for q in queries], dtype=np.float64)
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    dsub = Q.shape[1] // m
    # dtabs[q][j][c] = q_sub_j · centroid_jc  (inner product == cosine
    # contribution, both sides normalized); shape (n_q, m, k_codes)
    dtabs = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ B[j].T for j in range(m)], axis=1
    )
    R = k * candidate_factor

    def _scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (B, m)
            ids = pdf["_id"].to_numpy()
            # scores[q, b] = Σ_j dtabs[q, j, codes[b, j]]
            scores = np.zeros((len(qids), len(codes)), dtype=np.float64)
            for j in range(m):
                scores += dtabs[:, j, codes[:, j]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                s = scores[qi]
                # exclude the query's own row BEFORE the local top-R cut:
                # cutting first would let the self row displace the R-th
                # non-self candidate in its batch, breaking the "union of
                # per-batch top-R ⊇ global top-R" exactness contract
                mask = ids != qids[qi]
                mids, ms = ids[mask], s[mask]
                take = min(R, len(mids))
                # deterministic local top-R: score desc, id asc
                order = np.lexsort((mids, -ms))[:take]
                out_q.extend([qids[qi]] * take)
                out_n.extend(mids[order].tolist())
                out_s.extend(ms[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score_pq": out_s}
            )

    cands = corpus_codes.select(
        F.col(id_col).alias("_id"), "codes"
    ).mapInPandas(_scan, schema="query_id long, neighbor_id long, score_pq double")
    cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
    from pyspark.sql import Window

    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("score_pq").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cands.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= R)
        .drop("_r", "score_pq")
    )
    # exact-cosine rerank against the raw vectors (same contract as LSH/IVF)
    qdf = shortlist.sparkSession.createDataFrame(
        [(int(i), list(map(float, v))) for i, v in zip(qids, Q)],
        "query_id long, q_vec array<double>",
    )
    joined = (
        shortlist.join(F.broadcast(qdf), "query_id")
        .join(
            corpus_vecs.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("n_vec"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_sim"), 4).desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
