"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need splits that are (a) reproducible across runs,
(b) stable under corpus growth (a doc's split never changes when other docs
arrive), and (c) auditable outside the engine. Spark's ``randomSplit`` is
none of these — it is partition-order-dependent. The portable primitive is
a cryptographic content hash of the row KEY: sha2 is bit-identical in every
engine (unlike xxhash64/murmur3 whose seeds/variants differ), so the same
row lands in the same split in Spark, DuckDB, or a Python audit script.

All pure Column expressions — one projection, no shuffle, no UDFs. At
100 TB a split assignment is free (fused into whatever scan reads the
corpus); the per-group sampler costs one window shuffle on the group key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: bucket space for split thresholds: 10^4 → 0.01% granularity
N_BUCKETS = 10_000


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets): first 32 bits of
    sha256(key-as-string), mod n_buckets.

    DuckDB equivalent (exact):
    ``CAST('0x' || substr(sha256(CAST(key AS VARCHAR)), 1, 8) AS BIGINT)
    % n_buckets``.
    """
    return (
        F.conv(F.substring(F.sha2(key.cast("string"), 256), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def split_column(
    key: Column, splits: dict[str, float], n_buckets: int = N_BUCKETS
) -> Column:
    """Named-split assignment from cumulative hash-bucket thresholds.

    ``splits`` maps name → fraction (must sum to ≤ 1; any remainder falls
    into the last split). Assignment is per-row independent: adding or
    removing other rows never moves a row across splits.
    """
    total = sum(splits.values())
    assert total <= 1.0 + 1e-9, f"split fractions sum to {total} > 1"
    bucket = hash_bucket(key, n_buckets)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = bucket < int(round(cum * n_buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def stratified_split(
    df: DataFrame, key_col: str, splits: dict[str, float]
) -> DataFrame:
    """Attach a ``split`` column (see :func:`split_column`)."""
    return df.withColumn("split", split_column(F.col(key_col), splits))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep a stable ~``fraction`` subset: rows whose hash bucket falls
    below fraction × n_buckets. Repeatable across engines and runs."""
    return df.filter(hash_bucket(F.col(key_col), n_buckets) < int(round(fraction * n_buckets)))


def per_group_sample(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Deterministic k rows per group: rank by (hash bucket, key) inside
    each group and keep the first k — a reproducible stand-in for
    per-group reservoir sampling (balanced eval-set curation). One window
    shuffle on the group key."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def epoch_order(
    df: DataFrame, key_col: str, epoch: int, n_buckets: int = 1 << 32
) -> DataFrame:
    """Deterministic per-epoch training order: attach ``epoch_pos``, the
    row's position under the epoch-keyed hash permutation
    sha256(epoch || key).

    Training loops need a different document order every epoch that is
    nevertheless REPRODUCIBLE (resume from a checkpoint mid-epoch, re-run
    an ablation bit-for-bit) and cheap at 100 TB. Sorting by a salted
    cryptographic hash gives both: the order is uniform-pseudorandom per
    epoch, identical across engines/runs, and computing it is one
    projection — writers consume it as a sort key (one global sort, the
    unavoidable cost of ANY explicit ordering) or bucket it for
    partitioned shuffling without a global sort at all.

    ``epoch_pos`` is the dense 0-based rank under (hash-bucket, key) —
    the key tiebreak makes the permutation total even on bucket
    collisions. The rank is computed with a single window over the hash
    order; at cluster scale prefer writing sorted-by-(_eb, key) files and
    letting consumers stream them in order instead of materializing the
    rank (the two-phase distributed prefix sum in operators/packing.py is
    the pattern if a materialized global position is genuinely needed).
    """
    eb = hash_bucket(
        F.concat(F.lit(f"e{epoch}:"), F.col(key_col).cast("string")),
        n_buckets,
    )
    w = Window.orderBy(eb.asc(), F.col(key_col).asc())
    return df.withColumn(
        "epoch_pos", (F.row_number().over(w) - 1).cast("long")
    )
