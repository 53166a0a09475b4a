"""Sequence packing for LLM pretraining batches (concat-and-chunk).

Reference scope: the lakehouse curates event/document tables
(/root/reference/pipelines/silver/transform_local.py); this operator adds
the downstream packing step a training-data pipeline needs: lay every
document's tokens end-to-end in a deterministic global order and cut the
stream every ``budget`` tokens into fixed-size training sequences
(GPT-style concat-and-chunk — documents may straddle sequence boundaries).

Scale design (100 TB):
- The global prefix sum is the crux: a single Window over a global ORDER BY
  collapses to ONE partition — the classic scale bug. This implementation
  uses the textbook two-phase distributed scan instead: (1) one hash
  aggregate of per-range-bucket token sums (n_buckets tiny rows to the
  driver), (2) exclusive bucket offsets computed driver-side and joined
  back broadcast, (3) a per-bucket window (orderBy id WITHIN bucket) adds
  the local prefix. Each bucket's window runs in parallel; nothing global
  ever materializes on one executor.
- Buckets are id ranges (id div width), so bucket order == id order and
  the two-phase sum equals the global one exactly — which is what the
  DuckDB oracle (a plain global window) verifies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from creatorops_lakehouse_spark.operators.cache import scoped_persist
from creatorops_lakehouse_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document packing coordinates under concat-and-chunk at
    ``budget`` tokens per sequence, in ascending ``id_col`` order:

    (id_col, n_tokens, start_offset, first_seq, last_seq) — start_offset
    is the exclusive global prefix sum of token counts; a document covers
    training sequences first_seq..last_seq (inclusive; it straddles a
    boundary when they differ). Zero-token documents occupy no tokens but
    keep a well-defined position (first_seq == last_seq == the sequence
    their offset falls in).
    """
    # Persisted: three consumers (max-id agg, phase-1 bucket sums, phase-2
    # window) would otherwise each re-scan + re-tokenize the full corpus —
    # the dominant cost at the 100 TB scale this docstring targets. The
    # projection is 2 numeric-ish columns per doc, far smaller than text.
    counts = scoped_persist(
        df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
    )
    max_id = counts.agg(F.max(id_col).alias("m")).collect()[0].m
    if max_id is None:
        return counts.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("first_seq"),
            F.lit(0).cast("long").alias("last_seq"),
        )
    width = max(1, (int(max_id) + n_buckets) // n_buckets)
    bucketed = counts.withColumn("_bkt", F.expr(f"{id_col} div {width}"))
    # phase 1: per-bucket totals — ≤ n_buckets rows to the driver
    sums = {
        r._bkt: r.s
        for r in bucketed.groupBy("_bkt").agg(F.sum("n_tokens").alias("s")).collect()
    }
    running, offsets = 0, []
    for b in sorted(sums):
        offsets.append((b, running))
        running += sums[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_bkt", "_boff"])
    # phase 2: local exclusive prefix within each bucket + broadcast offset
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.join(F.broadcast(off_df), on="_bkt").withColumn(
        "start_offset",
        (F.col("_boff") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))).cast(
            "long"
        ),
    )
    return local.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {budget}").alias("first_seq"),
        F.expr(
            f"(start_offset + greatest(n_tokens - 1, 0)) div {budget}"
        ).alias("last_seq"),
    )


def packing_summary(packed: DataFrame, budget: int = 512) -> DataFrame:
    """One-row packing audit: total tokens, number of training sequences,
    documents straddling a boundary, and fill ratio of the final sequence
    in basis points (exact integers — engine-portable)."""
    return packed.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("last_seq") > F.col("first_seq"), 1).otherwise(0)).alias(
            "n_straddling"
        ),
    ).select(
        "total_tokens",
        "n_docs",
        "n_straddling",
        F.expr(f"(total_tokens + {budget} - 1) div {budget}").alias("n_seqs"),
        F.expr(
            f"CASE WHEN total_tokens % {budget} = 0 THEN 10000 "
            f"ELSE (10000 * (total_tokens % {budget})) div {budget} END"
        ).alias("last_fill_bp"),
    )


def shard_snake(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Balanced training-shard assignment by snake (boustrophedon)
    placement: rank all rows by (weight DESC, id ASC) and deal rank r into
    shard ``r%n`` on even passes, ``n-1-(r%n)`` on odd passes — the
    classic greedy layout that keeps per-shard weight sums within one
    item of each other on near-uniform weights, entirely deterministic,
    and (unlike first-fit bin packing) expressible as pure rank
    arithmetic so a SQL oracle can replay it exactly.

    This is the LAST step of a training-data pipeline: after dedup,
    quality gates, and packing, the corpus must land in N output shards
    (one per data-loader worker) with near-equal token budgets, or the
    slowest shard gates every training step.

    Scale shape: one :func:`distributed_global_rank` (range shuffle +
    per-partition window + broadcast offsets — no single-partition
    window), then the shard id is a Project. Writing the shards is then
    ``.repartition(n_shards, shard_col)`` or a partitionBy sink.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from creatorops_lakehouse_spark.operators.sampling import (
        distributed_global_rank,
    )

    ranked, _n = distributed_global_rank(
        df, [F.col(weight_col).desc(), F.col(id_col).asc()], "_srank"
    )
    return ranked.withColumn(
        shard_col,
        F.expr(
            f"CAST(CASE WHEN ((_srank - 1) div {n_shards}) % 2 = 0 "
            f"THEN (_srank - 1) % {n_shards} "
            f"ELSE {n_shards} - 1 - ((_srank - 1) % {n_shards}) "
            f"END AS INT)"
        ),
    ).drop("_srank")
