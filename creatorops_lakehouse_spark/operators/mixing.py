"""Dataset mixture reweighting — subsample a corpus to target group
proportions (reference scope: the lakehouse's curation tier,
/root/reference/pipelines/silver/transform_local.py stage map; this
operator extends it with the data-mixing step every LLM training pipeline
runs between curation and packing: domain/language proportions are a
first-order lever on model quality).

Semantics: given integer target weights in basis points per group (e.g.
``{"en": 4000, "de": 1500, ...}``), find the LARGEST total sample size T
such that every group can supply its share (T = min over groups of
n_g × 10000 // w_g — the binding group is taken whole), then keep exactly
k_g = w_g × T // 10000 rows per group, chosen deterministically by content
hash. Groups not named in the weights are dropped (weight 0).

All arithmetic is exact integers (basis-point weights, floor division) and
selection uses the same sha256 hash-rank primitive as
``operators/sampling.py`` — reproducible across engines and runs, stable
audits outside Spark.

Scale design (100 TB):
- The per-group counts are ONE hash aggregate collected to the driver —
  group cardinality (languages, domains, sources) is tiny by construction.
  The target computation is driver-side integer math on that dict.
- Selection is one window shuffle on the group key (rank by hash within
  group), identical in shape to per_group_sample. Groups are few and
  large, so per-group rank is the skew-bounded cost; if a single group
  dominates at extreme scale, pre-filter with an approximate
  hash-threshold (keep if bucket < k_g/n_g × buckets, then exact-rank the
  ~k_g survivors) to cut the sorted volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from creatorops_lakehouse_spark.operators.sampling import hash_bucket

#: weights are expressed in basis points over this total
WEIGHT_SCALE = 10_000


def mixture_targets(
    counts: dict[str, int], weights_bp: dict[str, int]
) -> dict[str, int]:
    """Per-group keep counts k_g for the largest achievable total T.

    Raises when a weighted group is absent/empty (the mixture is
    unsatisfiable: its share of any T > 0 cannot be supplied)."""
    total_w = sum(weights_bp.values())
    if total_w != WEIGHT_SCALE:
        raise ValueError(
            f"mixture weights must sum to {WEIGHT_SCALE} bp, got {total_w}"
        )
    missing = [g for g in weights_bp if counts.get(g, 0) == 0 and weights_bp[g] > 0]
    if missing:
        raise ValueError(f"mixture groups absent from corpus: {missing}")
    t = min(counts[g] * WEIGHT_SCALE // w for g, w in weights_bp.items() if w > 0)
    return {g: w * t // WEIGHT_SCALE for g, w in weights_bp.items()}


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights_bp: dict[str, int],
) -> DataFrame:
    """Corpus subsampled to the target mixture: exactly k_g rows per
    weighted group (see :func:`mixture_targets`), selected by
    (sha256-bucket, key) rank within the group. Unweighted groups drop."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1))).collect()
    }
    targets = mixture_targets(counts, weights_bp)
    k_col = F.create_map(
        *[x for g, k in targets.items() for x in (F.lit(g), F.lit(k))]
    )[F.col(group_col)]
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_k", k_col)
        .filter(F.col("_k").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_k"))
        .drop("_k", "_rn")
    )
