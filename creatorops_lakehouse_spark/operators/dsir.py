"""DSIR-style data selection via hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023, public):
estimate how target-domain-like each raw document is from the ratio of
target vs raw probability under hashed n-gram feature distributions, then
resample the raw corpus with probability proportional to that importance
weight. The published method works in log-space with floating point; this
implementation is an EXACT-INTEGER variant (scaled ratios, truncating
division, sha256 acceptance hashing) so the whole pipeline — feature
hashing, distribution estimation, per-doc scoring, the accept/reject
draw — is bit-reproducible and oracle-checkable in any engine, the same
determinism contract as operators/sampling.py.

Reference scope: the reference lakehouse curates events/documents
(/root/reference/pipelines/silver/transform_local.py) but has no
data-selection stage; this is part of the LLM-pipeline tier layered on
top of its corpus model.

Scale design (100 TB):
- Feature extraction is one projection (tokens → adjacent-pair bigrams →
  sha256 bucket) — no shuffle, no UDF, fused into the corpus scan.
- The bucket-distribution table is ``n_buckets`` rows (thousands) built
  by one hash aggregate; it joins back BROADCAST, so the per-doc scoring
  pass is scan + broadcast-join + one groupBy(doc) — a single shuffle on
  the doc id, carrying (id, bucket-ratio) ints only.
- Acceptance is per-row independent (hash of the doc id vs its score):
  stable under corpus growth, no global ordering, no driver state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from creatorops_lakehouse_spark.operators.sampling import hash_bucket
from creatorops_lakehouse_spark.operators.text import tokens

#: importance scale: score 10^4 == "as target-like as the target corpus
#: average"; doubles as the acceptance-hash space so score IS the
#: per-10^4 acceptance probability.
SCALE = 10_000


def bigram_multiset(text: Column) -> Column:
    """Adjacent token pairs, space-joined, multiplicity preserved
    (operators/text.py::word_ngrams is distinct — importance estimation
    needs occurrence counts). Documents with < 2 tokens yield []."""
    toks = tokens(text)
    cnt = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, cnt),
        F.slice(toks, 2, cnt),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(cnt > 0, pairs).otherwise(F.array().cast("array<string>"))


def importance_scores(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = SCALE,
) -> DataFrame:
    """Per-document scaled importance score toward the ``is_target`` slice.

    For each hashed-bigram bucket b: ratio_b = (scale * (tgt_b + 1)) div
    (raw_b + 1) (Laplace-smoothed, truncating integer division — exact in
    every engine). A document's score is the mean ratio over its bigram
    OCCURRENCES (again truncating div). score ≈ scale means "bigram
    profile indistinguishable from the corpus-wide target rate"; higher
    means target-typical. Returns (id_col, n_bigrams, score_scaled) with
    score_scaled = 0 for documents without bigrams.
    """
    feats = df.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(bigram_multiset(F.col(text_col))).alias("_g"),
    ).select(
        id_col, "_tgt", hash_bucket(F.col("_g"), n_buckets).alias("_b")
    )
    dist = feats.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_raw_n"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_tgt_n"),
    )
    ratios = dist.select(
        "_b",
        F.expr(f"({scale} * (_tgt_n + 1)) div (_raw_n + 1)").alias("_rb"),
    )
    scored = (
        feats.join(F.broadcast(ratios), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum("_rb").alias("_s"),
        )
        .select(
            id_col,
            F.col("_nb").cast("long").alias("n_bigrams"),
            F.expr("_s div _nb").cast("long").alias("score_scaled"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("score_scaled"), F.lit(0))
            .cast("long")
            .alias("score_scaled"),
        )
    )


def importance_resample(
    scores: DataFrame,
    id_col: str = "doc_id",
    scale: int = SCALE,
) -> DataFrame:
    """Deterministic importance-resampling verdict: accept a document iff
    sha256-bucket(id) in [0, scale) falls below its score — acceptance
    probability proportional to the importance weight (capped at 1 for
    scores above ``scale``), per-row independent, bit-reproducible."""
    return scores.withColumn(
        "accepted",
        hash_bucket(F.col(id_col), scale) < F.least(
            F.col("score_scaled"), F.lit(scale)
        ),
    )
