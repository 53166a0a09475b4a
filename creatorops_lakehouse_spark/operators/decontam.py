"""Benchmark decontamination: remove training documents that overlap an
evaluation set (reference scope: the lakehouse's dedup/quality gates,
/root/reference/pipelines/silver/transform_local.py stage map; this
operator extends the same curation tier to eval-overlap, a standard step
in LLM training-data pipelines).

Semantics (GPT-3/PaLM-style n-gram decontamination): a corpus document is
*contaminated* when it shares at least ``min_hits`` distinct word n-grams
with any document in the evaluation set. Decontamination drops those rows.

Scale design (100 TB corpus, small eval set):
- The eval n-gram set is built once (explode + distinct) and BROADCAST:
  eval benchmarks are orders of magnitude smaller than the corpus, so the
  corpus side never shuffles its text. Even ~10M distinct eval n-grams is
  a few hundred MB — broadcastable; beyond that, switch the hint off and
  Spark falls back to a shuffle join on ``gram`` (the API takes a flag).
- Corpus docs are exploded to (id, gram) and hash-joined against the
  broadcast set; only MATCHING grams reach the per-doc aggregation, and
  partial (map-side) counting means the shuffle carries (id, count)
  pairs, not text.
- Contamination stats are exact integers (hit counts + basis points via
  integer division) so any engine reproduces them bit-for-bit.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from creatorops_lakehouse_spark.operators.text import _idiv, word_ngrams


def _word_ngrams_udf(n: int):
    """Arrow-batched pandas UDF: per-document distinct word ``n``-grams —
    the decontamination twin of the dedup signature seams (guide §4.2:
    hand whole batches to native code instead of interpreted expression
    trees). The JVM ``word_ngrams`` expression chain (lower + regex split
    + n zip_with slice-folds + array_distinct) is interpreted per element
    and measured as the dominant cost of every decontamination pass;
    CPython's C-level str.lower/re.split/str.join does the same corpus in
    a small fraction of the time (r14: 0.19 s single-threaded for the
    whole sf0.1 corpus vs a ~2 s JVM floor).

    EXACT-equality contract with :func:`word_ngrams` (pinned by
    tests/test_operators_decontam.py::test_word_ngrams_udf_contract over
    the full ASCII alphabet — the driver corpus alphabet, verified
    lowercase-ASCII + space at all three SFs):
    - tokens: maximal ``[a-z0-9]+`` runs of the lowercased text (Python
      str.lower == JVM lower == DuckDB lower on ASCII; the regex class is
      pure ASCII, so every non-matching code point is a separator in all
      three engines);
    - documents with fewer than ``n`` tokens yield their whole token
      sequence as ONE gram (the empty string for token-less documents);
    - dict.fromkeys preserves first-occurrence order == array_distinct;
    - NULL text yields a NULL array, matching the expression's null
      propagation.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    split = re.compile("[^a-z0-9]+").split

    def _grams(col):  # no annotations (Spark 4 signature inference)
        out = []
        for t in col:
            if t is None:
                out.append(None)  # word_ngrams(NULL) is NULL (propagated)
                continue
            toks = [x for x in split(t.lower()) if x]
            if len(toks) < n:
                out.append([" ".join(toks)])
            else:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
        return pd.Series(out)

    # nondeterministic marker (guide §4.4): Catalyst infers a
    # size(..)>0 constraint from the downstream explode and pushes it
    # below the projection, evaluating the gram UDF TWICE per corpus row
    # (confirmed: stacked ArrowEvalPython (3)+(6) in the first r14
    # after-plan). The marker pins one evaluation; values are unchanged
    # (the function is deterministic in fact).
    return pandas_udf(_grams, "array<string>").asNondeterministic()


def eval_ngram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word n-grams occurring anywhere in the eval set — the
    (small) probe side of decontamination. One column ``gram``.

    The gram array is materialized in its own projection before the
    explode: a nondeterministic expression may live in a Project but not
    inside a Generate."""
    return (
        eval_df.select(_word_ngrams_udf(n)(F.col(text_col)).alias("_g"))
        .select(F.explode("_g").alias("gram"))
        .distinct()
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination stats for corpus docs that share >=
    ``min_hits`` distinct n-grams with the eval set.

    Returns (id_col, n_grams, n_hit, hit_bp): total distinct n-grams in
    the doc, how many also occur in the eval set, and the contaminated
    fraction in basis points (integer, engine-portable).
    """
    grams = eval_ngram_set(eval_df, text_col, n)
    if broadcast_eval:
        grams = F.broadcast(grams)
    # Materialize the gram array as an ATTRIBUTE before exploding: putting
    # size(..) next to explode(..) of the same gram expression inlines it
    # into Generate's consume path, re-evaluating it per OUTPUT row —
    # measured 45x slower at sf0.1 with the expression form; the Arrow
    # seam (one ArrowEvalPython projection) has the same requirement.
    exploded = corpus.select(
        F.col(id_col), _word_ngrams_udf(n)(F.col(text_col)).alias("_grams")
    ).select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("n_grams"),
        F.explode("_grams").alias("gram"),
    )
    return (
        exploded.join(grams, "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") >= min_hits)
        .withColumn("hit_bp", _idiv(F.lit(10000) * F.col("n_hit"), F.col("n_grams")))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Corpus with contaminated documents removed (left anti join on the
    flagged ids — ids only, so the anti-join shuffle never carries text).

    No broadcast hint on the flagged side: its size is bounded by the
    CORPUS (contamination can cover a large fraction of it), not by the
    eval set, so forcing a broadcast risks driver OOM at exactly the scale
    this module targets. AQE picks a broadcast anti join at runtime
    whenever the flagged side turns out small — the common case."""
    flagged = ngram_contamination(
        corpus, eval_df, text_col, id_col, n, min_hits, broadcast_eval
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def contamination_gram(text: Column, n: int = 5) -> Column:
    """The shared shingle definition (distinct word n-grams) — exposed so
    audits/oracles can reproduce the exact gram set."""
    return word_ngrams(text, n)


#: embedding_contamination collects the eval matrix to the driver; above
#: this row count the collect is a design smell (see docstring) and the
#: call refuses unless the caller raises the cap explicitly.
MAX_EVAL_VECTORS = 200_000


def embedding_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    max_eval_vectors: int = MAX_EVAL_VECTORS,
) -> DataFrame:
    """Embedding-space decontamination (the semantic complement of the
    n-gram overlap check): a corpus vector is *contaminated* when its
    cosine similarity to ANY eval-set vector reaches ``threshold`` after
    rounding to ``round_digits`` (rounding on both engines makes the
    boundary comparison oracle-portable).

    Returns (id_col, n_eval_hits, max_cos_r) for flagged vectors only:
    how many eval vectors the row collides with, and its highest rounded
    cosine against the eval set.

    Scale design (100 TB corpus, small eval set):
    - The eval matrix is collected ONCE to the driver (eval benchmarks are
      thousands of rows — ``max_eval_vectors`` guards the collect) and
      shipped in the UDF closure, i.e. broadcast: the corpus side is a
      single Arrow-batched projection — ZERO shuffle of corpus data; the
      only shuffle is one (id, hits, max) row per FLAGGED document into
      the final filter.
    - Each Arrow batch is one numpy matmul against the eval matrix
      (batch × dim @ dim × n_eval) — the sanctioned similarity-math seam
      (PLAN_AUDIT.md): expression-level fold dots would cost ~3 folds ×
      dim interpreted evals per pair.
    - For eval sets too large to broadcast, compose the LSH route instead:
      bucket both sides with ann_lsh_topk's band-OR projection and verify
      candidates exactly — same candidates-then-verify shape as near-dup.
    """
    import numpy as np
    import pandas as pd

    eval_rows = eval_df.select(F.col(vec_col).cast("array<double>")).collect()
    if len(eval_rows) > max_eval_vectors:
        raise ValueError(
            f"embedding_contamination collected {len(eval_rows):,} eval "
            f"vectors (> max_eval_vectors={max_eval_vectors:,}); broadcast "
            "decontamination is for small eval sets — use the LSH "
            "candidates-then-verify route for corpus-scale eval sides."
        )
    E = np.asarray([r[0] for r in eval_rows], dtype=np.float64)  # m × d
    if E.size == 0:
        return corpus.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_eval_hits"),
            F.lit(0.0).alias("max_cos_r"),
        ).limit(0)
    # Norms via cumsum = SEQUENTIAL left-to-right double fold — matches the
    # DuckDB oracle's list_cosine_similarity accumulation bit-for-bit
    # (np.sum's pairwise summation differs in the last ulp, which flips
    # ROUND(,4) values sitting on a rounding boundary — the hash-checked
    # max_cos_r column cannot absorb that).
    e_norm = np.sqrt(np.cumsum(E * E, axis=1)[:, -1])  # ‖e‖, kept separate so
    # the computed quantity is literally (x·e)/(‖x‖‖e‖) — the oracle's formula

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, n_eval_hits long, max_cos_r double"

    # mapInPandas, not a scalar pandas_udf returning a struct: projecting
    # two fields out of a struct-valued UDF collapses into TWO stacked
    # ArrowEvalPython nodes (one per field reference — the matmul runs
    # twice); one map pass also lets the flag filter run Python-side, so
    # only flagged (id, hits, max) rows ever leave the UDF.
    def _scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["_v"].tolist(), dtype=np.float64)  # n × d
            x_norm = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            # BLAS matmul fast path. The oracle accumulates each dot
            # left-to-right in double; BLAS pairwise summation can differ
            # in the last ulp, which only changes ROUND(,4) for cosines
            # sitting essentially ON a rounding boundary. So: matmul
            # everything, then re-fold sequentially ONLY the entries within
            # 1e-9 of a half-step boundary (|error| between the two
            # summation orders is < ~1e-13, so any entry that could round
            # differently is inside that band — a near-empty set).
            num = X @ E.T
            den = x_norm[:, None] * e_norm[None, :]
            ok = den > 0.0
            # zero-norm → -1.0 (DuckDB's own zero-vector cosine) instead of
            # NaN, whose ordering the two engines disagree on.
            S = np.where(ok, num / np.where(ok, den, 1.0), -1.0)
            scale = 10.0 ** round_digits
            scaled = S * scale
            # distance (in scaled units) to the nearest x.5 rounding edge
            edge_dist = 0.5 - np.abs(scaled - np.round(scaled))
            risky = ok & (edge_dist < 1e-9 * scale)
            for i, j in zip(*np.nonzero(risky)):
                acc = 0.0
                for k in range(E.shape[1]):  # the oracle's exact fold order
                    acc += X[i, k] * E[j, k]
                S[i, j] = acc / den[i, j]
            R = np.round(S, round_digits)
            hits = (R >= threshold).sum(axis=1).astype("int64")
            keep = hits >= 1
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    "n_eval_hits": hits[keep],
                    "max_cos_r": R.max(axis=1)[keep],
                }
            )

    narrowed = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    return narrowed.mapInPandas(_scan, out_schema)


def decontaminate_embeddings(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus with embedding-contaminated rows removed (ids-only anti
    join; same no-forced-broadcast reasoning as :func:`decontaminate` —
    the flagged side is bounded by the corpus, so AQE decides)."""
    flagged = embedding_contamination(
        corpus, eval_df, threshold, id_col, vec_col
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")
