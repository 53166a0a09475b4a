"""Distributed byte-pair-encoding TRAINER (the full merge loop, not just
the first iteration docs_bpe_top_merges computes).

Reference scope: the lakehouse curates text (silver transform); this adds
the tokenizer-training step an LLM data pipeline runs next. The classic
BPE trainer (Sennrich et al. 2016; the Hugging Face / SentencePiece BPE
mode) never iterates over the corpus: it aggregates once to a WORD
FREQUENCY table and runs every merge iteration against that. That is the
whole 100 TB story here:

- ``word_frequencies``: ONE shuffle over the corpus (pre-token explode +
  hash aggregate). 100 TB of text collapses to |distinct pre-tokens| rows
  — a dimension-sized table.
- ``train_bpe``: K iterations over the vocab table only; each iteration
  is (a) a weighted adjacent-pair count (explode + aggregate over vocab),
  (b) ONE argmax row collected to the driver (count desc, pair asc —
  fully deterministic tie-break), (c) a pure-expression greedy merge of
  that pair inside every word's symbol array (F.aggregate fold, no UDF).
  Training cost is independent of corpus size once the frequency table
  exists — exactly why the single-node reference trainers are fine with
  the same loop, and why the distributed one matches them bit-for-bit.

The fold implements greedy LEFT-TO-RIGHT pair replacement (the BPE apply
rule): scanning symbols, when the accumulator's last symbol is ``a`` and
the next is ``b``, they fuse to ``ab``; the fused symbol participates in
further fusions only on later iterations — byte-for-byte the sequential
semantics, so the pytest pins equality against a pure-Python reference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from creatorops_lakehouse_spark.operators.text import bpe_pretokens


def word_frequencies(
    df: DataFrame, text_col: str = "text", pretoken: Column | None = None
) -> DataFrame:
    """(word, cnt) pre-token frequency table — the one corpus-sized pass
    of BPE training. ``pretoken`` overrides the text expression (e.g. a
    seeded column)."""
    src = bpe_pretokens(pretoken if pretoken is not None else F.col(text_col))
    return (
        df.select(F.explode(src).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _merge_pair_expr(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right fuse of adjacent (a, b) inside a symbol array,
    as a pure catalyst fold — no UDF, engine-side, codegen-friendly."""
    pa_, pb_ = F.lit(a), F.lit(b)

    def step(acc: Column, x: Column) -> Column:
        prev = F.element_at(acc, -1)
        fuse = (F.size(acc) > 0) & prev.eqNullSafe(pa_) & x.eqNullSafe(pb_)
        return F.when(
            fuse,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(prev, x)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.expr("cast(array() as array<string>)"), step
    )


def train_bpe(
    word_freq: DataFrame, n_merges: int, min_count: int = 2
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Run ``n_merges`` BPE merge iterations over a (word, cnt) table.

    Returns (merges, final_vocab) where ``merges`` is the ordered list of
    fused pairs and ``final_vocab`` has (word, cnt, symbols) with the
    trained segmentation. Stops early when no pair reaches ``min_count``.

    Each iteration shuffles only the vocab-sized pair table and collects
    exactly one argmax row; the symbol-merge rewrite is a pure expression.
    Lineage is cut with a scoped persist per iteration (the pagerank
    cadence) so K iterations stay K independent short jobs.
    """
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    vocab = word_freq.select(
        "word",
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("symbols"),
    ).filter(F.length("word") > 0)
    vocab = scoped_persist(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.filter(F.size("symbols") >= 2).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(symbols) - 1), "
                    "i -> struct(element_at(symbols, i) AS a, "
                    "element_at(symbols, i + 1) AS b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = vocab.withColumn(
            "symbols", _merge_pair_expr(F.col("symbols"), a, b)
        )
        nxt = scoped_persist(nxt)
        nxt.count()  # materialize before the parent cache is released
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def train_bpe_sequential(
    word_counts: dict[str, int], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Pure-Python reference trainer (the single-node classic) — the
    equality oracle for :func:`train_bpe` in tests and verdicts."""
    vocab = {w: list(w) for w in word_counts if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def bpe_encode(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretoken: Column | None = None,
) -> DataFrame:
    """Apply a trained segmentation to the corpus — the CORPUS-sized half
    of BPE, shaped for it: instead of replaying K merges over every
    occurrence (K folds over 100 TB), each pre-token occurrence broadcast-
    joins the trained vocab's (word → symbols) segmentation — the vocab
    is dimension-sized, the corpus never shuffles, and the result is
    identical because BPE segmentation is a pure function of the word.

    Unseen words (vocab trained elsewhere / new data) fall back to
    character segmentation — the worst-case correct encoding, matching
    what a real tokenizer's byte-fallback guarantees.

    Returns per-document (id_col, n_pretokens, n_tokens, n_chars).
    """
    src = bpe_pretokens(pretoken if pretoken is not None else F.col(text_col))
    pre = df.select(F.col(id_col), F.explode(src).alias("word")).filter(
        F.length("word") > 0
    )
    seg = vocab.select("word", F.size("symbols").alias("_n_sym"))
    joined = pre.join(F.broadcast(seg), "word", "left")
    n_sym = F.coalesce(F.col("_n_sym"), F.length("word"))  # char fallback
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pretokens"),
        F.sum(n_sym).cast("long").alias("n_tokens"),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
    )
