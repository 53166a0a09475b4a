"""Decontamination operator: n-gram overlap flagging + removal."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.decontam import (
    decontaminate,
    eval_ngram_set,
    ngram_contamination,
)

SHARED = "the quick brown fox jumps over the lazy dog tonight"
CLEAN = "completely different words about spark execution plans here"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, SHARED + " plus trailing context"),  # shares 5-grams with eval
            (2, CLEAN),  # no overlap
            (3, "prefix words then " + SHARED),  # shares 5-grams with eval
            (4, "tiny doc"),  # shorter than n -> whole-doc shingle
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame(
        [(100, "intro sentence then " + SHARED + " and more")],
        "doc_id long, text string",
    )


def test_flags_overlapping_docs_only(corpus, eval_df):
    flagged = ngram_contamination(corpus, eval_df, n=5)
    rows = {r.doc_id: r for r in flagged.collect()}
    assert set(rows) == {1, 3}
    for r in rows.values():
        assert 1 <= r.n_hit <= r.n_grams
        assert r.hit_bp == 10000 * r.n_hit // r.n_grams


def test_decontaminate_removes_flagged(corpus, eval_df):
    kept = decontaminate(corpus, eval_df, n=5)
    assert {r.doc_id for r in kept.collect()} == {2, 4}


def test_min_hits_threshold(corpus, eval_df):
    # SHARED has 10 tokens -> 6 distinct 5-grams; doc 3 additionally
    # shares the "then the quick brown fox" gram with eval (7 total).
    # min_hits above the max shared count clears the flag list.
    strict = ngram_contamination(corpus, eval_df, n=5, min_hits=8)
    assert strict.count() == 0


def test_stability_under_corpus_growth(spark, corpus, eval_df):
    """A doc's contamination verdict never depends on other corpus rows."""
    base = {
        r.doc_id: (r.n_grams, r.n_hit)
        for r in ngram_contamination(corpus, eval_df, n=5).collect()
    }
    extra = spark.createDataFrame(
        [(99, "unrelated filler text that changes nothing for others")],
        "doc_id long, text string",
    )
    grown = {
        r.doc_id: (r.n_grams, r.n_hit)
        for r in ngram_contamination(corpus.unionByName(extra), eval_df, n=5).collect()
    }
    for doc_id, stats in base.items():
        assert grown[doc_id] == stats


def test_eval_ngram_set_distinct(eval_df):
    grams = eval_ngram_set(eval_df, n=5)
    vals = [r.gram for r in grams.collect()]
    assert len(vals) == len(set(vals))
    assert all(len(g.split(" ")) == 5 for g in vals)


def test_short_doc_whole_shingle(spark, eval_df):
    """Docs shorter than n tokens shingle as the whole token string —
    only an exact (normalized) eval match flags them."""
    tiny_eval = spark.createDataFrame(
        [(1, "Tiny DOC!")], "doc_id long, text string"
    )
    tiny_corpus = spark.createDataFrame(
        [(2, "tiny doc"), (3, "tiny dog")], "doc_id long, text string"
    )
    flagged = ngram_contamination(tiny_corpus, tiny_eval, n=5)
    assert {r.doc_id for r in flagged.collect()} == {2}


def test_word_ngrams_udf_contract(spark):
    """r14 byte-level contract: the Arrow gram seam (_word_ngrams_udf)
    must equal the JVM word_ngrams expression EXACTLY — same grams, same
    first-occurrence order — over the full ASCII alphabet (the driver
    corpus alphabet is lowercase ASCII + space at all three SFs; this
    test pins the wider claim for every ASCII byte, upper/digit/punct
    included, plus NULL/empty/short-doc edges)."""
    from creatorops_lakehouse_spark.operators.decontam import (
        _word_ngrams_udf,
    )
    from creatorops_lakehouse_spark.operators.text import word_ngrams

    ascii_all = "".join(chr(c) for c in range(128))
    docs = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "UPPER Case MiXeD 123 tokens 456 with DIGITS and CAPS here"),
        (3, ascii_all),
        (4, ascii_all * 3),
        (5, "tiny doc"),  # shorter than n -> whole-doc gram
        (6, ""),  # token-less -> one empty gram
        (7, "!!! ??? ..."),  # separators only -> one empty gram
        (8, None),  # NULL text -> [NULL]
        (9, "a b c d e a b c d e a b c d e"),  # duplicate grams: distinct
        (10, "word " * 40),  # one repeated token -> one distinct gram
        (11, "tabs\tand\nnewlines\rand  double  spaces"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n in (2, 5):
        got = {
            r.doc_id: r.g
            for r in df.select(
                "doc_id", _word_ngrams_udf(n)(F.col("text")).alias("g")
            ).collect()
        }
        want = {
            r.doc_id: r.g
            for r in df.select(
                "doc_id", word_ngrams(F.col("text"), n).alias("g")
            ).collect()
        }
        assert got == want, f"gram seam diverges from expression at n={n}"


# ---- embedding-space decontamination ----------------------------------


def _vec(*xs):
    return [float(x) for x in xs]


@pytest.fixture(scope="module")
def emb_corpus(spark):
    # 1: parallel to eval vec (cos=1), 2: near-parallel, 3: orthogonal,
    # 4: antiparallel — only 1 and 2 are contaminated at threshold 0.9
    return spark.createDataFrame(
        [
            (1, _vec(2, 0, 0, 0)),
            (2, _vec(10, 1, 0, 0)),
            (3, _vec(0, 0, 3, 0)),
            (4, _vec(-1, 0, 0, 0)),
        ],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def emb_eval(spark):
    return spark.createDataFrame(
        [(100, _vec(1, 0, 0, 0)), (101, _vec(0, 1, 0, 0))],
        "vec_id long, embedding array<float>",
    )


def test_embedding_contamination_flags_and_counts(emb_corpus, emb_eval):
    from creatorops_lakehouse_spark.operators.decontam import (
        embedding_contamination,
    )

    rows = {
        r.vec_id: r
        for r in embedding_contamination(
            emb_corpus, emb_eval, threshold=0.9
        ).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1].n_eval_hits == 1 and rows[1].max_cos_r == 1.0
    # vec 2 ≈ (10,1)/|.| · (1,0) = 0.9950 — one eval hit, rounded cosine
    assert rows[2].n_eval_hits == 1
    assert abs(rows[2].max_cos_r - 0.995) < 1e-3


def test_embedding_decontaminate_removes_flagged(emb_corpus, emb_eval):
    from creatorops_lakehouse_spark.operators.decontam import (
        decontaminate_embeddings,
    )

    kept = {
        r.vec_id
        for r in decontaminate_embeddings(
            emb_corpus, emb_eval, threshold=0.9
        ).collect()
    }
    assert kept == {3, 4}


def test_embedding_contamination_empty_eval(spark, emb_corpus):
    from creatorops_lakehouse_spark.operators.decontam import (
        embedding_contamination,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_contamination(emb_corpus, empty).count() == 0


def test_embedding_contamination_eval_size_guard(emb_corpus, emb_eval):
    from creatorops_lakehouse_spark.operators.decontam import (
        embedding_contamination,
    )

    with pytest.raises(ValueError, match="max_eval_vectors"):
        embedding_contamination(emb_corpus, emb_eval, max_eval_vectors=1)
