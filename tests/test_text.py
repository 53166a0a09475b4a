"""Text-operator pins: tokenizer, n-grams, language id, quality score,
normalization/fingerprint invariances."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.text import (
    char_ngrams,
    fingerprint,
    lang_id,
    normalize_text,
    quality_score,
    token_count,
    tokens,
    word_ngrams,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).collect()[0].v


def test_tokenizer(spark):
    assert _one(spark, "Hello, World!  42 times", tokens(F.col("text"))) == [
        "hello", "world", "42", "times",
    ]
    assert _one(spark, "", token_count(F.col("text"))) == 0


def test_word_ngrams(spark):
    assert _one(spark, "a b c d", word_ngrams(F.col("text"), 2)) == [
        "a b", "b c", "c d",
    ]
    assert _one(spark, "a", word_ngrams(F.col("text"), 3)) == ["a"]


def test_char_ngrams(spark):
    out = _one(spark, "abcd", char_ngrams(F.col("text"), 3))
    assert out == ["abc", "bcd"]


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog sat in the garden", lang_id(F.col("text"))) == "en"
    assert _one(spark, "der Hund und die Katze sind nicht da", lang_id(F.col("text"))) == "de"
    assert _one(spark, "el perro y la casa de los amigos", lang_id(F.col("text"))) == "es"
    assert _one(spark, "zzzz qqqq xxxx", lang_id(F.col("text"))) is None


def test_quality_score_bounds_and_ordering(spark):
    good = "The quick brown fox jumps over the lazy dog while seventeen sailors watch from a distant harbor pier in the golden evening light of autumn"
    junk = "!!! ??? ### 111 222 !!! ??? ### 111 222"
    s_good = _one(spark, good, quality_score(F.col("text")))
    s_junk = _one(spark, junk, quality_score(F.col("text")))
    assert 0.0 <= s_junk < s_good <= 1.0


def test_normalize_and_fingerprint_invariance(spark):
    a = _one(spark, "Hello,   World!", fingerprint(F.col("text")))
    b = _one(spark, "hello world", fingerprint(F.col("text")))
    c = _one(spark, "hello worlds", fingerprint(F.col("text")))
    assert a == b != c
    assert _one(spark, "  A  B\tC ", normalize_text(F.col("text"))) == "a b c"


def test_repetition_features_hand_computed(spark):
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.operators.text import repetition_features

    rows = [
        (1, "spam spam spam spam"),       # 3 bigrams, 1 distinct -> 6667 bp
        (2, "a\na\nb"),                   # 3 lines, 2 distinct -> 3334 bp dup
        (3, "ab abcd"),                   # mean word len 3.00 -> 300 c
        (4, "hi!!"),                      # 2 symbols / 4 chars -> 5000 bp
        (5, "the fox"),                   # 1 stopword / 2 tokens -> 5000 bp
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = repetition_features(F.col("text"))
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[e.alias(n) for n, e in sig.items()]
        ).collect()
    }
    assert got[1].rep_bigram_bp == 10000 - (10000 * 1) // 3
    assert got[2].dup_line_bp == 10000 - (10000 * 2) // 3
    assert got[3].mean_word_len_c == 300
    assert got[4].symbol_bp == 5000
    assert got[5].stopword_bp == 5000
    # non-repetitive prose scores 0 on both repetition axes
    assert got[3].rep_bigram_bp == 0 and got[3].dup_line_bp == 0


def test_rarity_scores_hand_computed(spark):
    from creatorops_lakehouse_spark.operators.rarity import (
        rarity_buckets,
        rarity_scores,
    )

    # df: shared=3 docs, pair=2, solo-a/solo-b/solo-c = 1 each
    docs = spark.createDataFrame(
        [
            (1, "shared pair soloa"),
            (2, "shared pair solob"),
            (3, "shared shared soloc"),  # 'shared' twice: occurrences count
        ],
        "doc_id long, text string",
    )
    scored = {r.doc_id: r for r in rarity_scores(docs).collect()}
    w_shared, w_pair, w_solo = 1_000_000 // 3, 1_000_000 // 2, 1_000_000
    assert scored[1].rarity_sum == w_shared + w_pair + w_solo
    assert scored[1].n_tokens == 3
    assert scored[1].rarity_mean_c == (w_shared + w_pair + w_solo) // 3
    assert scored[3].rarity_sum == 2 * w_shared + w_solo
    assert scored[3].rarity_mean_c == (2 * w_shared + w_solo) // 3
    buckets = {r.doc_id: r.bucket for r in rarity_buckets(rarity_scores(docs)).collect()}
    assert set(buckets) == {1, 2, 3}
    # doc 3 is the common-heavy one -> head (below corpus mean);
    # docs 1 and 2 are identical scores just above the mean -> middle
    assert buckets[3] == "head"
    assert buckets[1] == buckets[2] == "middle"


def test_rarity_zero_token_docs_omitted(spark):
    from creatorops_lakehouse_spark.operators.rarity import rarity_scores

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, "!!! ...")],
        "doc_id long, text string",
    )
    assert [r.doc_id for r in rarity_scores(docs).collect()] == [1]


def test_bpe_pretokens_hand_computed(spark):
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.operators.text import bpe_pretokens

    df = spark.createDataFrame(
        [
            (1, "it's a test"),
            (2, "we're 100% done..."),
            (3, "plain words only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.toks
        for r in df.select("doc_id", bpe_pretokens(F.col("text")).alias("toks")).collect()
    }
    assert got[1] == ["it", "'s", " a", " test"]
    assert got[2] == ["we", "'re", " 100", "%", " done", "..."]
    # pure lowercase words: pre-tokenization degenerates to whitespace words
    assert got[3] == ["plain", " words", " only"]
