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
