"""Distributed BPE trainer (operators/bpe.py): bit-parity with the
sequential classic, greedy-fuse edge cases, early stop, and the
corpus-independence of the training loop."""

from __future__ import annotations

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.operators.bpe import (
    train_bpe,
    train_bpe_sequential,
    word_frequencies,
)


def _wc(wf):
    return {r.word: r.cnt for r in wf.collect()}


def test_train_bpe_matches_sequential(spark):
    rows = [
        ("the quick brown fox the quick the the fox!",),
        ("lower lowest low lowly newer newest new news...",),
        ("it's we're 100% done, isn't it? yes it's done!",),
    ]
    wf = word_frequencies(spark.createDataFrame(rows, ["text"]))
    merges, vocab = train_bpe(wf, n_merges=8)
    assert merges == train_bpe_sequential(_wc(wf), 8)
    assert len(merges) == 8
    # every trained symbol reassembles its word exactly
    bad = vocab.filter(
        F.concat_ws("", F.col("symbols")) != F.col("word")
    ).count()
    assert bad == 0


def test_train_bpe_greedy_overlap_runs(spark):
    """'aaaa'-style runs: greedy left-to-right fuse must produce [aa][aa],
    never overlap — the classic off-by-one of naive pair replacement."""
    wf = spark.createDataFrame(
        [("aaaa", 10), ("aaa", 5), ("aa", 3)], ["word", "cnt"]
    )
    merges, vocab = train_bpe(wf, n_merges=2)
    ref = train_bpe_sequential({"aaaa": 10, "aaa": 5, "aa": 3}, 2)
    assert merges == ref == [("a", "a"), ("aa", "aa")]
    got = {r.word: r.symbols for r in vocab.collect()}
    assert got == {"aaaa": ["aaaa"], "aaa": ["aa", "a"], "aa": ["aa"]}


def test_train_bpe_early_stop_and_min_count(spark):
    # every pair unique -> nothing reaches min_count=2 -> zero merges
    wf = spark.createDataFrame([("ab", 1), ("cd", 1)], ["word", "cnt"])
    merges, _ = train_bpe(wf, n_merges=10, min_count=2)
    assert merges == []
    # single-char words only: no pairs at all
    wf1 = spark.createDataFrame([("a", 9), ("b", 4)], ["word", "cnt"])
    merges1, vocab1 = train_bpe(wf1, n_merges=3)
    assert merges1 == []
    assert {r.word: r.symbols for r in vocab1.collect()} == {
        "a": ["a"], "b": ["b"],
    }


def test_word_frequencies_is_the_only_corpus_pass(spark):
    """Training is a pure function of the frequency table: permuting the
    corpus's document layout leaves the table — and therefore every
    trained merge — identical. (Pre-tokens keep their leading space, so
    'cat' at line start and ' cat' mid-line are DIFFERENT pre-tokens;
    only layouts with equal pre-token multisets are equivalent.)"""
    a = spark.createDataFrame([("cat hat",), ("cat hat bat",)], ["text"])
    b = spark.createDataFrame([("cat hat bat",), ("cat hat",)], ["text"])
    wfa, wfb = word_frequencies(a), word_frequencies(b)
    assert _wc(wfa) == _wc(wfb)
    ma, _ = train_bpe(wfa, n_merges=4)
    mb, _ = train_bpe(wfb, n_merges=4)
    assert ma == mb == train_bpe_sequential(_wc(wfa), 4)


def test_bpe_encode_join_apply(spark):
    """Corpus encode by broadcast-joining the trained segmentation:
    totals equal the frequency-table mass, and an unseen word falls back
    to character segmentation."""
    from creatorops_lakehouse_spark.operators.bpe import bpe_encode

    corpus = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low news")], ["doc_id", "text"]
    )
    wf = word_frequencies(corpus)
    merges, vocab = train_bpe(wf, n_merges=5)
    enc = bpe_encode(corpus, vocab)
    got = {r.doc_id: (r.n_pretokens, r.n_tokens, r.n_chars) for r in enc.collect()}
    # two independent token-mass routes agree
    mass = vocab.selectExpr("sum(cnt * size(symbols)) AS m").collect()[0].m
    assert sum(v[1] for v in got.values()) == mass
    # a merge only shrinks: n_pretokens <= n_tokens <= n_chars
    assert all(p <= t <= c for p, t, c in got.values())

    # unseen corpus: every word char-falls-back (tokens == chars; the
    # pre-tokens are 'zzz' and ' qq' — the leading space is a character)
    other = spark.createDataFrame([(9, "zzz qq")], ["doc_id", "text"])
    fb = bpe_encode(other, vocab).collect()[0]
    assert (fb.n_pretokens, fb.n_tokens, fb.n_chars) == (2, 6, 6)


def test_bpe_verdict_refuses_big_vocab(spark, monkeypatch):
    """The single-node reference trainer's vocab collect must REFUSE an
    unexpectedly huge word-frequency table instead of OOMing the driver."""
    import pytest

    import creatorops_lakehouse_spark.queries.text as qt

    monkeypatch.setattr(qt, "MAX_REF_VOCAB", 3)
    with pytest.raises(ValueError, match="distinct words"):
        qt.docs_bpe_train_verdict(spark, "/root/testdata/sf0.001")
