"""Unit pins for the LLM-prep operators: packing prefix-sum correctness
(vs a sequential reference), chunk-grid edges, PII pattern semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)
from creatorops_lakehouse_spark.operators.pii import pii_counts, redact
from creatorops_lakehouse_spark.operators.text import chunk_windows


def test_pack_sequences_matches_sequential_reference(spark):
    """Two-phase distributed prefix sum == plain sequential packing, with
    deliberately non-uniform ids (gaps, empty docs) across many buckets."""
    rows = []
    texts = {}
    for i in range(0, 400, 3):  # gappy ids → uneven buckets
        words = "w " * (i % 17)  # includes zero-token docs
        rows.append((i, words))
        texts[i] = i % 17
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_seq, r.last_seq)
        for r in pack_sequences(df, budget=50, n_buckets=7).collect()
    }
    running = 0
    for i in sorted(texts):
        n = texts[i]
        first = running // 50
        last = (running + max(n - 1, 0)) // 50
        assert got[i] == (n, running, first, last), f"doc {i}"
        running += n


def test_packing_summary_straddlers(spark):
    df = spark.createDataFrame(
        [(0, "a " * 30), (1, "b " * 30), (2, "c " * 30)], ["doc_id", "text"]
    )
    s = packing_summary(pack_sequences(df, budget=50), budget=50).collect()[0]
    assert s.total_tokens == 90
    assert s.n_seqs == 2
    assert s.n_straddling == 1  # doc 1 spans the 50-token boundary
    assert s.last_fill_bp == 8000  # 40/50 of the final sequence used


def test_chunk_windows_grid_edges(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(33))),  # 33 toks → 3 chunks
            (2, "one two"),  # shorter than size → 1 truncated chunk
            (3, ""),  # empty → no chunks
        ],
        ["doc_id", "text"],
    )
    rows = chunk_windows(df, size=32, stride=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3
    c = {r.chunk_idx: r for r in by_doc[1]}
    assert c[0].n_chunk_tokens == 32 and c[0].chunk_text.startswith("t0 t1 ")
    assert c[1].n_chunk_tokens == 17 and c[1].chunk_text.startswith("t16 ")
    assert c[2].n_chunk_tokens == 1 and c[2].chunk_text == "t32"
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert 3 not in by_doc


@pytest.mark.parametrize(
    "text,kind,n",
    [
        ("mail me at a.b+c@ex-ample.co.uk now", "email", 1),
        ("hosts 10.0.0.1 and 192.168.255.3", "ipv4", 2),
        ("call +1 555-0123456 today", "phone", 1),
        ("ssn-like 123456789 and card 1234567890123456", "id_number", 2),
        ("no pii here at all", "email", 0),
    ],
)
def test_pii_detection_cases(spark, text, kind, n):
    df = spark.createDataFrame([(text,)], ["t"])
    counts = pii_counts(F.col("t"))
    got = df.select(counts[kind].alias("c")).collect()[0].c
    assert got == n, f"{kind} on {text!r}"


def test_pii_redaction_is_clean(spark):
    text = "a@b.co, 10.1.2.3, +1 555-0123456, id 123456789 end"
    df = spark.createDataFrame([(text,)], ["t"])
    red = df.select(redact(F.col("t")).alias("r")).collect()[0].r
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red and "<ID>" in red
    # re-scan the redacted string: nothing may remain
    rescanned = spark.createDataFrame([(red,)], ["t"])
    for kind, col in pii_counts(F.col("t")).items():
        assert rescanned.select(col.alias("c")).collect()[0].c == 0, kind
