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


def test_shard_snake_placement_and_balance(spark):
    """Snake sharding: placement matches the sequential reference dealing
    (desc-weight rank, boustrophedon), every row lands in exactly one
    shard, and shard weight sums are near-equal on a skewed corpus."""
    from creatorops_lakehouse_spark.operators.packing import shard_snake

    n, k = 103, 4  # non-divisible count exercises the ragged last pass
    rows = [(i, ((i * 37) % 19) + 1) for i in range(n)]  # skewed weights
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id: r.shard_id for r in shard_snake(df, "w", "doc_id", k).collect()}

    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want, loads = {}, [0] * k
    for r0, (doc, w) in enumerate(order):
        s = r0 % k if (r0 // k) % 2 == 0 else k - 1 - (r0 % k)
        want[doc] = s
        loads[s] += w
    assert got == want  # exact placement parity incl. weight ties
    # balance: snake over desc weights keeps the spread within the
    # largest item
    assert max(loads) - min(loads) <= max(w for _, w in rows)
    # and the operator is deterministic across runs
    got2 = {r.doc_id: r.shard_id for r in shard_snake(df, "w", "doc_id", k).collect()}
    assert got2 == got


def test_shard_snake_single_shard_and_validation(spark):
    from creatorops_lakehouse_spark.operators.packing import shard_snake

    df = spark.createDataFrame([(1, 5), (2, 3)], "doc_id long, w long")
    assert {r.shard_id for r in shard_snake(df, "w", "doc_id", 1).collect()} == {0}
    with pytest.raises(ValueError, match="n_shards"):
        shard_snake(df, "w", "doc_id", 0)
