"""Streaming near-dup admission: per-batch probe of the persisted MinHash
index, within-batch keep-min, retry idempotency, end-to-end stream run."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.sources.tables import TableSpec
from creatorops_lakehouse_spark.streaming.dedup import (
    accepted_corpus,
    admit_batch,
    dedup_ingest_stream,
)

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5, "completely different content about spark query engines and distributed joins"),
]
# 3 near-dups an ADMITTED doc (1); 6 is novel
BATCH2 = [
    (3, "the quick brown fox jumps over the lazy dog near the river bend today"),
    (6, "another unrelated document discussing parquet file formats and columnar storage"),
]


def _specs(tmp_path):
    return (
        TableSpec("t.bands", str(tmp_path / "bands"), partition_by=("p_batch",)),
        TableSpec("t.sets", str(tmp_path / "sets"), partition_by=("p_batch",)),
        TableSpec("t.accepted", str(tmp_path / "accepted"), partition_by=("p_batch",)),
    )


def test_admit_batches_cross_and_within(spark, tmp_path):
    bands, sets, accepted = _specs(tmp_path)
    b1 = spark.createDataFrame(BATCH1, ["doc_id", "text"])
    admit_batch(spark, b1, 0, bands, sets, accepted)
    got1 = {r.doc_id for r in accepted_corpus(spark, accepted).collect()}
    assert got1 == {1, 5}  # 2 rejected within-batch (keep min id)

    b2 = spark.createDataFrame(BATCH2, ["doc_id", "text"])
    admit_batch(spark, b2, 1, bands, sets, accepted)
    got2 = {r.doc_id for r in accepted_corpus(spark, accepted).collect()}
    assert got2 == {1, 5, 6}  # 3 rejected against the index; 6 admitted


def test_admit_batch_retry_is_idempotent(spark, tmp_path):
    bands, sets, accepted = _specs(tmp_path)
    b1 = spark.createDataFrame(BATCH1, ["doc_id", "text"])
    admit_batch(spark, b1, 0, bands, sets, accepted)
    b2 = spark.createDataFrame(BATCH2, ["doc_id", "text"])
    admit_batch(spark, b2, 1, bands, sets, accepted)
    before = sorted(
        (r.doc_id, r.text) for r in accepted_corpus(spark, accepted).collect()
    )
    # simulate foreachBatch replay of batch 1 (at-least-once delivery)
    admit_batch(spark, b2, 1, bands, sets, accepted)
    after = sorted(
        (r.doc_id, r.text) for r in accepted_corpus(spark, accepted).collect()
    )
    assert before == after
    # index state too: one partition per batch, no duplicated rows
    idx = spark.read.parquet(sets.path)
    assert idx.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_dedup_ingest_stream_end_to_end(spark, tmp_path):
    bands, sets, accepted = _specs(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for i, t in BATCH1 + BATCH2:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    q = dedup_ingest_stream(
        spark,
        str(src),
        "doc_id long, text string",
        bands,
        sets,
        accepted,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in accepted_corpus(spark, accepted).collect()}
    # one batch containing everything: 2 (exact dup) and 3 (near dup of 1)
    # rejected within-batch; 1, 5, 6 admitted
    assert got == {1, 5, 6}
    # stream is resumable: a second run over the same source is a no-op
    q2 = dedup_ingest_stream(
        spark,
        str(src),
        "doc_id long, text string",
        bands,
        sets,
        accepted,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert {r.doc_id for r in accepted_corpus(spark, accepted).collect()} == {1, 5, 6}
    assert os.path.exists(bands.path)


def test_native_drop_duplicates_within_watermark(spark, tmp_path):
    """Native exact-key streaming dedup (dropDuplicatesWithinWatermark):
    a key re-arriving in a later micro-batch within the watermark horizon
    is dropped; state for expired keys is evicted instead of growing
    forever (the API's contract vs plain dropDuplicates in streaming).
    Complements the custom NEAR-dup admission above — exact keys ride the
    built-in operator, similarity needs the index."""
    import uuid

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = {
        "b0": [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:05:00")],
        # key 1 re-arrives within the 1h horizon -> dropped; key 3 is new
        "b1": [(1, "2024-01-01 00:30:00"), (3, "2024-01-01 00:40:00")],
        # watermark advances one batch LATE and state cleanup runs after
        # a batch's dedup: two spacer batches push the wm past key 2's
        # expiry (00:05 + 1h) AND give the cleanup a batch to run in
        "b2": [(4, "2024-01-02 00:00:00")],
        "b3": [(5, "2024-01-02 01:00:00")],
        # key 2's state expired before this batch -> re-arrival is KEPT
        "b4": [(2, "2024-01-05 00:00:00")],
    }
    for i, (name, rs) in enumerate(rows.items()):
        path = os.path.join(src, f"{name}.json")
        with open(path, "w") as f:
            for k, ts in rs:
                f.write(json.dumps({"k": k, "ts": ts}) + "\n")
        os.utime(path, (1700000000 + i, 1700000000 + i))

    name = f"ddww_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {(r.k, str(r.ts)) for r in spark.table(name).collect()}
    assert got == {
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:05:00"),
        (3, "2024-01-01 00:40:00"),
        (4, "2024-01-02 00:00:00"),
        (5, "2024-01-02 01:00:00"),
        (2, "2024-01-05 00:00:00"),  # expired state -> legitimate re-emit
    }


def test_admission_verdict_refuses_big_corpus(spark, monkeypatch):
    """The verdict's micro-batch staging collect is corpus-bounded at test
    SFs but must REFUSE (not OOM the driver) if pointed at a big corpus —
    the cosine_topk guard pattern."""
    import pytest

    import creatorops_lakehouse_spark.queries.dedup as qd

    monkeypatch.setattr(qd, "MAX_STAGE_DOCS", 3)
    with pytest.raises(ValueError, match="refuses corpora above"):
        qd.docs_streaming_admission_verdict(spark, "/root/testdata/sf0.001")
