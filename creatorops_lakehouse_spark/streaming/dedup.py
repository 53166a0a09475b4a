"""Streaming near-duplicate-aware ingestion: probe the persisted MinHash
index per micro-batch, admit only novel documents, grow the index.

The 100 TB operating loop (operators/dedup.py::build_minhash_index's
docstring) run CONTINUOUSLY: a document stream lands in micro-batches;
each batch is deduplicated (a) against every previously-admitted document
via the persisted band index — cost scales with the BATCH, not the corpus
— and (b) within itself; survivors are appended to both the accepted
corpus and the index, so the next batch probes them too.

Reference scope: the reference's streaming surface is bronze event
ingestion (/root/reference/pipelines/bronze/ingest_local.py); near-dup
gating on the stream is part of the training-data tier built on top.

Delivery semantics: foreachBatch is AT-LEAST-ONCE, so every write is
keyed by ``p_batch`` (the micro-batch id) with dynamic partition
overwrite — a retried batch REPLACES its own partition in the accepted
table, the band index, and the shingle-set table instead of
double-appending (same idempotency discipline as streaming/stateful.py).
A crash between the accepted write and the index writes re-runs the whole
batch body and converges to the identical state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.operators.dedup import (
    _band_buckets,
    _token_sets,
    probe_minhash_index,
)
from creatorops_lakehouse_spark.sources.tables import (
    TableSpec,
    read_table,
    write_table,
)


def dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    bands_spec: TableSpec,
    sets_spec: TableSpec,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """One micro-batch's admission decision: the batch minus (a) docs
    near-duplicating an already-indexed doc, (b) all-but-the-minimum-id
    doc of every within-batch near-dup group. Pure function of
    (batch, index state) — re-running it yields the same survivors."""
    import os

    batch = batch_df.dropDuplicates([id_col])
    if os.path.exists(bands_spec.path):
        pairs = probe_minhash_index(
            spark, bands_spec, sets_spec, batch, threshold=threshold, id_col=id_col
        ).select("a_id", "b_id")
    else:
        # bootstrap: no index yet (first batch) — within-batch dedup only
        from creatorops_lakehouse_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            batch, id_col=id_col, threshold=threshold
        ).select("a_id", "b_id")
    ids = batch.select(F.col(id_col).alias("_bid"))
    tagged = (
        pairs.join(
            ids.select(F.col("_bid").alias("a_id"), F.lit(1).alias("_a_in")),
            "a_id",
            "left",
        )
        .join(
            ids.select(F.col("_bid").alias("b_id"), F.lit(1).alias("_b_in")),
            "b_id",
            "left",
        )
    )
    # both sides in batch → keep the min id (a_id, since pairs are
    # canonical a<b) and reject b; exactly one side in batch → reject it
    # (the other is an already-admitted indexed doc, which always wins)
    rejected = tagged.select(
        F.when(
            F.col("_a_in").isNotNull() & F.col("_b_in").isNotNull(), F.col("b_id")
        )
        .when(F.col("_a_in").isNotNull(), F.col("a_id"))
        .otherwise(F.col("b_id"))
        .alias(id_col)
    ).distinct()
    return batch.join(rejected, id_col, "left_anti")


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    bands_spec: TableSpec,
    sets_spec: TableSpec,
    accepted_spec: TableSpec,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> None:
    """foreachBatch body: dedup the batch, then write survivors +
    index growth, all partitioned by ``p_batch`` with dynamic overwrite
    (idempotent under foreachBatch's at-least-once replays)."""
    for spec in (bands_spec, sets_spec, accepted_spec):
        assert "p_batch" in spec.partition_by, (
            f"{spec.name}: streaming dedup specs must partition by p_batch "
            "(retry idempotency)"
        )
    survivors = dedup_batch(
        spark, batch_df, bands_spec, sets_spec, threshold, id_col
    ).persist()
    try:
        stamp = F.lit(int(batch_id)).alias("p_batch")
        write_table(
            survivors.withColumn("p_batch", stamp), accepted_spec, mode="overwrite"
        )
        sets = _token_sets(survivors, "text", id_col, ngram=2)
        write_table(sets.withColumn("p_batch", stamp), sets_spec, mode="overwrite")
        write_table(
            _band_buckets(sets, num_perm=64, bands=16).withColumn("p_batch", stamp),
            bands_spec,
            mode="overwrite",
        )
    finally:
        survivors.unpersist()


def dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    bands_spec: TableSpec,
    sets_spec: TableSpec,
    accepted_spec: TableSpec,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
):
    """readStream(json lines) → per-batch near-dup admission → partitioned
    sinks. Returns the started StreamingQuery (caller awaits/stops).

    ``max_files_per_trigger`` bounds each micro-batch to that many source
    files (availableNow honors it as a read limit) — the batch-replay
    equivalence verdict uses 1 to force one micro-batch per staged file."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: admit_batch(
                spark, df, bid, bands_spec, sets_spec, accepted_spec, threshold
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def accepted_corpus(spark: SparkSession, accepted_spec: TableSpec) -> DataFrame:
    """The admitted corpus across all batches (drop the plumbing column)."""
    return read_table(spark, accepted_spec).drop("p_batch")
