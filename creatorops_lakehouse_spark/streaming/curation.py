"""Streaming ingestion into the ROLLING curation corpus — the composition
a 100 TB training-data pipeline actually runs: documents land as files,
Structured Streaming discovers them, and each micro-batch admits through
curation.curate_increment (quality → exact-dedup probe → near-dup probe →
split → decontam, against the persisted state indexes).

Delivery semantics: foreachBatch is AT-LEAST-ONCE — a crash between the
sink work and the checkpoint commit redelivers the batch. Admission is
idempotent WITHOUT any work here because curate_increment's state appends
are exactly-once PER TABLE under the snapshot log's txn map keyed by the
micro-batch id (a replayed batch pins its pre-batch state via the txn
walk, recomputes the same stage outputs, and completes only the missing
appends). The micro-batch id is the batch id — monotone by construction
from the stream's checkpoint, which is exactly the admission-order
contract curate_increment enforces.

Scale: each micro-batch pays batch-sized shuffles plus one scan of the
state indexes (partition-pruned on a bucketed 100 TB layout); no state
table is ever rewritten. Run optimize_curation_state between batches on
a maintenance cadence to keep the per-batch commit dirs packed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def curation_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    root: str,
    checkpoint_dir: str,
    config=None,
    max_files_per_trigger: int | None = None,
):
    """readStream(json lines of doc_id/text/lang) → per-micro-batch
    curate_increment into the rolling state under ``root``. Returns the
    started StreamingQuery (caller awaits/stops). ``availableNow``
    drains what exists and stops — the incremental-batch cadence; a
    long-lived trigger is the same body."""
    from creatorops_lakehouse_spark.curation import curate_increment
    from creatorops_lakehouse_spark.operators.cache import (
        release_scoped_caches,
    )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)

    def _admit(df, bid):
        # each admission pins its batch-sized stage outputs; release them
        # once the batch's state appends are committed, or a long-lived
        # stream accumulates cached partitions across micro-batches
        try:
            curate_increment(spark, df, root, config, batch_id=int(bid))
        finally:
            release_scoped_caches()

    return (
        stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
