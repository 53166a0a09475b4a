"""Streaming-curation steady-state rehearsal (VERDICT r12 item 6):
`curation_ingest_stream` is pytest-pinned for exactly-once semantics but
was never measured over a LONG run — this drives a fixed-size micro-batch
cadence while the rolling state grows, with `optimize_curation_state`
in the loop, and charts per-batch admit latency. The claim under test:
admit latency stays bounded as the corpus accumulates (flat-ish after
the r13 probe rework: hash-prefiltered texts anti-joins, persisted
batch stages, batch-side decontam broadcast).

Shape: seed the root with the sf0.1 documents corpus (batch 0), then
stream N_BATCHES fixed-size NDJSON files (one micro-batch each via
maxFilesPerTrigger=1, availableNow) in SEGMENTS, running
optimize_curation_state between segments (the maintenance cadence the
module docstring prescribes). Per-batch wall comes from the streaming
engine's own progress events (triggerExecution ms).

Usage: python tools/curation_stream_rehearsal.py   (BENCH_NOTES table)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
BATCH_DOCS = 400
N_SEGMENTS = 3
BATCHES_PER_SEGMENT = 4


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from creatorops_lakehouse_spark.curation import (
        incremental_clean_train,
        optimize_curation_state,
    )
    from creatorops_lakehouse_spark.streaming.curation import (
        curation_ingest_stream,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_docs = docs.count()

    def perturbed(df, tag, every, id_offset):
        toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
        pert = F.transform(
            toks,
            lambda t, i: F.when(
                i % every == 0,
                F.concat(F.lit(tag), F.lit("x"), i.cast("string")),
            ).otherwise(t),
        )
        return df.select(
            (F.col("doc_id") + id_offset).alias("doc_id"),
            F.array_join(pert, " ").alias("text"),
            "lang",
        )

    work = tempfile.mkdtemp(prefix="cur_stream_rehearsal_")
    root = os.path.join(work, "state")
    src_dir = os.path.join(work, "incoming")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src_dir)
    try:
        # the seed corpus is the STREAM's own first file (micro-batch 0)
        # — seeding out-of-band would collide with the engine's batch-id
        # sequence: the exactly-once contract would classify stream
        # batch 0 as a replay of the seed and silently skip it
        seed_rows = [
            json.dumps({"doc_id": r.doc_id, "text": r.text, "lang": r.lang})
            for r in docs.collect()
        ]
        with open(os.path.join(src_dir, "a_seed.json"), "w") as f:
            f.write("\n".join(seed_rows))
        print(f"# seed corpus: {n_docs} docs (stream micro-batch 0)")
        print("segment,batch_id,admit_ms,clean_train_rows")

        total_batches = N_SEGMENTS * BATCHES_PER_SEGMENT
        for seg in range(N_SEGMENTS):
            # one NDJSON file per micro-batch, batch-specific perturbation
            for b in range(BATCHES_PER_SEGMENT):
                gbatch = seg * BATCHES_PER_SEGMENT + b
                batch = perturbed(
                    docs.filter(F.col("doc_id") % total_batches == gbatch)
                    .limit(BATCH_DOCS),
                    f"s{gbatch}",
                    7 + (gbatch % 5),
                    (gbatch + 1) * 10_000_000,
                )
                rows = [
                    json.dumps(
                        {"doc_id": r.doc_id, "text": r.text, "lang": r.lang}
                    )
                    for r in batch.collect()
                ]
                with open(
                    os.path.join(src_dir, f"seg{seg}_b{b}.json"), "w"
                ) as f:
                    f.write("\n".join(rows))
            q = curation_ingest_stream(
                spark, src_dir, "doc_id long, text string, lang string",
                root, ckpt, max_files_per_trigger=1,
            )
            q.awaitTermination()
            ct = incremental_clean_train(spark, root).count()
            for p in q.recentProgress:
                if p["numInputRows"] == 0:
                    continue
                print(
                    f"{seg},{p['batchId']},"
                    f"{p['durationMs']['triggerExecution']},{ct}"
                )
            # maintenance cadence between segments: pack state dirs +
            # fold manifests so probe scans stay O(few dirs). max_dirs=4
            # so the pack actually FIRES at this batch cadence (the
            # default 16 would skip at 12 batches) — admission semantics
            # are unaffected (txn map survives the rewrite) and the
            # subsequent segments' latencies prove it
            t0 = time.time()
            optimize_curation_state(spark, root, max_dirs=4)
            print(f"# segment {seg} optimize_curation_state: "
                  f"{time.time() - t0:.1f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
