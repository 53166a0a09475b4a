"""Incremental-curation rehearsal (VERDICT r11 item 4): second-batch cost
must track the BATCH, not the corpus, as the corpus grows 10×.

Shape: for corpus sizes 1×/10× (× = sf0.1 documents, 5k docs —
replicated with the scale_rehearsal perturbation so near-dup structure is
preserved without a quadratic pair explosion), admit the corpus as batch
0, then admit ONE FIXED 500-doc batch (batch-specific token perturbation,
ids above the corpus range) and time it. The admit reads the state
indexes once (a scan that partition-prunes on a bucketed 100-TB layout)
and shuffles only batch-sized frames, so batch wall should grow far
slower than 10×.

Usage: python tools/curation_incremental_rehearsal.py  (BENCH_NOTES table)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from creatorops_lakehouse_spark.curation import (
        curate_increment,
        incremental_clean_train,
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

    def perturbed(df, tag_col, every, id_offset):
        toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
        pert = F.transform(
            toks,
            lambda t, i: F.when(
                i % every == 0,
                F.concat(tag_col, F.lit("x"), i.cast("string")),
            ).otherwise(t),
        )
        return df.select(
            (F.col("doc_id") + id_offset).alias("doc_id"),
            F.array_join(pert, " ").alias("text"),
            "lang",
        )

    def corpus(m):
        ks = spark.range(m).select(F.col("id").alias("_k"))
        out = None
        base = docs.crossJoin(ks)
        tag = F.concat(F.lit("v"), F.col("_k").cast("string"))
        toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
        pert = F.transform(
            toks,
            lambda t, i: F.when(
                i % 4 == 0, F.concat(tag, F.lit("x"), i.cast("string"))
            ).otherwise(t),
        )
        return base.select(
            (F.col("doc_id") + F.col("_k") * F.lit(1_000_000)).alias(
                "doc_id"
            ),
            F.when(F.col("_k") == 0, F.col("text"))
            .otherwise(F.array_join(pert, " "))
            .alias("text"),
            "lang",
        )

    batch = perturbed(
        docs.orderBy("doc_id").limit(500), F.lit("bnew"), 3, 50_000_000
    ).persist()
    batch.count()

    # warmup: one throwaway admit so codegen/JIT cost doesn't land on the
    # first timed row
    wroot = tempfile.mkdtemp(prefix="cur_inc_warm_")
    try:
        curate_increment(spark, docs.orderBy("doc_id").limit(100), wroot)
        curate_increment(
            spark,
            perturbed(docs.orderBy("doc_id").limit(100), F.lit("warm"), 3,
                      90_000_000),
            wroot,
        )
    finally:
        shutil.rmtree(wroot, ignore_errors=True)

    from creatorops_lakehouse_spark.curation import CurationConfig

    print("mode,corpus_mult,corpus_docs,init_s,batch_docs,batch_admit_s,"
          "net_clean_train")
    for mode in ("exact", "lsh"):
        cfg = CurationConfig(neardup=mode)
        for m in (1, 10):
            root = tempfile.mkdtemp(prefix=f"cur_inc_{mode}_{m}x_")
            try:
                c = corpus(m).persist()
                n_c = c.count()
                t0 = time.time()
                curate_increment(spark, c, root, cfg)
                init_s = time.time() - t0
                t0 = time.time()
                curate_increment(spark, batch, root, cfg)
                batch_s = time.time() - t0
                n_clean = incremental_clean_train(spark, root).count()
                print(
                    f"{mode},{m},{n_c},{init_s:.2f},500,{batch_s:.2f},"
                    f"{n_clean}"
                )
                c.unpersist()
            finally:
                shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
