"""10x/100x rehearsal for the bloom-index write path (BENCH_NOTES).

Times snapshot_write WITH vs WITHOUT bloom_for over synthetic commits of
growing row counts, and times the driver-side point-lookup prune. The
bloom build is one distinct-aggregate per indexed column over ONLY the
new commit; the bitmap pull is bounded by m (<= 16 KiB of bits), so the
write overhead should grow sub-linearly once m saturates its cap and the
prune should stay metadata-speed regardless of commit size.

Usage: python tools/bloom_rehearsal.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    print("rows,write_plain_s,write_bloom_s,overhead,prune_ms,skipped/2")
    for n in (100_000, 1_000_000, 10_000_000):
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("v"),
            )
        )
        root = tempfile.mkdtemp(prefix="bloom_rehearsal_")
        try:
            plain = TableSpec("t.plain", root + "/plain")
            t0 = time.monotonic()
            snapshot_write(df, plain)
            t_plain = time.monotonic() - t0

            spec = TableSpec("t.bloom", root + "/bloom")
            t0 = time.monotonic()
            snapshot_write(df, spec, bloom_for=("k",))
            # second disjoint commit so pruning has something to skip
            snapshot_write(
                df.select((F.col("k") + 2 * n).alias("k"), "v"),
                spec,
                bloom_for=("k",),
            )
            t_bloom = (time.monotonic() - t0) / 2

            t0 = time.monotonic()
            reps = 50
            for i in range(reps):
                kept, skipped = pruned_dirs(spec, {"k": (i * 7, i * 7)})
            prune_ms = (time.monotonic() - t0) / reps * 1000
            print(
                f"{n},{t_plain:.2f},{t_bloom:.2f},"
                f"{t_bloom / t_plain:.2f}x,{prune_ms:.2f},{len(skipped)}/2"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
