"""10x/100x rehearsal for DELETE paths: copy-on-write rewrite vs
merge-on-read deletion vector, plus the purge cost (BENCH_NOTES).

The DV delete should be near-constant (one counting aggregate over the
affected commits + one manifest write) while the rewrite scales with the
affected commits' size; purge pays the deferred rewrite once.

Usage: python tools/dv_rehearsal.py
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
        purge_deletes,
        snapshot_count,
        snapshot_delete_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    print("rows,delete_cow_s,delete_dv_s,purge_s,count_mdonly")
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        root = tempfile.mkdtemp(prefix="dv_rehearsal_")
        try:
            cow = TableSpec("t.cow", root + "/cow")
            snapshot_write(df, cow)
            t0 = time.monotonic()
            snapshot_delete_where(spark, cow, {"k": (0, n // 10)})
            t_cow = time.monotonic() - t0

            mor = TableSpec("t.mor", root + "/mor")
            snapshot_write(df, mor)
            t0 = time.monotonic()
            snapshot_delete_where(spark, mor, {"k": (0, n // 10)}, rewrite=False)
            t_dv = time.monotonic() - t0
            cnt = snapshot_count(mor)
            t0 = time.monotonic()
            purge_deletes(spark, mor)
            t_purge = time.monotonic() - t0
            print(
                f"{n},{t_cow:.2f},{t_dv:.2f},{t_purge:.2f},"
                f"{cnt == n - (n // 10 + 1)}"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
