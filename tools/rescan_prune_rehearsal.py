"""Rescan-repair pruning rehearsal (r12): measure the claim that on a
layout clustered by the group key, on_dml='rescan_groups' repair I/O is
proportional to the TOUCHED groups, not the table.

Two sources with identical content (10M rows, 1000 groups):
- packed: one commit dir (the matview_rehearsal shape) — per-dir stats
  span every group, so the IN-set read keeps the dir: the rescan pays a
  full scan.
- clustered: 20 commits, each holding a contiguous band of 50 groups —
  per-dir grp min/max are tight, so the IN-set read proves 19/20 dirs
  disjoint and scans one band.

Same DML on both (delete 6 fixed keys → 6 groups touched), same HLL view,
same rescan refresh; the wall difference is the pruning. A plain
SUM-view diff refresh is measured alongside as the CDF floor both repairs
share.

Usage: python tools/rescan_prune_rehearsal.py   (BENCH_NOTES table)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N = 10_000_000
GROUPS = 1000
BANDS = 20


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_delete_where,
        snapshot_write,
        current_version,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def rows(lo, hi, grp_lo, grp_span):
        # grp = grp_lo + k % grp_span: contiguous group band per commit
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.lit(grp_lo) + F.col("id") % grp_span).alias("grp"),
            (F.col("id") % 9973).alias("val"),
            (F.col("id") % 5001).alias("dk"),
        )

    keys, sums, row_key = ["grp"], {"sum_val": "val"}, ["k"]
    hlls = {"nd_dk": "dk"}

    print("layout,dirs,pruned_for_probe,small_dml_s,rescan_hll_s")
    for layout in ("packed", "clustered"):
        root = tempfile.mkdtemp(prefix=f"rescan_prune_{layout}_")
        try:
            src = TableSpec("r.src", root + "/src")
            view = TableSpec("r.view", root + "/view")    # SUM floor
            hview = TableSpec("r.hview", root + "/hview")  # HLL rescan
            if layout == "packed":
                snapshot_write(rows(0, N, 0, GROUPS), src)
            else:
                per = N // BANDS
                gper = GROUPS // BANDS
                for b in range(BANDS):
                    snapshot_write(
                        rows(b * per, (b + 1) * per, b * gper, gper), src
                    )
            create_agg_view(spark, src, view, keys, sums)
            create_agg_view(spark, src, hview, keys, sums, hlls=hlls)

            # 6 fixed keys -> groups 0..5 (all inside band 0 of the
            # clustered layout)
            snapshot_delete_where(spark, src, {"k": (0, 5)})
            kept, skipped = pruned_dirs(
                src, {}, version=current_version(src),
                eq_in={"grp": list(range(6))},
            )
            t0 = time.time()
            _, m1 = refresh_agg_view(spark, src, view, keys, sums, row_key)
            small_dml_s = time.time() - t0
            assert m1 == "incremental-diff", m1
            t0 = time.time()
            _, m2 = refresh_agg_view(
                spark, src, hview, keys, sums, row_key, hlls=hlls,
                on_dml="rescan_groups",
            )
            rescan_s = time.time() - t0
            assert m2 == "incremental-diff-rescan", m2
            print(
                f"{layout},{len(kept) + len(skipped)},{len(skipped)},"
                f"{small_dml_s:.2f},{rescan_s:.2f}"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
