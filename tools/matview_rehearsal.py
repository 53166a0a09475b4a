"""100x matview refresh rehearsal (VERDICT r10 item 3): prove the
append-path O(new data) claim against a GROWING base table, then show
the DML fallback's honest O(table-read) CDF cost.

Shape: for base sizes 1x/10x/100x (x = 100k rows), build the source,
create the view (grp = k % 1000; COUNT(*), SUM(val), HLL distinct), then
append a FIXED-SIZE batch (50k rows) and refresh. If the append path is
truly O(new data), refresh wall stays FLAT while the base grows 100x.
Then run one copy-on-write DELETE + refresh on the SUM/COUNT view (HLL
refuses DML by contract): the CDF fallback scans the two pinned
versions, so its wall is expected to GROW with the base — the honest
cost the module docstring declares.

Usage: python tools/matview_rehearsal.py   (prints a BENCH_NOTES table)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

X = 100_000
APPEND_ROWS = 50_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_write,
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

    def rows(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("grp"),
            (F.col("id") % 9973).alias("val"),
            (F.col("id") % 5001).alias("dk"),
        )

    keys, sums, row_key = ["grp"], {"sum_val": "val"}, ["k"]
    hlls = {"nd_dk": "dk"}
    cmss = {"f_dk": "dk"}

    print("base_rows,create_s,append_refresh_s,append_refresh_hll_s,"
          "append_refresh_cms_s,dml_refresh_s,dml_refresh_cms_s,"
          "view_groups,mode_append,mode_dml")
    for mult in (1, 10, 100):
        n = mult * X
        root = tempfile.mkdtemp(prefix=f"mv_rehearsal_{mult}x_")
        try:
            src = TableSpec("r.src", root + "/src")
            view = TableSpec("r.view", root + "/view")       # SUM/COUNT only
            hview = TableSpec("r.hview", root + "/hview")    # + HLL distinct
            cview = TableSpec("r.cview", root + "/cview")    # + CMS frequency
            snapshot_write(rows(0, n), src)

            t0 = time.time()
            create_agg_view(spark, src, view, keys, sums)
            create_agg_view(spark, src, hview, keys, sums, hlls=hlls)
            create_agg_view(spark, src, cview, keys, sums, cmss=cmss)
            create_s = time.time() - t0

            # FIXED-size append against the grown base
            snapshot_write(rows(n, APPEND_ROWS), src)
            t0 = time.time()
            _, mode_a = refresh_agg_view(spark, src, view, keys, sums, row_key)
            append_s = time.time() - t0
            t0 = time.time()
            refresh_agg_view(spark, src, hview, keys, sums, row_key, hlls=hlls)
            append_hll_s = time.time() - t0
            t0 = time.time()
            refresh_agg_view(spark, src, cview, keys, sums, row_key, cmss=cmss)
            append_cms_s = time.time() - t0
            assert mode_a == "incremental-append", mode_a

            # one DML, then the CDF-fallback refresh (SUM/COUNT + CMS —
            # the CMS view folds the ± cells through the SAME fallback;
            # the HLL view would refuse here by contract)
            snapshot_delete_where(spark, src, {"k": (0, n // 100)})
            t0 = time.time()
            _, mode_d = refresh_agg_view(spark, src, view, keys, sums, row_key)
            dml_s = time.time() - t0
            t0 = time.time()
            refresh_agg_view(spark, src, cview, keys, sums, row_key, cmss=cmss)
            dml_cms_s = time.time() - t0
            assert mode_d == "incremental-diff", mode_d

            groups = snapshot_read(spark, view).count()
            print(
                f"{n},{create_s:.2f},{append_s:.2f},{append_hll_s:.2f},"
                f"{append_cms_s:.2f},{dml_s:.2f},{dml_cms_s:.2f},"
                f"{groups},{mode_a},{mode_d}"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
