"""100x matview refresh rehearsal (VERDICT r10 item 3 + r11 items 1-2):
prove the append-path O(new data) claim against a GROWING base table,
the OPTIMIZE content-noop advance, the rescan repair's bounded cost,
then show the DML fallback's honest O(table-read) CDF cost.

Shape: for base sizes 1x/10x/100x (x = 100k rows), build the source,
create the view (grp = k % 1000; COUNT(*), SUM(val), HLL distinct), then:
- append a FIXED-SIZE batch (50k rows) and refresh → FLAT if O(new data);
- OPTIMIZE the source and refresh → 'noop-optimize' (r12: the span walk
  classifies mode='optimize' commits as content-noops), wall = manifest
  reads + one metadata commit, FLAT by construction;
- append AFTER the OPTIMIZE and refresh → still the append fast path
  (mixed noop+append span), FLAT;
- a small DELETE touching a FIXED set of ~6 groups, then
  on_dml='rescan_groups' on the HLL view → repair cost = the CDF (an
  honest O(table-read), same as the plain diff) + a rescan bounded by
  the touched groups' rows; the col to watch is rescan_hll_s minus
  small_dml_s, which tracks touched-group mass, not base size;
- one 1%-of-table DELETE + refresh on the SUM/COUNT and CMS views: the
  CDF fallback scans the two pinned versions, so its wall is expected
  to GROW with the base — the honest cost the module docstring declares.

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
          "append_refresh_cms_s,opt_noop_s,opt_noop_hll_s,"
          "postopt_append_hll_s,small_dml_s,rescan_hll_s,"
          "dml_refresh_s,dml_refresh_cms_s,cascade_child_s,"
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

            # OPTIMIZE packs the head's dirs; pre-r12 this bricked the
            # HLL view forever and forced an O(2x table) empty-delta CDF
            # on the others — now it's a metadata-only watermark advance
            from creatorops_lakehouse_spark.sources.snapshots import (
                optimize_snapshots,
            )

            optimize_snapshots(spark, src)
            t0 = time.time()
            _, mode_o = refresh_agg_view(spark, src, view, keys, sums, row_key)
            opt_s = time.time() - t0
            t0 = time.time()
            _, mode_oh = refresh_agg_view(
                spark, src, hview, keys, sums, row_key, hlls=hlls
            )
            opt_hll_s = time.time() - t0
            assert (mode_o, mode_oh) == ("noop-optimize", "noop-optimize")
            refresh_agg_view(spark, src, cview, keys, sums, row_key, cmss=cmss)

            # a fixed-size append AFTER the OPTIMIZE: the mixed
            # noop+append span still takes the O(new data) fast path
            snapshot_write(rows(n + APPEND_ROWS, APPEND_ROWS), src)
            t0 = time.time()
            _, mode_pa = refresh_agg_view(
                spark, src, hview, keys, sums, row_key, hlls=hlls
            )
            postopt_append_s = time.time() - t0
            assert mode_pa == "incremental-append", mode_pa
            refresh_agg_view(spark, src, view, keys, sums, row_key)
            refresh_agg_view(spark, src, cview, keys, sums, row_key, cmss=cmss)

            # small DELETE touching a FIXED ~6 groups (k 0..5): the
            # rescan repair pays the same CDF as the plain diff PLUS a
            # rescan bounded by the touched groups' rows — watch
            # rescan_hll_s - small_dml_s stay put while the base grows
            snapshot_delete_where(spark, src, {"k": (0, 5)})
            t0 = time.time()
            _, mode_sd = refresh_agg_view(spark, src, view, keys, sums, row_key)
            small_dml_s = time.time() - t0
            assert mode_sd == "incremental-diff", mode_sd
            t0 = time.time()
            _, mode_r = refresh_agg_view(
                spark, src, hview, keys, sums, row_key, hlls=hlls,
                on_dml="rescan_groups",
            )
            rescan_s = time.time() - t0
            assert mode_r == "incremental-diff-rescan", mode_r

            # one 1% DML, then the CDF-fallback refresh (SUM/COUNT + CMS
            # — the CMS view folds the ± cells through the SAME fallback;
            # the HLL view is left alone here: its rescan cost was
            # measured above against the bounded delete)
            snapshot_delete_where(spark, src, {"k": (6, n // 100)})
            t0 = time.time()
            _, mode_d = refresh_agg_view(spark, src, view, keys, sums, row_key)
            dml_s = time.time() - t0
            t0 = time.time()
            refresh_agg_view(spark, src, cview, keys, sums, row_key, cmss=cmss)
            dml_cms_s = time.time() - t0
            assert mode_d == "incremental-diff", mode_d

            # depth-2 CASCADE (VERDICT r12 item 5): a gold view over the
            # silver view. The child's one refresh here folds the
            # parent's WHOLE commit history (creates + appends + DML
            # refreshes) through snapshot_diff — with the r13 CDF-at-
            # write sidecars on every parent overwrite, that span
            # assembles in O(changed parent groups) with NO full parent
            # version reads, so the child wall must stay flat while the
            # FACT grows 100x (the parent's group count is
            # scale-invariant by construction).
            gview = TableSpec("r.gview", root + "/gview")

            def enrich_child(df):
                return df.withColumn("band", F.col("grp") % 10)

            create_agg_view(
                spark, view, gview, ["band"], {"sum_sv": "sum_val"},
                enrich=enrich_child,
            )
            # one more fact append + parent refresh so the child has a
            # fresh parent delta to fold
            snapshot_write(rows(n + 2 * APPEND_ROWS, APPEND_ROWS), src)
            refresh_agg_view(spark, src, view, keys, sums, row_key)
            t0 = time.time()
            _, mode_c = refresh_agg_view(
                spark, view, gview, ["band"], {"sum_sv": "sum_val"},
                row_key=["grp"], enrich=enrich_child,
            )
            cascade_child_s = time.time() - t0
            assert mode_c == "incremental-diff", mode_c

            groups = snapshot_read(spark, view).count()
            print(
                f"{n},{create_s:.2f},{append_s:.2f},{append_hll_s:.2f},"
                f"{append_cms_s:.2f},{opt_s:.2f},{opt_hll_s:.2f},"
                f"{postopt_append_s:.2f},{small_dml_s:.2f},{rescan_s:.2f},"
                f"{dml_s:.2f},{dml_cms_s:.2f},{cascade_child_s:.2f},"
                f"{groups},{mode_a},{mode_d}"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
