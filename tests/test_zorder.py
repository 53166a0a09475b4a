"""Z-order clustering (sources/tables.py::zorder_for_skipping): parquet
footer min/max must be tight on BOTH dimensions, unlike the lexicographic
sort where the trailing column spans its full range in every file."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.sources.tables import (
    sort_for_skipping,
    zorder_for_skipping,
)


def _coverage(path: str, col_idx: int, lo: int, hi: int) -> float:
    """Mean fraction of the global [lo, hi] range covered per file."""
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((max(maxs) - min(mins)) / (hi - lo))
    return sum(spans) / len(spans)


def _grid(spark):
    # two independent uniform dims — the case lexicographic sort can't skip
    return spark.range(0, 1 << 14).select(
        F.pmod(F.xxhash64("id"), F.lit(1024)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1024)).alias("y"),
    )


def test_zorder_tightens_both_dims(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lex")
    zorder_for_skipping(df, ["x", "y"], target_files=16).write.parquet(zpath)
    sort_for_skipping(df, ["x", "y"], target_files=16).write.parquet(lpath)

    # lexicographic: leading col perfectly tight, trailing col ~full range
    assert _coverage(lpath, 0, 0, 1023) < 0.2
    assert _coverage(lpath, 1, 0, 1023) > 0.8
    # z-order: BOTH columns substantially tighter than the full range
    zx, zy = _coverage(zpath, 0, 0, 1023), _coverage(zpath, 1, 0, 1023)
    assert zx < 0.55, zx
    assert zy < 0.55, zy


def test_zorder_preserves_rows(spark, tmp_path):
    df = _grid(spark)
    out = str(tmp_path / "zp")
    zorder_for_skipping(df, ["x", "y"], target_files=8).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.columns == ["x", "y"]  # helper columns dropped
    assert back.count() == df.count()
    assert (
        back.groupBy().agg(F.sum("x"), F.sum("y")).collect()
        == df.groupBy().agg(F.sum("x"), F.sum("y")).collect()
    )


def test_zorder_full_int64_range_column(spark, tmp_path):
    # raw xxhash64 spans nearly the whole int64 range: integer
    # cross-multiplied scaling would overflow and wrap (regression);
    # the double-scaled key must still cluster both dims
    df = spark.range(0, 1 << 13).select(
        F.xxhash64("id").alias("x"),  # ~[-2^63, 2^63)
        F.pmod(F.xxhash64(F.col("id") + 3), F.lit(512)).alias("y"),
    )
    out = str(tmp_path / "wide")
    zorder_for_skipping(df, ["x", "y"], target_files=16).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert _coverage(out, 1, 0, 511) < 0.6  # y still prunes despite x's range


def test_zorder_key_bit_budget(spark):
    import pytest

    from creatorops_lakehouse_spark.sources.tables import zorder_key

    with pytest.raises(ValueError, match="BIGINT"):
        zorder_key(["a", "b", "c", "d"], bits=21)  # 84 bits > 63
