"""Sketch-aggregate accuracy pins: HLL++ distinct counts and KLL-style
approximate percentiles vs their exact counterparts."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_sketch_accuracy_vs_exact(spark):
    from creatorops_lakehouse_spark.queries import load

    df = load(spark, "/root/testdata/sf0.001", "events")
    approx = (
        df.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a_users"),
            F.expr("percentile_approx(value, 0.5, 10000)").alias("a_p50"),
        )
        .collect()
    )
    exact = {
        r.event_type: r
        for r in df.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("e_users"),
            F.expr("percentile(value, 0.5)").alias("e_p50"),
        )
        .collect()
    }
    for r in approx:
        e = exact[r.event_type]
        assert abs(r.a_users - e.e_users) <= max(2, 0.05 * e.e_users)
        assert abs(r.a_p50 - e.e_p50) <= max(1.0, 0.05 * abs(e.e_p50))
