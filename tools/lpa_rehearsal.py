"""10x/100x rehearsal for label_propagation (BENCH_NOTES): planted
communities (ring-of-cliques) at growing edge counts, 3 supersteps.
Per superstep the cost is one key join + one (node,label) count + one
max_by — all shuffles on node ids, so wall should track edge count.

Usage: python tools/lpa_rehearsal.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from creatorops_lakehouse_spark.operators.graph import label_propagation

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("edges,wall_s,n_nodes,n_communities")
    for n_edges in (100_000, 1_000_000, 10_000_000):
        # ring of 100-node near-cliques: node i connects to the next
        # (edge_per_node) nodes inside its block, one bridge per block
        k = 10  # out-edges per node
        n_nodes = n_edges // k
        e = spark.range(n_edges).select(
            (F.col("id") / k).cast("long").alias("src"),
            (
                (F.col("id") / k).cast("long")
                - F.pmod((F.col("id") / k).cast("long"), 100)
                + F.pmod(
                    (F.col("id") / k).cast("long") + F.pmod(F.col("id"), k) + 1,
                    100,
                )
            ).alias("dst"),
        )
        edges = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        t0 = time.monotonic()
        out = label_propagation(edges, iterations=3)
        n_comm = out.select("label").distinct().count()
        wall = time.monotonic() - t0
        print(f"{n_edges},{wall:.1f},{n_nodes},{n_comm}")
    spark.stop()


if __name__ == "__main__":
    main()
