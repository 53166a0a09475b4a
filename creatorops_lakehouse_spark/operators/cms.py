"""Count-min sketch as a relational table: mergeable heavy-hitter counts.

Completes the mergeable-sketch family next to the HLL-union rollup and the
Theta overlap (queries/events.py): a CMS answers "how often does key k
appear" within eps*N overcount using depth x width counters, regardless of
the number of distinct keys — the heavy-hitter / frequency primitive for
100 TB streams where an exact per-key groupBy's state would be the
bottleneck but the query only needs frequent keys.

Representation: the sketch IS a DataFrame of (row_i, bucket, cnt) — at
most depth*width rows. That makes every sketch operation relational:

- build: one explode (depth rows per input row) + one hash aggregate —
  partial (map-side) combine does the heavy lifting, the shuffle carries
  at most depth*width rows per map task;
- merge: unionByName + re-aggregate (counter-wise sum) — associative and
  commutative, so partial sketches from partitions/days/streams merge
  losslessly (pinned exactly by the verdict query: merged == full);
- probe: join candidate keys' (row_i, bucket) coordinates, min over rows.

Hash family: xxhash64(key, seed + row) mod width — pairwise-independent
enough in practice, deterministic per (seed, row), and JVM-side.

Guarantees (classic CMS): estimate >= exact always (counters only ever
add); P[estimate > exact + e*N/width] < exp(-depth) per key. The verdict
query pins the first exactly and the second with the 3N/width bound at
depth 5 on the deterministic driver corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _coords(key: Column, depth: int, width: int, seed: int) -> Column:
    """array<struct<row_i,bucket>> of the key's depth counter coordinates."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 272,
    seed: int = 7,
) -> DataFrame:
    """Build the sketch table (row_i, bucket, cnt) over ``df[key_col]``."""
    if depth < 1 or width < 1:
        raise ValueError(f"cms needs depth >= 1 and width >= 1, got {depth}x{width}")
    return (
        df.select(
            F.explode(_coords(F.col(key_col), depth, width, seed)).alias("c")
        )
        .groupBy(F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum of same-geometry sketches (lossless, associative)."""
    if not sketches:
        raise ValueError("cms_merge needs >= 1 sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_i", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 272,
    seed: int = 7,
) -> DataFrame:
    """(key_col, est) for every row of ``keys``: min over the key's depth
    counters. The sketch is at most depth*width rows — it broadcasts; the
    probe side never shuffles on sketch coordinates."""
    probes = keys.select(
        F.col(key_col),
        F.explode(_coords(F.col(key_col), depth, width, seed)).alias("c"),
    ).select(key_col, F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
