"""Engine-portable HyperLogLog: a MERGEABLE distinct-count sketch with
zero floats and an exactly-replayable estimate.

The 100 TB problem this solves: COUNT(DISTINCT key) over a sharded/
partitioned/day-bucketed corpus forces a full shuffle of every distinct
key. An HLL register table is ≤ 2^b rows, merges by per-bucket MAX
(associative + commutative — per-partition sketches, per-day sketches,
cross-cluster sketches all fold the same way), and answers within
~1.04/√m relative error. Spark's own approx_count_distinct is the same
idea but its binary sketch is opaque and engine-specific; this one is a
PLAIN (bucket, rho) table, so it can be persisted as a snapshot table,
merged incrementally (the matview pattern), and — the point for this
repo — recomputed bit-identically by the DuckDB oracle.

Engine-exact construction (both engines compute the identical sketch):
  h60    = first 15 hex chars of md5(key-as-string) as a 60-bit int
  bucket = h60 % m              (m = 2^b registers)
  rho    = leading zeros of the remaining 53-bit quotient, + 1
           = 54 - bitlength(q), via length(bin(q)) — integer, no log2
  register_j = MAX(rho) over keys landing in bucket j

Estimate, exact-integer (the float-free HLL formula): with
S54 = Σ_j 2^(54 - rho_j) (absent buckets contribute rho=0 → 2^54),
  E = alpha_m · m² / Σ 2^-rho = alpha_m · m² · 2^54 / S54
computed as ONE integer division of the 88-bit constant
NUM = round(alpha_m·10^6) · m² · 2^54 by (S54 · 10^6) — DECIMAL(38,0)
`div` on Spark, HUGEINT `//` on DuckDB, identical floor semantics.
No small-range linear-counting branch (it needs ln): callers in the
small-n regime should COUNT(DISTINCT) exactly — the sketch is for the
regime where exact counting is the thing that doesn't scale.

md5 keeps the sketch oracle-replayable; a production deployment that
doesn't need cross-engine replay can swap xxhash64 for the hash at
~3× scan throughput with the same register/merge/estimate machinery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: default precision: m=128 registers, ~9.2% (1σ) relative error
DEFAULT_B = 7


def _alpha_scaled(m: int) -> int:
    """round(alpha_m * 10^6) — the only non-integer HLL constant, pinned
    to a 6-decimal integer so both engines use literally the same value."""
    return round(0.7213 / (1 + 1.079 / m) * 10**6)


def estimate_numerator(b: int = DEFAULT_B) -> int:
    """The 88-bit integer constant alpha_scaled · m² · 2^54 (python int —
    pass into SQL as a string literal; it exceeds BIGINT by design)."""
    m = 1 << b
    return _alpha_scaled(m) * m * m * (1 << 54)


def hll_registers(
    df: DataFrame,
    key_col: str,
    b: int = DEFAULT_B,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sketch a column: ≤ 2^b rows of (bucket int, rho int) — per group
    when ``group_cols`` is given (≤ 2^b rows PER group: the GROUP BY
    COUNT(DISTINCT) shape, e.g. a matview's per-group distinct measure).
    One projection + one map-side-combinable groupBy — the same shuffle
    shape as any partial aggregate. NULL keys are excluded, matching
    COUNT(DISTINCT)'s NULL semantics (md5(NULL) would otherwise sketch a
    phantom bucket)."""
    m = 1 << b
    h60 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols, h60.alias("_h60")
    )
    q = F.expr(f"_h60 div {m}")
    rho = F.when(q == 0, F.lit(54)).otherwise(F.lit(54) - F.length(F.bin(q)))
    return (
        d.select(
            *group_cols,
            (F.col("_h60") % m).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Fold any number of register tables into one: per-bucket MAX.
    Associative, commutative, idempotent — the property that makes the
    sketch shippable across partitions, days, and clusters."""
    it = iter(registers)
    out = next(it)
    for r in it:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, b: int = DEFAULT_B) -> DataFrame:
    """One row: (est long, n_buckets long, max_rho long, sum_rho long).
    Exact-integer arithmetic end to end (see module docstring) — the
    same registers always produce the same estimate on any engine."""
    m = 1 << b
    num = estimate_numerator(b)
    s = registers.agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 54 - rho)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 54)
        ).alias("_s54"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("rho").cast("long").alias("max_rho"),
        F.sum("rho").cast("long").alias("sum_rho"),
    )
    return s.select(
        F.expr(
            f"CAST(CAST('{num}' AS DECIMAL(38,0)) div "
            f"(CAST(_s54 AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("est"),
        "n_buckets",
        "max_rho",
        "sum_rho",
    )
