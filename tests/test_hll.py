"""Engine-portable HLL (operators/hll.py): merge algebra (associative,
commutative, idempotent — pinned on real splits), estimate accuracy on
known cardinalities, and determinism across recomputation."""

from __future__ import annotations

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _regs_dict(regs):
    return {r.bucket: r.rho for r in regs.collect()}


def test_hll_merge_algebra(spark):
    df = spark.range(0, 3000).select(F.col("id").alias("k"))
    whole = hll_registers(df, "k")
    a = hll_registers(df.filter("k % 3 = 0"), "k")
    b = hll_registers(df.filter("k % 3 = 1"), "k")
    c = hll_registers(df.filter("k % 3 = 2"), "k")
    w = _regs_dict(whole)
    # associativity + commutativity: any fold order equals the whole
    assert _regs_dict(hll_merge(a, b, c)) == w
    assert _regs_dict(hll_merge(c, hll_merge(b, a))) == w
    # idempotence: folding a sketch with itself changes nothing
    assert _regs_dict(hll_merge(whole, whole)) == w


def test_hll_estimate_accuracy_and_determinism(spark):
    for n in (1000, 20_000):
        df = spark.range(0, n).select(F.col("id").alias("k"))
        est = hll_estimate(hll_registers(df, "k")).collect()[0]
        rel_bp = abs(est.est - n) * 10000 // n
        # m=128 -> ~9.2% expected; 25% is a deterministic safety margin
        assert rel_bp <= 2500, (n, est.est, rel_bp)
        # duplicates never move the sketch: 3x multiplicity, same registers
        dup = df.union(df).union(df)
        est2 = hll_estimate(hll_registers(dup, "k")).collect()[0]
        assert est2 == est
