"""100× dress rehearsal of the composed curation pipeline (VERDICT r9
item 1, second half): run docs_curation_e2e_verdict's exact body —
quality gate → exact dedup → trigram-CC near-dup → split+decontam →
mixture → packing → shard manifest — at sf0.1 and at the 100×-documents
scale (.scale100/, the scale_rehearsal.py perturbation design: near-dup
structure preserved ×100 without a quadratic pair explosion), recording
per-stage wall clock and peak cached storage.

The per-query bench can't see cross-operator interactions (cache
interference, cumulative skew, a stage whose input grew superlinearly
because an upstream stage stopped filtering); this harness runs the REAL
composition end-to-end and prints the per-stage growth table for
BENCH_NOTES.

    python tools/curation_e2e_rehearsal.py [--skip-gen] [--copies=N]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))


def run_once(spark, sf_dir: str, label: str, neardup: str = "exact") -> dict:
    from creatorops_lakehouse_spark.queries.curation import curation_e2e_row

    import bench

    bench._isolate(spark)  # cold caches: the rehearsal measures the build
    walls: dict[str, float] = {}
    t0 = time.time()
    row = curation_e2e_row(
        spark, sf_dir, stage_walls=walls, neardup=neardup
    ).collect()[0]
    walls["final_pack_shard"] = round(time.time() - t0 - sum(walls.values()), 2)
    total = round(time.time() - t0, 2)
    peak_mb = round(bench._cached_bytes(spark) / 1e6, 1)
    print(f"\n[{label}] total {total}s, peak cached {peak_mb} MB")
    for k, v in walls.items():
        print(f"  {k:>18}: {v:.2f}s")
    print(f"  stages: {row.asDict()}")
    return {"label": label, "total": total, "walls": walls,
            "peak_mb": peak_mb, "row": row.asDict()}


def main() -> int:
    copies = 100
    for a in sys.argv:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    import scale_rehearsal as sr

    from creatorops_lakehouse_spark.session import build_spark

    spark = build_spark("curation-e2e-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    out = sr.scale_dir(copies)
    if "--skip-gen" not in sys.argv and not os.path.exists(
        os.path.join(out, "documents.parquet", "_SUCCESS")
    ):
        print(f"synthesizing {copies}x corpus under {out} ...")
        t0 = time.time()
        sr.synthesize(spark, copies)
        print(f"synthesized in {time.time() - t0:.0f}s")

    # untimed warm-up at 1x: JVM/JIT/codegen startup would otherwise land
    # in the 1x walls and make every growth ratio read artificially low
    run_once(spark, sr.SF_DIR, "warm-up (untimed)")
    neardup = "exact"
    for a in sys.argv:
        if a.startswith("--neardup="):
            neardup = a.split("=", 1)[1]
    base = run_once(spark, sr.SF_DIR, f"sf0.1 (1x, {neardup})", neardup)
    if neardup != "exact":  # pin the lsh path's retention deviation vs exact
        exact = run_once(spark, sr.SF_DIR, "sf0.1 (1x, exact ref)")
        dev = exact["row"]["n_neardup"] - base["row"]["n_neardup"]
        print(f"\nlsh retention deviation vs exact at 1x: "
              f"{base['row']['n_neardup']} vs {exact['row']['n_neardup']} "
              f"(lsh keeps {-dev} more docs; LSH recall < 1)")
    big = run_once(spark, out, f"{copies}x ({neardup})", neardup)

    print(f"\nper-stage growth at {copies}x data "
          f"(linear would be <= ~{copies}x wall):")
    ratios = {}
    for k in base["walls"]:
        b, g = base["walls"][k], big["walls"].get(k, float("nan"))
        r = g / b if b > 0.05 else float("nan")  # sub-50ms base: noise
        ratios[k] = r
        print(f"  {k:>18}: {b:7.2f}s -> {g:8.2f}s  ({r:6.1f}x)"
              if r == r else f"  {k:>18}: {b:7.2f}s -> {g:8.2f}s  (base too small)")
    print(f"  {'TOTAL':>18}: {base['total']:7.2f}s -> {big['total']:8.2f}s "
          f"({big['total'] / base['total']:6.1f}x)")
    bad = {k: r for k, r in ratios.items() if r == r and r > copies * 1.5}
    if bad:
        print(f"SUPER-LINEAR stages (> {copies * 1.5:.0f}x): {bad}")
        return 1
    print("no super-linear stage")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
