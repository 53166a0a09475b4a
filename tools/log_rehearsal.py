"""Metadata-scale rehearsal of the snapshot LOG itself (VERDICT r7 item 5).

Every prior rehearsal measured DATA-side scaling; this one measures the
log: 10,000 commits with checkpoint cadence 100, deletion vectors and
bloom sidecars live in the manifests throughout. Reported:

- reader PLANNING time at 100 / 1,000 / 10,000 total commits — resolving
  the head manifest + stats/bloom pruning + dir resolution. The contract:
  planning opens checkpoint + loose tail only, so it must stay FLAT in
  total commits (the tail never exceeds the cadence).
- time travel INTO compacted history (a version folded into the
  checkpoint), cold (parsed-checkpoint cache cleared) and warm — the cold
  cost is one checkpoint-body parse, which grows with folded-history size
  (the expected O(total commits) term, paid once per process, not per
  read).
- version_as_of (timestampAsOf) — walks every version's committed_at;
  linear in total commits by definition, and the parsed-checkpoint cache
  is what keeps it from being QUADRATIC (one body parse per folded
  version otherwise).
- checkpoint fold and VACUUM wall time at the full log.

Usage: python tools/log_rehearsal.py [n_commits] [cadence]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _timeit(fn, reps: int = 5) -> float:
    """Median wall seconds of ``fn`` over ``reps`` runs."""
    runs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return sorted(runs)[len(runs) // 2]


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import creatorops_lakehouse_spark.sources.snapshots as S
    from creatorops_lakehouse_spark.session import build_spark
    from creatorops_lakehouse_spark.sources.snapshots import (
        _commit,
        _read_manifest,
        checkpoint_manifest,
        current_version,
        pruned_dirs,
        snapshot_delete_where,
        snapshot_dirs,
        snapshot_read,
        snapshot_write,
        vacuum_snapshots,
        version_as_of,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    cadence = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = build_spark("log-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="log_rehearsal_")
    spec = TableSpec("t.snap", os.path.join(root, "t"))

    # three REAL data commits (bloom-indexed) + one DV delete so manifests
    # carry the full feature surface the planner must handle at scale
    for lo in (0, 100, 200):
        snapshot_write(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(lo, lo + 100)], ["id", "v"]
            ),
            spec,
            bloom_for=("id",),
        )
    snapshot_delete_where(spark, spec, {"id": (0, 4)}, rewrite=False)
    head = _read_manifest(spec, current_version(spec))
    template = {
        k: head[k]
        for k in ("dirs", "schema", "stats", "rows", "bloom", "dv")
        if k in head
    }

    # synthesize the remaining commits through the SAME _commit path real
    # writes use (checkpointing and planning are pure log operations; the
    # referenced data dirs are opaque names) — checkpoint every `cadence`
    results: dict[str, dict] = {}
    probe = {"id": (150, 160)}  # prunes to the middle commit by stats

    def plan_head():
        v = current_version(spec)
        kept, _ = pruned_dirs(spec, probe, v)
        snapshot_dirs(spec, v)
        return kept

    def plan_head_bloom():  # equality probe: consults the bloom sidecars
        return pruned_dirs(spec, {"id": (155, 155)}, current_version(spec))

    t_fold_last = None
    next_report = 100
    t_build0 = time.time()
    for v in range(current_version(spec) + 1, n_total):
        m = {"version": v, "mode": "append", "parent": v - 1, **template}
        _commit(spec, v, m)
        if v % cadence == cadence - 1:
            t0 = time.time()
            checkpoint_manifest(spec)
            t_fold_last = time.time() - t0
        if v + 1 == next_report:
            loose = len(S._loose_versions(spec))
            results[f"plan@{v + 1}"] = {
                "total_commits": v + 1,
                "loose_tail": loose,
                "head_planning_ms": round(_timeit(plan_head) * 1000, 2),
                "bloom_eq_planning_ms": round(
                    _timeit(plan_head_bloom) * 1000, 2
                ),
            }
            next_report *= 10
    build_s = time.time() - t_build0

    # time travel into COMPACTED history: cold = checkpoint body re-parsed
    folded_version = 5

    def tt_cold():
        S._CP_CACHE.clear()
        _read_manifest(spec, folded_version)

    def tt_warm():
        _read_manifest(spec, folded_version)

    tt_cold_ms = round(_timeit(tt_cold) * 1000, 2)
    tt_warm_ms = round(_timeit(tt_warm) * 1000, 3)
    # and actually READ a folded version end-to-end once
    t0 = time.time()
    n_rows_tt = snapshot_read(spark, spec, version=2).count()
    tt_read_s = round(time.time() - t0, 2)

    at = _read_manifest(spec, folded_version)["committed_at"]
    vaso_ms = round(
        _timeit(lambda: version_as_of(spec, str(at)[:19]), reps=3) * 1000, 1
    )

    t0 = time.time()
    checkpoint_manifest(spec)
    fold_full_s = round(time.time() - t0, 2)

    t0 = time.time()
    vacuum_snapshots(spec, keep_last=50)
    vacuum_s = round(time.time() - t0, 2)
    plan_after_vacuum_ms = round(_timeit(plan_head) * 1000, 2)

    out = {
        "n_commits": n_total,
        "cadence": cadence,
        "build_wall_s": round(build_s, 1),
        "planning": results,
        "last_incremental_fold_s": round(t_fold_last or 0.0, 2),
        "full_fold_s": fold_full_s,
        "time_travel_folded_cold_ms": tt_cold_ms,
        "time_travel_folded_warm_ms": tt_warm_ms,
        "time_travel_read_rows": n_rows_tt,
        "time_travel_read_s": tt_read_s,
        "version_as_of_ms": vaso_ms,
        "vacuum_keep50_s": vacuum_s,
        "head_planning_after_vacuum_ms": plan_after_vacuum_ms,
    }
    print(json.dumps(out, indent=1))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
