"""Benchmark harness: run every registered driver query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count() action — full plan runs,
result rows are materialized on executors but not shipped to the driver, so
timings measure the engine, not Py4J serialization).

Each query runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) within the
session and reports the per-query MEDIAN (VERDICT r5 item 7: round 5
measured a uniform ~1.4x host-window drift across code-identical queries —
single samples conflate host noise with regressions). The headline value is
the sum of medians; per-rep samples and mins land in BENCH_DETAIL.json,
along with the peak cached-storage footprint sampled after every query
(sticky-cache memory discipline, item 5).

The harness that records this output keeps only the LAST 2000 characters of
stdout and JSON-parses within that window — rounds 2 and 3 each produced a
(valid) >2000-char line that therefore recorded as ``parsed: None``. The
final line is now budgeted to ``LINE_BUDGET``: every query's timing is
written to ``BENCH_DETAIL.json`` next to this script, and the printed line
carries the slowest queries that fit plus ``n_queries``/``detail`` markers
so nothing is silently dropped.
"""

from __future__ import annotations

import json
import os
import sys
import time

LINE_BUDGET = 1900  # hard cap 2000 (recorder tail); leave slack

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from creatorops_lakehouse_spark.queries import all_queries
    from creatorops_lakehouse_spark.session import build_spark

    spark = build_spark("creatorops-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first measured query isn't paying startup
    spark.range(1000000).selectExpr("sum(id)").collect()

    # Host-speed calibration: a fixed, data-independent pair of jobs (pure
    # codegen arithmetic + one 1024-key shuffle) whose cost depends only on
    # the machine. Round 5 and round 7 both measured uniform ~1.2-1.5x
    # wall-clock drift across CODE-IDENTICAL queries between measurement
    # windows (shared-host contention); cross-round comparisons should
    # divide per-query times by (calib_sec / prior round's calib_sec)
    # before calling anything a regression.
    calib = []
    for _ in range(3):
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 7)").collect()
        spark.range(20_000_000).selectExpr("id % 1024 AS k").groupBy(
            "k"
        ).count().count()
        calib.append(time.time() - t0)
    calib_sec = round(sorted(calib)[1], 3)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    failures: dict[str, str] = {}
    peak_storage = 0
    # *_verdict queries are oracle-checkable correctness AUDITS: each runs a
    # deliberately-exhaustive exact baseline (all-pairs hamming, full-corpus
    # exact Jaccard) next to the fast operator to pin its recall contract.
    # They belong in the driver's correctness gate, not the throughput
    # headline — timing them would measure the audit baseline, not the engine.
    queries = {n: f for n, f in all_queries().items() if not n.endswith("_verdict")}
    for name, fn in queries.items():
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                failures[name] = str(e)[:200]
                break
        if runs and name not in failures:
            samples[name] = runs
            timings[name] = sorted(runs)[len(runs) // 2]  # median (upper)
        else:
            timings[name] = -1.0
        peak_storage = max(peak_storage, _cached_bytes(spark))

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": f"total_wall_sec_{len(timings)}_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": reps,
        "peak_storage_mb": round(peak_storage / 1e6, 1),
        "calib_sec": calib_sec,
    }
    if failures:
        result["failures"] = failures

    detail = dict(result)
    detail["samples"] = samples
    detail["queries_min"] = {n: min(r) for n, r in samples.items()}
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    print(json.dumps(_fit_line(result), separators=(",", ":")))


def _cached_bytes(spark) -> int:
    """Current executor-memory footprint of all cached partitions (bytes);
    sampled after every query so the detail file reports the bench run's
    peak storage usage under the sticky-cache LRU cap."""
    try:
        return sum(
            i.memSize() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        )
    except Exception:  # private API: never let accounting fail the bench
        return 0


def _fit_line(result: dict) -> dict:
    """Trim ``queries`` (slowest-first) until the compact line fits
    LINE_BUDGET. The full dict is already on disk in BENCH_DETAIL.json."""
    line = dict(result)
    line["n_queries"] = len(result["queries"])
    line["detail"] = "BENCH_DETAIL.json"
    by_cost = sorted(result["queries"].items(), key=lambda kv: -kv[1])
    keep = len(by_cost)
    while keep > 0:
        line["queries"] = dict(by_cost[:keep])
        if len(json.dumps(line, separators=(",", ":"))) <= LINE_BUDGET:
            break
        keep -= 1
    return line


if __name__ == "__main__":
    main()
