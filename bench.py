"""Benchmark harness: run every registered driver query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count() action — full plan runs,
result rows are materialized on executors but not shipped to the driver, so
timings measure the engine, not Py4J serialization).

Per-query isolation (VERDICT r7 item 1 — regression attributability):
queries execute in FIXED name-sorted order, and before each query every
shared cache layer is cleared (scoped persists, the sticky corpus-artifact
LRU, the Spark cache registry). One UNTIMED warm-up rep then runs: it pays
the sticky/index builds, JIT, and page-cache faults deterministically, so
the ``$SPARK_GRAFT_BENCH_REPS`` (default 3) timed reps that follow measure
the query's warm steady-state — a number that depends only on the query's
own plan, not on which OTHER queries ran first or where the registry
happened to order it. Previously stickies were shared across queries, so
whichever query FIRST touched a corpus paid its build: registry growth
reshuffled that assignment between rounds and code-untouched queries
swung up to 3.7x. The headline per-query number is the MIN of the timed
reps (least-noise estimator of the warm cost); medians and raw samples
land in BENCH_DETAIL.json along with the peak cached-storage footprint
sampled after every query (sticky-cache memory discipline). Cross-round
comparisons should still divide by the calib_sec ratio (host drift).

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
    # pin numpy/BLAS threading in the Python workers (local mode inherits
    # this env): unpinned BLAS picks thread counts by machine load, which
    # measured as a persistent ~1.3x level shift on the Arrow-matmul
    # queries between otherwise identical runs
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "4")

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
    # adaptive repetition: superstep/JIT-heavy queries keep speeding up
    # past 3 reps (a decaying series whose min measures "how far it
    # converged", not the query) — sample until the best two agree within
    # 8%, capped. The headline stays min; `converged` marks queries whose
    # spread never settled, so cross-round comparisons know which numbers
    # are low-confidence before calling one a regression.
    reps_max = max(
        reps, int(os.environ.get("SPARK_GRAFT_BENCH_REPS_MAX", "6"))
    )
    # PINNED jitter-bound list (VERDICT r9 item 5): these queries'
    # dominant cost is Arrow/BLAS matmul batches or iterative-superstep
    # JIT, whose rep-to-rep spread is machine-load noise, not plan cost —
    # the "unconverged" flag drifted between otherwise-identical runs.
    # They get a widened rep budget so convergence is reached when the
    # host is quiet, and a `jitter_bound` marker in BENCH_DETAIL either
    # way so tools/bench_compare.py reports their non-convergence as the
    # EXPECTED instrument property rather than a new low-confidence
    # finding. Membership changes belong here, in code review — never
    # inferred per run.
    # Class-defined, not per-incident: (a) the Arrow/BLAS-matmul ANN
    # rows, (b) every iterative-superstep graph query — their walls ride
    # a decaying JIT/codegen series (each rep re-JITs N superstep stages)
    # that the two-best-agree rule mistakes for non-convergence on
    # whichever runs land mid-decay. Two back-to-back r10 runs drifted
    # exactly these classes (BENCH_NOTES r10 jitter row).
    JITTER_BOUND = {
        "emb_ann_ivf_topk",
        "emb_ann_lsh_topk",
        # r12 attribution (VERDICT r11 item 3): two back-to-back isolated
        # runs put both at their r9/r10 walls (PQ min 1.47/1.39 s, bigram
        # 1.75/1.62 s — agree within 8%) while their first rep rides a
        # ~7 s JIT/codegen decay; the r11 driver moves (PQ 1.06→1.83,
        # bigram spread 3.35x) were host drift over exactly that decay —
        # class (a) for PQ (Arrow/numpy ADC matmul seam), class-(b)-like
        # codegen decay for the bigram LM's chained HOF stages.
        "emb_ann_pq_topk",
        "docs_bigram_lm_score",
        "graph_triangles_copurchase",
        "graph_label_propagation",
        "graph_pagerank_trade",
        "graph_pagerank_directed",
        "graph_pagerank_personalized",
        "graph_pagerank_weighted_trade",
        "graph_khop_reach",
    }
    converged: dict[str, bool] = {}
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    failures: dict[str, str] = {}
    peak_storage = 0
    # interleaved calibration TIMELINE: the start-of-run calib_sec cannot
    # represent a 10-minute run on a shared host (measured: an external
    # load spike decayed mid-run and start-calibs disagreed with the very
    # queries they were supposed to normalize). A mini fixed-job probe
    # every CALIB_EVERY queries records the host speed local to each
    # query's window; bench_compare --normalize=window divides per-query
    # times by the window ratio before calling drift a regression.
    calib_timeline: list[float] = []
    query_window: dict[str, int] = {}

    def _mini_calib() -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            spark.range(50_000_000).selectExpr("sum(id * 3 + 7)").collect()
            spark.range(5_000_000).selectExpr("id % 1024 AS k").groupBy(
                "k"
            ).count().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    CALIB_EVERY = 15
    # *_verdict queries are oracle-checkable correctness AUDITS: each runs a
    # deliberately-exhaustive exact baseline (all-pairs hamming, full-corpus
    # exact Jaccard) next to the fast operator to pin its recall contract.
    # They belong in the driver's correctness gate, not the throughput
    # headline — timing them would measure the audit baseline, not the engine.
    queries = {n: f for n, f in all_queries().items() if not n.endswith("_verdict")}
    # iteration aid: SPARK_GRAFT_BENCH_ONLY="q1,q2" times just those
    # queries (comma-separated exact names). The filtered run is marked in
    # the output line so a partial total is never mistaken for a headline.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s
    }
    if only:
        unknown = only - set(all_queries())
        if unknown:  # a typo must not masquerade as an instant run
            sys.exit(f"SPARK_GRAFT_BENCH_ONLY names not in the registry: "
                     f"{sorted(unknown)}")
        queries = {n: f for n, f in queries.items() if n in only}
    for i, name in enumerate(sorted(queries)):  # fixed order: registry
        fn = queries[name]  # growth can't reshuffle
        if i % CALIB_EVERY == 0:
            calib_timeline.append(_mini_calib())
        query_window[name] = len(calib_timeline) - 1
        _isolate(spark)  # drop every cross-query cache layer
        try:
            t0 = time.time()
            fn(spark, sf_dir).count()  # untimed warm-up: sticky/index builds,
            warm = round(time.time() - t0, 3)  # JIT, page cache (recorded)
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e)[:200]
            timings[name] = -1.0
            continue
        runs: list[float] = []
        q_reps_max = reps_max + 4 if name in JITTER_BOUND else reps_max
        while len(runs) < q_reps_max:
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                failures[name] = str(e)[:200]
                break
            if len(runs) >= max(2, reps):  # convergence needs two samples
                b1, b2 = sorted(runs)[:2]
                # 8% relative OR 150 ms absolute: sub-second queries on
                # local[32] carry 100-200 ms scheduler jitter per rep
                # (measured: back-to-back r10 runs flipped DIFFERENT
                # ~0.6 s queries at the old 50 ms bound) — a tolerance
                # below the scheduler's own noise floor measures the
                # scheduler, not the query
                if b2 <= b1 * 1.08 + 0.15:
                    break
        if runs and name not in failures:
            samples[name] = [warm] + runs  # samples[0] is the cold warm-up
            timings[name] = min(runs)  # headline: min of the warm reps
            if len(runs) >= 2:
                b1, b2 = sorted(runs)[:2]
                converged[name] = b2 <= b1 * 1.08 + 0.15
            else:  # REPS=1: a single sample can't demonstrate convergence
                converged[name] = False
        else:
            timings[name] = -1.0
        peak_storage = max(peak_storage, _cached_bytes(spark))
    _isolate(spark)

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
    if only:
        result["partial"] = sorted(only)  # never mistake a filtered total

    detail = dict(result)
    detail["samples"] = samples  # [cold warm-up, rep1, rep2, ...] per query
    detail["queries_min"] = dict(timings)  # headline IS min-of-warm-reps
    detail["queries_median"] = {
        n: sorted(r[1:])[len(r[1:]) // 2] for n, r in samples.items()
    }
    detail["queries_cold"] = {n: r[0] for n, r in samples.items()}
    detail["queries_converged"] = converged
    detail["jitter_bound"] = sorted(JITTER_BOUND & set(timings))
    detail["calib_timeline"] = calib_timeline
    detail["queries_window"] = query_window
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        # a filtered run must not clobber the full-run detail file
        "BENCH_DETAIL_partial.json" if only else "BENCH_DETAIL.json",
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    print(json.dumps(_fit_line(result), separators=(",", ":")))


def _isolate(spark) -> None:
    """Reset every cache layer that could leak one query's work into
    another's timing: scoped persists (normally released by the NEXT query's
    wrapper), the sticky corpus-artifact LRU (deliberately session-lived in
    production — here each query's warm-up rebuilds its own), and Spark's
    cache registry (cached tables/views)."""
    from creatorops_lakehouse_spark.operators.cache import (
        release_scoped_caches,
        release_sticky,
    )

    release_scoped_caches()
    release_sticky()
    try:
        spark.catalog.clearCache()
    except Exception:  # accounting must never fail the bench
        pass


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
    line["detail"] = (
        "BENCH_DETAIL_partial.json" if result.get("partial") else "BENCH_DETAIL.json"
    )
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
