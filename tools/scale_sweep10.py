"""Full-suite 10× scale sweep (VERDICT r9 item 2): synthesize a 10×-rows
copy of the five big driver tables under .sweep10/ and run the ENTIRE
bench suite against it, then print the per-query wall-growth table.

Synthesis design (foreign keys preserved — unlike .scalerel*, which
deliberately breaks them to grow dimensions):

- orders / lineitem: 10 copies with o_orderkey / l_orderkey shifted by
  the SAME k·10^8 per copy, so the fact-fact join keys stay paired;
  custkey/partkey/suppkey are NOT shifted — dimensions stay fixed and
  every customer/part/supplier now carries 10× facts (the realistic
  fact-grows-dims-don't shape; group cardinality fixed, group size ×10).
- events: event_id shifted, user_id kept (per-user session windows grow
  ×10 — the honest window-stress), ts jittered +k seconds so copies
  don't create exact (user, ts) ties.
- documents / embeddings: symlinked to .scale/ (scale_rehearsal.py's 10×
  perturbation design — near-dup structure preserved without a quadratic
  pair explosion).
- region/nation/customer/supplier/part: symlinked unscaled.

Run:
    python tools/scale_sweep10.py [--skip-gen]      # synthesize only
then (bench must run EXCLUSIVE — no other Spark JVM):
    SPARK_GRAFT_SF_DIR=$REPO/.sweep10 SPARK_GRAFT_BENCH_REPS=1 \
        SPARK_GRAFT_BENCH_REPS_MAX=2 python bench.py
then compare:
    python tools/scale_sweep10.py --compare=BENCH_DETAIL.json,BENCH_r08.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COPIES = 10
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def out_dir() -> str:
    return os.path.join(_REPO, ".sweep10")


def synthesize(spark) -> None:
    out = out_dir()
    os.makedirs(out, exist_ok=True)
    ks = spark.range(COPIES).select(F.col("id").alias("_k"))

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        orders.crossJoin(ks)
        .select(
            (F.col("o_orderkey") + F.col("_k") * F.lit(100_000_000)).alias(
                "o_orderkey"
            ),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .drop("_k")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li.crossJoin(ks)
        .select(
            (F.col("l_orderkey") + F.col("_k") * F.lit(100_000_000)).alias(
                "l_orderkey"
            ),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .drop("_k")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )

    sys.path.insert(0, _REPO)
    from creatorops_lakehouse_spark.queries import load

    events = load(spark, SF_DIR, "events")
    (
        events.crossJoin(ks)
        .select(
            (F.col("event_id") + F.col("_k") * F.lit(100_000_000)).alias(
                "event_id"
            ),
            F.expr("timestampadd(SECOND, _k, ts)").alias("ts"),
            *[c for c in events.columns if c not in ("event_id", "ts")],
        )
        .drop("_k")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    for t, src in (
        ("documents", os.path.join(_REPO, ".scale", "documents.parquet")),
        ("embeddings", os.path.join(_REPO, ".scale", "embeddings.parquet")),
    ):
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(src, link)
    for t in TABLES:
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)


def compare(sweep_path: str, base_path: str, factor: int = COPIES) -> int:
    with open(sweep_path) as f:
        sweep = json.load(f)
    with open(base_path) as f:
        base = json.load(f)
    sq = sweep.get("queries_min") or sweep["queries"]
    bq = base.get("queries_min") or base["queries"]
    rows = []
    for name in sorted(set(sq) & set(bq)):
        s, b = sq[name], bq[name]
        if s < 0 or b < 0:
            rows.append((float("inf"), name, b, s, "FAILED"))
            continue
        # sub-100ms base walls are scheduler noise; growth there is not
        # a scaling signal (still listed, never flagged)
        ratio = s / b if b > 0 else float("inf")
        flag = "SUPER-LINEAR" if (b >= 0.1 and ratio > factor * 1.5) else ""
        rows.append((ratio, name, b, s, flag))
    rows.sort(reverse=True)
    print(f"{'query':<42} {'1x':>8} {'10x':>9} {'ratio':>7}")
    for ratio, name, b, s, flag in rows:
        print(f"{name:<42} {b:>8.3f} {s:>9.3f} {ratio:>6.1f}x {flag}")
    bad = [r for r in rows if r[4] == "SUPER-LINEAR"]
    failed = [r for r in rows if r[4] == "FAILED"]
    print(f"\n{len(rows)} compared; {len(bad)} super-linear, {len(failed)} failed")
    return 1 if (bad or failed) else 0


def main() -> int:
    for a in sys.argv:
        if a.startswith("--compare="):
            sweep_p, base_p = a.split("=", 1)[1].split(",")
            return compare(sweep_p, base_p)
    sys.path.insert(0, _REPO)
    from creatorops_lakehouse_spark.session import build_spark

    spark = build_spark("scale-sweep10")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-gen" not in sys.argv:
        t0 = time.time()
        synthesize(spark)
        print(f"synthesized 10x orders/lineitem/events in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
