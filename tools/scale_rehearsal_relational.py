"""100× scale rehearsal for the relational/events newcomers that the
documents-based harness (scale_rehearsal.py) can't cover — VERDICT r6
item 8: ``customer_rfm_segments`` (three range-partitioned global-rank
passes over a growing orders-derived dimension) and
``events_grouping_sets_summary`` (multi-grain aggregate).

Synthesizes N× copies of sf0.1's ``orders`` and ``events`` under
.scalerel<N>/ (gitignored) — key offsets spaced so copies never collide;
every other driver table is symlinked unscaled so registered queries can
read the dir as a normal sf_dir. Copy k shifts o_custkey/user_id into a
fresh key range, so GROUP-BY cardinality grows with the data (the honest
dimension-growth case for RFM's rank shuffles), while dates/types keep
their original distributions (grouping-set group counts stay bounded —
the aggregate's own scale story).

    python tools/scale_rehearsal_relational.py [--copies=N] [--skip-gen]
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
QUERIES = ("customer_rfm_segments", "events_grouping_sets_summary")


def scale_dir(copies: int) -> str:
    return os.path.join(_REPO, f".scalerel{copies}")


def synthesize(spark, copies: int) -> None:
    out = scale_dir(copies)
    os.makedirs(out, exist_ok=True)
    ks = spark.range(copies).select(F.col("id").alias("_k"))

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    scaled = orders.crossJoin(ks).select(
        (F.col("o_orderkey") + F.col("_k") * F.lit(100_000_000)).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_k") * F.lit(10_000_000)).alias("o_custkey"),
        *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
    )
    scaled.repartition(32).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    # events: read through queries.load (ts physical-type normalization),
    # then write microsecond timestamps the loader round-trips unchanged
    sys.path.insert(0, _REPO)
    from creatorops_lakehouse_spark.queries import load

    events = load(spark, SF_DIR, "events")
    escaled = events.crossJoin(ks).select(
        (F.col("event_id") + F.col("_k") * F.lit(100_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_k") * F.lit(10_000_000)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    escaled.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    for t in TABLES:
        if t in ("orders", "events"):
            continue
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)


def main() -> int:
    sys.path.insert(0, _REPO)
    from creatorops_lakehouse_spark.operators.cache import release_scoped_caches
    from creatorops_lakehouse_spark.queries import all_queries
    from creatorops_lakehouse_spark.session import build_spark

    copies = 100
    for a in sys.argv:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    spark = build_spark("scale-rehearsal-relational")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-gen" not in sys.argv:
        t0 = time.time()
        synthesize(spark, copies)
        print(f"synthesized {copies}x orders+events in {time.time() - t0:.0f}s")

    qs = all_queries()
    results: dict[str, dict[str, float]] = {}
    for tag, ddir in (("sf0.1", SF_DIR), (f"{copies}x", scale_dir(copies))):
        for name in QUERIES:
            release_scoped_caches()
            t0 = time.time()
            n = qs[name](spark, ddir).count()
            dt = time.time() - t0
            results.setdefault(name, {})[tag] = dt
            results[name][tag + "_rows"] = n
            print(f"{tag:6} {name:32} rows={n:<8} {dt:6.1f}s", flush=True)

    xtag = f"{copies}x"
    print(f"\n| operator | sf0.1 | {xtag} | ratio | rows sf0.1 | rows {xtag} |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        ratio = r[xtag] / r["sf0.1"] if r["sf0.1"] > 0 else float("nan")
        print(
            f"| {name} | {r['sf0.1']:.1f}s | {r[xtag]:.1f}s | {ratio:.1f}x "
            f"| {int(r['sf0.1_rows'])} | {int(r[xtag + '_rows'])} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
