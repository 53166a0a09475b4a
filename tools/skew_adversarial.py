"""Adversarial skew rehearsal (VERDICT r9 item 5): every rehearsal so far
used the driver's well-behaved synthetic distributions; this one builds a
deliberately hostile corpus and pins parity + wall for the skew-sensitive
paths.

Synthesized (deterministic, .skewadv/, gitignored):
- events_skew: 2M rows where ONE user holds 30% of all rows (600k); the
  rest spread over ~100k users (hash-uniform). The hot user is the
  hot-grouping-key / hot-join-key / giant-window-partition case.
- docs_skew: 50k docs where 10% (5k) form ONE near-dup cluster
  (shared 60-token base + tiny per-doc suffix, trigram Jaccard ≈ 0.9);
  the other 45k are mutually dissimilar. The giant cluster is the
  quadratic-bucket case for LSH pair emission.

Paths pinned (parity asserted, walls recorded):
1. plain groupBy count vs operators/skew.py::salted_count — identical
   counts, wall both ways.
2. hash-aggregate vs window on the hot user: a single 600k-row window
   partition cannot be split by AQE (known hazard) — wall recorded as the
   documented cost of window semantics on an unsalted hot key.
3. minhash all-pairs listing vs minhash_star_edges clustering on the
   giant cluster: CC cluster parity + candidate-volume + wall.
4. AQE skew join: events_skew ⋈ user dim on user_id — row-count parity
   vs broadcast reference, wall.

    python tools/skew_adversarial.py [--skip-gen]
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_EVENTS = 2_000_000
N_DOCS = 50_000
HOT_FRAC_EVENTS = 0.3  # one user owns 30% of events
CLUSTER_FRAC_DOCS = 0.1  # one near-dup cluster owns 10% of docs


def out_dir() -> str:
    return os.path.join(_REPO, ".skewadv")


def synthesize(spark) -> None:
    out = out_dir()
    os.makedirs(out, exist_ok=True)
    hot_n = int(N_EVENTS * HOT_FRAC_EVENTS)
    ev = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)) + 1)
        .alias("user_id"),
        F.expr("timestampadd(SECOND, CAST(id % 864000 AS INT), "
               "TIMESTAMP'2024-01-01 00:00:00')").alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(10_000))).alias("value"),
    )
    ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events_skew.parquet")

    cluster_n = int(N_DOCS * CLUSTER_FRAC_DOCS)
    base = " ".join(f"tok{i % 7}w{i}" for i in range(60))  # shared 60-token base
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < cluster_n,
            # giant cluster: base + 2 doc-specific tokens (J ≈ 58/62)
            F.concat(
                F.lit(base + " u"),
                F.col("id").cast("string"),
                F.lit("a u"),
                F.col("id").cast("string"),
                F.lit("b"),
            ),
        ).otherwise(
            # mutually dissimilar: 40 doc-salted tokens
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"t{j}x"),
                        F.pmod(F.xxhash64("id", F.lit(j)), F.lit(10_000_000)).cast(
                            "string"
                        ),
                    )
                    for j in range(40)
                ],
            )
        ).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(f"{out}/docs_skew.parquet")


def main() -> int:
    from creatorops_lakehouse_spark.operators.cache import release_scoped_caches
    from creatorops_lakehouse_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_star_edges,
    )
    from creatorops_lakehouse_spark.operators.skew import explode_salts, salt, salted_count
    from creatorops_lakehouse_spark.session import build_spark

    spark = build_spark("skew-adversarial")
    spark.sparkContext.setLogLevel("ERROR")
    out = out_dir()
    if "--skip-gen" not in sys.argv and not os.path.exists(
        os.path.join(out, "docs_skew.parquet", "_SUCCESS")
    ):
        t0 = time.time()
        synthesize(spark)
        print(f"synthesized skew corpus in {time.time() - t0:.0f}s")

    ev = spark.read.parquet(f"{out}/events_skew.parquet")
    docs = spark.read.parquet(f"{out}/docs_skew.parquet")
    walls: dict[str, float] = {}

    def timed(name, thunk):
        release_scoped_caches()
        t0 = time.time()
        v = thunk()
        walls[name] = round(time.time() - t0, 2)
        print(f"  {name}: {walls[name]}s")
        return v

    # warm-up: JVM/codegen
    ev.count(), docs.count()

    print("1) hot-key counts")
    plain = timed(
        "count_plain_groupby",
        lambda: {r.user_id: r.n for r in ev.groupBy("user_id")
                 .agg(F.count("*").alias("n")).filter("user_id < 5").collect()},
    )
    salted = timed(
        "count_salted",
        lambda: {r.user_id: r.n for r in salted_count(ev, ["user_id"],
                 salt_cols=["event_id"]).filter("user_id < 5").collect()},
    )
    assert plain == salted, (plain, salted)
    assert plain[0] == int(N_EVENTS * HOT_FRAC_EVENTS)

    print("2) hot-user window (single 600k-row partition; AQE cannot split)")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n_sess = timed(
        "window_sessionize_hot",
        lambda: ev.withColumn("_next", F.lead("ts").over(w))
        .filter(F.unix_timestamp("_next") - F.unix_timestamp("ts") > 1800)
        .count(),
    )
    print(f"  session breaks: {n_sess}")

    print("2b) bucketed sessionizer (operators/sessionize.py) vs plain window")
    from creatorops_lakehouse_spark.operators.sessionize import (
        sessionize_bucketed,
    )

    us = F.unix_micros("ts")
    flagged = ev.withColumn(
        "_new",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > 1800_000_000),
            1,
        ).otherwise(0),
    )
    naive = flagged.withColumn(
        "session_id",
        (F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
        .cast("long"),
    )
    n_naive = timed(
        "sessionize_plain_window",
        lambda: naive.groupBy("user_id", "session_id").count().count(),
    )
    n_bucketed = timed(
        "sessionize_bucketed",
        lambda: sessionize_bucketed(ev, gap_s=1800)
        .groupBy("user_id", "session_id").count().count(),
    )
    assert n_naive == n_bucketed, (n_naive, n_bucketed)
    print(f"  sessions: {n_bucketed} (parity plain vs bucketed)")

    print("2c) bucketed LEAD (keyed_lead_bucketed) vs plain per-key window")
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_lead_bucketed,
    )

    n_plain_lead = timed(
        "lead_plain_window",
        lambda: ev.withColumn("_next", F.lead("ts").over(w))
        .filter(F.col("_next").isNotNull())
        .count(),
    )
    n_bucketed_lead = timed(
        "lead_bucketed",
        lambda: keyed_lead_bucketed(ev, ["ts"])
        .filter(F.col("ts_next").isNotNull())
        .count(),
    )
    assert n_plain_lead == n_bucketed_lead, (n_plain_lead, n_bucketed_lead)
    print(f"  lead rows: {n_bucketed_lead} (parity plain vs bucketed)")

    print("3) giant near-dup cluster: all-pairs listing vs star-edge clustering")
    pairs = timed(
        "minhash_allpairs_listing",
        lambda: minhash_lsh_pairs(docs, threshold=0.5).count(),
    )
    cc_star = timed(
        "minhash_star_cc",
        lambda: connected_components(
            minhash_star_edges(docs, threshold=0.5)
        ).collect(),
    )
    clusters = {}
    for r in cc_star:
        clusters.setdefault(r.cluster_id, set()).add(r.node)
    cluster_n = int(N_DOCS * CLUSTER_FRAC_DOCS)
    giant = clusters.get(0, set()) | {0}
    assert giant == set(range(cluster_n)), (
        f"giant cluster wrong: {len(giant)} members"
    )
    assert len(cc_star) == cluster_n, "no spurious edges outside the cluster"
    print(f"  all-pairs listed {pairs} pairs (~n^2/2 of the cluster); "
          f"star CC recovered the {cluster_n}-doc cluster exactly")

    print("4) AQE skew join on the hot key")
    dim = spark.range(100_001).select(
        F.col("id").alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100)).alias("segment"),
    )
    ref = timed(
        "join_broadcast_ref",
        lambda: ev.join(F.broadcast(dim), "user_id")
        .groupBy("segment").count().count(),
    )
    import pyspark.sql.functions as _F

    aqe = timed(
        "join_shuffle_aqe",
        lambda: ev.hint("merge").join(dim.hint("merge"), "user_id")
        .groupBy("segment").count().count(),
    )
    n_salts = 16
    sev = salt(ev, n_salts, salt_cols=["event_id"])
    sdim = explode_salts(dim, n_salts)
    salted_j = timed(
        "join_salted",
        lambda: sev.join(sdim, ["user_id", "_salt"])
        .groupBy("segment").count().count(),
    )
    assert ref == aqe == salted_j

    print("\nwalls:", walls)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
