"""Fixed-iteration PageRank in exact integer arithmetic.

Iterative graph algorithms are the second class (after connected
components, operators/dedup.py) that SQL engines can't express directly —
but a FIXED number of power iterations can, as K chained
join-aggregate steps. Doing the per-step arithmetic in scaled integers
(floor divisions, no floats) makes every iteration bit-identical across
engines, so the whole algorithm is hash-checkable against a DuckDB oracle
that unrolls the same K steps as chained CTEs — a far stronger check than
the usual "converged to roughly the same vector".

Update rule per iteration, all in BIGINT units (initial rank = 10^9):

    contrib(u -> v) = units(u) div outdeg(u)
    units'(v)       = teleport + (d_num * sum(contrib)) div d_den

with teleport = (10^9 * (d_den - d_num)) div d_den (the (1-d) mass for a
rank scale of 10^9 per node; ranks are N x the probability scale).

Scale design (100 TB / 10^9-node graphs):
- The edge list is the only big table; it shuffles ONCE to attach
  out-degrees, is persisted, and every iteration reuses that partitioning
  for the contribute-and-aggregate join (shuffle on src, then on dst —
  the classic Pregel superstep cost, K times).
- Ranks are one row per node. Each iteration's ranks are persisted and
  the previous iteration released (scoped_persist), so the plan depth
  stays O(1) per step instead of O(K) — lineage cut is what keeps a
  30-iteration run from recompiling a 30-deep join tree.
- Dangling nodes: callers must orient the graph so every node has at
  least one out-edge (an undirected/symmetrized edge list satisfies this
  by construction); the operator raises otherwise, because dangling mass
  redistribution is a modeling choice, not a default.
- Overflow bound: total system mass is N x INIT_UNITS, so the worst-case
  single-node inflow times d_num must stay under 2^63 — fine through
  N ~ 10^8 nodes at the default 10^9 scale; for web-scale graphs drop
  INIT_UNITS a decade per extra decade of N (rank resolution trades off
  against headroom). WEIGHTED runs shrink that headroom further: the
  per-edge product units(u) * w must also stay under 2^63, so divide the
  N bound by max edge weight (or pre-normalize weights to a small
  integer range) — a hub holding ~1e13 units with w ~ 1e6 weights wraps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from creatorops_lakehouse_spark.operators.cache import scoped_persist

INIT_UNITS = 10**9


#: below this node count the per-iteration ranks table is broadcast.
#: A broadcast relation costs far more than its 16 B/row raw width — the
#: rows are collected to the driver, rebuilt as a hash relation (typically
#: 5-10x raw), and the ranks table is re-collected and re-broadcast EVERY
#: one of the K iterations. 2M nodes ≈ 32 MB raw ≈ a few hundred MB of
#: transient driver/executor footprint per step — comfortably safe; the
#: old 10M default was not (ADVICE r5).
BROADCAST_NODE_LIMIT = 2_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    damping: tuple[int, int] = (85, 100),
    check_dangling: bool = True,
    broadcast_ranks: bool | None = None,
    weight: str | None = None,
    seeds: DataFrame | None = None,
    dangling: str | None = None,
    unit_scale: int = INIT_UNITS,
) -> DataFrame:
    """Integer-arithmetic PageRank over a directed edge list.

    Returns ``(node, rank_units)`` — BIGINT units on a 10^9-per-node
    scale, bit-identical to the unrolled-CTE SQL form of the same
    arithmetic. Nodes with no IN-edges are fine — they hold exactly the
    teleport mass each iteration and keep contributing along their
    out-edges. Nodes with no OUT-edges (dangling) are governed by
    ``dangling``:

    - ``"check"`` (default): raise — the caller must orient the graph so
      every node has >= 1 out-edge (an undirected/symmetrized edge list
      satisfies this by construction).
    - ``"ignore"``: skip the check; dangling mass silently leaks (only
      correct when the caller has proven there are no dangling nodes and
      wants to skip the verification pass).
    - ``"redistribute"``: the standard random-surfer treatment for real
      directed graphs (web links, citations): each iteration the total
      rank mass sitting on dangling nodes is re-spread uniformly —
      ``share = dangling_mass div N`` integer units added to every node's
      inflow before damping — still bit-exact against the unrolled SQL
      oracle. The node universe becomes src ∪ dst. (Not combinable with
      ``seeds``: where dangling mass restarts under personalization is a
      modeling choice this operator refuses to default.)

    ``check_dangling=False`` is the legacy spelling of
    ``dangling="ignore"``; the ``dangling`` keyword wins when given.

    ``weight`` names an integer edge-weight column: contributions become
    ``units * w div sum_w(u)`` — trade volume, link multiplicity — with
    the unweighted case exactly equivalent to all-ones weights.
    ``unit_scale`` is the integer rank resolution (units per node at
    initialization; default 10^9). The int64 overflow bound is
    N × unit_scale × d_num < 2^63, so past ~10^8 nodes at the default
    scale a caller DOWNSHIFTS unit_scale a decade per extra decade of N —
    rank resolution trades off against headroom; the arithmetic stays
    deterministic integer at any scale and the SQL oracle takes the same
    parameter (VERDICT r6 item 6).
    ``seeds`` (a one-column ``node`` DataFrame) switches to PERSONALIZED
    PageRank: the teleport mass lands only on the seed set (random-walk-
    with-restart proximity to the seeds, the recommendation primitive);
    non-seed no-inflow nodes then hold 0, and seeds must be a subset of
    the out-edge node universe.

    Join strategy: the ranks table is one row per node — tiny next to the
    edge list — so by default it is BROADCAST into the per-iteration
    contribute join when the node count is under ``BROADCAST_NODE_LIMIT``
    (decided from a one-off count of the degree table; pass
    ``broadcast_ranks`` to skip that count). Each iteration then costs one
    scan of the persisted edge list + one aggregate shuffle on dst — no
    edge re-shuffle. Above the limit (wikipedia/web-graph scale) the join
    falls back to shuffle: the degree-annotated edge list is persisted
    pre-partitioned on src and ranks arrive partitioned on node from the
    previous iteration's dst-aggregate, so the SMJ re-shuffles only the
    small side per step.
    """
    d_num, d_den = damping
    # Fail-loud on a nonsense damping tuple (ADVICE r5): d_num > d_den
    # yields a negative teleport and silently garbage ranks; d_den <= 0
    # would only surface as a ZeroDivisionError below. Same guard
    # convention as the dangling/weight/seed checks.
    if d_den <= 0 or not (0 <= d_num <= d_den):
        raise ValueError(
            f"pagerank: damping must satisfy 0 <= d_num <= d_den with "
            f"d_den > 0, got {damping!r}"
        )
    mode = dangling if dangling is not None else (
        "check" if check_dangling else "ignore"
    )
    if mode not in ("check", "ignore", "redistribute"):
        raise ValueError(f"pagerank: unknown dangling mode {mode!r}")
    if mode == "redistribute" and seeds is not None:
        raise ValueError(
            "pagerank: dangling='redistribute' with seeds is a modeling "
            "choice this operator refuses to default; handle dangling "
            "mass explicitly for personalized runs"
        )
    if unit_scale < 10**3:
        raise ValueError(
            f"pagerank: unit_scale {unit_scale} leaves no rank resolution "
            "(teleport mass floors to ~0); use >= 1e3"
        )
    teleport = (unit_scale * (d_den - d_num)) // d_den

    # Persist the raw edge list first: the degree aggregate, the dangling
    # check, and the degree-annotate join all read it — without the persist
    # each one would recompute the (possibly join-heavy) edge derivation.
    w_col = (
        F.col(weight).cast("long") if weight is not None else F.lit(1).cast("long")
    )
    e = scoped_persist(
        edges.select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w_col.alias("w")
        )
    )
    # Right-size the partitioning from the actual edge count (~250k edge
    # rows per task) BEFORE any other pass: an edge list assembled by
    # unions/joins inherits far too many tiny partitions, and every
    # downstream pass (degree aggregate, dangling check, K iteration
    # scans) would pay pure task-scheduling overhead. The count is the
    # only pass over the raw partitioning — it also materializes the
    # persisted edge list. coalesce (not repartition): narrow, no shuffle.
    if weight is not None:
        # Zero/negative/NULL weights poison the arithmetic silently: a
        # node whose weights sum to 0 divides by zero (NULL under
        # non-ANSI Spark, an ERROR in the DuckDB oracle) and its rank
        # mass vanishes. Same fail-loud contract as the dangling check —
        # fused into the sizing count (r14: one job instead of two).
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("w") <= 0) | F.col("w").isNull(), 1
                ).otherwise(0)
            ).alias("bad"),
        ).first()
        n_edges, n_bad = row.n, row.bad or 0
        if n_bad:
            raise ValueError(
                f"pagerank: {n_bad} edge(s) with non-positive or NULL "
                f"weight in column {weight!r}; weights must be >= 1"
            )
    else:
        n_edges = e.count()
    parts = max(1, min(e.rdd.getNumPartitions(), -(-n_edges // 250_000)))
    e = e.coalesce(parts)
    # outdeg = total outgoing WEIGHT (== edge count when unweighted: the
    # weight column defaults to 1, so both cases share one code path)
    deg = e.groupBy(F.col("e_src").alias("node")).agg(
        F.sum("w").cast("long").alias("outdeg")
    )
    if mode == "check":
        n_dst_only = (
            e.select(F.col("e_dst").alias("node"))
            .distinct()
            .join(deg, "node", "left_anti")
            .count()
        )
        if n_dst_only:
            raise ValueError(
                f"pagerank: {n_dst_only} dangling node(s) (no out-edges); "
                "symmetrize the edge list, pass dangling='redistribute', "
                "or handle dangling mass first"
            )
    dangling_nodes = None
    n_nodes = None
    if mode == "redistribute":
        # Node universe widens to src ∪ dst; the dangling set (nodes with
        # no out-edges) is re-read every iteration for the mass sum.
        universe_nodes = scoped_persist(
            e.select(F.col("e_src").alias("node"))
            .union(e.select(F.col("e_dst").alias("node")))
            .distinct()
        )
        n_nodes = universe_nodes.count()
        dangling_nodes = scoped_persist(
            universe_nodes.join(deg, "node", "left_anti")
        )
    else:
        universe_nodes = deg.select("node")
    if broadcast_ranks is None:
        n_universe = n_nodes if n_nodes is not None else deg.count()
        broadcast_ranks = n_universe <= BROADCAST_NODE_LIMIT
    # Attach out-degrees. Small graphs: deg broadcasts -> map-side join,
    # no edge shuffle at all. Big graphs: pre-partition edges on src so
    # the per-iteration SMJ against ranks reuses this partitioning.
    if broadcast_ranks:
        annotated = e.join(
            F.broadcast(deg.select(F.col("node").alias("e_src"), "outdeg")), "e_src"
        )
    else:
        annotated = e.repartition(F.col("e_src")).join(
            deg.select(F.col("node").alias("e_src"), "outdeg"), "e_src"
        )
    ed = scoped_persist(annotated)
    # The node universe: every node has an out-edge (checked above), so
    # deg IS the node set, annotated with its per-node teleport mass —
    # uniform by default, restricted to the seed set for personalized
    # PageRank. Persist-worthy: re-read every iteration as the zero-row
    # side of the inflow union. Coalesced like the edge table — K
    # iterations over
    # a 32-partition 16k-row table would pay pure task scheduling, same
    # failure mode as the edge list.
    if seeds is None:
        node_tele = universe_nodes.select(
            "node", F.lit(teleport).cast("long").alias("tele")
        )
    else:
        seed_set = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
        # A seed outside the node universe would be silently ignored by
        # the left join below (zero teleport mass lands anywhere near
        # it) — a typo'd or un-mangled id is a modeling error, not a
        # no-op. Fail loud, matching the dangling/weight guards.
        n_unknown = seed_set.join(deg, "node", "left_anti").count()
        if n_unknown:
            raise ValueError(
                f"pagerank: {n_unknown} seed node(s) not present in the "
                "edge list's out-edge node universe"
            )
        node_tele = deg.select("node").join(
            F.broadcast(seed_set.withColumn("_is_seed", F.lit(1))), "node", "left"
        ).select(
            "node",
            F.when(F.col("_is_seed").isNotNull(), F.lit(teleport))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("tele"),
        )
    if mode == "redistribute":
        # The dangling flag is attached to the node table ONCE (r14) —
        # the per-iteration dangling-mass sum then filters the (small,
        # checkpointed) ranks table instead of broadcast-joining the
        # dangling set into every iteration's plan. The one-time attach
        # join broadcasts under the same node-count decision as the
        # per-iteration ranks (dangling ⊆ the node universe).
        dang_flagged = dangling_nodes.withColumn("_dang", F.lit(True))
        node_tele = node_tele.join(
            F.broadcast(dang_flagged) if broadcast_ranks else dang_flagged,
            "node",
            "left",
        ).select(
            "node", "tele", F.coalesce("_dang", F.lit(False)).alias("_dang")
        )
    nodes = scoped_persist(node_tele.coalesce(parts))
    ranks = nodes.select(
        "node",
        F.lit(unit_scale).cast("long").alias("units"),
        *(["_dang"] if mode == "redistribute" else []),
    )
    # Per-iteration shape (r14, guide §2.4 shared exchanges): units'(v) =
    # tele(v) + damped(inflow(v)) previously needed a second broadcast
    # (collect + hash-relation build EVERY iteration) to left-join the
    # inflow aggregate back onto the node set. Unioning one (node, c=0,
    # tele) row per node into the contribution stream computes the same
    # thing in the aggregate itself: every node appears exactly once on
    # the zero side, so sum(tele) == tele, sum(c) is unchanged by the
    # zero rows, and no-inflow nodes get sum(c) = 0 — exactly the old
    # coalesce(_, 0). One exchange, zero per-iteration broadcast builds.
    for _ in range(iters):
        share_df = None
        if mode == "redistribute":
            # One-row dangling-mass scalar, kept IN the plan (a broadcast
            # cross join, the sanctioned one-row-aggregate pattern) so
            # each iteration stays a single job — a driver-side collect
            # here would double the per-iteration job count. share is the
            # per-node uniform re-spread, floor-divided so the arithmetic
            # stays integer-exact against the unrolled SQL oracle.
            share_df = (
                ranks.filter(F.col("_dang"))
                .agg(F.coalesce(F.sum("units"), F.lit(0)).alias("_dm"))
                .select(
                    F.expr(f"_dm div {n_nodes}").cast("long").alias("_share")
                )
            )
        rsel = ranks.select(F.col("node").alias("e_src"), "units")
        rhs = F.broadcast(rsel) if broadcast_ranks else rsel
        contrib = ed.join(rhs, "e_src").select(
            F.col("e_dst").alias("node"),
            F.expr("(units * w) div outdeg").alias("c"),
        )
        both = contrib.select(
            "node",
            "c",
            F.lit(0).cast("long").alias("tele"),
            *(
                [F.lit(False).alias("_dang")]
                if mode == "redistribute"
                else []
            ),
        ).unionByName(
            nodes.select(
                "node",
                F.lit(0).cast("long").alias("c"),
                "tele",
                *(["_dang"] if mode == "redistribute" else []),
            )
        )
        if mode == "redistribute":
            # units' = tele + (d * (edge inflow + uniform dangling share)),
            # composed over the aggregate so every node (even one with
            # zero edge inflow) receives its dangling share.
            ranks = (
                both.groupBy("node")
                .agg(
                    F.sum("tele").alias("_tele"),
                    F.sum("c").alias("_sum_c"),
                    F.max("_dang").alias("_dang"),
                )
                .crossJoin(F.broadcast(share_df))
                .select(
                    "node",
                    (
                        F.col("_tele")
                        + F.expr(
                            f"({d_num} * (_sum_c + _share)) div {d_den}"
                        )
                    )
                    .cast("long")
                    .alias("units"),
                    "_dang",
                )
            )
        else:
            ranks = both.groupBy("node").agg(
                F.expr(f"(sum(tele) + ({d_num} * sum(c)) div {d_den})")
                .cast("long")
                .alias("units")
            )
        # Cut lineage EVERY iteration: persist() alone keeps the logical
        # plan, so iteration k would re-optimize a k-deep join tree and
        # driver-side planning dominates (measured: ~8s warm for 6
        # iterations at sf0.1, ~3s with the checkpoint). The ranks table
        # is one small row per node, so the eager materialization is
        # cheap; on a real cluster localCheckpoint trades executor-loss
        # recovery for exactly this planning cost, the standard deal for
        # iterative algorithms. Cadence alternatives were MEASURED WORSE
        # at sf0.1 (r7): cutting every 2nd iteration 3.1/4.1/2.7/3.0 s and
        # skipping only the final cut 3.2/3.5/2.0/2.2 s vs 3.0/2.7/2.0/2.2
        # for trade/directed/weighted/personalized — the un-cut tail
        # recomputes its broadcasts inside the consumer job and costs more
        # than the saved checkpoint job.
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("units").alias("rank_units"))


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 6,
    damping: tuple[int, int] = (85, 100),
    weighted: bool = False,
    seeds_sql: str | None = None,
    dangling: str = "ignore",
    unit_scale: int = INIT_UNITS,
) -> str:
    """DuckDB SQL computing the identical integer arithmetic: K unrolled
    join-aggregate CTE steps over ``edges_sql`` (must yield columns
    ``src, dst`` — plus ``w`` when ``weighted``). ``seeds_sql`` (yields
    ``node``) restricts teleport mass to the seed set (personalized).
    ``dangling="redistribute"`` mirrors the operator's uniform dangling-
    mass re-spread over the src ∪ dst node universe (not combinable with
    ``seeds_sql``). Returns a relation ``(node, rank_units)``."""
    d_num, d_den = damping
    teleport = (unit_scale * (d_den - d_num)) // d_den
    redistribute = dangling == "redistribute"
    if redistribute and seeds_sql is not None:
        raise ValueError("redistribute + seeds unsupported (see pagerank())")
    steps = []
    if weighted:
        steps.append(f"e AS ({edges_sql})")
    else:
        steps.append(f"e AS (SELECT src, dst, 1 AS w FROM ({edges_sql}))")
    steps.append(
        "deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS outdeg"
        " FROM e GROUP BY 1)"
    )
    steps.append(
        "ed AS (SELECT e.src, e.dst, e.w, d.outdeg FROM e JOIN deg d"
        " ON d.node = e.src)"
    )
    universe = "deg"
    if redistribute:
        steps.append(
            "uni AS (SELECT DISTINCT node FROM ("
            "SELECT src AS node FROM e UNION ALL SELECT dst FROM e))"
        )
        steps.append(
            "dang AS (SELECT uni.node FROM uni LEFT JOIN deg"
            " ON deg.node = uni.node WHERE deg.node IS NULL)"
        )
        universe = "uni"
    if seeds_sql is None:
        steps.append(
            f"nt AS (SELECT node, CAST({teleport} AS BIGINT) AS tele"
            f" FROM {universe})"
        )
    else:
        steps.append(
            f"nt AS (SELECT deg.node, CAST(CASE WHEN s.node IS NOT NULL"
            f" THEN {teleport} ELSE 0 END AS BIGINT) AS tele"
            f" FROM deg LEFT JOIN (SELECT DISTINCT node FROM ({seeds_sql})) s"
            f" ON s.node = deg.node)"
        )
    steps.append(
        f"r0 AS (SELECT node, CAST({unit_scale} AS BIGINT) AS units"
        f" FROM {universe})"
    )
    for k in range(1, iters + 1):
        if redistribute:
            steps.append(
                f"dm{k} AS (SELECT CAST(COALESCE(SUM(r.units), 0) AS BIGINT)"
                f" // (SELECT COUNT(*) FROM uni) AS share"
                f" FROM r{k-1} r JOIN dang ON dang.node = r.node)"
            )
            steps.append(
                f"r{k} AS (SELECT nt.node, "
                f"CAST(nt.tele + ({d_num} * (COALESCE(a{k}.sum_c, 0) + "
                f"(SELECT share FROM dm{k}))) // {d_den} AS BIGINT) AS units "
                f"FROM nt LEFT JOIN ("
                f"SELECT ed.dst AS node, "
                f"CAST(SUM((r{k-1}.units * ed.w) // ed.outdeg) AS BIGINT)"
                f" AS sum_c "
                f"FROM ed JOIN r{k-1} ON r{k-1}.node = ed.src GROUP BY ed.dst"
                f") a{k} ON a{k}.node = nt.node)"
            )
        else:
            steps.append(
                f"r{k} AS (SELECT nt.node, "
                f"CAST(nt.tele + COALESCE(a{k}.damped, 0) AS BIGINT) AS units "
                f"FROM nt LEFT JOIN ("
                f"SELECT ed.dst AS node, "
                f"({d_num} * CAST(SUM((r{k-1}.units * ed.w) // ed.outdeg) "
                f"AS BIGINT)) // {d_den} AS damped "
                f"FROM ed JOIN r{k-1} ON r{k-1}.node = ed.src GROUP BY ed.dst"
                f") a{k} ON a{k}.node = nt.node)"
            )
    return (
        "WITH " + ",\n    ".join(steps) + f"\n    SELECT node, units AS rank_units FROM r{iters}"
    )
