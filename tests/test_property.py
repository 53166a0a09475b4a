"""Property-based tests (hypothesis): custom operators vs brute-force
Python references on randomized small inputs.

Each example pays a Spark round-trip, so example counts are deliberately
small — the value is the randomized EDGE STRUCTURE (tied timestamps,
chain/clique graphs, boundary-straddling spans) that hand-written cases
under-sample, not volume.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsi"]


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---- as-of join --------------------------------------------------------


@SETTINGS
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=12
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 99)),
        min_size=0,
        max_size=12,
    ),
)
def test_asof_join_matches_reference(spark, left, right):
    from creatorops_lakehouse_spark.operators.asof import asof_join

    # unique (key, ts) on the right: as-of semantics ("latest right row")
    # are ambiguous when two right rows share a timestamp — the operator
    # may pick either payload; dedup keeps the property well-defined.
    seen = set()
    right = [
        r for r in right if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, ts int, lid int"
    )
    rdf = spark.createDataFrame(right, "k int, ts int, payload int")
    got = {
        (r.lid): (r.asof_ts, r.asof_payload)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", how="inner"
        ).collect()
    }
    expected = {}
    for lid, (k, lt) in enumerate(left):
        cands = [(t, p) for (rk, t, p) in right if rk == k and t <= lt]
        if cands:
            expected[lid] = max(cands)  # latest ts wins; ts unique per key
    assert got == expected


# ---- connected components ---------------------------------------------


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=20
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


# ---- sequence packing --------------------------------------------------


@SETTINGS
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12), max_size=10
    ),
    budget=st.integers(2, 16),
)
def test_pack_sequences_matches_sequential_scan(spark, texts, budget):
    from creatorops_lakehouse_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_seq, r.last_seq)
        for r in pack_sequences(df, budget=budget, n_buckets=3).collect()
    }
    cum = 0
    for i, ws in enumerate(texts):
        nt = len(ws)
        first = cum // budget
        last = (cum + max(nt - 1, 0)) // budget
        assert got[i] == (nt, cum, first, last)
        cum += nt


# ---- span-level dedup --------------------------------------------------


def _ref_strip(rows, window):
    toks = {i: _tok(t) for i, t in rows}
    wins: dict[tuple, list] = {}
    for i, l in toks.items():
        for p in range(len(l) - window + 1):
            wins.setdefault(tuple(l[p : p + window]), []).append((i, p))
    covered = {i: set() for i in toks}
    for occ in wins.values():
        docs = {i for i, _ in occ}
        if len(docs) >= 2:
            keeper = min(docs)
            for i, p in occ:
                if i != keeper:
                    covered[i].update(range(p, p + window))
    return {
        i: (
            len(l),
            len(covered[i] & set(range(len(l)))),
            " ".join(t for j, t in enumerate(l) if j not in covered[i]),
        )
        for i, l in toks.items()
    }


@SETTINGS
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS[:3]), min_size=0, max_size=14),
        min_size=1,
        max_size=6,
    ),
    window=st.integers(2, 5),
)
def test_strip_duplicate_spans_matches_reference(spark, texts, window):
    from creatorops_lakehouse_spark.operators.dedup import strip_duplicate_spans

    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in strip_duplicate_spans(df, window=window).collect()
    }
    assert got == _ref_strip(rows, window)


# ---- simhash multiprobe banding ---------------------------------------


@SETTINGS
@given(
    sigs=st.lists(
        st.integers(-(1 << 63), (1 << 63) - 1), min_size=2, max_size=10, unique=True
    ),
    geometry=st.sampled_from([(4, 1), (8, 1), (8, 0), (16, 1)]),
)
def test_simhash_banded_matches_exhaustive_within_guarantee(spark, sigs, geometry):
    """For ANY 64-bit signature multiset, banded candidates (exact or
    1-bit multiprobe) must reproduce the exhaustive hamming join exactly
    at max_hamming = n_chunks*(probe+1) - 1 — the pigeonhole guarantee at
    the bit level, independent of the shingle pipeline."""
    from creatorops_lakehouse_spark.operators.dedup import (
        simhash_banded_pairs,
        simhash_exact_pairs,
    )

    n_chunks, probe = geometry
    h = n_chunks * (probe + 1) - 1
    sh = spark.createDataFrame(
        list(enumerate(sigs)), "doc_id long, simhash long"
    )
    banded = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_banded_pairs(sh, h, n_chunks, probe).collect()
    }
    exact = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_exact_pairs(sh, h).collect()
    }
    assert banded == exact


# ---- SCD2 run collapse (round 6) --------------------------------------


def _py_scd2(rows):
    """rows: (key, attr, ts, tb). Reference run collapse under the
    (ts, tb) total order with half-open intervals."""
    out = []
    bykey: dict = {}
    for k, a, ts, tb in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        bykey.setdefault(k, []).append((a, ts))
    for k, seq in bykey.items():
        runs = []
        for a, ts in seq:
            if not runs or runs[-1][0] != a:
                runs.append((a, ts))
        for i, (a, ts) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((k, a, ts, nxt, i + 1))
    return sorted(out, key=lambda t: (t[0], t[2], t[4]))


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),  # key
            st.sampled_from(["a", "b", None]),  # attr (None is a value)
            st.integers(0, 8),  # ts (collisions likely)
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda r: (r[0], r[2]),  # unique (key, ts): tb unneeded
    )
)
def test_scd2_matches_python_reference(spark, rows):
    import datetime as dt

    from creatorops_lakehouse_spark.operators.scd import scd2_intervals

    data = [
        (k, a, dt.datetime(2024, 1, 1 + ts), i)
        for i, (k, a, ts) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "k int, attr string, ts timestamp, tb int"
    )
    got = sorted(
        (
            (r.k, r.attr, r.valid_from, r.valid_to, r.version)
            for r in scd2_intervals(df, ["k"], "ts", ["attr"], ["tb"]).collect()
        ),
        key=lambda t: (t[0], t[2], t[4]),
    )
    want = _py_scd2(
        [(k, a, ts, tb) for (k, a, ts, tb) in (tuple(d) for d in data)]
    )
    assert got == want


# ---- count-min sketch never undercounts (round 6) ----------------------


@SETTINGS
@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    depth=st.integers(1, 4),
    width=st.integers(4, 32),
)
def test_cms_never_undercounts_property(spark, keys, depth, width):
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.operators.cms import cms_build, cms_estimate

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sk = cms_build(df, "k", depth=depth, width=width)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("x"))
    est = cms_estimate(sk, exact.select("k"), "k", depth=depth, width=width)
    j = exact.join(est, "k").collect()
    assert all(r.est >= r.x for r in j)
    # total mass conservation per sketch row
    per_row = {r.row_i: r.s for r in sk.groupBy("row_i").agg(F.sum("cnt").alias("s")).collect()}
    assert all(v == len(keys) for v in per_row.values())


# ---- symmetric-delete fuzzy pairs --------------------------------------


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for x in range(1, m + 1):
        prev, d[0] = d[0], x
        for y in range(1, n + 1):
            prev, d[y] = d[y], min(
                d[y] + 1, d[y - 1] + 1, prev + (a[x - 1] != b[y - 1])
            )
    return d[n]


@SETTINGS
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5), min_size=2, max_size=10
    ),
)
def test_edit1_pairs_equals_bruteforce_random(spark, names):
    """edit1_pairs over a tiny alphabet (dense dist-1 AND dist-2 structure
    — substitutions, indels, transpositions, repeats) must equal the
    quadratic DP scan exactly; duplicates at dist 0 also pair."""
    from creatorops_lakehouse_spark.operators.dedup import edit1_pairs

    rows = [(i, nm) for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.a_id, r.b_id): r.edit_distance
        for r in edit1_pairs(df, "name", "id").collect()
    }
    ref = {
        (ia, ib): _lev(na, nb)
        for ia, na in rows
        for ib, nb in rows
        if ia < ib and _lev(na, nb) <= 1
    }
    assert got == ref


# ---- hot-key-safe bucketed window family vs plain windows ---------------


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                 # user
            st.integers(0, 4 * 86400),         # seconds offset (spans 4+ day buckets)
            st.integers(-50, 50),              # value (mixed sign)
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_bucketed_window_family_matches_plain_windows(spark, rows):
    """Randomized cross-check of ALL four bucketed hot-key-safe forms
    (lead, running sum, trailing frame, sessionize) against their plain
    per-key-lifetime windows — random timestamp collisions, bucket
    straddles, and empty buckets that hand-written cases under-sample."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_lead_bucketed,
        keyed_running_sum_bucketed,
        keyed_trailing_agg_bucketed,
        sessionize_bucketed,
    )

    df = spark.createDataFrame(
        [
            (f"u{u}", i, s, v)
            for i, (u, s, v) in enumerate(rows)
        ],
        "user_id string, event_id int, secs int, v long",
    ).select(
        "user_id",
        "event_id",
        F.expr(
            "timestampadd(SECOND, secs, TIMESTAMP'2024-01-01 00:00:00')"
        ).alias("ts"),
        "v",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )

    # lead
    got = {
        (r.user_id, r.event_id, str(r.ts_next))
        for r in keyed_lead_bucketed(df, ["ts"]).collect()
    }
    want = {
        (r.user_id, r.event_id, str(r.ts_next))
        for r in df.withColumn("ts_next", F.lead("ts").over(w)).collect()
    }
    assert got == want

    # running sum (mixed sign)
    got = {
        (r.user_id, r.event_id, r.run)
        for r in keyed_running_sum_bucketed(df, "v", out_col="run").collect()
    }
    want = {
        (r.user_id, r.event_id, r.run)
        for r in df.withColumn(
            "run", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).collect()
    }
    assert got == want

    # trailing 1h frame, inclusive
    got = {
        (r.user_id, r.event_id, r.n, r.s)
        for r in keyed_trailing_agg_bucketed(
            df, "v", lo_us=-3600 * 1_000_000, hi_us=0,
            count_col="n", sum_col="s",
        ).collect()
    }
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    want = {
        (r.user_id, r.event_id, r.n, r.s)
        for r in df.select(
            "user_id", "event_id",
            F.count(F.lit(1)).over(wr).cast("long").alias("n"),
            F.sum("v").over(wr).alias("s"),
        ).collect()
    }
    assert got == want

    # gap sessionization (30 min)
    got = {
        (r.user_id, r.event_id, r.session_id)
        for r in sessionize_bucketed(df, gap_s=1800).collect()
    }
    us = F.unix_micros("ts")
    flagged = df.withColumn(
        "_new",
        F.when(
            F.lag(us).over(w).isNull()
            | (us - F.lag(us).over(w) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    want = {
        (r.user_id, r.event_id, r.session_id)
        for r in flagged.withColumn(
            "session_id",
            (
                F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
                - 1
            ).cast("long"),
        ).collect()
    }
    assert got == want
