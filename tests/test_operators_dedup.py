"""Correctness pins for the dedup operator family: LSH candidates must
recover high-similarity pairs (recall vs exact Jaccard), and verification
must eliminate false positives."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.dedup import (
    duplicate_clusters,
    exact_dedup,
    fingerprint_clusters,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
    (4, "The  quick brown fox, jumps over the lazy dog near the river bank today!"),  # fmt dup of 1
    (5, "completely different content about spark query engines and distributed joins"),
    (6, "another unrelated document discussing parquet file formats and columnar storage"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).persist()


def test_exact_dedup_keeps_one_per_content(docs):
    out = exact_dedup(docs, ["text"], keep_order_col="doc_id")
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids and 2 not in ids  # doc 2 is the exact dup, doc 1 kept
    assert len(ids) == 5


def test_duplicate_clusters(docs):
    clusters = duplicate_clusters(docs, "text", "doc_id").filter(F.col("n_docs") > 1).collect()
    assert len(clusters) == 1
    assert clusters[0].n_docs == 2
    assert clusters[0].canonical_id == 1


def test_fingerprint_catches_format_dup(docs):
    clusters = fingerprint_clusters(docs, "text", "doc_id").filter(F.col("n_docs") > 1).collect()
    assert len(clusters) == 1
    assert clusters[0].n_docs == 3  # docs 1, 2, 4 normalize identically


def test_jaccard_pairs_exact(docs):
    pairs = {
        (r.a_id, r.b_id): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.5, ngram=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 3) in pairs and 0.7 < pairs[(1, 3)] < 1.0
    assert (5, 6) not in pairs


def test_minhash_lsh_recall_and_precision(docs):
    exact = {
        (r.a_id, r.b_id)
        for r in jaccard_pairs(docs, threshold=0.7, ngram=2).collect()
    }
    lsh = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.7, ngram=2, num_perm=64, bands=32).collect()
    }
    # recall: every exact pair ≥0.7 must be found by LSH at this band setting
    assert exact <= set(lsh), f"missed: {exact - set(lsh)}"
    # precision: verification step guarantees no pair below threshold
    assert all(j >= 0.7 for j in lsh.values())


def test_minhash_jaccard_matches_exact(docs):
    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.1, ngram=2).collect()
    }
    lsh = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.1, ngram=2, num_perm=64, bands=32).collect()
    }
    for pair, j in lsh.items():
        assert abs(exact[pair] - j) < 1e-9  # verified value IS the exact jaccard


def test_simhash_identical_and_near(docs):
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs(docs, max_hamming=7, ngram=1).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical docs, hamming 0
    assert pairs.get((1, 4)) == 0  # normalization-identical
    assert pairs.get((1, 3)) == 3  # one-word change → 3 bits
    assert (5, 6) not in pairs


def test_simhash_recall_guarantee(docs):
    # pigeonhole: every pair with hamming <= n_chunks-1 MUST be found
    all_pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs(docs, max_hamming=64, ngram=1, n_chunks=64).collect()
    }  # 1-bit chunks → exhaustive candidates
    banded = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs(docs, max_hamming=7, ngram=1, n_chunks=8).collect()
    }
    expected = {p: h for p, h in all_pairs.items() if h <= 7}
    assert banded == expected


def test_simhash_multiprobe_recall_guarantee(docs):
    # 1-bit multiprobe pigeonhole: hamming <= 2*n_chunks-1 MUST be found.
    # 4x16-bit probe-1 is the SHIPPED geometry (queries/dedup.py).
    all_pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs(docs, max_hamming=64, ngram=1, n_chunks=64).collect()
    }
    probed = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs(
            docs, max_hamming=7, ngram=1, n_chunks=4, probe=1
        ).collect()
    }
    expected = {p: h for p, h in all_pairs.items() if h <= 7}
    assert probed == expected


def test_lsh_pairs_unique(docs):
    out = minhash_lsh_pairs(docs, threshold=0.1, ngram=2).collect()
    keys = [(r.a_id, r.b_id) for r in out]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_prefix_filter_exactness_vs_unpruned(spark):
    """Prefix filtering must be lossless: identical pairs to the unpruned
    inverted-index join at several thresholds (all-pairs prefix theorem)."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(8, 24)))) for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).persist()
    for t in (0.3, 0.5, 0.7, 0.9):
        exact = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_pairs(df, threshold=t, ngram=1, prefix_filter=False).collect()
        }
        pruned = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_pairs(df, threshold=t, ngram=1, prefix_filter=True).collect()
        }
        assert pruned == exact, f"t={t}: {set(exact) ^ set(pruned)}"


def test_simhash_survives_book_length_docs(spark):
    # Regression: the 4×16-bit lane packing overflowed int64 once a doc had
    # ≥ 2^15 shingles (top lane shifted to bits 48-63) — ANSI SUM throw or a
    # silently wrong signature. The 2×32-bit packing must survive and match
    # a driver-side recomputation from the same shingle hashes.
    from creatorops_lakehouse_spark.operators.dedup import _token_sets, simhash_table

    n = 40_000  # > 32768 distinct unigram shingles
    text = " ".join(f"tok{i:05d}" for i in range(n))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    sets = _token_sets(df, "text", "doc_id", ngram=1)
    got = simhash_table(sets).collect()[0].simhash

    # independent recomputation: majority vote over xxhash64 of each shingle
    hashes = [
        r.h
        for r in sets.select(F.explode("toks").alias("s"))
        .select(F.xxhash64("s").alias("h"))
        .collect()
    ]
    assert len(hashes) == n
    expected = 0
    for b in range(64):
        ones = sum(((h >> b) & 1) for h in hashes)
        if ones * 2 > n:
            expected |= 1 << b
    if expected >= 1 << 63:  # two's-complement to match Spark's signed long
        expected -= 1 << 64
    assert got == expected


def test_connected_components_merges_transitively(spark):
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair {9,10};
    # exercised through BOTH the local union-find fast path and the
    # distributed rounds (local_threshold=0) — identical output required
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 10)], ["a_id", "b_id"]
    )
    for thr in (100_000, 0):
        got = {
            r.node: r.cluster_id
            for r in connected_components(pairs, local_threshold=thr).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9, 10: 9}


def test_connected_components_clique_and_empty(spark):
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    clique = spark.createDataFrame(
        [(5, 6), (5, 7), (6, 7)], ["a_id", "b_id"]
    )
    for thr in (100_000, 0):
        got = {
            r.node: r.cluster_id
            for r in connected_components(clique, local_threshold=thr).collect()
        }
        assert got == {5: 5, 6: 5, 7: 5}

    empty = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(empty).count() == 0


def test_connected_components_string_ids(spark):
    """String ids take the non-numeric paths end-to-end: lexicographic
    min-label, the changed-count convergence join (no monotone label sum),
    and the id_type-preserving schema — through BOTH the local union-find
    fast path and the distributed rounds, including a chain deep enough to
    enter the pointer-doubling branch (double_from=3)."""
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    # chain b-c-d-e-f-g (diameter 5 → doubling rounds engage) + pair {x, y}
    chain = list(zip("bcdef", "cdefg")) + [("y", "x")]
    pairs = spark.createDataFrame(chain, ["a_id", "b_id"])
    expected = {n: "b" for n in "bcdefg"} | {"x": "x", "y": "x"}
    for thr in (100_000, 0):
        out = connected_components(pairs, local_threshold=thr)
        assert dict(out.dtypes) == {"node": "string", "cluster_id": "string"}
        got = {r.node: r.cluster_id for r in out.collect()}
        assert got == expected


def test_incremental_minhash_index_equals_full_recompute(spark, tmp_path):
    from creatorops_lakehouse_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_pairs,
        probe_minhash_index,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    indexed = docs.filter(F.col("doc_id") <= 3)  # contains dup pair (1,2),(1,3)...
    batch = docs.filter(F.col("doc_id") > 3)  # doc 4 is a format-dup of 1
    bands_spec = TableSpec("t.bands", str(tmp_path / "bands"))
    sets_spec = TableSpec("t.sets", str(tmp_path / "sets"))
    build_minhash_index(indexed, bands_spec, sets_spec)

    def norm(df):
        return {
            (min(r.a_id, r.b_id), max(r.a_id, r.b_id)) for r in df.collect()
        }

    incremental = norm(
        probe_minhash_index(spark, bands_spec, sets_spec, batch)
    ) | norm(minhash_lsh_pairs(indexed))
    full = norm(minhash_lsh_pairs(docs))
    assert incremental == full
    assert len(full) > 0  # the corpus really has near-dups to find
    # cross-batch pair found: doc 4 (new) duplicates doc 1 (indexed)
    assert any(4 in p for p in incremental)


def test_minhash_index_append_mode(spark, tmp_path):
    from creatorops_lakehouse_spark.operators.dedup import (
        build_minhash_index,
        probe_minhash_index,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    b1 = docs.filter(F.col("doc_id") <= 2)
    b2 = docs.filter((F.col("doc_id") > 2) & (F.col("doc_id") <= 4))
    bands_spec = TableSpec("t.bands", str(tmp_path / "bands"))
    sets_spec = TableSpec("t.sets", str(tmp_path / "sets"))
    build_minhash_index(b1, bands_spec, sets_spec)
    build_minhash_index(b2, bands_spec, sets_spec, mode="append")
    probe = probe_minhash_index(
        spark, bands_spec, sets_spec, docs.filter(F.col("doc_id") == 5)
    )
    # doc 5 is unrelated content: probing the grown index finds nothing
    assert probe.count() == 0


def test_connected_components_long_chain_converges(spark):
    """Diameter-59 chain (3× the old max_iters): pointer doubling must
    converge it well inside 20 rounds instead of silently returning split
    clusters (VERDICT r2 item 2)."""
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["a_id", "b_id"]
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs, local_threshold=0).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iters must be LOUD, never silently-wrong labels."""
    import pytest

    from creatorops_lakehouse_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["a_id", "b_id"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=1, local_threshold=0)


def test_probe_reingested_id_no_duplicate_pairs(spark, tmp_path):
    """A doc_id present in BOTH the index and the probe batch must not fan
    the verification join out into duplicated result pairs; the probe
    batch's text wins (ADVICE r2)."""
    from creatorops_lakehouse_spark.operators.dedup import (
        build_minhash_index,
        probe_minhash_index,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bands_spec = TableSpec("t.bands", str(tmp_path / "bands"))
    sets_spec = TableSpec("t.sets", str(tmp_path / "sets"))
    build_minhash_index(docs, bands_spec, sets_spec)
    # re-ingest docs 1 and 4 (a known near-dup pair) as the probe batch
    batch = docs.filter(F.col("doc_id").isin(1, 4))
    pairs = probe_minhash_index(spark, bands_spec, sets_spec, batch).collect()
    keys = [(min(r.a_id, r.b_id), max(r.a_id, r.b_id)) for r in pairs]
    assert len(keys) == len(set(keys)), f"duplicated pairs: {sorted(keys)}"
    assert (1, 4) in keys


def test_strip_duplicate_spans_planted(spark):
    """A 16-token span planted in three docs survives only in the min-id
    doc; unique text is untouched; a fully-duplicated doc strips to ''."""
    from creatorops_lakehouse_spark.operators.dedup import strip_duplicate_spans

    span = " ".join(f"dup{i}" for i in range(16))
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"{span} epsilon zeta eta theta"),
        (3, span),  # nothing but the duplicated span
        (4, "iota kappa lam mu nu xi omicron pi"),  # unique — untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in strip_duplicate_spans(df, window=16).collect()}
    assert out[1].n_removed == 0  # keeper (min doc_id)
    assert "dup0" in out[1].text_clean
    assert out[2].n_removed == 16
    assert out[2].text_clean == "epsilon zeta eta theta"
    assert out[3].n_removed == 16 and out[3].text_clean == ""
    assert out[4].n_removed == 0
    assert out[4].text_clean == "iota kappa lam mu nu xi omicron pi"


def test_strip_duplicate_spans_overlapping_union(spark):
    """Overlapping duplicated windows in one doc union their coverage
    (17 shared tokens → two 16-windows overlapping in 15 → 17 removed)."""
    from creatorops_lakehouse_spark.operators.dedup import strip_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(17))
    rows = [
        (10, f"{shared} tail1 tail2"),
        (20, f"head1 head2 {shared}"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in strip_duplicate_spans(df, window=16).collect()}
    assert out[10].n_removed == 0  # keeper of both windows
    assert out[20].n_removed == 17
    assert out[20].text_clean == "head1 head2"


def test_containment_finds_embedded_short_doc(spark):
    """A short doc fully embedded in a long one has containment 1.0 but low
    Jaccard — the asymmetric case containment_pairs exists to catch."""
    from creatorops_lakehouse_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(30))
    rows = [
        (1, short),
        (2, short + " " + filler),  # contains all of doc 1's unigrams
        (3, "wholly unrelated text about columnar storage engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = containment_pairs(df, threshold=0.8, ngram=1).collect()
    pairs = {(r.a_id, r.b_id): r.containment for r in out}
    assert pairs == {(1, 2): 1.0}
    # Jaccard at the same threshold misses it (union-diluted)
    jac = jaccard_pairs(df, threshold=0.8, ngram=1, prefix_filter=False).collect()
    assert not any({r.a_id, r.b_id} == {1, 2} for r in jac)


def test_containment_integer_threshold_boundary(spark):
    """keep/drop at the threshold is exact: 4 of 5 shingles shared = 0.8
    keeps at t=0.8, drops at t=0.8001."""
    from creatorops_lakehouse_spark.operators.dedup import containment_pairs

    rows = [
        (1, "a b c d e"),          # unigrams {a..e}
        (2, "a b c d x y z w v"),  # shares 4 of doc 1's 5
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    at = containment_pairs(df, threshold=0.8, ngram=1).collect()
    assert [(r.a_id, r.b_id, r.n_common) for r in at] == [(1, 2, 4)]
    above = containment_pairs(df, threshold=0.8001, ngram=1).collect()
    assert above == []


def test_edit1_pairs_matches_bruteforce(spark):
    """Symmetric-delete candidates + verify == quadratic block scan,
    including the indel (length±1) and transposition-false-positive cases."""
    from creatorops_lakehouse_spark.operators.dedup import edit1_pairs

    rows = [
        (1, "alpha", 0),
        (2, "alphb", 0),   # substitution: dist 1
        (3, "alpha1", 0),  # insertion: dist 1
        (4, "alph", 0),    # deletion: dist 1
        (5, "lapha", 0),   # transposition: dist 2 — candidate but must verify out
        (6, "alpha", 1),   # other block: must not pair with 1
        (7, "omega", 0),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    out = edit1_pairs(df, "name", "id", block_cols=["blk"]).collect()
    got = {(r.a_id, r.b_id): r.edit_distance for r in out}
    ref = {}
    for i, (ia, na, ba) in enumerate(rows):
        for ib, nb, bb in rows[i + 1:]:
            if ba != bb:
                continue
            import difflib
            # tiny exact DP levenshtein
            m, n = len(na), len(nb)
            d = list(range(n + 1))
            for x in range(1, m + 1):
                prev, d[0] = d[0], x
                for y in range(1, n + 1):
                    prev, d[y] = d[y], min(
                        d[y] + 1, d[y - 1] + 1, prev + (na[x - 1] != nb[y - 1])
                    )
            if d[n] <= 1:
                ref[(min(ia, ib), max(ia, ib))] = d[n]
    assert got == ref
    assert (1, 5) not in got and (1, 6) not in got


def test_edit1_pairs_rejects_k2(spark):
    from creatorops_lakehouse_spark.operators.dedup import edit1_pairs

    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="max_distance=1"):
        edit1_pairs(df, "name", "id", max_distance=2)


def test_containment_lsh_recalls_bounded_ratio_pairs(spark):
    """The min-wise sampled containment path must recover the exact
    bounded-ratio containment pairs (planted short-in-long, ratio ≤ 4)
    with zero false positives, and must exclude pairs beyond max_ratio."""
    from creatorops_lakehouse_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_lsh,
    )

    short = " ".join(f"tok{i}" for i in range(20))
    bounded = short + " " + " ".join(f"pad{i}" for i in range(40))  # ratio 3
    huge = short + " " + " ".join(f"big{i}" for i in range(300))  # ratio ~16
    rows = [
        (1, short),
        (2, bounded),
        (3, huge),
        (4, " ".join(f"other{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id)
        for r in containment_pairs_lsh(
            df, threshold=0.8, max_ratio=4, ngram=1, num_perm=64
        ).collect()
    }
    exact_all = {
        (r.a_id, r.b_id)
        for r in containment_pairs(df, threshold=0.8, ngram=1).collect()
    }
    # exact (no ratio bound) sees both containments; the sketch path must
    # return exactly the bounded-ratio subset
    assert (1, 2) in exact_all and (1, 3) in exact_all
    assert got == {(1, 2)}


def test_containment_lsh_guard_refuses_dense_collisions(spark):
    """The candidate-mass guard must fail loud (naming the exact pass)
    when bucket collisions exceed the cap, and pass when raised."""
    from creatorops_lakehouse_spark.operators.dedup import containment_pairs_lsh

    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(i, text) for i in range(12)], ["doc_id", "text"]
    )  # 12 identical docs -> every bucket holds all 12
    with pytest.raises(ValueError, match=r"containment_pairs\(\)"):
        containment_pairs_lsh(df, ngram=1, max_candidates=100)
    out = containment_pairs_lsh(df, ngram=1, max_candidates=None).collect()
    assert len(out) == 12 * 11 // 2  # all pairs, containment 1.0


def test_minhash_star_edges_connectivity_parity(spark):
    """Star edges (per-bucket min→member) must recover the SAME connected
    components as the all-pairs listing on a near-dup cluster — at
    O(n·bands) candidate edges instead of the quadratic bucket self-join
    (the giant-cluster adversarial case; tools/skew_adversarial.py runs
    this at 5k cluster members)."""
    from creatorops_lakehouse_spark.operators.dedup import (
        connected_components,
        minhash_star_edges,
    )

    base = " ".join(f"tok{i % 7}w{i}" for i in range(60))
    rows = [(i, f"{base} u{i}a u{i}b") for i in range(12)] + [
        (100 + i, " ".join(f"t{j}x{(100 + i) * 31 + j}" for j in range(40)))
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def clusters(pairs_df):
        cc = connected_components(pairs_df.select("a_id", "b_id")).collect()
        out = {}
        for r in cc:
            out.setdefault(r.cluster_id, set()).add(r.node)
        for cid, members in out.items():
            members.add(cid)
        return {frozenset(m) for m in out.values()}

    all_pairs = minhash_lsh_pairs(docs, threshold=0.5)
    stars = minhash_star_edges(docs, threshold=0.5)
    assert clusters(all_pairs) == clusters(stars) == {frozenset(range(12))}
    # star candidate volume is linear in the cluster (bands may disagree
    # on the bucket min, so ≤ ~2(n-1), never the quadratic pair list)
    assert stars.count() <= 2 * 11
    assert all_pairs.count() == 12 * 11 // 2
