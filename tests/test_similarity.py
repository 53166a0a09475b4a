"""Similarity-search pins: brute-force correctness on hand-built vectors,
ANN recall vs the exact baseline, multimodal plumbing shapes."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    fake_image_features,
    to_asset_table,
)
from creatorops_lakehouse_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_neardup_pairs,
)


def _unit(i, dim=8):
    v = [0.0] * dim
    v[i] = 1.0
    return v


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # close to 0
        (2, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # orthogonal to 0
        (3, [1.0, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # closest to 0
        (4, [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()


def test_bruteforce_ordering(vectors):
    out = cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=4).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [3, 1, 2, 4]
    sims = {r.neighbor_id: r.cos_sim for r in out}
    assert sims[3] == pytest.approx(1 / math.sqrt(1 + 0.05**2))
    assert sims[2] == pytest.approx(0.0)
    assert sims[4] == pytest.approx(-1.0)


def test_ann_recall_against_bruteforce(spark):
    # clustered corpus — the workload hyperplane LSH is built for: members
    # of a tight cluster land in the same half-space bucket w.h.p.
    import random

    rng = random.Random(3)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(10)]
    rows = []
    for i in range(100):
        c = centers[i % 10]
        rows.append((i, [x + rng.gauss(0, 0.01) for x in c]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    queries = df.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(df, queries, k=3, n_planes=6, dim=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ANN recall too low on clustered data: {recall}"
    assert all(q != n for q, n in approx)


def test_neardup_pairs_threshold(vectors):
    pairs = {
        (r.a_id, r.b_id): r.cos_sim
        for r in embedding_neardup_pairs(vectors, threshold=0.95, n_planes=2, dim=8).collect()
    }
    for (a, b), sim in pairs.items():
        assert sim >= 0.95 and a < b
    assert (0, 3) in pairs  # cos ≈ 0.9988 and same LSH bucket for any plane set


def test_multimodal_asset_schema(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "spark")], ["doc_id", "text"])
    assets = to_asset_table(docs, "doc_id", "text", "image")
    rows = {r.asset_id: r for r in assets.collect()}
    assert rows[1].content_length == 11
    assert rows[1].media_type == "image"
    assert len(rows[1].content_sha256) == 64
    assert rows[1].meta_width is None


def test_multimodal_feature_extraction_batches(spark):
    docs = spark.createDataFrame(
        [(i, f"payload number {i}") for i in range(100)], ["doc_id", "text"]
    ).repartition(2)
    feats = extract_features(to_asset_table(docs, "doc_id", "text", "image"))
    rows = feats.collect()
    assert len(rows) == 100
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    assert all(r.batch_rows >= 1 for r in rows)
    # deterministic stand-in: same payload → same features
    assert rows[0].feature == [
        pytest.approx(x) for x in fake_image_features(f"payload number {rows[0].asset_id}".encode())
    ]


def test_decode_stub_raises():
    from creatorops_lakehouse_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_ivf_recall_on_clustered_data(spark):
    import random

    from creatorops_lakehouse_spark.operators.similarity import (
        ann_ivf_topk,
        train_ivf_centroids,
    )

    rng = random.Random(5)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = [
        (i, [x + rng.gauss(0, 0.02) for x in centers[i % 8]]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    centroids = train_ivf_centroids(df, k=8, iters=3, dim=16)
    assert len(centroids) == 8 and len(centroids[0]) == 16
    queries = df.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(df, queries, k=3).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(df, queries, centroids, k=3, nprobe=2).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.9, f"IVF recall too low: {recall}"


def test_bruteforce_guard_refuses_large_product(vectors):
    with pytest.raises(ValueError, match="brute-force"):
        cosine_topk(vectors, vectors, k=2, max_pairs=10)
    # exact=True bypasses the guard; same result as an under-threshold call
    forced = cosine_topk(vectors, vectors, k=2, exact=True).collect()
    assert len(forced) > 0


def test_ivf_index_partition_pruning(spark, tmp_path):
    import contextlib
    import io
    import random

    from creatorops_lakehouse_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivf_topk_indexed,
        build_ivf_index,
        train_ivf_centroids,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    rng = random.Random(11)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = [
        (i, [x + rng.gauss(0, 0.02) for x in centers[i % 8]]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    centroids = train_ivf_centroids(df, k=8, iters=3, dim=16)
    spec = TableSpec("ivf.index", str(tmp_path / "ivf_index"), ("cell",))
    build_ivf_index(df, centroids, spec)

    queries = df.filter(F.col("vec_id") < 3)
    indexed = ann_ivf_topk_indexed(spark, spec, queries, centroids, k=3, nprobe=2)

    # the index scan must prune to the probed cell partitions only
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        indexed.explain(mode="formatted")
    plan = buf.getvalue()
    import re

    m = re.search(r"Scan parquet.*?PartitionFilters: \[([^\]]*)\]", plan, re.DOTALL)
    assert m and "cell" in m.group(1), f"no partition filter on cell:\n{plan[:1500]}"

    # the index on disk really has all 8 cell partitions (so the pruned scan
    # above is a strict subset, not a trivially-small index)
    import glob

    all_cells = {p.split("cell=")[1] for p in glob.glob(str(tmp_path / "ivf_index/cell=*"))}
    assert len(all_cells) == 8

    # results match the inline (non-indexed) variant exactly
    inline = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann_ivf_topk(df, queries, centroids, k=3, nprobe=2).collect()
    }
    got = {(r.query_id, r.neighbor_id, r.rank) for r in indexed.collect()}
    assert got == inline


def test_auto_tables_sizing_closed_form():
    """auto_tables returns the smallest L with band-OR recall ≥ target,
    and warns (not silently collapses) when the cap binds — the fix for
    the single-table recall decay ADVICE r2 flagged."""
    import warnings

    from creatorops_lakehouse_spark.operators.similarity import (
        auto_tables,
        plane_agreement_prob,
    )

    for b, thr in [(4, 0.9), (6, 0.8), (8, 0.95)]:
        p = plane_agreement_prob(thr) ** b
        L = auto_tables(b, thr, recall_target=0.9)
        assert 1 - (1 - p) ** L >= 0.9
        assert L == 1 or 1 - (1 - p) ** (L - 1) < 0.9

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        capped = auto_tables(24, 0.95, recall_target=0.9, max_tables=8)
        assert capped == 8
        assert any("capping" in str(w.message) for w in caught)


def test_neardup_multitable_recall_on_clustered(spark):
    """Auto-sized plane/table counts must find the within-cluster pairs a
    single fixed-plane table can miss."""
    import random

    from creatorops_lakehouse_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    rng = random.Random(17)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(12)]
    rows = []
    for i in range(120):
        c = centers[i % 12]
        rows.append((i, [x + rng.gauss(0, 0.005) for x in c]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    pairs = embedding_neardup_pairs(df, threshold=0.99, dim=16).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    # every within-cluster pair is a true near-dup at this noise level
    expected = {
        (a, b)
        for a in range(120)
        for b in range(a + 1, 120)
        if a % 12 == b % 12
    }
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"multi-table neardup recall too low: {recall}"
    assert all(r.cos_sim >= 0.99 for r in pairs)


# ---- SemDeDup-style semantic dedup ------------------------------------


def test_semantic_dedup_planted_clusters(spark):
    import numpy as np

    from creatorops_lakehouse_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(4, 16)
    rows = []
    # 4 well-separated anchors, each with 2 near-copies (cos ≈ 1) and
    # 3 unrelated singleton vectors
    vid = 0
    for b in base:
        for _ in range(3):
            rows.append((vid, (b + rng.randn(16) * 0.01).astype("float32").tolist()))
            vid += 1
    for _ in range(3):
        rows.append((vid, rng.randn(16).astype("float32").tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = train_ivf_centroids(df, k=4, iters=2, dim=16, sample_mod=None)
    pairs = semantic_dedup_pairs(df, centroids, threshold=0.95, nprobe=2)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    expected = {(g * 3 + i, g * 3 + j) for g in range(4) for i in range(3) for j in range(3) if i < j}
    assert got == expected  # every planted pair found, nothing else
    kept = {r.vec_id for r in semantic_dedup(df, centroids, threshold=0.95, nprobe=2).collect()}
    # min-id representative per planted cluster + the 3 singletons
    assert kept == {0, 3, 6, 9, 12, 13, 14}


def test_ivf_training_local_and_distributed_agree(spark):
    """The adaptive local Lloyd solve must produce centroids that agree
    with the distributed aggregation path to float tolerance (they may
    differ in the last ulp — numpy mean vs Spark sum-then-divide)."""
    import random

    from creatorops_lakehouse_spark.operators.similarity import (
        train_ivf_centroids,
    )

    rng = random.Random(11)
    centers = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(4)]
    rows = [
        (i, [x + rng.gauss(0, 0.05) for x in centers[i % 4]]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    local = train_ivf_centroids(df, k=4, iters=3, dim=8)
    dist = train_ivf_centroids(df, k=4, iters=3, dim=8, local_threshold=0)
    assert len(local) == len(dist) == 4
    for lc, dc in zip(local, dist):
        for lx, dx in zip(lc, dc):
            assert abs(lx - dx) < 1e-9, (lx, dx)


def test_sample_frames_grid_and_digests(spark):
    """Frame grid: ceil(len/fb) frames, every stride-th sampled; last
    frame may be short; zero-length assets emit nothing."""
    import hashlib

    from creatorops_lakehouse_spark.operators.multimodal import (
        sample_frames,
        to_asset_table,
    )

    rows = [(1, "a" * 150), (2, "b" * 64), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assets = to_asset_table(df, "doc_id", "text", "video")
    out = sample_frames(assets, frame_bytes=64, stride=2).collect()
    got = {(r.asset_id, r.frame_idx): (r.frame_len, r.frame_sha256) for r in out}
    # asset 1: 150 bytes -> frames 0,1,2 (64,64,22); stride 2 -> idx 0, 2
    assert set(got) == {(1, 0), (1, 2), (2, 0)}
    assert got[(1, 0)][0] == 64 and got[(1, 2)][0] == 22
    assert got[(2, 0)] == (64, hashlib.sha256(b"b" * 64).hexdigest())
    assert got[(1, 2)][1] == hashlib.sha256(b"a" * 22).hexdigest()


def test_pq_encode_roundtrip_and_recall(spark):
    """Product quantization: codebook training is deterministic, encoding
    maps every vector to m in-range codes, and ADC + exact rerank recovers
    the exact top-k on a corpus with planted near-neighbors."""
    import numpy as np

    from creatorops_lakehouse_spark.operators.similarity import (
        build_pq_codes,
        cosine_topk,
        pq_topk,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    # plant: vectors 100+i are tiny perturbations of 0..4 -> their true
    # nearest neighbors
    rows = [(i, base[i].tolist()) for i in range(40)]
    rows += [
        (100 + i, (base[i] + 0.01 * rng.randn(16)).tolist()) for i in range(5)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = train_pq_codebooks(emb, m=4, k=8, dim=16, iters=4)
    books2 = train_pq_codebooks(emb, m=4, k=8, dim=16, iters=4)
    assert books == books2  # deterministic training
    assert len(books) == 4 and all(len(b) == 8 for b in books)

    codes = build_pq_codes(emb, books)
    got = {r.vec_id: r.codes for r in codes.collect()}
    assert len(got) == 45
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in got.values())

    queries = [(i, base[i].tolist()) for i in range(5)]
    ann = pq_topk(codes, queries, books, emb, k=1, candidate_factor=8)
    top1 = {r.query_id: r.neighbor_id for r in ann.collect()}
    # each planted near-duplicate is its query's exact nearest neighbor
    assert top1 == {i: 100 + i for i in range(5)}


def test_ivf_tombstones_and_compaction(spark, tmp_path):
    """VERDICT r12 item 4: the rolling IVF index is delete-aware —
    tombstoned vectors (forget-user / DV-delete on the embeddings table)
    never surface from a probe or hold a top-k slot, and compaction
    leaves the index content-equal to a fresh build over the surviving
    corpus."""
    import os
    import random

    from creatorops_lakehouse_spark.operators.similarity import (
        ann_ivf_topk_indexed,
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        tombstone_ivf_vectors,
        train_ivf_centroids,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec, read_table

    rng = random.Random(23)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(6)]
    rows = [
        (i, [x + rng.gauss(0, 0.02) for x in centers[i % 6]])
        for i in range(180)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    centroids = train_ivf_centroids(df, k=6, iters=3, dim=16)
    spec = TableSpec("ivf.index", str(tmp_path / "ivf_index"), ("cell",))
    build_ivf_index(df.filter(F.col("vec_id") < 120), centroids, spec)
    append_to_ivf_index(df.filter(F.col("vec_id") >= 120), centroids, spec)

    queries = df.filter(F.col("vec_id") < 3)
    before = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk_indexed(
            spark, spec, queries, centroids, k=3, nprobe=2
        ).collect()
    }
    # erase the nearest neighbors the probe just returned (same-cluster
    # ids) — the erased ids must vanish AND their top-k slots must be
    # refilled by the next-best survivors, not left short
    doomed = sorted({n for _, n in before})[:4]
    tombstone_ivf_vectors(
        spark.createDataFrame([(i,) for i in doomed], ["vec_id"]), spec
    )
    after = ann_ivf_topk_indexed(spark, spec, queries, centroids, k=3, nprobe=2)
    got = after.collect()
    assert all(r.neighbor_id not in doomed for r in got)
    assert (
        after.groupBy("query_id").count().agg(F.min("count")).collect()[0][0]
        == 3
    ), "tombstoned neighbors must not consume top-k slots"

    # compaction: index == fresh build over the surviving corpus, the
    # sidecar is gone, and probes answer identically
    compact_ivf_index(spark, spec)
    assert not os.path.isdir(str(tmp_path / "ivf_index_tombstones"))
    survivors = df.filter(~F.col("vec_id").isin(doomed))
    fresh = TableSpec("ivf.fresh", str(tmp_path / "ivf_fresh"), ("cell",))
    build_ivf_index(survivors, centroids, fresh)
    a = {
        (r.neighbor_id, r.cell, tuple(round(x, 9) for x in r.c_vec))
        for r in read_table(spark, spec).collect()
    }
    b = {
        (r.neighbor_id, r.cell, tuple(round(x, 9) for x in r.c_vec))
        for r in read_table(spark, fresh).collect()
    }
    assert a == b
    post = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk_indexed(
            spark, spec, queries, centroids, k=3, nprobe=2
        ).collect()
    }
    assert post == {(q, n) for q, n in ((r.query_id, r.neighbor_id) for r in got)}
