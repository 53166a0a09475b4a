"""Public curation API (creatorops_lakehouse_spark/curation.py): the
config-driven ``run()`` must reproduce the hash-checked
``docs_curation_e2e_verdict`` row's numbers at the default config, and
the knobs must actually steer the pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.curation import CurationConfig, run
from creatorops_lakehouse_spark.queries import load

SF_DIR = "/root/testdata/sf0.001"


def test_default_config_matches_verdict_row(spark):
    """run() with defaults == the registry's composed verdict row, field
    for field — the API is the same pipeline, not a lookalike."""
    from creatorops_lakehouse_spark.queries.curation import curation_e2e_row

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    got = run(spark, docs).manifest(spark).collect()[0].asDict()
    want = curation_e2e_row(spark, SF_DIR).collect()[0].asDict()
    assert got == want


def test_lsh_mode_and_knobs(spark):
    """The LSH near-dup path and non-default knobs flow through: LSH
    retention can only differ from exact by MORE survivors (recall < 1),
    a higher quality bar retains fewer docs, and the shard manifest
    respects n_shards."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")

    base = run(spark, docs)
    lsh = run(spark, docs, CurationConfig(neardup="lsh"))
    n_exact_path = base.deduped.count()
    n_lsh_path = lsh.deduped.count()
    assert n_lsh_path >= n_exact_path

    # a stricter quality bar retains fewer docs; an absurd bar empties
    # the corpus and the mixture stage refuses LOUDLY at build time (its
    # unsatisfiable-mixture contract) rather than returning empty tables
    stricter = run(spark, docs, CurationConfig(min_tokens=40))
    assert stricter.quality.count() < base.quality.count()
    import pytest

    with pytest.raises(ValueError, match="mixture groups absent"):
        run(spark, docs, CurationConfig(min_tokens=10_000))

    sharded = run(spark, docs, CurationConfig(n_shards=3))
    assert (
        sharded.shards.select("shard_id").distinct().count() <= 3
    )
    # conservation: shard mass == mixture token mass
    assert (
        sharded.shards.agg(F.sum("w")).collect()[0][0]
        == sharded.mixture.agg(F.sum("k")).collect()[0][0]
    )


def test_write_result_durable(spark, tmp_path):
    """write_result persists every stage as a snapshot-log table plus
    the audit manifest; read-back counts match the in-memory run and
    the persisted manifest equals manifest(spark) exactly."""
    from creatorops_lakehouse_spark.curation import write_result
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    result = run(spark, docs)
    specs = write_result(spark, result, str(tmp_path / "cur"))

    assert snapshot_read(spark, specs["mixture"]).count() == result.mixture.count()
    assert snapshot_read(spark, specs["shards"]).count() == result.shards.count()
    persisted = snapshot_read(spark, specs["manifest"]).collect()[0].asDict()
    live = result.manifest(spark).collect()[0].asDict()
    assert persisted == live


def test_bad_neardup_mode_refused(spark):
    import pytest

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    with pytest.raises(ValueError, match="neardup"):
        run(spark, docs, CurationConfig(neardup="typo"))


def _ct_set(df):
    return {
        (r.doc_id, r.text, r.lang, r.k) for r in df.collect()
    }


def test_incremental_two_batches_equals_full(spark, tmp_path):
    """VERDICT r11 item 4: curate_increment over two monotone-id batches
    equals (a) a one-shot increment over the concatenated corpus and
    (b) run()'s clean_train on the same corpus, field for field — the
    exact posting-join probe has no LSH recall loss, first-seen-wins
    matches MIN-id keeps under monotone ids, and retro-decontam
    tombstones close the late-arriving-eval gap."""
    from creatorops_lakehouse_spark.curation import (
        curate_increment,
        increment_manifest,
        incremental_clean_train,
        run,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    b1 = docs.filter(F.col("doc_id") <= cut)
    b2 = docs.filter(F.col("doc_id") > cut)

    inc_root = str(tmp_path / "inc")
    c1 = curate_increment(spark, b1, inc_root)
    c2 = curate_increment(spark, b2, inc_root)
    assert (c1["batch_id"], c2["batch_id"]) == (0, 1)
    got = _ct_set(incremental_clean_train(spark, inc_root))

    oneshot_root = str(tmp_path / "oneshot")
    curate_increment(spark, docs, oneshot_root)
    assert got == _ct_set(incremental_clean_train(spark, oneshot_root))

    full = run(spark, docs)
    assert got == _ct_set(
        full.clean_train.select("doc_id", "text", "lang", "k")
    )

    # the manifest records one row per admitted batch, counts conserved
    man = {r.batch_id: r.asDict() for r in
           increment_manifest(spark, inc_root).collect()}
    assert set(man) == {0, 1}
    assert man[0]["n_in"] + man[1]["n_in"] == docs.count()
    n_clean_net = (
        man[0]["n_clean"] + man[1]["n_clean"] - man[1]["n_retro_tombstoned"]
    )
    assert n_clean_net == len(got)


def test_incremental_replay_is_exactly_once(spark, tmp_path):
    """A replayed batch (same batch_id) is a no-op per state table: the
    txn map skips tables the batch already reached, so at-least-once
    scheduling converges to the same state."""
    from creatorops_lakehouse_spark.curation import (
        curate_increment,
        incremental_clean_train,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    b1 = docs.filter(F.col("doc_id") <= cut)
    b2 = docs.filter(F.col("doc_id") > cut)

    root = str(tmp_path / "inc")
    curate_increment(spark, b1, root)
    c2 = curate_increment(spark, b2, root)
    before = _ct_set(incremental_clean_train(spark, root))

    # full replay of batch 1 (explicit id) — nothing may double-append
    c2r = curate_increment(spark, b2, root, batch_id=1)
    assert c2r == c2
    assert _ct_set(incremental_clean_train(spark, root)) == before

    # out-of-order admission refused loudly
    import pytest

    with pytest.raises(ValueError, match="older than"):
        curate_increment(spark, b2, root, batch_id=0)


def test_incremental_state_maintenance(spark, tmp_path):
    """optimize_curation_state bin-packs the per-batch commit dirs
    (probe scans plan O(1) dirs instead of one per batch) without
    changing a single admission decision: admissions after maintenance
    still equal the unmaintained run, and a REPLAY of a batch admitted
    BEFORE the OPTIMIZE still pins its true pre-batch state (the txn
    walk, not head-minus-one)."""
    from creatorops_lakehouse_spark.curation import (
        _inc_specs,
        curate_increment,
        incremental_clean_train,
        optimize_curation_state,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        current_version,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    cuts = docs.approxQuantile("doc_id", [0.34, 0.67], 0.0)
    b1 = docs.filter(F.col("doc_id") <= cuts[0])
    b2 = docs.filter(
        (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
    )
    b3 = docs.filter(F.col("doc_id") > cuts[1])

    plain = str(tmp_path / "plain")
    maint = str(tmp_path / "maint")
    for root in (plain, maint):
        curate_increment(spark, b1, root)
        c2 = curate_increment(spark, b2, root)
        if root == maint:
            out = optimize_curation_state(spark, root, max_dirs=1)
            assert any(v is not None for v in out.values()), out
            sets_spec = _inc_specs(root)["sets"]
            head = _read_manifest(sets_spec, current_version(sets_spec))
            assert len(head["dirs"]) == 1, "sets index should be packed"
            # replay of the PRE-optimize batch still pins correctly
            c2r = curate_increment(spark, b2, root, batch_id=1)
            assert c2r == c2
        curate_increment(spark, b3, root)

    a = {
        (r.doc_id, r.text, r.lang, r.k)
        for r in incremental_clean_train(spark, plain).collect()
    }
    b = {
        (r.doc_id, r.text, r.lang, r.k)
        for r in incremental_clean_train(spark, maint).collect()
    }
    assert a == b, "maintenance changed admission decisions"


def test_streaming_curation_ingest(spark, tmp_path):
    """Structured-Streaming ingestion into the rolling corpus
    (streaming/curation.py): files arrive, availableNow drains them one
    micro-batch per file, curate_increment admits each under the
    micro-batch id — and the resulting state equals a one-shot admission
    of the concatenated corpus. A second stream run over a NEW file (same
    checkpoint) continues the batch sequence instead of reprocessing."""
    import json
    import os

    from creatorops_lakehouse_spark.curation import (
        curate_increment,
        increment_manifest,
        incremental_clean_train,
    )
    from creatorops_lakehouse_spark.streaming.curation import (
        curation_ingest_stream,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "state")

    def stage(name, df):
        rows = [
            json.dumps({"doc_id": r.doc_id, "text": r.text, "lang": r.lang})
            for r in df.collect()
        ]
        with open(os.path.join(src_dir, name), "w") as f:
            f.write("\n".join(rows))

    stage("b0.json", docs.filter(F.col("doc_id") <= cut))
    q = curation_ingest_stream(
        spark, src_dir, "doc_id long, text string, lang string",
        root, ckpt, max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    stage("b1.json", docs.filter(F.col("doc_id") > cut))
    q = curation_ingest_stream(
        spark, src_dir, "doc_id long, text string, lang string",
        root, ckpt, max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    man = {r.batch_id for r in increment_manifest(spark, root).collect()}
    assert man == {0, 1}, man

    oneshot_root = str(tmp_path / "oneshot")
    curate_increment(spark, docs, oneshot_root)
    got = _ct_set(incremental_clean_train(spark, root))
    assert got == _ct_set(incremental_clean_train(spark, oneshot_root))


def test_incremental_lsh_mode(spark, tmp_path):
    """neardup='lsh' increments (the banded 100 TB path): two batches
    through the persisted MinHash band index equal a one-shot LSH
    admission field-for-field (band-collision candidate generation
    decomposes across batches; verification is exact either way), LSH
    retention is >= the exact path's (recall < 1 only ever KEEPS more),
    and mode mixing across batches is refused loudly."""
    import pytest

    from creatorops_lakehouse_spark.curation import (
        CurationConfig,
        curate_increment,
        incremental_clean_train,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    b1 = docs.filter(F.col("doc_id") <= cut)
    b2 = docs.filter(F.col("doc_id") > cut)
    cfg = CurationConfig(neardup="lsh")

    inc_root = str(tmp_path / "inc")
    curate_increment(spark, b1, inc_root, cfg)
    curate_increment(spark, b2, inc_root, cfg)
    got = _ct_set(incremental_clean_train(spark, inc_root))

    oneshot_root = str(tmp_path / "oneshot")
    curate_increment(spark, docs, oneshot_root, cfg)
    assert got == _ct_set(incremental_clean_train(spark, oneshot_root))

    exact_root = str(tmp_path / "exact")
    curate_increment(spark, docs, exact_root)
    assert len(got) >= len(_ct_set(incremental_clean_train(spark, exact_root)))

    with pytest.raises(ValueError, match="must keep the mode"):
        curate_increment(spark, b2, inc_root)  # exact batch on an lsh root
    with pytest.raises(ValueError, match="must keep the mode"):
        curate_increment(spark, b2, exact_root, cfg)  # lsh on an exact root
