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
