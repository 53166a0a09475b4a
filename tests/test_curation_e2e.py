"""Composed curation pipeline: the lsh (scale-path) near-dup variant must
reproduce the exact path's retention on corpora whose near-dup clusters
collide in at least one MinHash band (the 100× rehearsal pinned zero
deviation at 5k and 500k docs; this pins it in CI at sf0.001)."""

from __future__ import annotations


def test_lsh_neardup_variant_matches_exact_retention(spark):
    from creatorops_lakehouse_spark.queries.curation import curation_e2e_row

    exact = curation_e2e_row(spark, "/root/testdata/sf0.001").collect()[0]
    lsh = curation_e2e_row(
        spark, "/root/testdata/sf0.001", neardup="lsh"
    ).collect()[0]
    assert exact.n_neardup == lsh.n_neardup
    # downstream stages consume identical survivor sets -> identical row
    assert exact == lsh
    # conservation facts hold on both paths
    assert exact.shards_conserve and exact.pack_counts_ok
    assert (
        exact.n_all
        >= exact.n_quality
        >= exact.n_exact
        >= exact.n_neardup
        >= exact.n_train
        >= exact.n_clean
        >= exact.n_mixture
    )
