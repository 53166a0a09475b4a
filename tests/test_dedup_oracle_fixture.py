"""Non-trivial oracle agreement for the exact/fingerprint dedup queries.

The driver fixture (sf0.01 documents) contains no exact duplicates, so the
CORRECTNESS rows for docs_exact_dedup_clusters / docs_fingerprint_dedup are
green at 0 rows — trivially satisfied (VERDICT r2 item 7). This test runs
the SAME spark-vs-DuckDB hash protocol (tools/check_oracle.py::normalize)
over a synthesized corpus with KNOWN duplicate clusters, so the oracle
agreement is exercised on non-empty output somewhere in CI.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

from check_oracle import normalize  # noqa: E402


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory):
    """documents.parquet with 3 exact-dup clusters and 1 fingerprint-only
    cluster (case/punctuation variants of the same normalized text)."""
    rows = []
    for i in range(40):
        rows.append((i, f"unique document number {i} with its own words"))
    # exact clusters: {100,101,102}, {110,111}, {120,121}
    rows += [(100, "the quick brown fox"), (101, "the quick brown fox"),
             (102, "the quick brown fox")]
    rows += [(110, "pack my box with jugs"), (111, "pack my box with jugs")]
    rows += [(120, "sphinx of black quartz"), (121, "sphinx of black quartz")]
    # fingerprint-only cluster: same after lowercase/punct/whitespace fold
    rows += [(130, "Hello, World!  How are you?"),
             (131, "hello world how are you")]
    d = tmp_path_factory.mktemp("dupcorpus")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet", index=False
    )
    return str(d)


def _check(spark, sf_dir, name):
    import duckdb

    from creatorops_lakehouse_spark.queries import all_oracles, all_queries

    sdf = all_queries()[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    odf = con.execute(all_oracles()[name]).df()
    assert len(sdf) > 0, f"{name}: fixture produced no clusters — trivial again"
    assert normalize(sdf) == normalize(odf), f"{name}: spark/oracle mismatch"
    return sdf


def test_exact_dedup_oracle_nonzero(spark, dup_corpus_dir):
    sdf = _check(spark, dup_corpus_dir, "docs_exact_dedup_clusters")
    assert sorted(sdf["n_docs"]) == [2, 2, 3]
    assert set(sdf["canonical_id"]) == {100, 110, 120}


def test_fingerprint_dedup_oracle_nonzero(spark, dup_corpus_dir):
    sdf = _check(spark, dup_corpus_dir, "docs_fingerprint_dedup")
    # fingerprint folds the exact clusters too, plus the {130,131} variant pair
    assert set(sdf["canonical_id"]) == {100, 110, 120, 130}
