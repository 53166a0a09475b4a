"""k-hop reachability operator: broadcast vs shuffle anti-join parity
(VERDICT r5 item 3) and frontier-size correctness on a known graph."""

from __future__ import annotations

import pytest

from creatorops_lakehouse_spark.operators.graph import khop_frontier_sizes


@pytest.fixture(scope="module")
def chain_graph(spark):
    # two chains from 0 plus a cycle edge back: frontiers 1->{1,10},
    # 2->{2,11}, 3->{3} (12 unreachable is absent; 0 revisit excluded)
    edges = [(0, 1), (0, 10), (1, 2), (10, 11), (2, 3), (11, 0), (3, 1)]
    return spark.createDataFrame(edges, ["src", "dst"])


@pytest.mark.parametrize("bc", [True, False, None])
def test_khop_paths_identical(spark, chain_graph, bc):
    seed = spark.createDataFrame([(0,)], ["node"])
    got = {
        (r.hop, r.n_new_nodes)
        for r in khop_frontier_sizes(
            chain_graph, seed, hops=3, broadcast_visited=bc
        ).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 1)}
