"""Label propagation (operators/graph.py): deterministic synchronous
community detection — frequency voting, (count DESC, label ASC) ties."""

from __future__ import annotations

from creatorops_lakehouse_spark.operators.graph import label_propagation


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def _labels(spark, pairs, iterations=3):
    df = spark.createDataFrame(_sym(pairs), ["src", "dst"])
    return {
        r.node: r.label
        for r in label_propagation(df, iterations=iterations).collect()
    }


def test_two_cliques_with_bridge_stay_two_communities(spark):
    # two 4-cliques joined by ONE bridge edge: min-label propagation
    # (connected components) would flood label 0 everywhere; frequency
    # voting keeps each clique its own community — the LPA point.
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    got = _labels(spark, c1 + c2 + [(3, 10)])
    left = {got[n] for n in range(4)}
    right = {got[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right  # the bridge did NOT merge the communities
    assert left == {0} and right == {10}  # smallest-label tie-break


def test_sync_determinism_and_tie_break(spark):
    # a path 0-1-2: node 1 hears labels {0, 2} equally often -> smallest
    # label wins the tie, every run identical
    a = _labels(spark, [(0, 1), (1, 2)], iterations=1)
    b = _labels(spark, [(0, 1), (1, 2)], iterations=1)
    assert a == b
    assert a[1] == 0  # tie between 0 and 2 breaks toward the smaller


def test_isolated_node_and_bipartite_oscillation(spark):
    # a self-loop-only node keeps its seed label across rounds; the 1-2
    # pair exhibits the documented sync-LPA two-coloring oscillation
    # (labels swap each round, returning to seeds on even rounds) — the
    # caveat that caps iteration counts
    df = spark.createDataFrame([(5, 5), (1, 2), (2, 1)], ["src", "dst"])
    after1 = {r.node: r.label for r in label_propagation(df, 1).collect()}
    after2 = {r.node: r.label for r in label_propagation(df, 2).collect()}
    assert after1[5] == 5 and after2[5] == 5
    assert (after1[1], after1[2]) == (2, 1)  # swapped
    assert (after2[1], after2[2]) == (1, 2)  # swapped back


def test_no_out_edge_node_keeps_seed_label(spark):
    """r14 fold-back rewrite: a node with NO out-edges never receives a
    vote, so its label stays the seed self-label through every superstep
    (the keep_self union leg); nodes WITH out-edges adopt winners."""
    df = spark.createDataFrame([(1, 2), (2, 1), (3, 1)], ["src", "dst"])
    # node 1,2: a 2-cycle; node 3 -> 1 has an out-edge, nothing points
    # at 3, and a pure-sink case: edge (2, 9) makes 9 dst-only
    df2 = spark.createDataFrame([(1, 2), (2, 1), (2, 9)], ["src", "dst"])
    for frame, sink in ((df, None), (df2, 9)):
        for iters in (1, 2, 3):
            got = {
                r.node: r.label
                for r in label_propagation(frame, iterations=iters).collect()
            }
            if sink is not None:
                assert got[sink] == sink  # dst-only node: seed label forever
            assert set(got) == {r.src for r in frame.collect()} | {
                r.dst for r in frame.collect()
            }


def test_string_node_ids(spark):
    """Labels may be any orderable type: the argmax is min(struct(-count,
    label)) so string ids order lexicographically (ADVICE r7: the previous
    -label negation only worked for numeric ids, failing under ANSI)."""
    c1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    c2 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    got = _labels(spark, c1 + c2 + [("d", "w")])
    assert {got[n] for n in "abcd"} == {"a"}  # smallest-string tie-break
    assert {got[n] for n in "wxyz"} == {"w"}
    # tie on a string path: 'b' hears {'a','c'} equally -> lexicographic min
    tie = _labels(spark, [("a", "b"), ("b", "c")], iterations=1)
    assert tie["b"] == "a"
