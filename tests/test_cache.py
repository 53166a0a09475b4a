"""Scoped/sticky cache registry: scope release, LRU cap, prefix eviction
(VERDICT r5 item 5 — sticky entries must not accumulate across corpora)."""

from __future__ import annotations

from creatorops_lakehouse_spark.operators import cache as C


def _entry(spark, n):
    return lambda: spark.range(n)


def setup_function(_):
    C.release_sticky()


def teardown_function(_):
    C.release_sticky()


def test_sticky_hit_returns_same_dataframe(spark):
    a = C.sticky_persist("k:a", _entry(spark, 5))
    b = C.sticky_persist("k:a", _entry(spark, 99))  # build ignored on hit
    assert a is b
    assert a.count() == 5


def test_sticky_lru_cap_evicts_oldest(spark):
    cap = C.STICKY_MAX_ENTRIES
    dfs = [C.sticky_persist(f"c1:{i}", _entry(spark, i + 1)) for i in range(cap)]
    # touch c1:0 so it is most-recent; inserting one more must evict c1:1
    C.sticky_persist("c1:0", _entry(spark, 999))
    C.sticky_persist("c2:new", _entry(spark, 7))
    assert "c1:1" not in C._STICKY
    assert "c1:0" in C._STICKY and "c2:new" in C._STICKY
    assert len(C._STICKY) == cap
    # evicted entry is unpersisted, survivors still cached
    assert dfs[1].storageLevel.useMemory is False
    assert dfs[0].storageLevel.useMemory is True


def test_second_corpus_evicts_first(spark):
    """A bench/driver session that swaps corpus dirs ends up holding only
    the newest corpus's artifacts once the cap cycles."""
    cap = C.STICKY_MAX_ENTRIES
    for i in range(cap):
        C.sticky_persist(f"art{i}:/data/sfA", _entry(spark, 2))
    for i in range(cap):
        C.sticky_persist(f"art{i}:/data/sfB", _entry(spark, 3))
    assert all(k.endswith("sfB") for k in C._STICKY)
    assert len(C._STICKY) == cap


def test_release_sticky_prefix(spark):
    # distinct row counts: Spark's cache manager is keyed by the logical
    # plan, so identical plans would share one cache entry and the
    # prefix-release of one would (correctly) uncache all of them
    C.sticky_persist("shingle:3:/x", _entry(spark, 11))
    C.sticky_persist("shingle:5:/x", _entry(spark, 12))
    kept = C.sticky_persist("trade:/x", _entry(spark, 13))
    C.release_sticky(prefix="shingle:")
    assert list(C._STICKY) == ["trade:/x"]
    assert kept.storageLevel.useMemory is True
