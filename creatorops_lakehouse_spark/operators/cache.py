"""Scoped cache registry: persist intermediates without leaking them.

Dedup/similarity operators persist intermediate DataFrames (shingle sets,
band projections, chunk tables) that are re-read within ONE query plan.
A bare ``.persist()`` leaks those partitions for the lifetime of the
session — harmless for a single query, but a long-lived session (the bench
loop, the driver's 50-query correctness run, a real pipeline) accumulates
cached partitions until the storage pool evicts under pressure.

``scoped_persist`` registers every persist in a module-level scope;
``release_scoped_caches`` drops them all. The query registry wrapper
releases the previous query's scope when the next query starts (by then the
previous result has been collected), and bench/tools call it explicitly
between timed queries — so no operator needs its own try/finally while the
returned DataFrame stays lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for the next release_scoped_caches()."""
    df = df.persist()
    _SCOPED.append(df)
    return df


def release_scoped_caches() -> None:
    """Unpersist every scoped-persisted intermediate (blocking=False)."""
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
