"""Incrementally-maintained materialized aggregate views over the
snapshot log — the materialized-view maintenance pattern of
Delta/Databricks MVs and classical self-maintainable-view theory,
re-expressed on this engine's CDF.

The reference's gold tables (pipelines/gold/kpis.py, retention.py — full
recompute on every run) are the workload this upgrades: at 100 TB a
nightly full re-aggregation re-reads the whole fact table to refresh a
few thousand group rows. A SUM/COUNT aggregate is SELF-MAINTAINABLE:
the new view state is a pure function of (old view state, changed rows).
Refresh cost: the APPEND path (the common case) reads only the new
data; the DML fallback computes the key-level CDF, which scans the two
pinned versions (O(table) read, like Delta CDF without per-commit
change files) but still folds into the view through the tiny delta —
the full re-AGGREGATION and the view rewrite stay O(changes)/O(groups).

Refresh paths, chosen per refresh from the two manifests alone:

- **incremental-append** (the common case): if the source head's file
  set is a superset of the watermark version's (same schema, same
  deletion vectors on the common dirs — i.e. every old row survived
  verbatim and only new dirs arrived), the delta is computed by scanning
  ONLY the added dirs (_load_dirs on the added subset). True
  O(new data): the existing table bytes are never touched.
- **incremental-diff**: any DML/rewrite between watermark and head falls
  back to the key-level CDF (snapshot_diff with update detection);
  change rows fold into the view with +1/-1 weights
  (insert/update_postimage = +1, delete/update_preimage = -1).
- **full-rebuild**: vacuum reclaimed the watermark version, so the delta
  is unreconstructible — re-materialize from the head (Delta's behavior
  past the change feed's retention horizon), still as ONE commit
  carrying the new watermark.

The WATERMARK is the snapshot log's own exactly-once txn map
(app_id = "matview:<view table name>", txn_version = source version):
``last_txn_version`` recovers it after any restart, and a replayed
refresh of an already-applied source version is a no-op by the same
mechanism that makes the streaming sink exactly-once. Each refresh
commits the merged view state as ONE snapshot version of the view
table, so the view itself has time travel, CDF, and vacuum for free.

Contracts (refused loudly, not silently wrong):
- only SUM and COUNT measures — MIN/MAX are not self-maintainable under
  deletes (a deleted max needs a rescan); register a full-recompute view
  for those.
- measure columns must be non-null: a NULL would be skipped by SUM on
  the full recompute but materially contribute 0 through the merge's
  COALESCE, silently diverging the two. Enforced per refresh on the
  delta only (O(changed rows)).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.sources.snapshots import (
    _load_dirs,
    _read_manifest,
    current_version,
    last_txn_version,
    snapshot_diff,
    snapshot_read,
    snapshot_write_txn,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec

#: the view's row-count measure (also the group-death signal: a group
#: whose count folds to 0 is removed from the view)
N_COL = "n_rows"


def _app_id(view: TableSpec) -> str:
    return f"matview:{view.name}"


def _aggregate(df: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias(N_COL)]
    for out_col, in_col in sums.items():
        aggs.append(F.sum(in_col).cast("long").alias(out_col))
    return df.groupBy(*keys).agg(*aggs)


def _check_measures_non_null(df: DataFrame, sums: dict[str, str]) -> None:
    if not sums:
        return
    cond = None
    for in_col in sums.values():
        c = F.col(in_col).isNull()
        cond = c if cond is None else (cond | c)
    bad = df.filter(cond).limit(1).count()
    if bad:
        raise ValueError(
            "matview measures must be non-null: NULL would be skipped by "
            "SUM on a full recompute but fold as 0 through the incremental "
            f"merge (columns {sorted(set(sums.values()))})"
        )


def create_agg_view(
    spark: SparkSession,
    src: TableSpec,
    view: TableSpec,
    keys: list[str],
    sums: dict[str, str],
) -> int:
    """Full initial materialization of ``GROUP BY keys`` with COUNT(*)
    plus the given SUM measures, watermarked at the source head. Returns
    the source version the view now reflects."""
    v = current_version(src)
    if v is None:
        raise ValueError(f"source table {src.path} has no snapshots")
    df = snapshot_read(spark, src, version=v)
    _check_measures_non_null(df, sums)
    snapshot_write_txn(
        _aggregate(df, keys, sums), view,
        app_id=_app_id(view), txn_version=v, mode="overwrite",
    )
    return v


def _append_only(m_old: dict, m_new: dict) -> bool:
    """True iff every row of the old version survives VERBATIM in the new
    one and only whole new dirs arrived — the condition under which the
    delta is exactly the added dirs' content."""
    old_dirs, new_dirs = set(m_old["dirs"]), set(m_new["dirs"])
    if old_dirs - new_dirs:
        return False
    if m_old.get("schema") != m_new.get("schema"):
        return False
    if m_old.get("column_map") != m_new.get("column_map"):
        return False
    dv_old, dv_new = m_old.get("dv", {}), m_new.get("dv", {})
    return all(dv_old.get(d) == dv_new.get(d) for d in old_dirs)


def refresh_agg_view(
    spark: SparkSession,
    src: TableSpec,
    view: TableSpec,
    keys: list[str],
    sums: dict[str, str],
    row_key: list[str],
    max_retries: int = 5,
) -> tuple[int, str]:
    """Advance the view to the source head. Returns ``(source_version,
    mode)`` with mode in ``noop | incremental-append | incremental-diff |
    full-rebuild`` (the last when vacuum reclaimed the watermark version
    — the delta is gone, so the view re-materializes from the head).

    ``row_key`` identifies source ROWS (not groups) for the CDF fallback;
    on the append fast path it is unused. The refresh is idempotent and
    crash-safe: the merged state and the watermark land in ONE view
    commit (the txn map), so a refresh killed before its commit leaves
    the old view+watermark intact and a replay redoes exactly the same
    catch-up.

    Concurrency: the view commit is an OVERWRITE, which aborts rather
    than rebase on conflict (two refreshers' merged states are not
    composable file-set-wise). A lost race — another refresher advanced
    the view, or this process's own previous attempt half-landed —
    retries the WHOLE refresh from a freshly-read watermark, up to
    ``max_retries`` times; a replay of an already-applied source version
    no-ops via the txn map, so the loop converges. SOURCE commits racing
    the refresh are always safe: the delta is computed between two
    pinned versions, never "the head"."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
    )

    last_err: Exception | None = None
    for _ in range(max_retries):
        try:
            return _refresh_once(spark, src, view, keys, sums, row_key)
        except SnapshotConflictError as e:
            last_err = e
    raise SnapshotConflictError(
        f"matview refresh of {view.path} lost {max_retries} commit races: "
        f"{last_err}"
    )


def _refresh_once(
    spark: SparkSession,
    src: TableSpec,
    view: TableSpec,
    keys: list[str],
    sums: dict[str, str],
    row_key: list[str],
) -> tuple[int, str]:
    v_now = current_version(src)
    v_last = last_txn_version(view, _app_id(view))
    if v_last is None:
        raise ValueError(
            f"view {view.path} has no watermark — call create_agg_view first"
        )
    if v_now is None or v_now <= v_last:
        return (v_last, "noop")

    try:
        m_last = _read_manifest(src, v_last)
    except ValueError:
        # the watermark version was vacuumed past — the delta between
        # watermark and head is no longer reconstructible, so fall back
        # to a FULL re-materialization (Delta MVs do the same when the
        # change feed's retention horizon is crossed). Still one commit:
        # state + new watermark land together.
        df = snapshot_read(spark, src, version=v_now)
        _check_measures_non_null(df, sums)
        snapshot_write_txn(
            _aggregate(df, keys, sums), view,
            app_id=_app_id(view), txn_version=v_now, mode="overwrite",
        )
        return (v_now, "full-rebuild")
    m_now = _read_manifest(src, v_now)
    if _append_only(m_last, m_now):
        mode = "incremental-append"
        added = [d for d in m_now["dirs"] if d not in set(m_last["dirs"])]
        changed = _load_dirs(spark, src, m_now, added)
        _check_measures_non_null(changed, sums)
        delta = _aggregate(changed, keys, sums)
    else:
        mode = "incremental-diff"
        cdf = snapshot_diff(
            spark, src, v_last, v_now, keys=row_key, detect_updates=True
        )
        _check_measures_non_null(cdf, sums)
        w = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        weighted = cdf.withColumn("_w", w)
        aggs = [F.sum("_w").cast("long").alias(N_COL)]
        for out_col, in_col in sums.items():
            aggs.append(
                F.sum(F.col("_w") * F.col(in_col)).cast("long").alias(out_col)
            )
        delta = weighted.groupBy(*keys).agg(*aggs)

    old = snapshot_read(spark, view)
    measure_cols = [N_COL, *sums.keys()]
    d = delta.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in measure_cols]
    )
    merged = (
        old.join(d, on=keys, how="full_outer")
        .select(
            *keys,
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
                ).cast("long").alias(c)
                for c in measure_cols
            ],
        )
        .filter(F.col(N_COL) > 0)
    )
    snapshot_write_txn(
        merged, view, app_id=_app_id(view), txn_version=v_now, mode="overwrite"
    )
    return (v_now, mode)
