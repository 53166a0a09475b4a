"""``spark.read.format("snapshot")`` — the snapshot log as a Spark 4
custom Python DataSource (pyspark.sql.datasource, added in Spark 4.0/4.1).

The snapshot layer's fast path is :func:`sources.snapshots.snapshot_read`
(the JVM parquet reader over the manifest's dir list — use that in
pipelines). THIS module is the INTEROP surface: it makes snapshot tables a
first-class format string so generic tooling that only speaks
``spark.read.format(...).options(...)`` — notebooks, BI bridges, ad-hoc
shells — gets time travel without importing this package's API:

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot").option("path", root).load()
    spark.read.format("snapshot").option("path", root)
         .option("version", "3").load()

Reader design (everything the DataSource API grades on):

- **Schema from the log**: each manifest pins the schema its version is
  read with; ``schema()`` returns exactly that (schema evolution and time
  travel both come through the format string for free).
- **Partition-parallel**: one InputPartition per parquet FILE across the
  manifest's dirs — a 1000-file version fans out to 1000 tasks, same
  granularity as the native reader.
- **Manifest-stats pruning via pushFilters** (Spark 4.1): eq/lt/gt
  filters on stats-covered columns drop whole commit dirs whose min/max
  PROVE disjointness — the same skipping contract as
  ``snapshot_read_where``, surfaced through the engine's own pushdown
  hook. All filters are returned to Spark for re-application, so pruning
  is a pure optimization, never a correctness dependency.
- **Arrow batches**: ``read()`` yields pyarrow RecordBatches (the API's
  vectorized path), casting file batches to the manifest schema's arrow
  types, filling schema-evolution gaps with nulls, and reconstructing
  hive-style partition columns from the file path.

Python-source overhead note: rows cross one Arrow boundary the JVM reader
does not pay; on the 100 TB hot path use ``snapshot_read``. The value here
is protocol compatibility, not throughput.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _manifest_for(options: dict) -> tuple[dict, str]:
    """(manifest, table_root) for the requested version (default: head)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        current_version,
        version_as_of,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    path = options.get("path")
    if not path:
        raise ValueError("snapshot source requires .option('path', <table root>)")
    spec = TableSpec("pyds.snapshot", path)
    v = options.get("version")
    ts = options.get("timestampasof") or options.get("timestampAsOf")
    if v is not None and ts is not None:
        raise ValueError("pass version OR timestampAsOf, not both")
    if ts is not None:
        version = version_as_of(spec, ts)
    else:
        version = current_version(spec) if v is None else int(v)
    if version is None:
        raise ValueError(f"no snapshots at {path}")
    return _read_manifest(spec, version), path


@dataclass
class _FilePartition(InputPartition):
    """One parquet file plus the hive partition-column values encoded in
    its path and the deletion-vector predicates applying to its commit
    dir (must stay picklable — plain tuples/scalars only). Each dv entry
    is a tuple of (column, lo, hi) bounds; matching rows filter out."""

    file_path: str
    hive: tuple[tuple[str, str | None], ...]
    dv: tuple[tuple[tuple, ...], ...] = ()
    cmap: tuple[tuple[str, str], ...] = ()  # (logical, physical) renames


def _walk_parquet(
    root: str,
    rel_dir: str,
    dv: tuple[tuple[tuple, ...], ...] = (),
    cmap: tuple[tuple[str, str], ...] = (),
) -> list[_FilePartition]:
    """File-level partitions for one commit dir, hive segments parsed."""
    parts: list[_FilePartition] = []
    base = os.path.join(root, rel_dir)
    for dirpath, _dirnames, files in os.walk(base):
        rel = os.path.relpath(dirpath, base)
        hive: list[tuple[str, str | None]] = []
        if rel != ".":
            from urllib.parse import unquote

            for seg in rel.split(os.sep):
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    # Spark percent-escapes partition path segments
                    # (ExternalCatalogUtils.escapePathName: ':'→'%3A',
                    # ' '→'%20', …); unescape so string values round-trip
                    # identically to the native reader. The null marker
                    # contains no escapes, so checking it pre-unquote is
                    # equivalent and keeps literal '__HIVE_DEFAULT_…'
                    # strings (which Spark would have escaped) distinct.
                    hive.append(
                        (unquote(k), None if v == _HIVE_NULL else unquote(v))
                    )
        for fn in files:
            if fn.endswith(".parquet"):
                parts.append(
                    _FilePartition(
                        os.path.join(dirpath, fn), tuple(hive), dv, cmap
                    )
                )
    return parts


def _dv_for_dir(manifest: dict, rel_dir: str) -> tuple[tuple[tuple, ...], ...]:
    """Picklable deletion-vector entries scoped to one commit dir."""
    return tuple(
        tuple((c, b[0], b[1]) for c, b in sorted(e["ranges"].items()))
        for e in manifest.get("dv", [])
        if rel_dir in set(e["dirs"])
    )


def _apply_dv(batch, dv):
    """Filter a RecordBatch through deletion-vector predicates: a row
    matching ANY entry (AND of its bounds; NULL never matches) drops."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = None
    for entry in dv:
        matched = None
        for col, lo, hi in entry:
            arr = batch.column(batch.schema.get_field_index(col))
            cond = None
            if lo is not None:
                cond = pc.greater_equal(arr, pa.scalar(lo).cast(arr.type))
            if hi is not None:
                le = pc.less_equal(arr, pa.scalar(hi).cast(arr.type))
                cond = le if cond is None else pc.and_(cond, le)
            if cond is not None:
                matched = cond if matched is None else pc.and_(matched, cond)
        if matched is None:  # unbounded predicate matches every row
            matched = pa.array([True] * batch.num_rows)
        matched = pc.fill_null(matched, False)  # NULL bound -> not matched
        entry_keep = pc.invert(matched)
        keep = entry_keep if keep is None else pc.and_(keep, entry_keep)
    return batch if keep is None else batch.filter(keep)


def _read_file_partition(schema: StructType, partition: _FilePartition) -> Iterator:
    """Arrow-batch read of one parquet file projected to ``schema``:
    missing columns null-fill (schema evolution), hive partition values
    become constant columns, types cast to the schema's arrow types."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    hive = dict(partition.hive)
    cmap = dict(partition.cmap)  # logical -> physical file name
    pf = pq.ParquetFile(partition.file_path)
    file_cols = set(pf.schema_arrow.names)

    def _phys(name: str) -> str:
        return cmap.get(name, name)

    want_from_file = [
        _phys(f.name) for f in target if _phys(f.name) in file_cols
    ]
    for batch in pf.iter_batches(columns=want_from_file or None):
        n = batch.num_rows
        arrays = []
        for field in target:
            if _phys(field.name) in file_cols:
                col = batch.column(want_from_file.index(_phys(field.name)))
                if col.type != field.type:
                    col = pc.cast(col, field.type)
                arrays.append(col)
            elif field.name in hive:
                v = hive[field.name]
                const = pa.array([v] * n, type=pa.string())
                if field.type != pa.string():
                    const = pc.cast(const, field.type)
                arrays.append(const)
            else:  # schema-evolution gap: file predates the column
                arrays.append(pa.nulls(n, type=field.type))
        out = pa.RecordBatch.from_arrays(arrays, schema=target)
        if partition.dv:
            out = _apply_dv(out, partition.dv)
        yield out


class SnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._manifest, self._root = _manifest_for(options)
        self._pruned: list[str] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Drop commit dirs whose manifest min/max stats prove them
        disjoint from an eq/range filter — and, for equality filters on a
        bloom-indexed column, dirs whose bloom sidecar proves the value
        absent. Everything is handed back to Spark (yield all), so this
        only ever REMOVES provably-dead I/O."""
        eq_probes: dict[str, object] = {}
        ranges: dict[str, list] = {}
        cmap = self._manifest.get("column_map", {})
        for f in filters:
            yield f  # Spark re-applies every filter: pruning is advisory
            col = f.attribute[0] if len(getattr(f, "attribute", ())) == 1 else None
            if col is None:
                continue
            col = cmap.get(col, col)  # stats/blooms key PHYSICAL names
            try:
                if isinstance(f, EqualTo):
                    eq_probes[col] = f.value
                    ranges.setdefault(col, [None, None])
                    lo, hi = ranges[col]
                    ranges[col] = [f.value if lo is None else max(lo, f.value),
                                   f.value if hi is None else min(hi, f.value)]
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    ranges.setdefault(col, [None, None])
                    lo = ranges[col][0]
                    ranges[col][0] = f.value if lo is None else max(lo, f.value)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    ranges.setdefault(col, [None, None])
                    hi = ranges[col][1]
                    ranges[col][1] = f.value if hi is None else min(hi, f.value)
            except TypeError:  # mixed-type bounds on one column: no prune
                ranges.pop(col, None)
        if not ranges and not eq_probes:
            return
        from creatorops_lakehouse_spark.sources.snapshots import (
            _bloom_might_contain,
        )
        from creatorops_lakehouse_spark.sources.tables import TableSpec

        spec = TableSpec("pyds.snapshot", self._root)
        blooms = self._manifest.get("bloom", {})
        bloom_cache: dict = {}
        per_dir = self._manifest.get("stats", {})
        for d in self._manifest["dirs"]:
            st = per_dir.get(d)
            disjoint = False
            for col, (lo, hi) in ranges.items():
                cs = (st or {}).get(col)
                if not cs or cs["min"] is None or cs["max"] is None:
                    continue
                try:
                    disjoint = (lo is not None and cs["max"] < lo) or (
                        hi is not None and cs["min"] > hi
                    )
                except TypeError:
                    # stats serialize dates/timestamps as ISO strings; a
                    # non-string filter value (datetime) is not comparable
                    # against them — keep the dir (pruning is advisory)
                    disjoint = False
                if disjoint:
                    break
            if not disjoint and eq_probes and d in blooms:
                for col, val in eq_probes.items():
                    if not _bloom_might_contain(
                        spec, blooms[d], col, val, bloom_cache
                    ):
                        disjoint = True
                        break
            if disjoint:
                self._pruned.append(d)

    def partitions(self):
        skip = set(self._pruned)
        cmap = tuple(
            sorted(self._manifest.get("column_map", {}).items())
        )
        return [
            p
            for d in self._manifest["dirs"]
            if d not in skip
            for p in _walk_parquet(
                self._root, d, _dv_for_dir(self._manifest, d), cmap
            )
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        return _read_file_partition(self._schema, partition)


class SnapshotStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("snapshot")`` — the snapshot log as a
    streaming SOURCE, Delta's table-as-a-stream feature on the manifest
    log: the commit VERSION is the offset, each micro-batch reads exactly
    the data dirs the versions in (start, end] added, and the immutable
    log makes replay after a checkpoint recovery byte-identical.

    Options: ``startingVersion`` (default 0 — full history; ``N`` starts
    AFTER version N-1, i.e. the first batch begins at version N);
    ``ignoreChanges`` ("true"/"false", default false): a non-append commit
    (overwrite / merge / delete rewrite / optimize / rollback) FAILS the
    stream by default — its rewritten dirs would re-emit rows already
    streamed; with ignoreChanges=true the new dirs are emitted anyway and
    downstream must dedup, exactly Delta's documented contract.

    Paired with ``start_exactly_once_sink`` this closes the loop:
    snapshot tables compose into incremental pipelines — stream out of
    one, transform, exactly-once append into the next."""

    def __init__(self, schema: StructType, options: dict) -> None:
        from creatorops_lakehouse_spark.sources.tables import TableSpec

        self._schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("snapshot source requires .option('path', <root>)")
        self._root = path
        self._spec = TableSpec("pyds.snapshot.stream", path)
        self._start_v = int(options.get("startingVersion", "0"))
        self._ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        # Delta's narrower escape hatch: tolerate DELETE commits (DV or
        # rewrite) without accepting every rewrite the way ignoreChanges
        # does — deleted rows were already streamed, surviving rows of a
        # delete-rewrite are suppressed as already-emitted
        self._ignore_deletes = (
            str(options.get("ignoreDeletes", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:  # noqa: N802
        return {"version": self._start_v - 1}

    def latestOffset(self) -> dict:  # noqa: N802
        from creatorops_lakehouse_spark.sources.snapshots import current_version

        cur = current_version(self._spec)
        return {"version": self._start_v - 1 if cur is None else cur}

    def partitions(self, start: dict, end: dict):
        from creatorops_lakehouse_spark.sources.snapshots import _read_manifest

        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m = _read_manifest(self._spec, v)
            parent = m.get("parent")
            prev_dirs = (
                set() if parent is None
                else set(_read_manifest(self._spec, parent)["dirs"])
            )
            new_dirs = [d for d in m["dirs"] if d not in prev_dirs]
            mode = m.get("mode")
            if mode != "append" and not self._ignore_changes:
                if not new_dirs and mode != "delete_dv":
                    # metadata-only commit (constraint change, checkpoint
                    # bookkeeping): no file-set change, nothing to emit
                    continue
                if mode in ("delete", "delete_dv") and self._ignore_deletes:
                    # Delta's ignoreDeletes: the delete's survivors (a
                    # rewrite's new dir) were already streamed from their
                    # original commits — emit nothing, keep going
                    continue
                hint = (
                    "a deletion-vector commit — already-streamed rows are "
                    "now deleted in the table"
                    if mode == "delete_dv"
                    else "rewritten data would re-emit already-streamed rows"
                )
                opt = (
                    "'ignoreDeletes'"
                    if mode in ("delete", "delete_dv")
                    else "'ignoreChanges'"
                )
                raise ValueError(
                    f"snapshot stream at {self._root}: version {v} is a "
                    f"'{mode}' commit — {hint}. Pass .option("
                    f"{opt}, 'true') to continue anyway "
                    "(downstream owns reconciliation)."
                )
            cm = tuple(sorted(m.get("column_map", {}).items()))
            for d in new_dirs:
                parts.extend(_walk_parquet(self._root, d, (), cm))
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        return _read_file_partition(self._schema, partition)

    def commit(self, end: dict) -> None:
        pass  # the log is immutable; nothing to acknowledge


class SnapshotDataSource(DataSource):
    """Format name ``snapshot``; see module docstring for options."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self) -> StructType:
        manifest, _ = _manifest_for(self.options)
        if "schema" not in manifest:
            raise ValueError(
                "manifest predates schema pinning; read via snapshot_read"
            )
        return StructType.fromJson(manifest["schema"])

    def reader(self, schema: StructType) -> SnapshotReader:
        return SnapshotReader(schema, self.options)

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:  # noqa: N802
        return SnapshotStreamReader(schema, self.options)


def register_snapshot_source(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of the snapshot format.
    Also enables the (off-by-default in 4.1) Python-source filter-pushdown
    hook — without it Spark refuses any reader that defines pushFilters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
