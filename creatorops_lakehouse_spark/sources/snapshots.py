"""Versioned snapshot tables on plain parquet: time travel, rollback,
change-data feed, checkpoint compaction, and optimistic multi-writer
commits — the transaction-log capability surface the reference assumes
from Delta (sql/ddl/01_bronze.sql TBLPROPERTIES, time travel in docs),
re-implemented natively because delta-spark is not installable in this
sandbox.

Design (a deliberately minimal Iceberg/Delta-shaped log):

- Data files are immutable: every write lands under
  ``<root>/data/b<version>-<writer_token>/`` and is NEVER rewritten or
  deleted by subsequent writes. The per-writer token keeps two concurrent
  writers' data files disjoint even when they race for the same version.
- A snapshot is a JSON manifest ``<root>/_manifests/v<N>.json`` listing
  the data directories visible at that version plus commit metadata.
- Commits are OPTIMISTIC-CONCURRENCY: the manifest is staged to a temp
  name and published with ``os.link`` — atomic on POSIX and it FAILS
  (EEXIST) if another writer already committed that version, so two
  writers can never both win v<N> (the same contract Delta gets from its
  log store's put-if-absent). On conflict an ``append`` re-reads the new
  head, rebases its file list, and retries — its already-written data dir
  is reused, no data rewrite. An ``overwrite`` (or rollback) ABORTS with
  ``SnapshotConflictError``: replacing a table state the writer never saw
  would silently drop the concurrent commit.
- ``append`` commits prev_dirs + new_dir; ``overwrite`` commits
  [new_dir]. Old versions stay readable (time travel) until
  ``vacuum_snapshots`` drops manifests older than a retention horizon and
  deletes data dirs no live manifest references.
- ``checkpoint_manifest`` folds all manifests ≤ N into ONE checkpoint
  file ``_manifests/c<N>.json`` and removes the loose files — Delta's
  answer to log growth. Readers plan from the latest checkpoint plus the
  loose tail, so a table with a million commits opens O(tail) manifest
  files; time travel to checkpointed versions reads them out of the
  checkpoint body.
- Reads load ONLY the directories in the requested manifest —
  O(changed files) planning, and schema evolution is free because each
  version pins its own file set.
- Every commit records per-dir min/max column stats AND a row count
  (Delta's numRecords): ``snapshot_read_where`` plans only intersecting
  commits, and ``snapshot_count`` answers COUNT(*) from the manifest
  without opening a data file.
- ``snapshot_write_txn`` adds Delta's idempotent-commit contract
  (``txnAppId``/``txnVersion``): each manifest carries a ``txns`` map of
  per-app watermarks that survives every write mode, so at-least-once
  micro-batch redelivery (foreachBatch) becomes exactly-once table state.

Scale note: a manifest holds directory names (one per commit), not
per-file lists — at 100 TB a commit of any size is one manifest entry,
and Spark's parquet reader parallelizes file discovery inside the
directories. Commit count grows the log; checkpointing bounds it.
Maintenance ops (checkpoint, vacuum) assume a single maintainer at a
time, exactly like Delta's OPTIMIZE.
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.sources.tables import TableSpec


class SnapshotConflictError(RuntimeError):
    """Another writer committed the version this writer raced for."""


class SnapshotProtocolError(RuntimeError):
    """The table requires a reader/writer feature this build does not
    implement (Delta's protocol-version contract): refusing loudly beats
    silently misreading — e.g. a reader without ``deletionVectors`` would
    resurrect deleted rows, one without ``columnMapping`` would read
    physical column names."""


#: features THIS build implements end-to-end. Every commit stamps the
#: features its manifest actually uses (``reader_features`` /
#: ``writer_features``); any manifest requiring something outside these
#: sets is refused at read/write time rather than misread.
_READER_FEATURES = frozenset({"deletionVectors", "columnMapping"})
_WRITER_FEATURES = _READER_FEATURES | frozenset({"checkConstraints"})


def _required_features(manifest: dict) -> tuple[list[str], list[str]]:
    """(reader, writer) features a manifest's content actually requires —
    self-describing per version, so a purge that removes the last deletion
    vector also drops the requirement (unlike Delta's monotonic protocol,
    there is no downgrade ceremony)."""
    r, w = set(), set()
    if manifest.get("dv"):
        r.add("deletionVectors")
        w.add("deletionVectors")
    if manifest.get("column_map"):
        r.add("columnMapping")
        w.add("columnMapping")
    if manifest.get("constraints"):
        w.add("checkConstraints")  # writers must enforce; readers unaffected
    return sorted(r), sorted(w)


def _check_features(manifest: dict, path: str, kind: str = "reader") -> None:
    """Raise SnapshotProtocolError when the manifest requires a feature
    outside this build's support set. ``kind='writer'`` additionally
    requires every reader feature (a writer that can't READ the table
    correctly must not rewrite it)."""
    req = set(manifest.get("reader_features", []))
    sup = _READER_FEATURES
    if kind == "writer":
        req |= set(manifest.get("writer_features", []))
        sup = _WRITER_FEATURES
    unknown = sorted(req - sup)
    if unknown:
        raise SnapshotProtocolError(
            f"table at {path} requires {kind} feature(s) {unknown} this "
            f"build does not implement (supported: {sorted(sup)}); "
            "upgrade before touching this table"
        )


class SchemaMismatchError(ValueError):
    """Append schema drifts from the table schema (pass merge_schema=True
    to evolve additively — Delta's mergeSchema)."""


class ConstraintViolationError(ValueError):
    """A write contains rows that violate a table CHECK constraint, or
    ADD CONSTRAINT found existing rows violating the new constraint."""


def _merge_schemas(old, new):
    """Delta-style additive evolution: old fields keep their order and
    types; new fields append. A same-name field with a DIFFERENT type is a
    conflict (no implicit casts — silent widening corrupts readers)."""
    from pyspark.sql.types import StructType

    by_name = {f.name: f for f in old.fields}
    conflicts = [
        f.name
        for f in new.fields
        if f.name in by_name and by_name[f.name].dataType != f.dataType
    ]
    if conflicts:
        raise SchemaMismatchError(
            f"schema evolution cannot change existing column types: {conflicts}"
        )
    added = [f for f in new.fields if f.name not in by_name]
    return StructType(list(old.fields) + added)


def _same_columns(a, b) -> bool:
    """Schema equality for enforcement: same {name: type} map. Nullability,
    field metadata, and column ORDER are not drift — parquet projects by
    name and each version's manifest pins its own canonical order."""
    return {f.name: f.dataType for f in a.fields} == {
        f.name: f.dataType for f in b.fields
    }


def _manifest_dir(spec: TableSpec) -> str:
    return os.path.join(spec.path, "_manifests")


def _latest_checkpoint_version(spec: TableSpec) -> int | None:
    """Version of the newest checkpoint from the FILENAME alone (one
    listdir, no JSON parse) — what _commit's race guards probe on every
    commit; parsing the body there would make commit cost grow with
    folded-history size."""
    d = _manifest_dir(spec)
    if not os.path.isdir(d):
        return None
    cps = []
    for f in os.listdir(d):
        if f.startswith("c") and f.endswith(".json"):
            try:
                cps.append(int(f[1:-5]))
            except ValueError:
                continue
    return max(cps) if cps else None


#: parsed checkpoint bodies keyed by file path, validated by (mtime, size)
#: — a history walk (version_as_of, snapshot_history, checkpoint folding)
#: touches the checkpoint once per FOLDED version, and re-parsing a
#: multi-MB body each time would make those walks quadratic in commit
#: count. Vacuum rewrites the same path atomically (os.replace), which
#: changes mtime/size and invalidates the entry. Bounded LRU-ish: oldest
#: inserted drops past _CP_CACHE_MAX (a process rarely walks many tables'
#: checkpoints at once).
_CP_CACHE: dict[str, tuple[tuple[float, int], tuple[int, dict[int, dict]]]] = {}
_CP_CACHE_MAX = 8


def _latest_checkpoint(spec: TableSpec) -> tuple[int, dict[int, dict]] | None:
    """(checkpoint_version, {version: manifest}) of the newest checkpoint,
    or None. Older checkpoint files are superseded and ignored."""
    n = _latest_checkpoint_version(spec)
    if n is None:
        return None
    path = os.path.join(_manifest_dir(spec), f"c{n}.json")
    try:
        st = os.stat(path)
    except FileNotFoundError:  # raced a superseding fold; re-resolve
        return _latest_checkpoint(spec)
    key = (st.st_mtime_ns, st.st_size)
    hit = _CP_CACHE.get(path)
    if hit is not None and hit[0] == key:
        return hit[1]
    with open(path) as fh:
        body = json.load(fh)
    out = (n, {int(k): v for k, v in body["manifests"].items()})
    _CP_CACHE[path] = (key, out)
    while len(_CP_CACHE) > _CP_CACHE_MAX:
        _CP_CACHE.pop(next(iter(_CP_CACHE)))
    return out


def _loose_versions(spec: TableSpec) -> list[int]:
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


def _versions(spec: TableSpec) -> list[int]:
    vs = set(_loose_versions(spec))
    cp = _latest_checkpoint(spec)
    if cp is not None:
        vs.update(cp[1])
    return sorted(vs)


def current_version(spec: TableSpec) -> int | None:
    """Latest committed version, or None for an empty table."""
    vs = _versions(spec)
    return vs[-1] if vs else None


def _read_manifest(spec: TableSpec, version: int) -> dict:
    """Loose manifest first (the tail past the checkpoint), else the
    checkpoint body (time travel into compacted history). EVERY consumer
    — snapshot_read, read_where, the pyds DataSource, the streaming
    source, DML, maintenance — enters the log here, so the reader-feature
    gate lives here: a manifest stamped with a feature this build doesn't
    implement refuses loudly instead of being silently misread."""
    path = os.path.join(_manifest_dir(spec), f"v{version}.json")
    m = None
    # open-first, no existence probe: a checkpoint fold deletes loose
    # files AFTER publishing the checkpoint, so a reader racing the fold
    # (check-then-open TOCTOU, caught by the cross-process chaos design
    # review) must fall through to the checkpoint body, never crash
    try:
        with open(path) as f:
            m = json.load(f)
    except FileNotFoundError:
        cp = _latest_checkpoint(spec)
        if cp is not None and version in cp[1]:
            m = cp[1][version]
    if m is None:
        raise ValueError(f"unknown snapshot version {version} at {spec.path}")
    _check_features(m, spec.path, "reader")
    return m


def snapshot_dirs(spec: TableSpec, version: int) -> list[str]:
    """Absolute data directories referenced by one committed version."""
    return [
        os.path.join(spec.path, d) for d in _read_manifest(spec, version)["dirs"]
    ]


#: atomic types whose min/max land in the manifest as data-skipping stats
#: (JSON-native or ISO strings whose lexicographic order matches the value
#: order, so pruning compares without type machinery)
_STATS_TYPES = (
    "byte", "short", "int", "integer", "long", "bigint",
    "float", "double", "string", "date", "timestamp", "timestamp_ntz",
)

#: types eligible for per-commit bloom filters: the probe value must have
#: ONE canonical string form identical in Spark (CAST AS STRING) and
#: Python (str()) — integers and strings qualify; floats/dates/timestamps
#: have engine-specific formatting and are excluded
_BLOOM_TYPES = ("byte", "short", "int", "integer", "long", "bigint", "string")

#: bloom geometry bounds: m is rounded up to whole bytes and capped so a
#: sidecar stays small metadata (2^21 bits = 256 KiB bitmap per column per
#: commit — supports ~145k-row commits at the 0.001 default fpp; larger
#: commits trip the saturation guard unless the caller raises the cap);
#: k capped at 8 hash probes
_BLOOM_MAX_BITS_DEFAULT = 1 << 21


def _bloom_params(n: int, fpp: float, max_bits: int) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for ``n`` expected values at ``fpp``
    false-positive rate, clamped to [64, max_bits] bits (byte-aligned)
    and [1, 8] hashes. ``n`` is the commit's ROW count — an upper bound
    on distinct values, so the realized fpp is at or below the target."""
    import math

    n = max(1, n)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, min(max_bits, m))
    m = (m + 63) // 64 * 64  # whole 64-bit words (in-engine bit_or fold)
    k = max(1, min(8, round(m / n * math.log(2))))
    return m, k


def _bloom_position(value_str: str, seed: int, m: int) -> int:
    """Driver-side probe position: the same sha256-derived slot the write
    path computes in-engine (``_bloom_positions_cols``). 15 hex chars =
    60 bits, uniform mod m."""
    import hashlib

    h = hashlib.sha256(f"{value_str}|{seed}".encode()).hexdigest()
    return int(h[:15], 16) % m


def _bloom_positions_cols(col: str, k: int, m: int) -> list:
    """In-engine bloom slot expressions for column ``col`` — one per hash
    seed. MUST stay bit-identical to ``_bloom_position``: sha256 over
    '<value-as-string>|<seed>', first 15 hex chars as an integer, mod m.
    sha2/conv/substring are all JVM built-ins (no Python UDF on the write
    path); CAST(int AS STRING) and Python str(int) agree by construction
    (_BLOOM_TYPES excludes every type where they could diverge)."""
    import pyspark.sql.functions as F

    s = F.col(col).cast("string")
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.sha2(F.concat_ws("|", s, F.lit(str(i))), 256), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        )
        for i in range(k)
    ]


def _bloom_sidecar_dir(spec: TableSpec) -> str:
    return os.path.join(spec.path, "_bloom")


# ---------------------------------------------------------------------------
# Partition TRANSFORMS (Iceberg-style hidden partitioning): a TableSpec's
# partition_by may name transforms — "days(ts)", "hours(ts)", "months(ts)",
# "years(ts)", "bucket(16, user_id)", "truncate(1000, id)" — next to plain
# identity columns. Writers derive a HIDDEN hive column per transform (the
# source column stays in the data files; the hidden column exists only in
# directory names), readers never see it (each manifest pins the logical
# schema), and snapshot_read_where maps source-column predicates onto the
# hidden columns so hive pruning bites INSIDE each commit dir — partition
# evolution without polluting the table schema, the Iceberg contract.
# ---------------------------------------------------------------------------

import re as _re

_TRANSFORM_RE = _re.compile(
    r"^(years|months|days|hours|bucket|truncate)\((.*)\)$"
)

#: time transforms emit sliceable-prefix strings so bound mapping is pure
#: string arithmetic in BOTH engines (lexicographic == chronological)
_TIME_FMT = {
    "years": ("yyyy", 4),
    "months": ("yyyy-MM", 7),
    "days": ("yyyy-MM-dd", 10),
    "hours": ("yyyy-MM-dd-HH", 13),
}


def _parse_partition_spec(partition_by) -> list[tuple]:
    """[(hive_col, transform, source_col, arg)] — identity entries carry
    transform None and hive_col == source_col."""
    out = []
    for p in partition_by or ():
        m = _TRANSFORM_RE.match(str(p).strip())
        if not m:
            out.append((p, None, p, None))
            continue
        fn, inner = m.group(1), m.group(2)
        if fn in ("bucket", "truncate"):
            arg_s, col = inner.split(",", 1)
            arg, col = int(arg_s.strip()), col.strip()
            out.append((f"_p_{fn}{arg}_{col}", fn, col, arg))
        else:
            col = inner.strip()
            out.append((f"_p_{fn}_{col}", fn, col, None))
    return out


def _hive_partition_cols(spec: TableSpec) -> tuple[str, ...]:
    return tuple(h for h, _, _, _ in _parse_partition_spec(spec.partition_by))


def _bucket_id(value, n: int) -> int:
    """Driver-side bucket transform — MUST match the in-engine expression
    in _materialize_partitions (same sha256 canonical-string hash the
    bloom layer uses; Spark's xxhash64 is not reproducible driver-side)."""
    return _bloom_position(f"{value}|bucket", 0, n)


def _materialize_partitions(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Append the hidden hive columns a transform spec demands (no-op for
    identity-only specs)."""
    import pyspark.sql.functions as F

    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    for hive_col, fn, col, arg in _parse_partition_spec(spec.partition_by):
        if fn is None:
            continue
        if fn in _TIME_FMT:
            expr = F.date_format(F.col(col), _TIME_FMT[fn][0])
        elif fn == "bucket":
            expr = F.pmod(
                F.conv(
                    F.substring(
                        F.sha2(
                            F.concat_ws(
                                "|", F.col(col).cast("string"),
                                F.lit("bucket"), F.lit("0"),
                            ),
                            256,
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(arg),
            ).cast("int")
        elif fn == "truncate":
            if types.get(col) == "string":
                expr = F.substring(F.col(col), 1, arg)
            else:
                expr = (
                    F.col(col).cast("long")
                    - F.pmod(F.col(col).cast("long"), F.lit(arg))
                )
        else:  # pragma: no cover — regex admits only the above
            raise ValueError(f"unknown partition transform {fn!r}")
        df = df.withColumn(hive_col, expr)
    return df


def _hidden_partition_filters(
    spec: TableSpec,
    ranges: dict[str, tuple] | None,
    eq_in: dict[str, list] | None,
) -> list[tuple]:
    """Map source-column predicates onto hidden hive columns:
    [(hive_col, hive_type, lo, hi, values)] — lo/hi for monotonic
    transforms (time formats, numeric truncate), values for bucket
    equality/IN probes. Only exact mappings are emitted (a mapping that
    could drop rows is never produced; unmappable predicates simply skip
    hive pruning and stay exact via the residual filter)."""
    out = []
    for hive_col, fn, col, arg in _parse_partition_spec(spec.partition_by):
        if fn is None:
            continue
        rng = (ranges or {}).get(col)
        vals = (eq_in or {}).get(col)
        if fn in _TIME_FMT:
            width = _TIME_FMT[fn][1]

            def _fmt(v, is_hi):
                s = _dv_ser(v)
                if not isinstance(s, str):
                    return None
                # a bound SHORTER than the transform width (a date on an
                # hours transform) is only safe as a LOWER bound: the
                # short prefix sorts before every extension, so it never
                # over-prunes; as an upper bound it would drop the
                # boundary partition ("2026-04-01-00" > "2026-04-01") —
                # skip the hive bound and let the residual filter decide
                if is_hi and len(s) < width:
                    return None
                return s[:width].replace(" ", "-")

            if rng is not None:
                lo = _fmt(rng[0], False) if rng[0] is not None else None
                hi = _fmt(rng[1], True) if rng[1] is not None else None
                if lo is not None or hi is not None:
                    out.append((hive_col, "string", lo, hi, None))
        elif fn == "truncate":
            def _trunc(v):
                if isinstance(v, int) and not isinstance(v, bool):
                    return v - v % arg
                return None  # string/float bound: residual filter decides

            if rng is not None:
                lo = _trunc(rng[0])
                hi = _trunc(rng[1])
                if lo is not None or hi is not None:
                    out.append((hive_col, "long", lo, hi, None))
        elif fn == "bucket":
            probe_vals = None
            if rng is not None and rng[0] is not None and rng[0] == rng[1]:
                probe_vals = [rng[0]]
            elif vals:
                probe_vals = [v for v in vals if v is not None]
            if probe_vals:
                out.append(
                    (
                        hive_col,
                        "int",
                        None,
                        None,
                        sorted({_bucket_id(v, arg) for v in probe_vals}),
                    )
                )
    return out


def _collect_bloom(
    spark: SparkSession,
    spec: TableSpec,
    rel_dir: str,
    df_schema,
    bloom_for,
    fpp: float,
    max_bits: int,
    n_rows: int,
) -> str | None:
    """Build per-column bloom filters over the just-written commit dir and
    persist them as ONE sidecar JSON under ``<root>/_bloom/`` (Delta keeps
    bloom indexes in separate index files for the same reason — bitmaps
    would bloat the log). Returns the sidecar's table-relative path, or
    None when no requested column is bloom-eligible.

    Cost: one aggregation per column over ONLY the new commit. The bitmap
    folds IN-ENGINE (positions group into 64-bit words combined with
    bit_or), so the driver pulls at most m/64 words — bounded metadata
    (32k longs at the default cap), never the commit's value set."""
    import base64

    import pyspark.sql.functions as F

    import math

    eligible = {
        f.name
        for f in df_schema.fields
        if f.dataType.typeName() in _BLOOM_TYPES
        and f.name not in (spec.partition_by or ())
    }
    cols = [c for c in bloom_for if c in eligible]
    if not cols:
        return None
    # SATURATION GUARD: when the commit's row count forces the capped
    # bitmap past ~50% expected fill, the filter approaches all-bits-set —
    # every probe answers "maybe", zero skipping, but the build cost was
    # still paid. Skip building instead (no sidecar = conservative keep,
    # exactly like un-bloomed commits); raise bloom_max_bits for commits
    # this large. Measured: a saturated filter on a 10M-row commit cost
    # 3x the plain write and pruned nothing (tools/bloom_rehearsal.py).
    m, k = _bloom_params(n_rows, fpp, max_bits)
    if 1.0 - math.exp(-k * n_rows / m) > 0.5:
        return None
    part = spark.read.format(spec.format).load(os.path.join(spec.path, rel_dir))
    body: dict[str, dict] = {}
    for c in cols:
        words = (
            part.select(c)
            .where(F.col(c).isNotNull())
            .select(
                F.explode(F.array(*_bloom_positions_cols(c, k, m))).alias("p")
            )
            .select(
                F.expr("p div 64").alias("w"),
                F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("b"),
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("bits"))
            .collect()
        )
        bits = bytearray(m // 8)
        for r in words:
            w = int(r["w"])
            word = int(r["bits"]) & ((1 << 64) - 1)
            bits[w * 8 : (w + 1) * 8] = word.to_bytes(8, "little")
        body[c] = {
            "m": m,
            "k": k,
            "bits": base64.b64encode(bytes(bits)).decode("ascii"),
        }
    os.makedirs(_bloom_sidecar_dir(spec), exist_ok=True)
    name = rel_dir.split("/", 1)[1].replace("/", "__") + ".json"
    rel_path = f"_bloom/{name}"
    fd, tmp = tempfile.mkstemp(prefix=".bloom-", dir=_bloom_sidecar_dir(spec))
    with os.fdopen(fd, "w") as f:
        json.dump(body, f)
    os.replace(tmp, os.path.join(spec.path, rel_path))
    return rel_path


def _bloom_might_contain(
    spec: TableSpec, sidecar_rel: str, col: str, value, cache: dict
) -> bool:
    """Probe a commit's bloom sidecar for an equality value. True means
    'maybe present' (keep the dir); False PROVES absence (bloom filters
    have no false negatives). Missing sidecar/column → True (conservative,
    same contract as missing min/max stats)."""
    if not isinstance(value, (int, str)) or isinstance(value, bool):
        return True
    body = cache.get(sidecar_rel)
    if body is None:
        p = os.path.join(spec.path, sidecar_rel)
        if not os.path.exists(p):
            cache[sidecar_rel] = {}
            return True
        with open(p) as f:
            body = json.load(f)
        cache[sidecar_rel] = body
    ent = body.get(col)
    if not ent:
        return True
    import base64

    bits = base64.b64decode(ent["bits"])
    m, k = int(ent["m"]), int(ent["k"])
    s = str(value)
    for i in range(k):
        p = _bloom_position(s, i, m)
        if not (bits[p // 8] >> (p % 8)) & 1:
            return False
    return True


def _collect_stats(spark: SparkSession, spec: TableSpec, rel_dir: str,
                   df_schema, stats_cols) -> tuple[dict | None, int]:
    """Per-commit (min/max column stats, row count) for manifest-level
    data skipping and metadata-only COUNT — the snapshot analogue of
    Delta's per-file stats + numRecords. Computed by reading back ONLY
    the just-written commit dir (cost ∝ commit size, never the table;
    parquet aggregate pushdown serves min/max/count from footers where
    eligible, so this is usually a footer read). Values serialize
    JSON-native; dates/timestamps as ISO strings (lexicographic ==
    chronological)."""
    import pyspark.sql.functions as F

    # partition columns are INCLUDED: the read-back reconstructs their
    # values from the hive path, min/max are as valid as any data column,
    # and they are what proves two DML writers touching disjoint
    # PARTITIONS compatible (disjoint-DML rebase) — plus they let
    # pruned_dirs skip commits by partition value
    eligible = [
        f.name
        for f in df_schema.fields
        if f.dataType.typeName() in _STATS_TYPES
    ]
    cols = eligible if stats_cols is None else [c for c in stats_cols if c in eligible]
    part = spark.read.format(spec.format).load(os.path.join(spec.path, rel_dir))
    aggs = [F.count(F.lit(1)).alias("_nrows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"_mn_{c}"))
        aggs.append(F.max(c).alias(f"_mx_{c}"))
    row = part.agg(*aggs).collect()[0]
    n_rows = int(row["_nrows"])
    if not cols:
        return None, n_rows

    def _ser(v):
        import datetime as _dt

        if v is None or isinstance(v, (int, float, str, bool)):
            return v
        if isinstance(v, _dt.datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, _dt.date):
            return v.isoformat()
        return str(v)

    return {
        c: {"min": _ser(row[f"_mn_{c}"]), "max": _ser(row[f"_mx_{c}"])}
        for c in cols
    }, n_rows


def _range_stats_disjoint(st: dict | None, ranges: dict[str, tuple]) -> bool:
    """True when a commit dir's min/max stats PROVE it disjoint from every
    row matching ``ranges`` (ALL ranges must hold for a row to match, so
    ONE provably-empty column suffices). Missing stats, all-null columns,
    and incomparable bounds all return False — pruning stays advisory."""
    if not st:
        return False
    for col, (lo, hi) in ranges.items():
        cs = st.get(col)
        if not cs or cs["min"] is None or cs["max"] is None:
            continue
        # stats serialize dates/timestamps as ISO strings — compare
        # datetime bounds through the same serialization (lexicographic
        # == chronological); anything still incomparable keeps the dir
        try:
            lo_c = _dv_ser(lo) if isinstance(cs["max"], str) else lo
            hi_c = _dv_ser(hi) if isinstance(cs["min"], str) else hi
            if (lo_c is not None and cs["max"] < lo_c) or (
                hi_c is not None and cs["min"] > hi_c
            ):
                return True
        except TypeError:
            continue
    return False


def pruned_dirs(
    spec: TableSpec,
    ranges: dict[str, tuple],
    version: int | None = None,
    eq_in: dict[str, list] | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) table-relative data dirs for a stats-pruned read.

    ``ranges``: {col: (lo, hi)} — None on either side means unbounded. A
    dir is SKIPPED only when its manifest stats PROVE the range disjoint
    (dir.max < lo or dir.min > hi); dirs without stats for the column are
    kept conservatively, and a NULL min/max (all-null commit column) also
    keeps the dir (nulls don't order).

    EQUALITY ranges (lo == hi, non-None) additionally consult the
    commit's bloom sidecar when the table was written with ``bloom_for``
    on that column: a negative probe PROVES the value absent and skips
    the dir even where min/max overlap (Delta's bloom-filter index — the
    point-lookup case range stats can't prune on a high-cardinality
    unsorted key). Bloom filters have no false negatives, so pruning
    stays exact; a false positive only keeps an extra dir.

    ``eq_in``: {col: [v, ...]} — IN-set point lookups. A dir is kept only
    if AT LEAST ONE value survives its min/max envelope AND (when a bloom
    sidecar exists) at least one surviving value maybe-matches the bloom.
    One pruning pass serves the whole value list — the multi-key fetch a
    feature-store or training-example join front-ends at 100 TB."""
    v = current_version(spec) if version is None else version
    if v is None:
        raise ValueError(f"no snapshots at {spec.path}")
    manifest = _read_manifest(spec, v)
    cmap = _col_map(manifest)
    if cmap:  # stats/blooms key PHYSICAL names: translate probe columns
        ranges = {cmap.get(c, c): b for c, b in ranges.items()}
        if eq_in:
            eq_in = {cmap.get(c, c): vs for c, vs in eq_in.items()}
    per_dir = manifest.get("stats", {})
    blooms = manifest.get("bloom", {})
    eq_probes = {
        col: lo
        for col, (lo, hi) in ranges.items()
        if lo is not None and hi is not None and lo == hi
    }
    bloom_cache: dict = {}
    kept, skipped = [], []
    for d in manifest["dirs"]:
        st = per_dir.get(d)
        disjoint = _range_stats_disjoint(st, ranges)
        if not disjoint and eq_probes and d in blooms:
            for col, val in eq_probes.items():
                if not _bloom_might_contain(
                    spec, blooms[d], col, val, bloom_cache
                ):
                    disjoint = True
                    break
        if not disjoint and eq_in:
            for col, vals in eq_in.items():
                candidates = [v for v in vals if v is not None]
                cs = (st or {}).get(col)
                if cs and cs["min"] is not None and cs["max"] is not None:
                    surviving = []
                    for v in candidates:
                        try:
                            if cs["min"] <= v <= cs["max"]:
                                surviving.append(v)
                        except TypeError:  # incomparable: keep the value
                            surviving.append(v)
                    candidates = surviving
                if candidates and d in blooms:
                    candidates = [
                        v
                        for v in candidates
                        if _bloom_might_contain(
                            spec, blooms[d], col, v, bloom_cache
                        )
                    ]
                if not candidates:
                    disjoint = True
                    break
        (skipped if disjoint else kept).append(d)
    return kept, skipped


def snapshot_read_where(
    spark: SparkSession,
    spec: TableSpec,
    ranges: dict[str, tuple] | None = None,
    version: int | None = None,
    eq_in: dict[str, list] | None = None,
) -> DataFrame:
    """Stats-pruned snapshot read: plan ONLY the commit dirs whose
    manifest min/max intersect every range in ``ranges`` (and, for
    ``eq_in`` IN-set lookups, whose stats/bloom admit at least one listed
    value), then apply the residual row filter — exact semantics, I/O ∝
    matching commits (the manifest-level form of Delta data skipping; at
    100 TB an append-mostly table prunes to the commits that can contain
    the key range without opening the others' footers at all)."""
    import pyspark.sql.functions as F

    ranges = ranges or {}
    v = current_version(spec) if version is None else version
    kept, _ = pruned_dirs(spec, ranges, v, eq_in=eq_in)
    manifest = _read_manifest(spec, v)
    if not kept:
        return _empty_like(spark, spec, manifest)
    # transform-partitioned specs: map source-column predicates onto the
    # hidden hive columns so Spark's partition pruning drops whole hive
    # dirs INSIDE each kept commit — the Iceberg hidden-partitioning
    # payoff; the residual source-column filter keeps semantics exact
    hive_filters = _hidden_partition_filters(spec, ranges, eq_in)
    out = _load_dirs(
        spark,
        spec,
        manifest,
        kept,
        hive_fields=[(h, t) for h, t, _, _, _ in hive_filters] or None,
    )
    for h, _t, lo, hi, vals in hive_filters:
        if vals is not None:
            out = out.filter(F.col(h).isin(vals))
        else:
            if lo is not None:
                out = out.filter(F.col(h) >= F.lit(lo))
            if hi is not None:
                out = out.filter(F.col(h) <= F.lit(hi))
    if hive_filters:
        out = out.drop(*[h for h, _, _, _, _ in hive_filters])
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            out = out.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(col) <= F.lit(hi))
    for col, vals in (eq_in or {}).items():
        out = out.filter(F.col(col).isin(list(vals)))
    return out


# ---------------------------------------------------------------------------
# COLUMN MAPPING (Delta's name-mapping mode): metadata-only RENAME/DROP
# COLUMN. Parquet files always carry a column's PHYSICAL name — the name it
# had at the table's first write; the manifest's "column_map"
# {logical: physical} translates at the boundaries. A table that never
# renames has no map and every path below is a no-op passthrough.
# ---------------------------------------------------------------------------


def _col_map(manifest: dict) -> dict[str, str]:
    """{logical: physical} for renamed columns (identity entries omitted)."""
    return dict(manifest.get("column_map", {}))


def _to_physical(manifest: dict, logical: str) -> str:
    return _col_map(manifest).get(logical, logical)


def rename_column(spec: TableSpec, old: str, new: str) -> int:
    """``ALTER TABLE ... RENAME COLUMN old TO new`` — metadata-only, zero
    data rewritten (Delta's column-mapping rename): the manifest schema
    renames the field and records the LOGICAL→PHYSICAL name mapping;
    every read path translates at load, every write path translates
    before the parquet writer, so files keep the physical name forever.

    Refused (honest limits, each lifts after the named maintenance op)
    when the column participates in a CHECK constraint (drop/re-add it
    under the new name), a live deletion vector (``purge_deletes``
    first), or the partition spec (partition layout is physical)."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    head = _read_manifest(spec, cur)
    if "schema" not in head:
        raise ValueError("rename_column needs a schema-pinned table")
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(head["schema"])
    names = schema.fieldNames()
    if old not in names:
        raise ValueError(f"no column {old!r} at {spec.path}")
    if new in names:
        raise ValueError(f"column {new!r} already exists at {spec.path}")
    for cname, cexpr in head.get("constraints", {}).items():
        if _re.search(rf"\b{_re.escape(old)}\b", cexpr):
            raise ValueError(
                f"column {old!r} is referenced by CHECK constraint "
                f"{cname!r} — drop and re-add the constraint under the "
                "new name first"
            )
    for e in head.get("dv", []):
        if old in e["ranges"]:
            raise ValueError(
                f"column {old!r} is referenced by a live deletion vector "
                "— run purge_deletes first"
            )
    for _h, _fn, src_col, _a in _parse_partition_spec(spec.partition_by):
        if src_col == old:
            raise ValueError(
                f"column {old!r} drives the partition spec — partition "
                "layout is physical and cannot be renamed in place"
            )
    cmap = _col_map(head)
    physical = cmap.pop(old, old)  # a→b→c composes to {c: a}
    cmap[new] = physical
    fields = [
        {**f.jsonValue(), "name": new} if f.name == old else f.jsonValue()
        for f in schema.fields
    ]
    manifest = _metadata_commit_body(spec, cur, mode="rename_column")
    manifest["schema"] = {"type": "struct", "fields": fields}
    manifest["column_map"] = {
        k: v for k, v in cmap.items() if k != v
    } or None
    if manifest["column_map"] is None:
        manifest.pop("column_map")
    _commit(spec, cur + 1, manifest)
    return cur + 1


def drop_column(spec: TableSpec, col: str) -> int:
    """``ALTER TABLE ... DROP COLUMN`` — metadata-only, zero data
    rewritten: the manifest schema drops the field, so reads simply never
    project it (parquet is columnar — the bytes stay until OPTIMIZE
    rewrites them, exactly Delta's contract). Same refusals as rename for
    constraint / deletion-vector / partition-spec participants."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    head = _read_manifest(spec, cur)
    if "schema" not in head:
        raise ValueError("drop_column needs a schema-pinned table")
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(head["schema"])
    if col not in schema.fieldNames():
        raise ValueError(f"no column {col!r} at {spec.path}")
    if len(schema.fields) == 1:
        raise ValueError("cannot drop the only column")
    for cname, cexpr in head.get("constraints", {}).items():
        if _re.search(rf"\b{_re.escape(col)}\b", cexpr):
            raise ValueError(
                f"column {col!r} is referenced by CHECK constraint "
                f"{cname!r} — drop the constraint first"
            )
    for e in head.get("dv", []):
        if col in e["ranges"]:
            raise ValueError(
                f"column {col!r} is referenced by a live deletion vector "
                "— run purge_deletes first"
            )
    for _h, _fn, src_col, _a in _parse_partition_spec(spec.partition_by):
        if src_col == col:
            raise ValueError(
                f"column {col!r} drives the partition spec and cannot drop"
            )
    manifest = _metadata_commit_body(spec, cur, mode="drop_column")
    manifest["schema"] = {
        "type": "struct",
        "fields": [f.jsonValue() for f in schema.fields if f.name != col],
    }
    cmap = _col_map(head)
    cmap.pop(col, None)
    if cmap:
        manifest["column_map"] = cmap
    else:
        manifest.pop("column_map", None)
    _commit(spec, cur + 1, manifest)
    return cur + 1


def _dv_matched(ranges: dict):
    """Row-matches-DV-predicate expression (AND of bounds; NULL never
    matches, so a DV can never delete a row the predicate can't see)."""
    import pyspark.sql.functions as F

    m = F.lit(True)
    for col, bounds in ranges.items():
        lo, hi = bounds[0], bounds[1]
        if lo is not None:
            m = m & (F.col(col) >= F.lit(lo))
        if hi is not None:
            m = m & (F.col(col) <= F.lit(hi))
    return F.coalesce(m, F.lit(False))


def _load_dirs(
    spark: SparkSession,
    spec: TableSpec,
    manifest: dict,
    rel_dirs: list[str],
    hive_fields: list[tuple] | None = None,
) -> DataFrame:
    """Load a manifest's commit dirs with DELETION VECTORS applied — the
    one read path every consumer (snapshot_read, read_where, DML rewrites,
    purge) goes through, so merge-on-read deletes can never resurrect.

    Each ``dv`` entry is scoped to the dirs that existed when the delete
    committed: rows from those dirs matching the entry's predicate are
    filtered out; dirs written later are untouched (a re-inserted key is
    visible — Delta's DV scoping, expressed at predicate granularity).
    Dirs are grouped by their applicable-entry signature so the table
    loads in O(distinct signatures) scans, not O(dirs).

    ``hive_fields``: [(name, spark_type_str)] — HIDDEN transform-partition
    columns to surface next to the pinned schema (directory-derived; used
    by snapshot_read_where for intra-commit hive pruning, dropped before
    the frame is returned to the caller)."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    cmap = _col_map(manifest)  # {logical: physical} for renamed columns
    reader = spark.read.format(spec.format)
    if "schema" in manifest:
        schema = StructType.fromJson(manifest["schema"])
        if cmap:
            # parquet files carry PHYSICAL names: read physically,
            # alias back to logical after load
            phys_fields = [
                {**f.jsonValue(), "name": cmap.get(f.name, f.name)}
                for f in schema.fields
            ]
            schema = StructType.fromJson(
                {"type": "struct", "fields": phys_fields}
            )
        for name, t in hive_fields or []:
            if name not in schema.fieldNames():
                schema = schema.add(name, _parse_datatype_string(t))
        reader = reader.schema(schema)
    if not rel_dirs:
        return _empty_like(spark, spec, manifest)
    dv = manifest.get("dv", [])
    dv_dirsets = [set(e["dirs"]) for e in dv]
    # hidden transform-partition columns: Spark appends discovered hive
    # columns even when the specified schema omits them — drop any the
    # caller did not explicitly request
    hidden = {
        h
        for h, fn, _, _ in _parse_partition_spec(spec.partition_by)
        if fn is not None
    } - {name for name, _ in hive_fields or []}
    groups: dict[tuple, list[str]] = {}
    for d in rel_dirs:
        sig = tuple(i for i, ds in enumerate(dv_dirsets) if d in ds)
        groups.setdefault(sig, []).append(d)
    out = None
    for sig, ds in groups.items():
        paths = [os.path.join(spec.path, d) for d in ds]
        if spec.partition_by:
            # hive-partitioned commits: partition-column discovery roots
            # at each commit dir — load per-dir and union (lazy)
            part = None
            for p in paths:
                x = reader.load(p)
                part = x if part is None else part.unionByName(x)
        else:
            part = reader.load(paths)
        if hidden:
            part = part.drop(*hidden)
        if cmap:
            import pyspark.sql.functions as F

            rev = {p: l for l, p in cmap.items()}
            part = part.select(
                *[
                    F.col(c).alias(rev.get(c, c))
                    for c in part.columns
                ]
            )
        for i in sig:
            part = part.filter(~_dv_matched(dv[i]["ranges"]))
        out = part if out is None else out.unionByName(part)
    return out


def _empty_like(spark: SparkSession, spec: TableSpec, manifest: dict) -> DataFrame:
    """Zero-row frame with the manifest's schema (every dir pruned)."""
    from pyspark.sql.types import StructType

    if "schema" in manifest:
        return spark.createDataFrame([], StructType.fromJson(manifest["schema"]))
    # legacy manifest without schema: fall back to reading one dir's schema
    d = os.path.join(spec.path, manifest["dirs"][0])
    return spark.read.format(spec.format).load(d).limit(0)


def _commit(spec: TableSpec, version: int, manifest: dict) -> None:
    """Publish v<version> atomically; raise SnapshotConflictError if a
    concurrent writer already owns that version (put-if-absent via
    ``os.link`` — the existence check and the publish are ONE syscall, no
    check-then-rename race).

    Checkpoint-race guard: ``checkpoint_manifest`` folds loose manifests
    into c<N>.json and DELETES them, so a lagging writer racing for a
    folded version would find no v<N>.json and its os.link would succeed
    — publishing a second, conflicting manifest for an already-committed
    version. Two checks close this: (1) before writing, a version at or
    below the latest checkpoint is rejected outright; (2) after a
    successful link, the checkpoint is re-read — if a checkpoint now
    covers this version with a DIFFERENT body (a fold completed inside
    the check-to-link window and had already folded the original
    writer's manifest), the just-published loose file is retracted and
    the commit aborts. An equal body means the fold picked up THIS
    manifest (it linked first and was folded) — that commit stands."""
    d = _manifest_dir(spec)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"v{version}.json")
    cpv = _latest_checkpoint_version(spec)
    if cpv is not None and version <= cpv:
        raise SnapshotConflictError(
            f"snapshot v{version} at {spec.path} is already covered by "
            f"checkpoint c{cpv} — a concurrent writer committed it and "
            "a checkpoint folded it"
        )
    if "committed_at" not in manifest:
        import datetime as _dt

        # wall-clock commit time (UTC ISO): powers timestampAsOf time
        # travel and RETAIN-hours vacuum; never part of checked outputs
        manifest["committed_at"] = _dt.datetime.now(
            _dt.timezone.utc
        ).isoformat(sep=" ", timespec="seconds")
    # protocol stamp: the features this manifest's content requires, plus
    # any already present (a rollback republishing an old manifest keeps
    # its stamps) — what lets a FUTURE build's tables refuse downlevel
    # readers/writers instead of being misread
    need_r, need_w = _required_features(manifest)
    need_r = sorted(set(manifest.get("reader_features", [])) | set(need_r))
    need_w = sorted(set(manifest.get("writer_features", [])) | set(need_w))
    if need_r:
        manifest["reader_features"] = need_r
    if need_w:
        manifest["writer_features"] = need_w
    fd, tmp = tempfile.mkstemp(prefix=f".v{version}-", dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise SnapshotConflictError(
                f"snapshot v{version} at {spec.path} was committed by a "
                "concurrent writer"
            ) from None
    finally:
        os.unlink(tmp)
    cpv = _latest_checkpoint_version(spec)
    if cpv is not None and version <= cpv:
        cp = _latest_checkpoint(spec)  # body parsed only on the rare trigger
        # canonical-JSON compare (json.dumps stringifies int keys the same
        # way the reload path does, so a folded copy of THIS manifest
        # compares equal)
        ours = json.dumps(manifest, sort_keys=True)
        folded = cp[1].get(version)
        if folded is None or json.dumps(folded, sort_keys=True) != ours:
            try:
                os.unlink(final)
            except FileNotFoundError:
                pass  # a newer fold already consumed (and deleted) it
            raise SnapshotConflictError(
                f"snapshot v{version} at {spec.path} raced a checkpoint "
                "fold of a concurrent writer's commit; retracted"
            )


def snapshot_count(spec: TableSpec, version: int | None = None) -> int | None:
    """Metadata-only COUNT(*): sum of the manifest's per-commit row counts
    — zero data files opened, the way Delta answers SELECT COUNT(*) from
    its log. Returns None when any referenced dir predates row-count
    stats (caller falls back to a scan); 0 for an empty table."""
    v = current_version(spec) if version is None else version
    if v is None:
        return 0
    m = _read_manifest(spec, v)
    rows = m.get("rows", {})
    if any(d not in rows for d in m["dirs"]):
        return None
    total = sum(int(rows[d]) for d in m["dirs"])
    # deletion vectors record their exact deleted-row count (computed at
    # delete time against the then-live rows, so overlapping vectors
    # never double-subtract); a partially-trimmed vector (n=None) forces
    # the scan fallback until purge
    for e in m.get("dv", []):
        if e.get("n") is None:
            return None
        total -= int(e["n"])
    return total


def snapshot_min_max(
    spec: TableSpec, col: str, version: int | None = None
) -> tuple | None:
    """Metadata-only MIN/MAX over one column — the manifest-stats answer
    to ``SELECT MIN(col), MAX(col)``, zero data files opened. Returns
    None (caller falls back to a scan) when any referenced dir lacks
    stats for the column, or when the version carries deletion vectors
    (a deleted row might hold an extremum — the stats become an envelope,
    not an answer). All-null columns return (None, None) only when every
    dir recorded nulls; a mix keeps the non-null extrema (matching SQL
    MIN/MAX null semantics)."""
    v = current_version(spec) if version is None else version
    if v is None:
        return None
    m = _read_manifest(spec, v)
    if m.get("dv"):
        return None
    col = _to_physical(m, col)  # stats key physical names
    stats = m.get("stats", {})
    lo = hi = None
    for d in m["dirs"]:
        cs = stats.get(d, {}).get(col)
        if cs is None:
            return None
        if cs["min"] is None or cs["max"] is None:
            continue  # all-null commit column: contributes nothing
        lo = cs["min"] if lo is None else min(lo, cs["min"])
        hi = cs["max"] if hi is None else max(hi, cs["max"])
    return (lo, hi)


def last_txn_version(spec: TableSpec, app_id: str) -> int | None:
    """Highest transaction version the table head has recorded for
    ``app_id`` (Delta's ``txnAppId``/``txnVersion`` readback — what
    ``foreachBatch`` writers consult to make redelivered micro-batches
    no-ops). None if the table is empty or has never seen the app."""
    cur = current_version(spec)
    if cur is None:
        return None
    v = _read_manifest(spec, cur).get("txns", {}).get(app_id)
    return None if v is None else int(v)


def table_constraints(spec: TableSpec) -> dict[str, str]:
    """CHECK constraints recorded on the table head: {name: sql_expr}.
    Empty table or never-constrained table → {}."""
    cur = current_version(spec)
    if cur is None:
        return {}
    return dict(_read_manifest(spec, cur).get("constraints", {}))


def _enforce_constraints(df: DataFrame, constraints: dict[str, str]) -> None:
    """Raise ConstraintViolationError if any row makes any constraint
    expression FALSE (SQL-standard CHECK: NULL passes). All constraints
    evaluate in ONE aggregate pass over ``df``."""
    if not constraints:
        return
    import pyspark.sql.functions as F

    aggs = [
        F.sum(
            F.when(~F.coalesce(F.expr(e), F.lit(True)), 1).otherwise(0)
        ).alias(name)
        for name, e in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {
        name: int(row[name] or 0)
        for name in constraints
        if (row[name] or 0) > 0
    }
    if bad:
        detail = ", ".join(
            f"{n} [{constraints[n]}]: {c} rows" for n, c in sorted(bad.items())
        )
        raise ConstraintViolationError(
            f"write violates CHECK constraint(s): {detail}"
        )


def add_check_constraint(
    spark: SparkSession, spec: TableSpec, name: str, expr: str
) -> int:
    """Delta's ``ALTER TABLE ... ADD CONSTRAINT name CHECK (expr)``:
    validates EXISTING table data against ``expr`` (one scan — rows where
    the expression is FALSE violate; NULL passes, per the SQL standard),
    then commits a metadata-only version carrying the constraint. Every
    subsequent ``snapshot_write`` (append and overwrite alike — constraints
    are table-level properties, not file-set state) pre-checks its rows and
    refuses the commit on violation. Returns the new version."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(
            f"cannot add constraint to empty table at {spec.path}"
        )
    cons = table_constraints(spec)
    if name in cons:
        raise ValueError(
            f"constraint {name!r} already exists: {cons[name]!r}"
        )
    try:
        _enforce_constraints(snapshot_read(spark, spec), {name: expr})
    except ConstraintViolationError as e:
        raise ConstraintViolationError(
            f"ADD CONSTRAINT {name} rejected — existing data violates it: {e}"
        ) from None
    manifest = _metadata_commit_body(spec, cur, mode="set_constraint")
    manifest["constraints"] = {**cons, name: expr}
    _commit(spec, cur + 1, manifest)
    return cur + 1


def _metadata_commit_body(spec: TableSpec, cur: int, mode: str) -> dict:
    """Manifest for a metadata-only commit: the head's file-set state
    (dirs/schema/stats/rows) and table-level state (txns/constraints)
    carried verbatim under a new version."""
    head = _read_manifest(spec, cur)
    _check_features(head, spec.path, "writer")
    manifest = {"version": cur + 1, "mode": mode, "parent": cur,
                "dirs": head["dirs"]}
    for k in (
        "schema", "stats", "rows", "txns", "constraints", "bloom", "dv",
        "column_map",
    ):
        if k in head:
            manifest[k] = head[k]
    return manifest


def drop_check_constraint(spec: TableSpec, name: str) -> int:
    """``ALTER TABLE ... DROP CONSTRAINT``: metadata-only commit without
    the named constraint. Returns the new version."""
    cur = current_version(spec)
    cons = table_constraints(spec)
    if name not in cons:
        raise ValueError(f"no constraint {name!r} at {spec.path}")
    del cons[name]
    manifest = _metadata_commit_body(spec, cur, mode="drop_constraint")
    if cons:
        manifest["constraints"] = cons
    else:
        manifest.pop("constraints", None)
    _commit(spec, cur + 1, manifest)
    return cur + 1


def snapshot_write_txn(
    df: DataFrame,
    spec: TableSpec,
    app_id: str,
    txn_version: int,
    mode: str = "append",
    **kwargs,
) -> int:
    """Idempotent transactional write — Delta's exactly-once sink contract
    (``txnAppId`` + ``txnVersion`` on the commit): if the table head
    already records ``app_id`` at a version >= ``txn_version``, the write
    is a NO-OP (no data files written, no commit) and the current version
    is returned. Otherwise commits like ``snapshot_write`` with the
    (app_id, txn_version) pair folded into the manifest's ``txns`` map.

    This is what turns at-least-once micro-batch delivery (foreachBatch
    redelivers a batch whenever the previous attempt crashed between sink
    write and checkpoint commit) into exactly-once TABLE state: the batch
    id is the txn version, so a redelivered batch finds itself already
    recorded and skips. The check is repeated inside the commit-retry loop
    against the freshly-read head, so two racing deliveries of the same
    batch cannot both commit — the loser's rebase sees the winner's txn
    record and backs off (its orphaned data dir is unreferenced by any
    manifest; ``vacuum_snapshots`` reaps it).
    """
    seen = last_txn_version(spec, app_id)
    if seen is not None and seen >= txn_version:
        return current_version(spec)
    return snapshot_write(
        df, spec, mode=mode, _txn=(str(app_id), int(txn_version)), **kwargs
    )


def snapshot_write(
    df: DataFrame,
    spec: TableSpec,
    mode: str = "append",
    max_retries: int = 10,
    merge_schema: bool = False,
    stats_cols: tuple | None = None,
    bloom_for: tuple | None = None,
    bloom_fpp: float = 0.001,
    bloom_max_bits: int = _BLOOM_MAX_BITS_DEFAULT,
    _pre_commit=None,
    _txn: tuple[str, int] | None = None,
    expected_version: int | None = None,
    cdf_parts: tuple | None = None,
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version won.

    ``mode='append'`` adds to the head version's file set and REBASES on
    commit conflict (re-reads the new head, reuses its already-written
    data dir, retries up to ``max_retries``); ``mode='overwrite'``
    replaces the file set and ABORTS on conflict — an overwrite that
    auto-rebased would silently discard a commit it never read. Either
    way previous versions stay intact and readable.

    SCHEMA-ON-WRITE (Delta's enforcement contract): an append whose
    schema drifts from the table schema raises ``SchemaMismatchError``
    unless ``merge_schema=True``, which evolves ADDITIVELY — new columns
    append to the table schema, existing columns keep their types (a type
    change is always a conflict). Each manifest pins the schema its
    version is read with, so evolution never rewrites old data: readers
    of the evolved head see nulls where old files lack the new columns,
    and time travel to a pre-evolution version sees the old schema.
    ``overwrite`` replaces the schema outright (overwriteSchema).

    ``stats_cols`` selects the columns whose per-commit min/max land in
    the manifest for data skipping (``snapshot_read_where``): None (the
    default) auto-collects every atomic non-partition column, ``()``
    disables stats for this commit (the dir is then never pruned). Stats
    cost one aggregate over ONLY the new commit's files.

    ``bloom_for`` names integer/string columns to index with a per-commit
    BLOOM FILTER (Delta's bloom-filter index): equality probes in
    ``pruned_dirs``/``snapshot_read_where`` (``{col: (v, v)}``) then skip
    commits that provably lack the value — the point-lookup case min/max
    can't prune on a high-cardinality unsorted key. Bitmaps live in
    ``_bloom/`` sidecar files (the manifest holds pointers, staying
    small); geometry auto-sizes from the commit's row count at
    ``bloom_fpp``, capped at ``bloom_max_bits`` bits per column. Cost:
    one distinct-aggregate per bloomed column over only the new commit.

    ``_pre_commit`` is a test seam invoked once between the data write
    and the first commit attempt (deterministic conflict injection).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_write mode must be append|overwrite, got {mode!r}")
    from pyspark.sql.types import StructType

    cur = current_version(spec)
    # optimistic-concurrency CAS for read-modify-write overwrites (the
    # matview refresher's merge): the caller read table state at
    # expected_version and its new state is only valid against THAT
    # head. The cheap check here fails fast; the airtight guarantee is
    # the put-if-absent commit at expected_version + 1 below — if ANY
    # writer advanced the table after this read, that slot is taken and
    # the overwrite aborts instead of silently discarding the
    # interleaved commit. (Without this, a competitor finishing BEFORE
    # our current_version() read is invisible: we would overwrite its
    # merged state from a stale read — the double-fold race the dueling
    # refresher chaos test caught.)
    if expected_version is not None and cur != expected_version:
        raise SnapshotConflictError(
            f"optimistic overwrite at {spec.path}: caller read state at "
            f"v{expected_version} but the head is now "
            f"v{cur} — re-read and retry"
        )
    if cur is not None:  # protocol gate: a writer missing a feature the
        # table head requires must not commit (even an overwrite — it
        # must first prove it can read what it replaces)
        _check_features(_read_manifest(spec, cur), spec.path, "writer")
    commit_schema = df.schema
    if cur is not None and mode == "append":
        head = _read_manifest(spec, cur)
        if "schema" in head:
            table_schema = StructType.fromJson(head["schema"])
            if _same_columns(df.schema, table_schema):
                commit_schema = table_schema  # keep the canonical order
            else:
                if not merge_schema:
                    got = {f.name: str(f.dataType) for f in df.schema.fields}
                    want = {f.name: str(f.dataType) for f in table_schema.fields}
                    drift = sorted(
                        set(got.items()) ^ set(want.items()),
                    )
                    raise SchemaMismatchError(
                        f"append schema drifts from table schema at "
                        f"{spec.path}: {drift}; pass merge_schema=True to "
                        "evolve additively or mode='overwrite' to replace"
                    )
                commit_schema = _merge_schemas(table_schema, df.schema)
    # CHECK constraints are table-level properties enforced on EVERY write
    # mode (one aggregate pass over df, before any data lands); the rebase
    # loop re-validates constraints a concurrent commit added meanwhile
    head_cons = {} if cur is None else _read_manifest(spec, cur).get(
        "constraints", {}
    )
    _enforce_constraints(df, head_cons)
    validated_cons = set(head_cons.items())
    version = 0 if cur is None else cur + 1
    token = uuid.uuid4().hex[:8]
    rel_dir = f"data/b{version}-{token}"
    # parquet files always carry PHYSICAL column names (column mapping):
    # translate renamed columns before the writer; stats and blooms key
    # physically too (pruned_dirs translates probe names at lookup)
    head_cmap = {} if cur is None else _col_map(_read_manifest(spec, cur))
    write_df = df
    if head_cmap and mode == "append":
        import pyspark.sql.functions as F

        write_df = df.select(
            *[F.col(c).alias(head_cmap.get(c, c)) for c in df.columns]
        )
    writer = (
        _materialize_partitions(write_df, spec)
        .write.format(spec.format)
        .mode("errorifexists")
    )
    if spec.partition_by:
        writer = writer.partitionBy(*_hive_partition_cols(spec))
    writer.save(os.path.join(spec.path, rel_dir))
    spark = df.sparkSession
    # row count is always collected (Delta's numRecords — it is what makes
    # snapshot_count metadata-only); min/max stats honor stats_cols
    phys_stats_cols = stats_cols
    if head_cmap and mode == "append" and stats_cols is not None:
        phys_stats_cols = tuple(head_cmap.get(c, c) for c in stats_cols)
    dir_stats, dir_rows = _collect_stats(
        spark, spec, rel_dir, write_df.schema, phys_stats_cols
    )
    bloom_file = None
    if bloom_for:
        phys_bloom = tuple(
            head_cmap.get(c, c) if mode == "append" else c for c in bloom_for
        )
        bloom_file = _collect_bloom(
            spark, spec, rel_dir, write_df.schema, phys_bloom,
            bloom_fpp, bloom_max_bits, dir_rows,
        )
    cdf_entry = None
    if cdf_parts is not None:
        # only an OVERWRITE can carry caller-computed change rows: an
        # append's delta IS its new dirs (span diffs read them directly),
        # and append rebases would invalidate a precomputed delta anyway.
        # The matview refresher uses this to stamp each refresh commit
        # with its O(changed groups) state delta, so a CASCADE child's
        # snapshot_diff of the parent view never re-reads two full
        # versions (VERDICT r12 items 1/5).
        if mode != "overwrite":
            raise ValueError("cdf_parts requires mode='overwrite'")
        removed_df, added_df = cdf_parts
        if removed_df is not None or added_df is not None:
            cdf_entry = _write_cdf_sidecar(
                spec, f"c{version}-{token}", removed_df, added_df,
                commit_schema.jsonValue(),
            )
        else:
            cdf_entry = {"dir": None}
    if _pre_commit is not None:
        _pre_commit()
    for _ in range(max_retries + 1):
        head_m = None if cur is None else _read_manifest(spec, cur)
        # txns survive EVERY write mode (Delta keeps SetTransaction
        # actions across appends and overwrites alike — app progress is
        # table-level state, not file-set state)
        txns = {} if head_m is None else dict(head_m.get("txns", {}))
        # constraints survive every write mode too; a rebase may meet a
        # constraint a concurrent commit just added — validate the fresh
        # ones before adopting them
        cons = {} if head_m is None else dict(head_m.get("constraints", {}))
        fresh_cons = {
            n: e for n, e in cons.items() if (n, e) not in validated_cons
        }
        _enforce_constraints(df, fresh_cons)
        validated_cons |= set(fresh_cons.items())
        if head_m is None or mode == "overwrite":
            prev_dirs, prev_stats, prev_rows = [], {}, {}
        else:
            prev_dirs = head_m["dirs"]
            prev_stats = head_m.get("stats", {})
            prev_rows = head_m.get("rows", {})
        if _txn is not None:
            app_id, txn_v = _txn
            seen = txns.get(app_id)
            if seen is not None and int(seen) >= txn_v:
                # a racing delivery of this very batch already committed
                # (or a prior attempt crashed AFTER its commit): the table
                # already contains the batch — back off, leaving our data
                # dir orphaned for vacuum
                return cur
            txns[app_id] = txn_v
        stats = {d: s for d, s in prev_stats.items() if d in set(prev_dirs)}
        if dir_stats:
            stats[rel_dir] = dir_stats
        rows = {d: r for d, r in prev_rows.items() if d in set(prev_dirs)}
        rows[rel_dir] = dir_rows
        prev_bloom = {} if head_m is None or mode == "overwrite" else dict(
            head_m.get("bloom", {})
        )
        bloom = {d: p for d, p in prev_bloom.items() if d in set(prev_dirs)}
        if bloom_file:
            bloom[rel_dir] = bloom_file
        manifest = {
            "version": version,
            "mode": mode,
            "dirs": [*prev_dirs, rel_dir],
            "parent": cur,
            "schema": commit_schema.jsonValue(),
            "stats": stats,
            "rows": rows,
        }
        if txns:
            manifest["txns"] = txns
        if cons:
            manifest["constraints"] = cons
        if bloom:
            manifest["bloom"] = bloom
        if cdf_entry is not None:
            manifest["cdf"] = cdf_entry
        # deletion vectors are file-set state scoped to existing dirs: an
        # append carries them (its new dir is never covered), an
        # overwrite replaces the file set and with it every vector
        if head_m is not None and mode == "append" and head_m.get("dv"):
            manifest["dv"] = head_m["dv"]
        # the column map follows the schema: appends carry it, an
        # overwrite replaces schema and files so physical == logical again
        if head_m is not None and mode == "append" and head_m.get("column_map"):
            manifest["column_map"] = head_m["column_map"]
        try:
            _commit(spec, version, manifest)
            return version
        except SnapshotConflictError:
            if mode == "overwrite":
                raise
            # rebase: adopt the new head as parent, keep our data dir.
            # Schema re-validates against the new head: a concurrent
            # commit may itself have evolved the table.
            cur = current_version(spec)
            version = 0 if cur is None else cur + 1
            head = _read_manifest(spec, cur)
            if "schema" in head:
                table_schema = StructType.fromJson(head["schema"])
                if _same_columns(df.schema, table_schema):
                    commit_schema = table_schema
                elif not merge_schema:
                    raise SchemaMismatchError(
                        f"append rebase at {spec.path}: concurrent "
                        "commit changed the table schema; pass "
                        "merge_schema=True to evolve additively"
                    )
                else:
                    commit_schema = _merge_schemas(table_schema, df.schema)
    raise SnapshotConflictError(
        f"append at {spec.path} lost {max_retries + 1} consecutive commit "
        "races; raise max_retries or reduce writer contention"
    )


def version_as_of(spec: TableSpec, timestamp: str) -> int:
    """Delta's ``timestampAsOf`` resolution: the LATEST version whose
    ``committed_at`` is <= ``timestamp`` ('YYYY-MM-DD HH:MM:SS', UTC —
    ISO-lexicographic compare, no parsing needed). Both sides truncate to
    19 chars so the stored tz-aware form ('... +00:00' suffix) and a
    tz-less probe compare as the same instant — a commit at the exact
    probe second is INCLUSIVE, matching vacuum's ``_retained``. Raises if
    every commit is newer (nothing existed yet) or if no commit carries a
    timestamp (pre-timestamp manifests)."""
    best = None
    for v in _versions(spec):
        at = _read_manifest(spec, v).get("committed_at")
        if at is not None and str(at)[:19] <= str(timestamp)[:19]:
            best = v
    if best is None:
        raise ValueError(
            f"no snapshot at {spec.path} committed at or before {timestamp!r}"
        )
    return best


def snapshot_read(
    spark: SparkSession,
    spec: TableSpec,
    version: int | None = None,
    timestamp: str | None = None,
) -> DataFrame:
    """Read a snapshot (latest by default; any committed ``version`` for
    time travel, including versions folded into a checkpoint; or
    ``timestamp`` for Delta's timestampAsOf — the head as of that UTC
    instant)."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    if version is not None and timestamp is not None:
        raise ValueError("pass version OR timestamp, not both")
    if timestamp is not None:
        version = version_as_of(spec, timestamp)
    v = cur if version is None else version
    manifest = _read_manifest(spec, v)  # raises "unknown snapshot version"
    # each manifest pins the schema its version is read with: post-
    # evolution heads project old files to the evolved schema (missing
    # columns read as null), pre-evolution versions keep the old schema.
    # _load_dirs also applies the manifest's deletion vectors.
    return _load_dirs(spark, spec, manifest, manifest["dirs"])


def rollback(spec: TableSpec, version: int) -> int:
    """Commit a NEW version whose content is an old version's file set —
    an auditable undo (history is never rewritten, matching Delta's
    RESTORE semantics). Aborts on a concurrent-commit conflict."""
    old = _read_manifest(spec, version)  # raises on unknown version
    cur = current_version(spec)
    new_v = cur + 1
    manifest = {
        "version": new_v,
        "mode": "rollback",
        "dirs": old["dirs"],
        "parent": cur,
        "restored_from": version,
    }
    # app txn watermarks are monotonic progress, not file-set state: a
    # RESTORE keeps the HEAD's records (matching Delta — rolling them back
    # would re-admit already-processed streaming batches)
    head_m = _read_manifest(spec, cur)
    if head_m.get("txns"):
        manifest["txns"] = head_m["txns"]
    # constraints are table properties, not file-set state: RESTORE keeps
    # the head's (Delta RESTORE does not roll back table properties)
    if head_m.get("constraints"):
        manifest["constraints"] = head_m["constraints"]
    if "schema" in old:  # restore reads with the restored version's schema
        manifest["schema"] = old["schema"]
    if "stats" in old:
        manifest["stats"] = old["stats"]
    if "rows" in old:  # row counts follow the restored file set
        manifest["rows"] = old["rows"]
    if "bloom" in old:  # bloom sidecars follow the restored file set
        manifest["bloom"] = old["bloom"]
    if "dv" in old:  # deletion vectors follow the restored file set
        manifest["dv"] = old["dv"]
    if "column_map" in old:  # the column map follows the restored schema
        manifest["column_map"] = old["column_map"]
    _commit(spec, new_v, manifest)
    return new_v


def snapshot_clone(
    src: TableSpec,
    dst: TableSpec,
    version: int | None = None,
    shallow: bool = True,
) -> int:
    """Delta's ``CREATE TABLE ... CLONE``: make ``dst`` a new snapshot
    table whose v0 content equals ``src`` at ``version`` (head by
    default). Returns the clone's version (0).

    - ``shallow=True``: zero data copied — the clone's manifest references
      the source's data dirs by ABSOLUTE path. O(metadata) regardless of
      table size; subsequent writes to the clone land under the clone's
      own root, and the clone's vacuum never touches absolute (source-
      owned) dirs. Caveat (same as Delta): vacuuming the SOURCE can
      delete files a shallow clone still references — deep-clone anything
      that must outlive the source's retention.
    - ``shallow=False``: deep clone — data dirs are copied under the
      clone's root; the clone is fully self-contained.

    Schema, per-dir stats, and row counts carry over (remapped to the
    clone's dir names). CHECK constraints carry (table properties clone);
    app txn watermarks do NOT (Delta: streaming transaction ids are not
    cloned — a clone is a new table with its own write history).
    """
    if current_version(dst) is not None:
        raise ValueError(f"clone target {dst.path} already has snapshots")
    if dst.format != src.format or dst.partition_by != src.partition_by:
        raise ValueError(
            "clone target spec must match source format and partitioning"
        )
    v = current_version(src) if version is None else version
    if v is None:
        raise ValueError(f"no snapshots to clone at {src.path}")
    m = _read_manifest(src, v)
    dir_map: dict[str, str] = {}
    if shallow:
        for d in m["dirs"]:
            dir_map[d] = os.path.join(os.path.abspath(src.path), d)
    else:
        import shutil

        for d in m["dirs"]:
            # flatten possible subdir commits (zorder buckets) to a safe
            # relative name under the clone's data root
            rel = "data/" + d.split("/", 1)[1].replace("/", "__")
            shutil.copytree(
                os.path.join(src.path, d), os.path.join(dst.path, rel)
            )
            dir_map[d] = rel
    manifest = {
        "version": 0,
        "mode": "clone",
        "dirs": [dir_map[d] for d in m["dirs"]],
        "parent": None,
        "cloned_from": {
            "path": os.path.abspath(src.path),
            "version": v,
            "shallow": shallow,
        },
    }
    if "schema" in m:
        manifest["schema"] = m["schema"]
    if "stats" in m:
        manifest["stats"] = {
            dir_map[d]: s for d, s in m["stats"].items() if d in dir_map
        }
    if "rows" in m:
        manifest["rows"] = {
            dir_map[d]: r for d, r in m["rows"].items() if d in dir_map
        }
    if m.get("constraints"):
        manifest["constraints"] = m["constraints"]
    if m.get("column_map"):  # the column map follows the cloned schema
        manifest["column_map"] = m["column_map"]
    if m.get("dv"):  # vectors follow the cloned file set, dirs remapped
        manifest["dv"] = [
            {
                "ranges": e["ranges"],
                "dirs": [dir_map[d] for d in e["dirs"] if d in dir_map],
                "n": e["n"],
            }
            for e in m["dv"]
            if any(d in dir_map for d in e["dirs"])
        ]
    if m.get("bloom"):
        src_bloom = {
            d: p for d, p in m["bloom"].items() if d in dir_map
        }
        if shallow:
            # sidecars stay source-owned: reference them absolutely (the
            # clone's vacuum only lists its OWN _bloom dir, so it can
            # never reap these)
            manifest["bloom"] = {
                dir_map[d]: os.path.join(os.path.abspath(src.path), p)
                for d, p in src_bloom.items()
            }
        else:
            import shutil as _sh

            os.makedirs(_bloom_sidecar_dir(dst), exist_ok=True)
            bloom = {}
            for d, p in src_bloom.items():
                _sh.copy(os.path.join(src.path, p), os.path.join(dst.path, p))
                bloom[dir_map[d]] = p
            manifest["bloom"] = bloom
    _commit(dst, 0, manifest)
    return 0


#: commit modes whose read content equals the parent's — a span CDF can
#: skip them entirely (the snapshot log's ``dataChange=false`` commits;
#: mirrors matview._NOOP_MODES, kept separate so this module stays
#: import-independent of the view layer).
_DIFF_NOOP_MODES = frozenset(
    {
        "optimize",
        "optimize-zorder",
        "purge",
        "set_constraint",
        "drop_constraint",
        "matview_watermark",
    }
)


def _cdf_sidecar_dir(spec: TableSpec) -> str:
    return os.path.join(spec.path, "_cdf")


def _write_cdf_sidecar(
    spec: TableSpec,
    token: str,
    removed: DataFrame | None,
    added: DataFrame | None,
    schema_json: dict,
) -> dict:
    """Persist a DML commit's change rows as a parquet sidecar under
    ``_cdf/<token>/`` — Delta's change-data files, written AT COMMIT TIME
    so ``snapshot_diff`` can assemble a span's CDF in O(changed rows)
    instead of recomputing an O(2×table) anti-join (VERDICT r12 item 1).

    Rows are stored under the commit's LOGICAL column names in manifest
    schema order, each cast to the schema type, plus ``_change_type``
    ('delete' = pre-image removed from the table, 'insert' = row added).
    Returns the manifest entry ``{"dir": "_cdf/<token>"}``. The sidecar
    is derived metadata: a vacuumed/raced-away sidecar only downgrades
    ``snapshot_diff`` to the recompute path, never corrupts it."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(schema_json)
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields
    ]
    parts = []
    if removed is not None:
        parts.append(
            removed.select(*cols, F.lit("delete").alias("_change_type"))
        )
    if added is not None:
        parts.append(
            added.select(*cols, F.lit("insert").alias("_change_type"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    rel = f"_cdf/{token}"
    out.write.format("parquet").mode("errorifexists").save(
        os.path.join(spec.path, rel)
    )
    return {"dir": rel}


def _read_cdf_sidecar(
    spark: SparkSession, spec: TableSpec, entry: dict, schema_json: dict
) -> DataFrame | None:
    """Load one commit's change sidecar (schema-pinned so an empty
    sidecar reads as zero rows); None when the dir is gone (vacuumed or
    lost a write race) — the caller falls back to the recompute path."""
    from pyspark.sql.types import StructType

    rel = entry.get("dir")
    if not rel:
        return None
    full = os.path.join(spec.path, rel)
    if not os.path.isdir(full):
        return None
    schema = StructType.fromJson(schema_json).add("_change_type", "string")
    try:
        return spark.read.schema(schema).format("parquet").load(full)
    except Exception as e:  # noqa: BLE001
        # the isdir check above raced a concurrent vacuum's reclaim: the
        # dir vanished before Spark listed it — downgrade, don't fail
        if _is_reclaimed_mid_read(e):
            return None
        raise


def _is_reclaimed_mid_read(e: Exception) -> bool:
    """True when an exception is a file/path-missing failure — the
    signature of a concurrent vacuum reclaiming a span input between this
    reader's plan and its execution (the chaos suite's refresher-vs-vacuum
    race). Callers downgrade to the recompute path, which reads pinned
    endpoint versions instead of per-commit files."""
    txt = f"{type(e).__name__}: {e}"
    return (
        "FAILED_READ_FILE" in txt
        or "FileNotFoundException" in txt
        or "PATH_NOT_FOUND" in txt
        or isinstance(e, FileNotFoundError)
    )


def _sidecar_span_diff(
    spark: SparkSession,
    spec: TableSpec,
    v_from: int,
    v_to: int,
    keys: list[str],
    detect_updates: bool,
) -> DataFrame | None:
    """Assemble the span CDF from per-commit change sidecars + appended
    dirs — O(changed rows), no endpoint-version reads. Returns None
    whenever the span is not fully covered (a commit without a sidecar,
    a vacuumed manifest, schema/column-map evolution mid-span, a map-typed
    column, or a key-uniqueness violation), and the caller recomputes.

    Soundness: with per-commit removed/added row sets R_i / A_i, the
    signed multiset ΣA − ΣR equals content(v_to) − content(v_from)
    (a row added then removed inside the span appears in both and
    cancels; ditto removed-then-readded). Under the documented contract
    that ``keys`` identify at most ONE row per version, a key with only
    net-positive rows is an insert, only net-negative a delete, both an
    update — validated at runtime (≤1 positive and ≤1 negative net row
    per key, |net| ≤ 1) with fallback on violation.

    Two deliberate behavioral refinements over the recompute, both
    confined to inputs outside the documented contract:

    - an UNCHANGED NULL-keyed row nets to zero and emits nothing,
      instead of the recompute's spurious delete+insert pair (the
      anti-joins can't match NULLs);
    - a key holding SEVERAL rows where exactly one changed passes the
      net-shape validator undetected (the residue looks like a clean
      single-row change) and emits that ROW's change — the recompute's
      key-membership anti-joins emit nothing for it, silently dropping
      the change from linear consumers' folds. The row-level answer is
      the one every ±1-weighted consumer (matview folds) actually
      needs, so the divergence is kept rather than paying an endpoint
      read to reproduce the lossier semantics."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import MapType, StructType

    if v_from >= v_to:
        return None
    try:
        manifests = {
            v: _read_manifest(spec, v) for v in range(v_from, v_to + 1)
        }
    except ValueError:  # an intermediate version was vacuumed
        return None
    m_to = manifests[v_to]
    if "schema" not in m_to:
        return None

    def _shape(m):
        """Column names + types in order, nullability ignored — an
        aggregate rewrite flips nullable flags without changing content
        (e.g. a matview's SUM column), and parquet reads don't enforce
        them anyway."""
        s = m.get("schema")
        if s is None:
            return None
        t = StructType.fromJson(s)
        return [(f.name, f.dataType.simpleString()) for f in t.fields]

    to_shape = _shape(m_to)
    if any(
        _shape(m) != to_shape
        or m.get("column_map") != m_to.get("column_map")
        for m in manifests.values()
    ):
        return None
    schema = StructType.fromJson(m_to["schema"])
    if any(isinstance(f.dataType, MapType) for f in schema.fields):
        return None  # map columns aren't groupable — netting impossible
    cols = schema.fieldNames()
    adds: list[DataFrame] = []
    removes: list[DataFrame] = []
    for v in range(v_from + 1, v_to + 1):
        m_prev, m_cur = manifests[v - 1], manifests[v]
        cdf_entry = m_cur.get("cdf")
        if cdf_entry is not None:
            if cdf_entry.get("dir") is None:  # recorded zero-change commit
                continue
            side = _read_cdf_sidecar(spark, spec, cdf_entry, m_to["schema"])
            if side is None:
                return None
            adds.append(side.filter(F.col("_change_type") == "insert"))
            removes.append(side.filter(F.col("_change_type") == "delete"))
            continue
        prev_dirs = set(m_prev["dirs"])
        if (
            not (prev_dirs - set(m_cur["dirs"]))
            and m_prev.get("dv", []) == m_cur.get("dv", [])
        ):
            # verbatim append (or a dir-preserving metadata commit):
            # the delta is exactly the added dirs' content, read under
            # THIS commit's manifest (no DV can cover a brand-new dir)
            added_dirs = [d for d in m_cur["dirs"] if d not in prev_dirs]
            if added_dirs:
                adds.append(_load_dirs(spark, spec, m_cur, added_dirs))
            continue
        if m_cur.get("mode") in _DIFF_NOOP_MODES:
            continue  # content-noop layout/metadata rewrite
        return None  # uncovered content change: recompute
    sgn = [
        *[a.select(*cols, F.lit(1).alias("_sgn")) for a in adds],
        *[r.select(*cols, F.lit(-1).alias("_sgn")) for r in removes],
    ]
    empty = spark.createDataFrame(
        [], StructType.fromJson(m_to["schema"]).add("_change_type", "string")
    )
    if not sgn:
        return empty
    signed = sgn[0]
    for p in sgn[1:]:
        signed = signed.unionByName(p)
    net = (
        signed.groupBy(*cols)
        .agg(F.sum("_sgn").alias("_net"))
        .filter(F.col("_net") != 0)
    )
    # one materialization: the validation below and every caller branch
    # read the checkpointed (small — O(changed rows)) result. A sidecar
    # or appended dir can be reclaimed by a concurrent vacuum between the
    # per-commit plan construction above and this execution — that is a
    # downgrade (recompute from the pinned endpoints), never a failure.
    try:
        net = net.localCheckpoint(eager=True)
    except Exception as e:  # noqa: BLE001
        if _is_reclaimed_mid_read(e):
            return None
        raise
    bad = (
        net.groupBy(*keys)
        .agg(
            F.sum(F.when(F.col("_net") > 0, 1).otherwise(0)).alias("_p"),
            F.sum(F.when(F.col("_net") < 0, 1).otherwise(0)).alias("_m"),
            F.max(F.abs(F.col("_net"))).alias("_a"),
        )
        .filter(
            (F.col("_p") > 1) | (F.col("_m") > 1) | (F.col("_a") > 1)
        )
        .limit(1)
        .count()
    )
    if bad:  # keys aren't unique row identifiers here: recompute instead
        return None
    pos = net.filter(F.col("_net") > 0).drop("_net")
    neg = net.filter(F.col("_net") < 0).drop("_net")
    inserted = pos.join(neg.select(*keys), keys, "left_anti").withColumn(
        "_change_type", F.lit("insert")
    )
    deleted = neg.join(pos.select(*keys), keys, "left_anti").withColumn(
        "_change_type", F.lit("delete")
    )
    out = inserted.unionByName(deleted)
    if not detect_updates:
        return out
    pre = neg.join(pos.select(*keys), keys, "left_semi").withColumn(
        "_change_type", F.lit("update_preimage")
    )
    post = pos.join(neg.select(*keys), keys, "left_semi").withColumn(
        "_change_type", F.lit("update_postimage")
    )
    return out.unionByName(pre).unionByName(post)


def snapshot_diff(
    spark: SparkSession,
    spec: TableSpec,
    v_from: int,
    v_to: int,
    keys: list[str],
    detect_updates: bool = False,
    use_sidecars: bool = True,
) -> DataFrame:
    """Change-data feed between two versions: full rows with a
    ``_change_type`` column. Default (key-level CDF): 'insert' | 'delete'
    — an updated key appears as a delete of the old row and an insert of
    the new one.

    FAST PATH (``use_sidecars=True``, default): when every content-
    changing commit in the span either carries a change sidecar (DML
    rewrites persist their removed/added rows at commit time — Delta's
    change-data files) or is a verbatim append / content-noop, the feed
    is assembled from sidecars + appended dirs in O(changed rows) —
    neither endpoint version is read. Any gap (no sidecar, vacuumed
    manifest, mid-span schema change, non-unique keys) falls back to the
    recompute below, so the result is identical either way (modulo the
    NULL-key note in :func:`_sidecar_span_diff`).

    RECOMPUTE: two key anti-joins over the two manifests' file sets —
    O(both versions) reads.

    ``detect_updates=True`` upgrades to Delta CDF's four-type feed: a key
    present in BOTH versions whose non-key payload changed emits
    'update_preimage' (the old row) and 'update_postimage' (the new row);
    unchanged keys emit nothing. Cost: one extra join on the keys with a
    payload-inequality filter (null-safe, so NULL↔value transitions
    count as changes).

    ``keys`` should be non-null row identifiers: the anti-joins match
    null-UNSAFELY (SQL join semantics), so an unchanged NULL-keyed row
    surfaces as a delete+insert pair on every diff — harmless to linear
    consumers (the pair cancels) but noisy for row-level CDC readers."""
    if use_sidecars:
        fast = _sidecar_span_diff(
            spark, spec, v_from, v_to, keys, detect_updates
        )
        if fast is not None:
            return fast
    a = snapshot_read(spark, spec, v_from)
    b = snapshot_read(spark, spec, v_to)
    import pyspark.sql.functions as F

    inserted = b.join(a.select(*keys), keys, "left_anti").withColumn(
        "_change_type", F.lit("insert")
    )
    deleted = a.join(b.select(*keys), keys, "left_anti").withColumn(
        "_change_type", F.lit("delete")
    )
    out = inserted.unionByName(deleted)
    if not detect_updates:
        return out
    payload = [c for c in b.columns if c not in keys]
    aa = a.select(*keys, *[F.col(c).alias(f"_pre_{c}") for c in payload])
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_pre_{c}"))
    both = b.join(aa, keys, "inner").filter(changed)
    pre = both.select(
        *keys,
        *[F.col(f"_pre_{c}").alias(c) for c in payload],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = both.select(
        *keys, *payload, F.lit("update_postimage").alias("_change_type")
    )
    return out.unionByName(pre).unionByName(post)


def snapshot_changes(
    spark: SparkSession,
    spec: TableSpec,
    starting_version: int,
    ending_version: int | None = None,
    keys: list[str] | None = None,
    detect_updates: bool = True,
) -> DataFrame:
    """Delta's ``table_changes`` reader: the PER-COMMIT change feed for
    every version in ``(starting_version, ending_version]`` (head by
    default), each row stamped with ``_commit_version`` and
    ``_commit_timestamp`` next to ``_change_type`` — the shape CDC
    consumers (replication, incremental ETL, audit) page through.

    ``keys=None`` requires every commit in the span to carry a change
    sidecar or be an append/content-noop (CDF-at-write is on by default
    for every DML path, so this is the common case) and returns the
    sidecar rows VERBATIM — exact row-level changes, no key semantics
    needed, O(changed rows). Passing ``keys`` computes each commit's
    key-level feed through :func:`snapshot_diff` instead (sidecar-fast
    when covered, anti-join recompute otherwise) — use it when updates
    must pair into pre/post images.

    Commits without content changes (OPTIMIZE, constraint DDL, watermark
    bumps) contribute no rows, matching Delta's dataChange=false
    commits. Raises when a span manifest was vacuumed (Delta: change
    data outside the retention horizon is unreadable) or, for
    ``keys=None``, when a DML commit predates CDF-at-write (no sidecar
    to read verbatim)."""
    import pyspark.sql.functions as F

    end = current_version(spec) if ending_version is None else ending_version
    if end is None or starting_version > end:
        raise ValueError(
            f"snapshot_changes at {spec.path}: empty span "
            f"({starting_version}, {ending_version})"
        )
    out = None
    for v in range(starting_version + 1, end + 1):
        m = _read_manifest(spec, v)  # raises if vacuumed past
        stamp = m.get("committed_at")
        if keys is not None:
            part = snapshot_diff(spark, spec, v - 1, v, keys,
                                 detect_updates=detect_updates)
        else:
            cdf_entry = m.get("cdf")
            if cdf_entry is not None:
                if cdf_entry.get("dir") is None:
                    continue  # recorded zero-change commit
                part = _read_cdf_sidecar(spark, spec, cdf_entry, m["schema"])
                if part is None:
                    raise ValueError(
                        f"snapshot_changes at {spec.path}: v{v}'s change "
                        "sidecar was reclaimed — pass keys= to recompute "
                        "the feed from the version pair"
                    )
            else:
                m_prev = _read_manifest(spec, v - 1)
                prev_dirs = set(m_prev["dirs"])
                if (
                    not (prev_dirs - set(m["dirs"]))
                    and m_prev.get("dv", []) == m.get("dv", [])
                ):
                    added = [d for d in m["dirs"] if d not in prev_dirs]
                    if not added:
                        continue
                    part = _load_dirs(spark, spec, m, added).withColumn(
                        "_change_type", F.lit("insert")
                    )
                elif m.get("mode") in _DIFF_NOOP_MODES:
                    continue
                else:
                    raise ValueError(
                        f"snapshot_changes at {spec.path}: v{v} "
                        f"(mode={m.get('mode')!r}) changed content but "
                        "carries no change sidecar (written before "
                        "CDF-at-write, or write_cdf=False) — pass keys= "
                        "to recompute its feed from the version pair"
                    )
        part = part.withColumn(
            "_commit_version", F.lit(v).cast("long")
        ).withColumn(
            "_commit_timestamp",
            F.lit(str(stamp)[:19] if stamp is not None else None).cast(
                "timestamp"
            ),
        )
        out = part if out is None else out.unionByName(part)
    if out is None:  # every commit in the span was a content-noop
        m_end = _read_manifest(spec, end)
        base = _empty_like(spark, spec, m_end)
        return (
            base.withColumn("_change_type", F.lit(None).cast("string"))
            .withColumn("_commit_version", F.lit(None).cast("long"))
            .withColumn("_commit_timestamp", F.lit(None).cast("timestamp"))
        )
    return out


def consume_changes(
    spark: SparkSession,
    src: TableSpec,
    sink: TableSpec,
    transform,
    app_id: str = "cdc-consumer",
    keys: list[str] | None = None,
    detect_updates: bool = True,
) -> tuple[int, int] | None:
    """Exactly-once incremental CDC consumption — the pull-based form of
    Delta's streaming change-feed reader: read :func:`snapshot_changes`
    for every source commit SINCE the sink's recorded watermark, apply
    ``transform(feed_df) -> rows_df``, and append the result to ``sink``
    under the source head version as the txn watermark. Returns the
    consumed ``(from_version, to_version]`` span, or None when the sink
    is already caught up.

    Exactly-once mechanics: the watermark IS the sink's txn map entry
    for ``app_id`` (``snapshot_write_txn``) — the processed rows and the
    new watermark land in ONE commit, so a consumer that crashes after
    the append simply no-ops the redelivery, and one that crashes before
    it re-reads the same span and produces the same rows (transform must
    be deterministic). Two calls over (a,b] then (b,c] append exactly
    what one call over (a,c] would — per-commit feeds compose by
    construction.

    First run (sink has no watermark): the source HEAD is processed as
    an initial snapshot — every current row as an 'insert' stamped with
    the head version (the streaming-CDF initial-snapshot convention);
    per-commit granularity starts with the next call."""
    import pyspark.sql.functions as F

    v_now = current_version(src)
    if v_now is None:
        raise ValueError(f"no snapshots at {src.path}")
    seen = (
        last_txn_version(sink, app_id)
        if current_version(sink) is not None
        else None
    )
    if seen is not None and int(seen) >= v_now:
        return None
    if seen is None:
        feed = (
            snapshot_read(spark, src, version=v_now)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(v_now).cast("long"))
            .withColumn(
                "_commit_timestamp", F.lit(None).cast("timestamp")
            )
        )
        v_from = -1
    else:
        v_from = int(seen)
        feed = snapshot_changes(
            spark, src, v_from, v_now, keys=keys,
            detect_updates=detect_updates,
        )
    snapshot_write_txn(
        transform(feed), sink, app_id=app_id, txn_version=v_now,
        mode="append",
    )
    return (v_from, v_now)


def _write_checkpoint(spec: TableSpec, n: int, manifests: dict[int, dict]) -> None:
    """Atomically (re)write c<n>.json. ``os.replace`` so readers see the
    old or new body, never a torn file."""
    d = _manifest_dir(spec)
    fd, tmp = tempfile.mkstemp(prefix=f".c{n}-", dir=d)
    with os.fdopen(fd, "w") as f:
        json.dump(
            {
                "checkpoint_version": n,
                "manifests": {str(v): m for v, m in sorted(manifests.items())},
            },
            f,
            indent=1,
            sort_keys=True,
        )
    os.replace(tmp, os.path.join(d, f"c{n}.json"))


def checkpoint_manifest(spec: TableSpec, upto: int | None = None) -> int:
    """Fold every manifest ≤ ``upto`` (default: head) into one checkpoint
    file and delete the loose manifests it covers (plus any superseded
    older checkpoint). Returns the checkpoint version.

    After this, the log holds c<upto>.json + the loose tail — reads open
    O(tail) files no matter how many commits the table has seen, and time
    travel to any folded version still works (the checkpoint embeds every
    manifest body, not just the head's).
    """
    head = current_version(spec)
    if head is None:
        raise ValueError(f"no snapshots to checkpoint at {spec.path}")
    n = head if upto is None else upto
    covered = [v for v in _versions(spec) if v <= n]
    if not covered:
        raise ValueError(f"no versions <= {n} to checkpoint at {spec.path}")
    manifests = {}
    for v in covered:
        try:
            manifests[v] = _read_manifest(spec, v)
        except ValueError:
            # vanished between the listing and the read: a concurrent
            # VACUUM dropped it (skipping matches its intent) — a
            # concurrent FOLD would have left it readable through the
            # newer checkpoint, so only a vacuum reaches here
            continue
    if not manifests:
        raise ValueError(f"no versions <= {n} to checkpoint at {spec.path}")
    n = max(manifests)
    _write_checkpoint(spec, n, manifests)
    d = _manifest_dir(spec)
    # delete only the loose files actually folded (a skipped-as-vacuumed
    # version's loose file, were it to reappear, is not ours to remove),
    # tolerating a racing fold/vacuum having removed them first
    for v in manifests:
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(d, f"v{v}.json"))
    # sweep EVERY older checkpoint, not just the one we read at start: a
    # lost fold race leaves a stale smaller c<k>.json behind. Removal is
    # safe by the superset-ordering invariant — any c<k> with k < n is
    # covered by c<n>, since versions are gap-free and every fold reads
    # the complete listing at its start. Tolerate racing removers.
    for f in os.listdir(d):
        if f.startswith("c") and f.endswith(".json"):
            try:
                k = int(f[1:-5])
            except ValueError:
                continue
            if k < n:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(d, f))
    return n


def vacuum_snapshots(
    spec: TableSpec,
    keep_last: int = 1,
    orphan_grace_s: float | None = None,
    retain_hours: float | None = None,
    _now: str | None = None,
    _post_plan=None,
) -> list[str]:
    """Drop all but the last ``keep_last`` versions and delete data dirs
    no surviving manifest references. Returns the deleted data dirs
    (table-relative). The snapshot analogue of ``VACUUM ... RETAIN``:
    time travel older than the horizon is traded for space.

    ``orphan_grace_s``: when set, also reap UNCOMMITTED data dirs — dirs
    no manifest (kept or dropped) has ever referenced, left by writers
    that crashed before commit or lost a same-batch txn race — provided
    their mtime is at least this many seconds old. This is Delta VACUUM's
    uncommitted-file cleanup; the grace window is what keeps a concurrent
    writer's just-written-not-yet-committed dir safe, so use a horizon
    comfortably above the longest write-to-commit gap (Delta's default is
    7 days). None (default) leaves orphans alone. The same grace window
    also reaps stale mkstemp leftovers (``.v<N>-*``/``.c<N>-*``) stranded
    in the manifest dir by writers killed between tmp-write and publish.

    ``retain_hours``: the literal ``VACUUM ... RETAIN N HOURS`` contract
    (the reference's DDL prescribes 168): versions whose ``committed_at``
    falls inside the window are RETAINED even beyond ``keep_last``, and
    versions outside it drop (the head always survives). Versions without
    a timestamp (pre-timestamp manifests) are retained conservatively.
    ``_now`` pins the clock for tests ('YYYY-MM-DD HH:MM:SS', UTC).

    Checkpoint-aware: versions folded into a checkpoint are dropped by
    REWRITING the checkpoint without them (atomic replace); the
    checkpoint file disappears once it covers nothing retained.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(spec)
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    if retain_hours is not None and vs:
        import datetime as _dt

        now = (
            _dt.datetime.now(_dt.timezone.utc).isoformat(
                sep=" ", timespec="seconds"
            )
            if _now is None
            else _now
        )
        horizon = (
            _dt.datetime.fromisoformat(now)
            - _dt.timedelta(hours=retain_hours)
        ).isoformat(sep=" ", timespec="seconds")

        def _retained(v: int) -> bool:
            at = _read_manifest(spec, v).get("committed_at")
            # strip tz suffix if present; ISO compare
            return at is None or str(at)[:19] >= horizon[:19]

        keep_set = {v for v in vs if _retained(v)} | {vs[-1]} | set(keep)
        keep = sorted(keep_set)
        drop = [v for v in vs if v not in keep_set]
    if _post_plan is not None:  # test seam: a concurrent fold/commit
        _post_plan()  # landing between the plan and the reclaim
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(spec, v)["dirs"])
    doomed: set[str] = set()
    dropped_cdf: set[str] = set()
    for v in drop:
        m_drop = _read_manifest(spec, v)
        doomed.update(d for d in m_drop["dirs"] if d not in live)
        cdf_d = (m_drop.get("cdf") or {}).get("dir")
        if cdf_d:  # collected now — the manifest file is removed below
            dropped_cdf.add(cdf_d)
    if orphan_grace_s is not None:
        import time

        referenced = set(live) | set(doomed)
        for v in drop + keep:
            referenced.update(_read_manifest(spec, v)["dirs"])
        data_root = os.path.join(spec.path, "data")
        now = time.time()
        if os.path.isdir(data_root):
            for name in os.listdir(data_root):
                rel = f"data/{name}"
                full = os.path.join(data_root, name)
                # a zorder commit references SUBDIRS (data/bN-tok/_zbucket=i);
                # the top-level dir is then a live container, not an orphan
                contains_live = any(
                    r.startswith(rel + "/") for r in referenced
                )
                if (
                    rel not in referenced
                    and not contains_live
                    and now - os.path.getmtime(full) >= orphan_grace_s
                ):
                    doomed.add(rel)
        # stale mkstemp leftovers in the manifest dir (".v<N>-*"/".c<N>-*"):
        # a writer SIGKILLed between mkstemp and os.link/os.replace strands
        # its tmp file forever — readers never see it (they glob v*.json /
        # c*.json) but the dir grows without bound across crashes. Reap
        # under the same grace window that protects a LIVE writer mid-link.
        md_tmp = _manifest_dir(spec)
        if os.path.isdir(md_tmp):
            import re as _re

            # ONLY the documented mkstemp prefixes — an unscoped
            # dot-prefix match would reap unrelated hidden files (editor
            # swap files, .DS_Store, future sidecar metadata) colocated
            # in the log dir.
            _tmp_pat = _re.compile(r"^\.(v|c)\d+-")
            for name in os.listdir(md_tmp):
                if not _tmp_pat.match(name):
                    continue
                full = os.path.join(md_tmp, name)
                with contextlib.suppress(OSError):
                    if now - os.path.getmtime(full) >= orphan_grace_s:
                        os.remove(full)
    if not doomed and not drop:
        return []
    import shutil

    deleted = []
    data_root = os.path.join(spec.path, "data")
    for d in sorted(doomed):
        if os.path.isabs(d):
            # a shallow clone references the SOURCE table's data dirs by
            # absolute path — the clone never owns them, so its vacuum
            # must never delete them (deleting would corrupt the source
            # and every other clone)
            continue
        full = os.path.join(spec.path, d)
        if os.path.isdir(full):
            # a concurrent vacuum may win the same doomed dir mid-walk;
            # rename-then-delete tolerates that and, more importantly,
            # makes the dir vanish ATOMICALLY for concurrent readers —
            # plain rmtree unlinks files before the dir, and a reader
            # listing in that window sees an existing-but-empty dir
            _rmtree_atomic(full)
            deleted.append(d)
            # zorder subdir removal can leave an empty commit-dir husk
            parent = os.path.dirname(full)
            with contextlib.suppress(OSError):
                if (
                    os.path.realpath(parent) != os.path.realpath(data_root)
                    and os.path.isdir(parent)
                    and not os.listdir(parent)
                ):
                    os.rmdir(parent)
    md = _manifest_dir(spec)
    for v in drop:
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(md, f"v{v}.json"))
    cp = _latest_checkpoint(spec)
    if cp is not None:
        n, manifests = cp
        # filter by NOT-IN-DROP, never by in-keep: the checkpoint is
        # re-read HERE, after the reclaim, and may contain versions that
        # committed (and were folded, deleting their loose files) after
        # this vacuum's plan was computed — a keep-set filter would
        # rewrite the checkpoint WITHOUT them, destroying the only copy
        # of those commits and rolling the table head back (the
        # lost-commit race pinned by tests/test_snapshot_races.py)
        drop_set = set(drop)
        kept_in_cp = {v: m for v, m in manifests.items() if v not in drop_set}
        if not kept_in_cp:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(md, f"c{n}.json"))
        elif len(kept_in_cp) != len(manifests):
            _write_checkpoint(spec, n, kept_in_cp)
    # bloom sidecars no retained manifest references are orphans (their
    # commit dirs just vacuumed away, or their writer's commit lost a
    # race) — reap them; they are derived metadata, rebuilt on re-index.
    # Sidecars of versions committed after the plan stay safe the same
    # way: reap only what the DROPPED manifests referenced exclusively.
    bdir = _bloom_sidecar_dir(spec)
    if os.path.isdir(bdir):
        live_sidecars: set[str] = set()
        for v in _versions(spec):
            try:
                live_sidecars.update(
                    _read_manifest(spec, v).get("bloom", {}).values()
                )
            except ValueError:  # raced another vacuum's drop
                continue
        for name in os.listdir(bdir):
            if f"_bloom/{name}" not in live_sidecars:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(bdir, name))
    # change sidecars (_cdf/) follow the DATA-DIR rule, not the bloom
    # rule: reap ONLY what the DROPPED manifests referenced exclusively.
    # A sidecar is written BEFORE its manifest commits, so "unreferenced
    # by any manifest" does NOT mean orphaned — it may be an in-flight
    # DML's sidecar one instant from being referenced (the chaos suite's
    # vacuum-vs-DV-delete race); those wait for the orphan_grace_s sweep
    # below, whose mtime window protects live writers exactly as it does
    # for uncommitted data dirs. Losing a sidecar is only a downgrade
    # (snapshot_diff recomputes), but never reap a live writer's.
    cdir = _cdf_sidecar_dir(spec)
    if os.path.isdir(cdir):
        live_cdf: set[str] = set()
        for v in _versions(spec):
            try:
                d = (_read_manifest(spec, v).get("cdf") or {}).get("dir")
                if d:
                    live_cdf.add(d)
            except ValueError:  # raced another vacuum's drop
                continue
        doomed_cdf = set(dropped_cdf) - live_cdf
        if orphan_grace_s is not None:
            import time as _time

            now2 = _time.time()
            for name in os.listdir(cdir):
                rel = f"_cdf/{name}"
                full = os.path.join(cdir, name)
                with contextlib.suppress(OSError):
                    if (
                        rel not in live_cdf
                        and now2 - os.path.getmtime(full) >= orphan_grace_s
                    ):
                        doomed_cdf.add(rel)
        for rel in doomed_cdf:
            # atomic disappearance matters doubly for change sidecars: a
            # diff assembler reading an existing-but-half-emptied sidecar
            # dir would silently net a WRONG (partial) change set; after
            # the rename it either reads the full sidecar or falls back
            _rmtree_atomic(os.path.join(spec.path, rel))
    return deleted


def _rmtree_atomic(full: str) -> None:
    """Reclaim a directory so concurrent readers observe it fully or not
    at all: one atomic rename to a hidden tombstone, then delete the
    tombstone. ``shutil.rmtree`` alone unlinks the files BEFORE removing
    the dir — a reader whose existence check lands in that window plans a
    scan over an empty dir (silent partial read), and one who listed
    earlier fails mid-read on vanished files. The rename closes the first
    window; :func:`_is_reclaimed_mid_read` handles the second."""
    import shutil

    parent, name = os.path.split(full.rstrip("/"))
    tomb = os.path.join(parent, f".vac-{os.getpid()}-{name}")
    try:
        os.rename(full, tomb)
    except OSError:  # already gone, or another vacuum won the rename
        shutil.rmtree(full, ignore_errors=True)
        return
    shutil.rmtree(tomb, ignore_errors=True)


def _rewrite_commit(
    spark: SparkSession,
    spec: TableSpec,
    cur: int,
    untouched: list[str],
    new_rows: DataFrame,
    mode: str,
    bloom_for: tuple | None = None,
    read_ranges: dict[str, tuple] | None = None,
    max_retries: int = 10,
    cdf_parts: tuple | None = None,
) -> int:
    """Shared tail of merge/delete/update/purge: write ``new_rows`` as one
    commit dir, publish a manifest of untouched dirs + the new dir.

    ``cdf_parts=(removed_df, added_df)`` (either may be None) persists the
    commit's change rows as a ``_cdf/`` sidecar and records it in the
    manifest, making span CDFs O(changed rows) — see
    :func:`_write_cdf_sidecar`. The sidecar stays exact across a REBASE:
    rebasing is only permitted when the interleaved commits are provably
    disjoint from this op's read set, so the content delta
    (−consumed dirs' rows +rewrite dir's rows) is unchanged by them.

    DISJOINT-DML CONCURRENCY (Delta's logical conflict resolution): on a
    commit race, the interleaved commits are checked against what THIS
    rewrite read, and the rewrite REBASES onto the new head when they are
    provably compatible — two writers deleting disjoint partitions/key
    bands both commit, the second rebasing — aborting with
    ``SnapshotConflictError`` only on real overlap. Compatible means ALL of:

    - every dir this rewrite consumed (its read set: base dirs minus
      ``untouched``) still exists at the new head — a concurrent commit
      that rewrote/removed any of them wins, we abort
      (ConcurrentDeleteReadException);
    - every dir the interleaved commits ADDED is provably disjoint from
      ``read_ranges`` (this op's read predicate) by manifest min/max
      stats, including partition-column stats — an added dir that MIGHT
      match the predicate aborts (ConcurrentAppendException; serializable
      semantics — a blind append inside the predicate band conflicts).
      ``read_ranges=None`` means the op reads only its consumed dirs, not
      a predicate over the table (purge), so added dirs always carry;
      ``read_ranges={}`` means the op read the WHOLE table (e.g. a merge
      with a NOT MATCHED BY SOURCE clause), so NO added non-empty dir can
      ever be proven disjoint and any concurrent append aborts;
    - table metadata (schema, column map, constraints) and the deletion-
      vector set are byte-identical between base and new head — any
      concurrent metadata or DV change aborts (MetadataChangedException);
    - CHECK constraints the new head added meanwhile re-validate against
      the rewrite output (paranoia: the equality check above already
      aborts on constraint changes).

    The rebased manifest re-derives untouched dirs from the NEW head
    (carrying commits the other writer added or rewrote), so neither
    writer's effect is lost."""
    base = _read_manifest(spec, cur)
    _check_features(base, spec.path, "writer")
    # MERGE/DELETE output rows must honor table CHECK constraints, exactly
    # like direct writes (Delta enforces constraints on merge output)
    _enforce_constraints(new_rows, base.get("constraints", {}))
    base_dirs = set(base["dirs"])
    consumed = base_dirs - set(untouched)  # the dirs this rewrite read
    token = uuid.uuid4().hex[:8]
    rel_dir = f"data/b{cur + 1}-{token}"
    cmap = _col_map(base)
    write_rows = new_rows
    if cmap:  # files keep PHYSICAL names through rewrites too
        import pyspark.sql.functions as F

        write_rows = new_rows.select(
            *[F.col(c).alias(cmap.get(c, c)) for c in new_rows.columns]
        )
    writer = (
        _materialize_partitions(write_rows, spec)
        .write.format(spec.format)
        .mode("errorifexists")
    )
    if spec.partition_by:
        writer = writer.partitionBy(*_hive_partition_cols(spec))
    writer.save(os.path.join(spec.path, rel_dir))
    dir_stats, dir_rows = _collect_stats(
        spark, spec, rel_dir, write_rows.schema, None
    )
    bloom_file = None
    if bloom_for:
        bloom_file = _collect_bloom(
            spark, spec, rel_dir, write_rows.schema,
            tuple(cmap.get(c, c) for c in bloom_for),
            0.001, _BLOOM_MAX_BITS_DEFAULT, dir_rows,
        )
    cdf_entry = None
    if cdf_parts is not None and "schema" in base:
        removed_df, added_df = cdf_parts
        if removed_df is not None or added_df is not None:
            cdf_entry = _write_cdf_sidecar(
                spec, f"c{cur + 1}-{token}", removed_df, added_df,
                base["schema"],
            )
        else:  # provably-zero-change commit: covered, nothing to store
            cdf_entry = {"dir": None}
    # stats key PHYSICAL names; translate the read predicate once for the
    # added-dir disjointness test (mirrors pruned_dirs)
    phys_ranges = None
    if read_ranges is not None:
        phys_ranges = {cmap.get(c, c): b for c, b in read_ranges.items()}

    def _meta_key(m: dict):
        return json.dumps(
            {
                "schema": m.get("schema"),
                "column_map": m.get("column_map"),
                "constraints": m.get("constraints"),
                "dv": m.get("dv", []),
            },
            sort_keys=True,
        )

    base_meta = _meta_key(base)
    validated_cons = set(base.get("constraints", {}).items())
    head, head_v = base, cur
    for _ in range(max_retries + 1):
        version = head_v + 1
        kept = [d for d in head["dirs"] if d not in consumed]
        stats = {
            d: s for d, s in head.get("stats", {}).items() if d in set(kept)
        }
        if dir_stats:
            stats[rel_dir] = dir_stats
        rows = {d: r for d, r in head.get("rows", {}).items() if d in set(kept)}
        rows[rel_dir] = dir_rows
        manifest = {
            "version": version,
            "mode": mode,
            "dirs": [*kept, rel_dir],
            "parent": head_v,
            "stats": stats,
            "rows": rows,
        }
        # bloom sidecars carry for untouched dirs; the rewritten dir is
        # re-indexed only when the caller passed bloom_for (conservative
        # keep otherwise — an unbloomed dir is never wrongly pruned)
        bloom = {
            d: p for d, p in head.get("bloom", {}).items() if d in set(kept)
        }
        if bloom_file:
            bloom[rel_dir] = bloom_file
        if bloom:
            manifest["bloom"] = bloom
        # deletion vectors trim to the untouched dirs they still cover (the
        # rewritten dir had its DVs applied on read). A partially-trimmed
        # entry loses its exact count (n=None -> snapshot_count falls back
        # to a scan until purge restores metadata-only counting).
        new_dv = []
        for e in head.get("dv", []):
            ds = [d for d in e["dirs"] if d in set(kept)]
            if ds:
                new_dv.append(
                    {
                        "ranges": e["ranges"],
                        "dirs": ds,
                        "n": e["n"] if len(ds) == len(e["dirs"]) else None,
                    }
                )
        if new_dv:
            manifest["dv"] = new_dv
        if cdf_entry is not None:
            manifest["cdf"] = cdf_entry
        if "schema" in head:
            manifest["schema"] = head["schema"]
        if head.get("txns"):  # app txn watermarks survive rewrites
            manifest["txns"] = head["txns"]
        if head.get("constraints"):  # table properties survive rewrites
            manifest["constraints"] = head["constraints"]
        if head.get("column_map"):  # the column map follows the schema
            manifest["column_map"] = head["column_map"]
        try:
            _commit(spec, version, manifest)
            return version
        except SnapshotConflictError:
            new_cur = current_version(spec)
            new_head = _read_manifest(spec, new_cur)
            if _meta_key(new_head) != base_meta:
                raise SnapshotConflictError(
                    f"{mode} at {spec.path}: concurrent commit changed table "
                    "metadata (schema/column map/constraints/deletion "
                    "vectors); recompute against the new head"
                ) from None
            missing = consumed - set(new_head["dirs"])
            if missing:
                raise SnapshotConflictError(
                    f"{mode} at {spec.path}: concurrent commit rewrote dirs "
                    f"this operation also read ({sorted(missing)[:3]}…); "
                    "recompute against the new head"
                ) from None
            added = [d for d in new_head["dirs"] if d not in base_dirs]
            if phys_ranges is None:
                overlapping = []
            else:
                new_stats = new_head.get("stats", {})
                new_rows_ct = new_head.get("rows", {})
                overlapping = [
                    d
                    for d in added
                    # an empty added dir (0 recorded rows) is trivially
                    # disjoint — a full-band concurrent delete leaves one
                    if new_rows_ct.get(d) != 0
                    and not _range_stats_disjoint(new_stats.get(d), phys_ranges)
                ]
            if overlapping:
                raise SnapshotConflictError(
                    f"{mode} at {spec.path}: concurrent commit added dirs "
                    f"that may match this operation's predicate "
                    f"({sorted(overlapping)[:3]}); recompute against the "
                    "new head"
                ) from None
            # compatible: re-validate any constraints added meanwhile
            # (none can exist given the metadata equality, but the shape
            # matches the append rebase loop) and rebase onto the new head
            cons = dict(new_head.get("constraints", {}))
            fresh = {
                n: e for n, e in cons.items() if (n, e) not in validated_cons
            }
            _enforce_constraints(new_rows, fresh)
            validated_cons |= set(fresh.items())
            head, head_v = new_head, new_cur
    raise SnapshotConflictError(
        f"{mode} at {spec.path} lost {max_retries + 1} consecutive commit "
        "races; raise max_retries or reduce writer contention"
    )


def snapshot_merge(
    spark: SparkSession,
    spec: TableSpec,
    source: DataFrame,
    keys: list[str],
    write_cdf: bool = True,
) -> int:
    """MERGE INTO (upsert) with stats-bounded rewrite — the Delta MERGE
    shape on the snapshot log: matched keys take the source row, unmatched
    source rows insert, and ONLY the commits whose manifest key-range
    stats intersect the source's key range are rewritten; every other
    commit dir is carried into the new manifest untouched. At 100 TB an
    update batch touching one day's keys rewrites that day's commits, not
    the table.

    ``source`` must have exactly the table's columns (a merge rewrites
    whole rows; evolve the schema with an append first if needed). The
    affected-commit test is per key column: a commit is carried untouched
    only when its stats PROVE it disjoint from the source's key ENVELOPE
    (min..max per key column) — so a batch whose keys scatter across the
    whole key space widens the envelope and rewrites conservatively;
    split wide batches by key locality to keep rewrites bounded (the same
    discipline Delta MERGE needs for file skipping to bite). Commits
    without stats always rewrite. A commit race REBASES when the
    interleaved commits are provably disjoint from this merge's key
    envelope (see ``_rewrite_commit``) and aborts with
    ``SnapshotConflictError`` on real overlap.

    Duplicate-key sources: this whole-row upsert REPLACES every matched
    key with ALL source rows carrying it (anti-join + union) — documented
    multiset semantics, deterministic either way. Clause merges differ:
    ``snapshot_merge_clauses`` applies per-row UPDATE/DELETE expressions,
    where a duplicated matched key would silently multiply rows, so THAT
    path raises MERGE_CARDINALITY_VIOLATION instead.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}; use snapshot_write")
    head = _read_manifest(spec, cur)
    if "schema" in head:
        table_schema = StructType.fromJson(head["schema"])
        if not _same_columns(source.schema, table_schema):
            raise SchemaMismatchError(
                f"snapshot_merge source schema must match the table at "
                f"{spec.path}; append with merge_schema=True first to evolve"
            )
    # source key envelope (one small aggregate) -> affected commits
    aggs = []
    for k in keys:
        aggs.append(F.min(k).alias(f"_mn_{k}"))
        aggs.append(F.max(k).alias(f"_mx_{k}"))
    env = source.agg(*aggs).collect()[0]
    ranges = {k: (env[f"_mn_{k}"], env[f"_mx_{k}"]) for k in keys}
    affected, untouched = pruned_dirs(spec, ranges, cur)
    cdf_removed = None
    if affected:
        old = _load_dirs(spark, spec, head, affected)  # DVs applied
        merged = old.join(source.select(*keys), keys, "left_anti").unionByName(
            source
        )
        # change sidecar: replaced pre-images out, every source row in
        # (an identical-payload replacement nets to zero at diff time)
        cdf_removed = old.join(source.select(*keys), keys, "left_semi")
    else:
        merged = source
    return _rewrite_commit(
        spark, spec, cur, untouched, merged, "merge", read_ranges=ranges,
        cdf_parts=(cdf_removed, source) if write_cdf else None,
    )


def snapshot_merge_clauses(
    spark: SparkSession,
    spec: TableSpec,
    source: DataFrame,
    keys: list[str],
    matched_update: dict[str, str] | None = None,
    matched_delete: str | None = None,
    insert: bool | str = True,
    not_matched_by_source_delete: str | None = None,
    write_cdf: bool = True,
) -> int:
    """Full-clause MERGE INTO — Delta's complete matched/not-matched form
    on the snapshot log (``snapshot_merge`` is the whole-row-upsert
    special case):

    - ``matched_delete``: SQL condition; a matched target row satisfying
      it is DELETED. Source columns are visible as ``src_<col>`` (keys
      keep their names), target columns by name — e.g. CDC applies
      ``"src_op = 'D'"``. Evaluated BEFORE matched_update (Delta's
      clause-order semantics with delete-first ordering).
    - ``matched_update``: {target_col: SQL expr} over the same namespace;
      a matched, not-deleted row takes the expressions, cast back to the
      table's column types (a merge never changes the schema). Key
      columns cannot be updated (row identity). Omitted → matched rows
      carry unchanged.
    - ``insert``: True inserts every unmatched source row (whole row);
      a string is a condition over SOURCE columns (plain names) gating
      the insert; False inserts nothing (update/delete-only merge).
    - ``not_matched_by_source_delete``: SQL condition over TARGET columns;
      a target row with NO source match satisfying it is deleted —
      Delta's WHEN NOT MATCHED BY SOURCE. This clause reads the WHOLE
      table (any row could lack a match), so stats pruning is disabled
      for it; without it only commits intersecting the source key
      envelope rewrite, exactly like ``snapshot_merge``.

    NULL join keys never match (SQL equality), so null-keyed source rows
    insert and null-keyed target rows fall under not-matched-by-source.
    Conflict behavior is ``_rewrite_commit``'s: disjoint concurrent
    commits rebase, real overlap aborts. Cites the reference's upsert
    surface (pipelines/silver/transform_local.py dedup-then-replace) —
    generalized to the clause algebra Delta exposes.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}; use snapshot_write")
    head = _read_manifest(spec, cur)
    if "schema" in head:
        table_schema = StructType.fromJson(head["schema"])
    else:
        table_schema = None
    bad_keys = sorted(set(matched_update or {}) & set(keys))
    if bad_keys:
        raise ValueError(
            f"matched_update cannot change merge keys {bad_keys} (row identity)"
        )
    # Pin the source plan ONCE: the envelope agg, the cardinality guard,
    # and the merge apply would otherwise each re-evaluate it, and a
    # non-deterministic source (rand(), uncheckpointed shuffle sampling)
    # could pass the guard yet hold duplicate matched keys at apply time
    # — the exact hazard the guard exists to prevent. localCheckpoint
    # materializes one immutable evaluation all three read.
    source = source.localCheckpoint(eager=True)
    aggs = []
    for k in keys:
        aggs.append(F.min(k).alias(f"_mn_{k}"))
        aggs.append(F.max(k).alias(f"_mx_{k}"))
    env = source.agg(*aggs).collect()[0]
    ranges = {k: (env[f"_mn_{k}"], env[f"_mx_{k}"]) for k in keys}
    if not_matched_by_source_delete is None:
        affected, untouched = pruned_dirs(spec, ranges, cur)
        read_ranges = ranges
    else:  # the by-source clause reads every row: no pruning is sound,
        # and the read set is the WHOLE table — read_ranges={} (full-table
        # read marker) so _rewrite_commit can never prove a concurrently
        # appended dir disjoint; a blind append racing this merge aborts
        # (Delta's ConcurrentAppendException when the merge predicate
        # spans the table) instead of its rows silently escaping the
        # by-source delete. None stays reserved for consumed-dirs-only
        # ops (purge/compaction).
        affected, untouched = list(head["dirs"]), []
        read_ranges = {}
    old = (
        _load_dirs(spark, spec, head, affected)
        if affected
        else _empty_like(spark, spec, head)
    )
    t_fields = (
        {f.name: f.dataType for f in table_schema.fields}
        if table_schema is not None
        else {f.name: f.dataType for f in old.schema.fields}
    )
    unknown = sorted(set(matched_update or {}) - set(t_fields))
    if unknown:
        raise ValueError(f"matched_update columns not in table: {unknown}")

    # MERGE cardinality guard (Delta's MERGE_CARDINALITY_VIOLATION): when
    # a matched clause exists, a target row matched by MULTIPLE source
    # rows would be updated/deleted once per duplicate — silently
    # multiplying rows on a non-deduped CDC batch. Refuse, naming the
    # keys. Only source keys that actually hit the target matter
    # (duplicate UNMATCHED keys legitimately insert multiple rows), and
    # the semi join runs over the already-pruned affected dirs only.
    if matched_update or matched_delete is not None:
        dup_keys = (
            source.join(old.select(*keys).distinct(), keys, "left_semi")
            .groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(5)
            .collect()
        )
        if dup_keys:
            shown = [tuple(r[k] for k in keys) for r in dup_keys]
            raise ValueError(
                f"merge into {spec.path}: multiple source rows match the "
                f"same target row for keys {keys} (e.g. {shown}); dedup "
                "the source by a deterministic tiebreaker before merging "
                "(MERGE_CARDINALITY_VIOLATION)"
            )

    src_pref = source.select(
        *[
            F.col(c).alias(c if c in keys else f"src_{c}")
            for c in source.columns
        ],
        F.lit(True).alias("_m"),
    )
    j = old.join(src_pref, keys, "left")
    matched = F.col("_m").isNotNull()
    drop = F.lit(False)
    if matched_delete is not None:
        drop = drop | (matched & F.coalesce(F.expr(matched_delete), F.lit(False)))
    if not_matched_by_source_delete is not None:
        drop = drop | (
            ~matched
            & F.coalesce(F.expr(not_matched_by_source_delete), F.lit(False))
        )
    upd = matched_update or {}
    kept = j.filter(~drop).select(
        *[
            (
                F.when(
                    matched & ~drop, F.expr(upd[c]).cast(t_fields[c])
                ).otherwise(F.col(c))
                if c in upd
                else F.col(c)
            ).alias(c)
            for c in t_fields
        ]
    )
    inserted_rows = None
    if insert:
        unmatched_src = source.join(
            old.select(*keys).distinct(), keys, "left_anti"
        )
        if isinstance(insert, str):
            unmatched_src = unmatched_src.filter(F.expr(insert))
        # inserts take the TABLE's columns and types (the source may carry
        # extra CDC columns like op flags — they stay on the source side)
        inserted_rows = unmatched_src.select(
            *[F.col(c).cast(t_fields[c]).alias(c) for c in t_fields]
        )
        merged = kept.unionByName(inserted_rows)
    else:
        merged = kept
    cdf_parts = None
    if write_cdf:
        # change sidecar: dropped rows' and updated rows' pre-images out,
        # updated rows' post-images and inserts in; matched-but-unchanged
        # rows net to zero at diff time (pre == post cancels)
        t_cols = list(t_fields)
        rem_parts, add_parts = [], []
        if matched_delete is not None or not_matched_by_source_delete is not None:
            rem_parts.append(j.filter(drop).select(*t_cols))
        if upd:
            touched = j.filter(matched & ~drop)
            rem_parts.append(touched.select(*t_cols))
            add_parts.append(
                touched.select(
                    *[
                        (
                            F.expr(upd[c]).cast(t_fields[c])
                            if c in upd
                            else F.col(c)
                        ).alias(c)
                        for c in t_fields
                    ]
                )
            )
        if inserted_rows is not None:
            add_parts.append(inserted_rows)

        def _cat(parts):
            if not parts:
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        cdf_parts = (_cat(rem_parts), _cat(add_parts))
    return _rewrite_commit(
        spark, spec, cur, untouched, merged, "merge",
        read_ranges=read_ranges, cdf_parts=cdf_parts,
    )


def snapshot_replace_where(
    spark: SparkSession,
    spec: TableSpec,
    df: DataFrame,
    ranges: dict[str, tuple],
    validate: bool = True,
    write_cdf: bool = True,
) -> int:
    """``INSERT OVERWRITE ... replaceWhere`` — Delta's predicate-scoped
    overwrite: rows matching EVERY range in ``ranges`` are replaced by
    ``df`` in ONE atomic commit (the delete and the insert cannot be
    observed separately); everything outside the predicate carries
    forward, and commits whose stats prove them disjoint carry
    byte-untouched. The canonical backfill shape at 100 TB: recompute one
    day/partition and swap it in without rewriting the table or leaving a
    window where the day is missing.

    ``validate=True`` enforces Delta's contract that every replacement
    row satisfies the predicate (one aggregate over ``df``); pass False
    for Delta's ``replaceWhere`` with constraint checking disabled.
    Conflicts follow ``_rewrite_commit``: concurrent commits provably
    disjoint from the predicate rebase; overlap aborts."""
    import pyspark.sql.functions as F

    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}; use snapshot_write")
    head = _read_manifest(spec, cur)
    inside = F.lit(True)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            inside = inside & (F.col(col) >= F.lit(lo))
        if hi is not None:
            inside = inside & (F.col(col) <= F.lit(hi))
    inside = F.coalesce(inside, F.lit(False))
    if validate:
        n_out = df.filter(~inside).count()
        if n_out:
            raise ValueError(
                f"replaceWhere: {n_out} replacement row(s) violate the "
                f"predicate {ranges} (pass validate=False to skip the check)"
            )
    affected, untouched = pruned_dirs(spec, ranges, cur)
    cdf_removed = None
    if affected:
        old = _load_dirs(spark, spec, head, affected)  # DVs applied
        survivors = old.filter(~inside)
        merged = survivors.unionByName(df.select(*old.columns))
        cdf_removed = old.filter(inside)  # replaced band's pre-images
    else:
        merged = df
    return _rewrite_commit(
        spark, spec, cur, untouched, merged, "replace_where",
        read_ranges=ranges,
        cdf_parts=(cdf_removed, df) if write_cdf else None,
    )


def snapshot_delete_where(
    spark: SparkSession,
    spec: TableSpec,
    ranges: dict[str, tuple],
    rewrite: bool = True,
    write_cdf: bool = True,
) -> int:
    """Row-level DELETE: rows inside EVERY range in ``ranges`` are
    deleted; only commits whose stats intersect the predicate are touched,
    the rest carry forward untouched.

    ``rewrite=True`` (default): copy-on-write — survivors from the
    affected commits move to one new commit dir (Delta's classic DELETE
    file rewrite). History stays readable until vacuum, so
    deletion-for-governance must pair with ``vacuum_snapshots`` exactly
    as in the forget-user flow.

    ``rewrite=False``: MERGE-ON-READ — Delta's deletion-vector shape. NO
    data is rewritten: the commit is metadata-only, recording the
    predicate scoped to the commits it could affect; every read path
    (snapshot_read, read_where, the DataSource, DML rewrites) filters
    those dirs' matching rows out. At 100 TB a delete costs one manifest
    write plus one counting aggregate over the affected commits, not a
    rewrite of them. Re-inserted keys in LATER commits are visible (the
    vector is scoped to the dirs that existed at delete time).
    ``purge_deletes`` materializes vectors back into clean files;
    governance deletes still need the purge + vacuum pair, since DV'd
    bytes remain on disk until then. The exact deleted-row count is
    recorded, so ``snapshot_count`` stays metadata-only."""
    import pyspark.sql.functions as F

    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    head = _read_manifest(spec, cur)
    affected, untouched = pruned_dirs(spec, ranges, cur)
    if not affected:  # nothing can match: no-op, no new version
        return cur
    old = _load_dirs(spark, spec, head, affected)  # prior DVs applied
    doomed = F.lit(True)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            doomed = doomed & (F.col(col) >= F.lit(lo))
        if hi is not None:
            doomed = doomed & (F.col(col) <= F.lit(hi))
    doomed = F.coalesce(doomed, F.lit(False))
    if not rewrite:
        cdf_entry = None
        if write_cdf and "schema" in head:
            # the DV'd pre-images ARE the change rows: persist them as
            # the sidecar, then count the deletes from the written files
            # (parquet footer metadata — no second scan of the table)
            cdf_entry = _write_cdf_sidecar(
                spec, f"c{cur + 1}-{uuid.uuid4().hex[:8]}",
                old.filter(doomed), None, head["schema"],
            )
            try:
                n_del = spark.read.format("parquet").load(
                    os.path.join(spec.path, cdf_entry["dir"])
                ).count()
            except Exception:
                # sidecar vanished under an aggressive concurrent vacuum
                # (derived metadata — losing it is always tolerable):
                # count from the source dirs and commit without the entry
                cdf_entry = None
                n_del = old.filter(doomed).count()
        else:
            n_del = old.filter(doomed).count()
        manifest = _metadata_commit_body(spec, cur, mode="delete_dv")
        entry = {
            "ranges": {c: [_dv_ser(lo), _dv_ser(hi)] for c, (lo, hi) in ranges.items()},
            "dirs": affected,
            "n": n_del,
        }
        manifest["dv"] = [*head.get("dv", []), entry]
        if cdf_entry is not None:
            manifest["cdf"] = cdf_entry
        _commit(spec, cur + 1, manifest)
        return cur + 1
    survivors = old.filter(~doomed)
    return _rewrite_commit(
        spark, spec, cur, untouched, survivors, "delete", read_ranges=ranges,
        cdf_parts=(old.filter(doomed), None) if write_cdf else None,
    )


def _dv_ser(v):
    """JSON-safe DV bound (dates/timestamps as ISO strings — Spark casts
    them back against the column at filter time)."""
    import datetime as _dt

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def purge_deletes(spark: SparkSession, spec: TableSpec) -> int:
    """Materialize every deletion vector: the DV-affected commits rewrite
    to clean files (one new commit dir of survivors), untouched commits
    carry forward, and the new head has no vectors — Delta's
    REORG TABLE ... APPLY (PURGE). After the purge, ``vacuum_snapshots``
    can reclaim the pre-purge dirs, completing a governance delete.
    No-op (head version returned) when the head has no vectors."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    head = _read_manifest(spec, cur)
    dv = head.get("dv", [])
    if not dv:
        return cur
    head_dirs = set(head["dirs"])
    affected_set = {d for e in dv for d in e["dirs"] if d in head_dirs}
    untouched = [d for d in head["dirs"] if d not in affected_set]
    affected = [d for d in head["dirs"] if d in affected_set]
    survivors = _load_dirs(spark, spec, head, affected)  # DVs applied
    return _rewrite_commit(spark, spec, cur, untouched, survivors, "purge")


def snapshot_update_where(
    spark: SparkSession,
    spec: TableSpec,
    ranges: dict[str, tuple],
    set_exprs: dict[str, str],
    write_cdf: bool = True,
) -> int:
    """Row-level ``UPDATE ... SET col = expr ... WHERE`` with
    stats-bounded rewrite — the third leg of the DML triad next to
    ``snapshot_merge`` and ``snapshot_delete_where``. Rows inside EVERY
    range in ``ranges`` take the SET expressions (evaluated against the
    matched row, so ``{"cents": "cents + 100"}`` is an increment);
    non-matching rows and commits whose stats prove them disjoint carry
    forward byte-untouched — at 100 TB an update touching one key band
    rewrites that band's commits, not the table.

    Each SET expression is cast back to the column's existing type
    (UPDATE never changes the schema — Delta's contract; evolve with an
    append first). Updated rows re-validate table CHECK constraints via
    the shared rewrite commit. Returns the head version unchanged when
    stats prove nothing can match (a pure no-op, like Delta's
    numFilesUpdated = 0). A commit race rebases when the interleaved
    commits are provably disjoint from the predicate (see
    ``_rewrite_commit``), aborting only on real overlap.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    head = _read_manifest(spec, cur)
    affected, untouched = pruned_dirs(spec, ranges, cur)
    if not affected:  # nothing can match: no-op, no new version
        return cur
    old = _load_dirs(spark, spec, head, affected)  # DVs applied
    if "schema" in head:
        table_schema = StructType.fromJson(head["schema"])
        schema_fields = {f.name: f.dataType for f in table_schema.fields}
    else:
        schema_fields = {f.name: f.dataType for f in old.schema.fields}
    unknown = sorted(set(set_exprs) - set(schema_fields))
    if unknown:
        raise ValueError(
            f"snapshot_update_where SET columns not in table: {unknown}"
        )
    matched = F.lit(True)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            matched = matched & (F.col(col) >= F.lit(lo))
        if hi is not None:
            matched = matched & (F.col(col) <= F.lit(hi))
    matched = F.coalesce(matched, F.lit(False))
    updated = old.select(
        *[
            (
                F.when(matched, F.expr(set_exprs[f.name]))
                .otherwise(F.col(f.name))
                .cast(schema_fields[f.name])
                if f.name in set_exprs
                else F.col(f.name)
            ).alias(f.name)
            for f in old.schema.fields
        ]
    )
    cdf_parts = None
    if write_cdf:
        # change sidecar: matched rows' pre- and post-images (a SET that
        # leaves a row unchanged nets to zero at diff time)
        pre = old.filter(matched)
        post = pre.select(
            *[
                (
                    F.expr(set_exprs[f.name]).cast(schema_fields[f.name])
                    if f.name in set_exprs
                    else F.col(f.name)
                ).alias(f.name)
                for f in old.schema.fields
            ]
        )
        cdf_parts = (pre, post)
    return _rewrite_commit(
        spark, spec, cur, untouched, updated, "update", read_ranges=ranges,
        cdf_parts=cdf_parts,
    )


def snapshot_history(spec: TableSpec) -> list[dict]:
    """DESCRIBE HISTORY parity: one dict per committed version (ascending)
    with version, mode, parent, commit-dir count, the table row count when
    every dir has recorded stats (Delta's numRecords operation metric),
    the txn watermarks a streaming writer recorded, and the extra
    provenance keys a mode records (restored_from for rollbacks). Reads
    manifests only — no data I/O."""
    out = []
    for v in _versions(spec):
        m = _read_manifest(spec, v)
        row = {
            "version": v,
            "mode": m.get("mode"),
            "parent": m.get("parent"),
            "n_dirs": len(m["dirs"]),
        }
        if "committed_at" in m:
            row["committed_at"] = m["committed_at"]
        rows = m.get("rows", {})
        if all(d in rows for d in m["dirs"]):
            row["n_rows"] = sum(int(rows[d]) for d in m["dirs"])
        if "txns" in m:
            row["txns"] = dict(m["txns"])
        if "restored_from" in m:
            row["restored_from"] = m["restored_from"]
        out.append(row)
    return out


def optimize_snapshots(
    spark: SparkSession,
    spec: TableSpec,
    max_dirs: int | None = None,
    zorder_by: list[str] | None = None,
    target_dirs: int = 8,
    bloom_for: tuple | None = None,
) -> int | None:
    """OPTIMIZE parity for the snapshot log: bin-pack the head version's
    commit dirs into ONE new commit (mode='optimize') so reads plan one
    directory instead of one per historical append. Old versions stay
    time-travelable until ``vacuum_snapshots`` reclaims the small dirs —
    exactly Delta's OPTIMIZE + VACUUM pairing (the reference prescribes a
    weekly OPTIMIZE, sql/ddl/01_bronze.sql:25-26).

    ``zorder_by`` turns this into ``OPTIMIZE ... ZORDER BY``: the head is
    rewritten into ``target_dirs`` RANGE buckets of the bit-interleaved
    Z-key (tables.zorder_key — the real curve), each bucket committed as
    its OWN manifest dir with its own min/max stats and row count. That
    is what makes the manifest-stats skipping layer bite after
    clustering: a point/range predicate on ANY participating column now
    prunes most dirs via ``pruned_dirs``/``snapshot_read_where``/the
    pushFilters hook — Delta's clustered-OPTIMIZE payoff, expressed at
    commit-dir granularity. Buckets are EXACT equi-depth slices of the
    sorted Z-key (distributed global rank + NTILE arithmetic — no sampled
    range boundaries), so the layout and its skipping quality are
    deterministic: exactly ``min(target_dirs, n_rows)`` buckets, each
    within one row of n/k. Cost: the rank's range shuffle + one hash
    shuffle on the bucket id; stats are one small aggregate per bucket.

    ``max_dirs``: only run when the head references MORE than this many
    dirs (the maintenance-loop guard; None = always). Returns the new
    version, or None when skipped. Aborts on a concurrent-commit race.
    Content is byte-preserved; per-commit stats are recollected.

    ``bloom_for``: rebuild bloom sidecars for the rewritten layout (an
    OPTIMIZE otherwise drops the old commits' filters with the old
    commits — pass the indexed columns to re-index each output dir; with
    ``zorder_by`` each bucket gets its own filter, so equality probes
    compose bloom + Z-clustered min/max)."""
    cur = current_version(spec)
    if cur is None:
        raise ValueError(f"no snapshots at {spec.path}")
    head = _read_manifest(spec, cur)
    if max_dirs is not None and len(head["dirs"]) <= max_dirs:
        return None
    rows = snapshot_read(spark, spec, cur)
    if zorder_by is None:
        return _rewrite_commit(
            spark, spec, cur, [], rows, "optimize", bloom_for=bloom_for
        )

    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.sources.tables import zorder_key

    version = cur + 1
    token = uuid.uuid4().hex[:8]
    rel_dir = f"data/b{version}-{token}"
    aggs = []
    for j, c in enumerate(zorder_by):
        aggs.append(F.min(F.col(c).cast("long")).alias(f"_zmin_{j}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"_zmax_{j}"))
    scalars = [f"_zmin_{j}" for j in range(len(zorder_by))] + [
        f"_zmax_{j}" for j in range(len(zorder_by))
    ]
    from creatorops_lakehouse_spark.operators.sampling import (
        distributed_global_rank,
        ntile_from_rank,
    )

    with_zk = (
        rows.crossJoin(F.broadcast(rows.agg(*aggs)))
        .withColumn("_zk", zorder_key(zorder_by))
        .drop(*scalars)
    )
    # exact equi-depth buckets via the distributed global rank + NTILE
    # arithmetic (NOT repartitionByRange — its sampled boundaries are
    # nondeterministic and can skew, which degrades per-bucket stats and
    # therefore skipping). Rows tied on _zk carry identical clustered
    # values, so tie placement across a bucket boundary never widens a
    # bucket's min/max: skipping quality is deterministic.
    ranked, n_rows = distributed_global_rank(
        with_zk, [F.col("_zk")], "_zrank"
    )
    k = max(1, min(target_dirs, n_rows))
    clustered = (
        ranked.withColumn("_zbucket", ntile_from_rank("_zrank", n_rows, k) - 1)
        .repartition(k, "_zbucket")
        .sortWithinPartitions("_zbucket", "_zk")
        .drop("_zk", "_zrank")
    )
    # hive partition columns nest UNDER the bucket, so each bucket subdir
    # is a self-contained partitioned layout (per-dir reads re-discover
    # the partition columns rooted at the bucket)
    zmap = _col_map(head)
    if zmap:  # files keep PHYSICAL names through the Z-order rewrite too
        clustered = clustered.select(
            *[F.col(c).alias(zmap.get(c, c)) for c in clustered.columns]
        )
    (
        _materialize_partitions(clustered, spec)
        .write.format(spec.format)
        .mode("errorifexists")
        .partitionBy("_zbucket", *_hive_partition_cols(spec))
        .save(os.path.join(spec.path, rel_dir))
    )
    # each _zbucket subdir becomes its OWN manifest dir: per-bucket stats
    # are what turns clustering into skipping
    base = os.path.join(spec.path, rel_dir)
    sub_dirs = sorted(
        f"{rel_dir}/{d}"
        for d in os.listdir(base)
        if d.startswith("_zbucket=")
    )
    schema = rows.schema
    phys_schema = schema
    if zmap:  # stats/blooms aggregate over the files' PHYSICAL names
        from pyspark.sql.types import StructType as _ST

        phys_schema = _ST.fromJson(
            {
                "type": "struct",
                "fields": [
                    {**f.jsonValue(), "name": zmap.get(f.name, f.name)}
                    for f in schema.fields
                ],
            }
        )
    stats, rcounts, blooms = {}, {}, {}
    for d in sub_dirs:
        st, n = _collect_stats(spark, spec, d, phys_schema, None)
        if st:
            stats[d] = st
        rcounts[d] = n
        if bloom_for:
            bf = _collect_bloom(
                spark, spec, d, phys_schema,
                tuple(zmap.get(c, c) for c in bloom_for),
                0.001, _BLOOM_MAX_BITS_DEFAULT, n,
            )
            if bf:
                blooms[d] = bf
    # commit with the same disjoint-race rebase contract as
    # _rewrite_commit: a ZORDER rewrite consumed exactly the base head's
    # dirs, so commits that only ADDED dirs (blind appends — Delta's
    # OPTIMIZE-vs-INSERT no-conflict cell) rebase, carrying the appended
    # dirs next to the Z-bucketed output; any metadata/DV change or a
    # rewrite of a consumed dir aborts.
    def _zmeta(m: dict) -> str:
        return json.dumps(
            {
                "schema": m.get("schema"),
                "column_map": m.get("column_map"),
                "constraints": m.get("constraints"),
                "dv": m.get("dv", []),
            },
            sort_keys=True,
        )

    base_dirs = set(head["dirs"])
    base_meta = _zmeta(head)
    head_m, head_v = head, cur
    for _ in range(11):
        version = head_v + 1
        kept = [d for d in head_m["dirs"] if d not in base_dirs]
        m_stats = {
            d: s for d, s in head_m.get("stats", {}).items() if d in set(kept)
        }
        m_stats.update(stats)
        m_rows = {
            d: r for d, r in head_m.get("rows", {}).items() if d in set(kept)
        }
        m_rows.update(rcounts)
        manifest = {
            "version": version,
            "mode": "optimize-zorder",
            "dirs": [*kept, *sub_dirs],
            "parent": head_v,
            "stats": m_stats,
            "rows": m_rows,
            "schema": schema.jsonValue(),
        }
        m_bloom = {
            d: p for d, p in head_m.get("bloom", {}).items() if d in set(kept)
        }
        m_bloom.update(blooms)
        if m_bloom:
            manifest["bloom"] = m_bloom
        new_dv = []
        for e in head_m.get("dv", []):  # vectors scoped to consumed dirs die
            ds = [d for d in e["dirs"] if d in set(kept)]
            if ds:
                new_dv.append(
                    {
                        "ranges": e["ranges"],
                        "dirs": ds,
                        "n": e["n"] if len(ds) == len(e["dirs"]) else None,
                    }
                )
        if new_dv:
            manifest["dv"] = new_dv
        if head_m.get("txns"):
            manifest["txns"] = head_m["txns"]
        if head_m.get("constraints"):
            manifest["constraints"] = head_m["constraints"]
        if head_m.get("column_map"):  # the column map follows the schema
            manifest["column_map"] = head_m["column_map"]
        try:
            _commit(spec, version, manifest)
            return version
        except SnapshotConflictError:
            new_cur = current_version(spec)
            new_head = _read_manifest(spec, new_cur)
            if _zmeta(new_head) != base_meta:
                raise SnapshotConflictError(
                    f"optimize-zorder at {spec.path}: concurrent commit "
                    "changed table metadata; recompute against the new head"
                ) from None
            if base_dirs - set(new_head["dirs"]):
                raise SnapshotConflictError(
                    f"optimize-zorder at {spec.path}: concurrent commit "
                    "rewrote dirs this rewrite also read; recompute against "
                    "the new head"
                ) from None
            head_m, head_v = new_head, new_cur
    raise SnapshotConflictError(
        f"optimize-zorder at {spec.path} lost 11 consecutive commit races"
    )
