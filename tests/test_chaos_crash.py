"""SIGKILL crash-chaos on the snapshot log — kill -9 the WHOLE writer
process group (python driver + JVM, a node dying) at random points and
assert the table never shows a torn state.

The cross-process chaos suite races live writers; every one of those
processes still EXITS CLEANLY. This suite is about the other production
failure: the writer that never gets to clean up. Each cycle boots a
fresh worker (tests/crash_worker.py), lets it commit, and murders it
mid-flight; across cycles the kill lands inside ``df.write`` (torn
parquet), between data-write and manifest publish (orphan dir), inside
the mkstemp-to-os.link window (stranded tmp), and between commit and
journal fsync (committed-but-unjournaled batch).

Invariants:
  - ALL-OR-NOTHING: every (cycle, seq) batch visible in the table is
    COMPLETE (exactly ROWS_PER_BATCH rows) — a partial batch visible at
    any version would be a torn commit;
  - every journaled commit is present (fsync'd journal line => the
    commit had published — kills must not un-commit);
  - every retained version is readable (no manifest points at a file a
    crash left half-written);
  - post-crash maintenance heals the debris: checkpoint + vacuum with an
    orphan grace reap the crashed writers' uncommitted data dirs AND the
    stranded manifest-dir tmp files, without touching committed rows;
  - exactly-once txn replay across process death: a worker that replays
    its full txn_version range from scratch after every SIGKILL lands
    each batch exactly once (Delta's txnAppId/txnVersion contract);
  - streaming exactly-once across driver death: kill the streaming
    driver mid-stream, restart from the same checkpoint, every input
    row lands exactly once.
"""

from __future__ import annotations

import glob
import json
import os
import random
import signal
import subprocess
import sys
import time

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "crash_worker.py")

ROWS_PER_BATCH = 40  # keep in sync with crash_worker.py


def _launch(role_args, table, run_dir):
    # start_new_session puts the worker AND its JVM child in their own
    # process group, so killpg takes the whole "node" down at one instant
    return subprocess.Popen(
        [sys.executable, WORKER, *map(str, role_args), table, run_dir],
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
        start_new_session=True,
    )


def _killpg(proc):
    with open(os.devnull, "w"):
        pass
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def _wait_file(path, deadline_s, proc=None, what=""):
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        if os.path.exists(path):
            return True
        if proc is not None and proc.poll() not in (None, 0):
            raise AssertionError(f"worker died before {what or path}")
        time.sleep(0.1)
    return False


def _journal_lines(run_dir, pattern):
    out = []
    for path in glob.glob(os.path.join(run_dir, pattern)):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    return out


def _seed(spark, spec):
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_write

    snapshot_write(
        spark.createDataFrame([(-1, -1, -1, 0)], ["cycle", "seq", "k", "val"]),
        spec,
    )


def test_crash_torn_appender_all_or_nothing(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        _manifest_dir,
        _read_manifest,
        _versions,
        checkpoint_manifest,
        snapshot_read,
        snapshot_write,
        vacuum_snapshots,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    table = str(tmp_path / "t")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    spec = TableSpec("crash.t", table)
    _seed(spark, spec)

    rng = random.Random(0xC0FFEE)
    n_cycles = 4
    for cycle in range(n_cycles):
        p = _launch(["append", cycle], table, run_dir)
        ok = _wait_file(
            os.path.join(run_dir, f"ready_append_{cycle}"), 180, p, "first commit"
        )
        assert ok, f"cycle {cycle}: worker never landed its first commit"
        time.sleep(rng.uniform(0.1, 1.2))  # kill mid-commit, varying phase
        _killpg(p)

    # --- all-or-nothing: every visible batch is complete ------------------
    df = snapshot_read(spark, spec).filter("cycle >= 0")
    counts = {
        (r["cycle"], r["seq"]): r["n"]
        for r in df.groupBy("cycle", "seq").count().withColumnRenamed("count", "n").collect()
    }
    torn = {k: v for k, v in counts.items() if v != ROWS_PER_BATCH}
    assert not torn, f"TORN batches visible after SIGKILL: {torn}"

    # --- journaled commits are durable ------------------------------------
    journaled = {
        (ln["cycle"], ln["seq"])
        for ln in _journal_lines(run_dir, "journal_append_*.jsonl")
    }
    missing = journaled - set(counts)
    assert not missing, f"journaled commits vanished: {missing}"
    assert len(journaled) >= n_cycles  # >=1 commit per cycle (the ready gate)

    # --- every retained version still readable ----------------------------
    for v in _versions(spec):
        snapshot_read(spark, spec, version=v).count()

    # --- maintenance heals the crash debris -------------------------------
    n_before = df.count()
    checkpoint_manifest(spec)
    snapshot_write(
        spark.createDataFrame(
            [(99, 0, 99_000_000 + i, i % 97) for i in range(ROWS_PER_BATCH)],
            ["cycle", "seq", "k", "val"],
        ),
        spec,
    )
    # the mkstemp-to-link kill window is microseconds wide, so a stranded
    # manifest tmp is rare in practice — plant one to pin the reap path
    # (exactly what a writer killed between tmp-write and os.link leaves)
    planted = os.path.join(_manifest_dir(spec), ".v999-stalecrash")
    with open(planted, "w") as f:
        f.write("{}")
    # an UNRELATED hidden file (editor swap, .DS_Store, future sidecar)
    # colocated in the log dir is NOT the reaper's to delete — only the
    # documented .v<N>-/.c<N>- mkstemp prefixes are
    bystander = os.path.join(_manifest_dir(spec), ".DS_Store")
    with open(bystander, "w") as f:
        f.write("x")
    vacuum_snapshots(spec, keep_last=1, orphan_grace_s=0.0)
    assert os.path.exists(bystander), "reaper deleted an unrelated hidden file"
    os.remove(bystander)

    after = snapshot_read(spark, spec).filter("cycle >= 0")
    assert after.count() == n_before + ROWS_PER_BATCH  # reap touched no rows

    # on-disk data dirs == exactly what the retained manifests reference
    referenced: set[str] = set()
    for v in _versions(spec):
        referenced.update(_read_manifest(spec, v)["dirs"])
    on_disk = {
        f"data/{name}" for name in os.listdir(os.path.join(table, "data"))
    }
    stray = on_disk - referenced
    assert not stray, f"crash orphans survived vacuum: {stray}"

    # stranded mkstemp tmps in the manifest dir were reaped too
    tmps = [n for n in os.listdir(_manifest_dir(spec)) if n.startswith(".")]
    assert not tmps, f"stranded manifest tmp files survived vacuum: {tmps}"


def test_crash_exactly_once_txn_resume(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        last_txn_version,
        snapshot_read,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    table = str(tmp_path / "t")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    spec = TableSpec("crash.t", table)
    _seed(spark, spec)

    n_txn = 10
    rng = random.Random(0xDEAD)
    done = None
    for cycle in range(4):
        p = _launch(["txn", cycle, n_txn], table, run_dir)
        done_path = os.path.join(run_dir, f"done_txn_{cycle}")
        ok = _wait_file(
            os.path.join(run_dir, f"ready_txn_{cycle}"), 180, p, "first txn"
        )
        assert ok, f"cycle {cycle}: worker never landed its first txn"
        if cycle < 3:
            # kill mid-range; the NEXT cycle replays 0..n-1 from scratch
            deadline = time.time() + rng.uniform(0.1, 0.8)
            while time.time() < deadline and not os.path.exists(done_path):
                time.sleep(0.05)
        else:
            # final cycle runs undisturbed to completion
            assert _wait_file(done_path, 240, p, "txn completion")
        if os.path.exists(done_path):
            done = cycle
        _killpg(p)
        if done is not None:
            break
    assert done is not None

    # exactly once: each txn_version appears as ONE complete batch, never
    # duplicated by the replaying restarts
    df = snapshot_read(spark, spec).filter("cycle >= 0")
    per_txn = {
        r["seq"]: r["n"]
        for r in df.groupBy("seq").count().withColumnRenamed("count", "n").collect()
    }
    assert per_txn == {i: ROWS_PER_BATCH for i in range(n_txn)}, per_txn
    # and each came from exactly one cycle (no cross-restart double-land)
    assert df.select("cycle", "seq").distinct().count() == n_txn
    assert last_txn_version(spec, "crashapp") == n_txn - 1


def _drop_stream_files(input_dir, file_ids):
    os.makedirs(input_dir, exist_ok=True)
    for j in file_ids:
        rows = [
            {"cycle": 0, "seq": j, "k": j * 100 + i, "val": i} for i in range(25)
        ]
        tmp = os.path.join(input_dir, f".f{j}.json.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(input_dir, f"f{j}.json"))


def test_crash_streaming_sink_resume(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    table = str(tmp_path / "t")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    spec = TableSpec("crash.t", table)
    input_dir = os.path.join(run_dir, "stream_in")
    _drop_stream_files(input_dir, range(3))

    rng = random.Random(0xBEEF)
    p = _launch(["stream", 0], table, run_dir)
    ok = _wait_file(
        os.path.join(run_dir, "ready_stream_0"), 240, p, "first micro-batches"
    )
    assert ok, "streaming worker never processed its first micro-batches"
    time.sleep(rng.uniform(0.2, 1.0))
    _killpg(p)  # driver death mid-stream, checkpoint possibly mid-batch

    _drop_stream_files(input_dir, range(3, 6))
    p = _launch(["stream", 1], table, run_dir)
    try:
        deadline = time.time() + 240
        total = 0
        while time.time() < deadline:
            assert p.poll() is None, "restarted streaming worker died"
            try:
                total = snapshot_read(spark, spec).count()
            except Exception:
                total = 0
            if total >= 150:
                break
            time.sleep(0.5)
        assert total == 150, f"expected 150 rows after resume, saw {total}"
        # give a trailing replayed batch the chance to double-land (it
        # must not — the txn map makes the replay a no-op)
        time.sleep(3)
    finally:
        _killpg(p)

    df = snapshot_read(spark, spec)
    assert df.count() == 150
    assert df.select("k").distinct().count() == 150, "duplicated rows after resume"


def test_crash_mid_vacuum_self_heals(spark, tmp_path):
    """Vacuum reclaims data dirs FIRST and removes dropped manifests
    SECOND (the same ordering as Delta's VACUUM, which deletes files the
    log may still reference). A crash between the two phases leaves
    ZOMBIE versions: manifests whose exclusive data dirs are gone. The
    contract this test pins: the head and every retained version stay
    readable, a checkpoint fold that resurrects a zombie keeps the log
    healthy (reading the zombie itself fails LOUDLY, never silently
    empty), and the NEXT vacuum converges — zombies dropped, disk equal
    to the retained reference set."""
    import shutil

    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        _versions,
        checkpoint_manifest,
        current_version,
        snapshot_read,
        snapshot_write,
        vacuum_snapshots,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    spec = TableSpec("crash.t", str(tmp_path / "t"))
    # v0-v2 appends, v3 OVERWRITE (the pre-overwrite dirs become exclusive
    # to v0-v2 — in an append-only chain dropped versions share every dir
    # with the head and vacuum reclaims nothing), v4-v5 appends
    for b in range(6):
        snapshot_write(
            spark.createDataFrame(
                [(0, b, b * 1000 + i, i % 97) for i in range(ROWS_PER_BATCH)],
                ["cycle", "seq", "k", "val"],
            ),
            spec,
            mode="overwrite" if b == 3 else "append",
        )
    head = current_version(spec)
    head_rows = 3 * ROWS_PER_BATCH  # seq 3 (overwrite) + seq 4 + seq 5

    # --- simulate the crash: vacuum(keep_last=2)'s phase 1 completed
    # (exclusive data dirs of dropped versions reclaimed), phase 2 (manifest
    # removal + checkpoint rewrite) never ran
    vs = _versions(spec)
    drop, keep = vs[:-2], vs[-2:]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(spec, v)["dirs"])
    for v in drop:
        for d in _read_manifest(spec, v)["dirs"]:
            if d not in live:
                shutil.rmtree(os.path.join(spec.path, d), ignore_errors=True)

    # head + retained versions unaffected by the zombie manifests
    assert current_version(spec) == head
    assert snapshot_read(spark, spec).filter("cycle = 0").count() == head_rows
    for v in keep:
        snapshot_read(spark, spec, version=v).count()

    # a fold now RESURRECTS the zombies into the checkpoint — the log must
    # stay healthy, and reading a zombie must fail loudly, never return
    # silently-partial data
    checkpoint_manifest(spec)
    assert current_version(spec) == head
    assert snapshot_read(spark, spec).filter("cycle = 0").count() == head_rows
    import pytest as _pytest

    with _pytest.raises(Exception, match="PATH_NOT_FOUND|unknown snapshot|does not exist"):
        snapshot_read(spark, spec, version=drop[0]).count()

    # the next vacuum converges: zombies dropped, disk == retained refs
    vacuum_snapshots(spec, keep_last=2, orphan_grace_s=0.0)
    assert _versions(spec) == keep
    referenced: set[str] = set()
    for v in _versions(spec):
        referenced.update(_read_manifest(spec, v)["dirs"])
    on_disk = {
        f"data/{name}" for name in os.listdir(os.path.join(spec.path, "data"))
    }
    assert on_disk == {d for d in referenced if d.startswith("data/")}
    assert snapshot_read(spark, spec).filter("cycle = 0").count() == head_rows


def test_crash_killed_maintenance_preserves_data(spark, tmp_path):
    """SIGKILL the MAINTENANCE process mid-op across repeated cycles:
    OPTIMIZE (data rewrite + commit), checkpoint fold (c<n>.json replace
    + loose-manifest deletes + stale-checkpoint sweep), and vacuum
    (rmtree walk + manifest removal + checkpoint rewrite) all die at
    random phases. Maintenance is DATA-PRESERVING by contract, so the
    invariant is absolute: after every storm of kills the head holds
    exactly the rows the appends committed, and a fresh
    checkpoint+optimize+vacuum converges the debris."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        _versions,
        checkpoint_manifest,
        optimize_snapshots,
        snapshot_read,
        snapshot_write,
        vacuum_snapshots,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    table = str(tmp_path / "t")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    spec = TableSpec("crash.t", table)

    # ground truth: 12 committed batches, never touched after this
    for b in range(12):
        snapshot_write(
            spark.createDataFrame(
                [(0, b, b * 1000 + i, i % 97) for i in range(ROWS_PER_BATCH)],
                ["cycle", "seq", "k", "val"],
            ),
            spec,
        )
    expect_n = 12 * ROWS_PER_BATCH
    expect_sum = sum(
        b * 1000 + i for b in range(12) for i in range(ROWS_PER_BATCH)
    )

    rng = random.Random(0xFA11)
    for cycle in range(3):
        p = _launch(["maint", cycle], table, run_dir)
        ok = _wait_file(
            os.path.join(run_dir, f"ready_maint_{cycle}"), 180, p, "first op"
        )
        assert ok, f"cycle {cycle}: maintenance worker never finished an op"
        time.sleep(rng.uniform(0.2, 2.0))
        _killpg(p)

        # the table is intact after EVERY kill, not just at the end
        got = snapshot_read(spark, spec).agg(
            {"k": "sum", "*": "count"}
        ).collect()[0]
        assert got["count(1)"] == expect_n, f"cycle {cycle}: rows changed"
        assert got["sum(k)"] == expect_sum, f"cycle {cycle}: content changed"

    # post-storm maintenance converges whatever the kills left behind
    optimize_snapshots(spark, spec)
    checkpoint_manifest(spec)
    vacuum_snapshots(spec, keep_last=1, orphan_grace_s=0.0)
    got = snapshot_read(spark, spec).agg({"k": "sum", "*": "count"}).collect()[0]
    assert (got["count(1)"], got["sum(k)"]) == (expect_n, expect_sum)
    referenced: set[str] = set()
    for v in _versions(spec):
        referenced.update(_read_manifest(spec, v)["dirs"])
    on_disk = set()
    for name in os.listdir(os.path.join(table, "data")):
        on_disk.add(f"data/{name}")
    stray = {
        d for d in on_disk
        if d not in referenced and not any(r.startswith(d + "/") for r in referenced)
    }
    assert not stray, f"maintenance-kill debris survived final vacuum: {stray}"


def test_crash_matview_refresher_watermark_exact(spark, tmp_path):
    """SIGKILL the append-then-refresh loop at random phases across
    cycles: the kill lands inside a source append, inside a refresh's
    delta computation, or between refresh commit and journal. The
    matview contract under fire: the view's txn-map watermark and the
    merged state land in ONE commit, so after any number of murdered
    refreshers one final refresh brings the view to EXACT equality with
    a from-scratch aggregate of the source head — nothing double-folded,
    nothing lost."""
    from creatorops_lakehouse_spark.sources.matview import refresh_agg_view
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    table = str(tmp_path / "t")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    src = TableSpec("crash.t", table)
    view = TableSpec("crash.v", os.path.join(run_dir, "view"))

    rng = random.Random(0x51EE)
    for cycle in range(3):
        p = _launch(["mview", cycle], table, run_dir)
        ok = _wait_file(
            os.path.join(run_dir, f"ready_mview_{cycle}"), 180, p,
            "first refresh",
        )
        assert ok, f"cycle {cycle}: worker never completed a refresh"
        time.sleep(rng.uniform(0.1, 1.5))
        _killpg(p)

    # one clean catch-up, then exact equality with the full recompute
    refresh_agg_view(
        spark, src, view, ["grp"], {"sum_k": "k"}, ["k"]
    )
    expect = {
        r.grp: (r.n, r.s)
        for r in snapshot_read(spark, src)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("s"),
        )
        .collect()
    }
    got = {
        r.grp: (r.n_rows, r.sum_k)
        for r in snapshot_read(spark, view).collect()
    }
    assert got == expect
    # and every journaled (committed) refresh's source version is <= head
    lines = _journal_lines(run_dir, "journal_mview_*.jsonl")
    assert lines, "no refresh ever committed across three cycles"
    assert all(ln["mode"] in ("incremental-append", "noop") for ln in lines)


def test_crash_dueling_matview_refreshers(spark, tmp_path):
    """TWO append-and-refresh processes share one source and ONE view:
    their view overwrites race for real across JVMs (the in-process
    thread test can't see file-level publish races). The refresh retry
    loop must absorb every cross-process SnapshotConflictError — a loser
    re-reads the watermark and either redoes the catch-up or no-ops.
    Both storms end in SIGKILL; a final clean refresh must land the view
    at exact equality with the full recompute."""
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    table = str(tmp_path / "t")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    src = TableSpec("crash.t", table)
    view = TableSpec("crash.v", os.path.join(run_dir, "view"))

    # pre-seed table + view so the workers race only append/refresh
    snapshot_write(
        spark.createDataFrame(
            [(-1, 0, i, i % 7) for i in range(ROWS_PER_BATCH)],
            ["cycle", "seq", "k", "grp"],
        ),
        src,
    )
    create_agg_view(spark, src, view, ["grp"], {"sum_k": "k"})

    ps = [_launch(["mview", c], table, run_dir) for c in (0, 1)]
    try:
        for c in (0, 1):
            ok = _wait_file(
                os.path.join(run_dir, f"ready_mview_{c}"), 180, ps[c],
                "first refresh",
            )
            assert ok, f"refresher {c} never completed a refresh"
        time.sleep(6)  # dueling refreshes across JVMs
        for p in ps:
            assert p.poll() is None, (
                "a refresher died mid-duel — retry loop failed to absorb "
                "a cross-process conflict"
            )
    finally:
        for p in ps:
            _killpg(p)

    refresh_agg_view(spark, src, view, ["grp"], {"sum_k": "k"}, ["k"])
    expect = {
        r.grp: (r.n, r.s)
        for r in snapshot_read(spark, src)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("s"),
        )
        .collect()
    }
    got = {
        r.grp: (r.n_rows, r.sum_k)
        for r in snapshot_read(spark, view).collect()
    }
    assert got == expect
    # both refreshers stayed in the fight (committed or tolerated a
    # conflict-exhaustion — never died), and real refreshes landed
    committed = 0
    for c in (0, 1):
        lines = _journal_lines(run_dir, f"journal_mview_{c}.jsonl")
        assert lines, f"refresher {c} journaled nothing"
        committed += sum(1 for ln in lines if "mode" in ln)
    assert committed >= 2, "the duel produced almost no committed refreshes"
