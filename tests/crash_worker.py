"""SIGKILL crash-chaos worker for the snapshot log (see
tests/test_chaos_crash.py).

The cross-process chaos suite (tests/test_chaos_multiprocess.py) races
LIVE writers; this worker exists to be MURDERED. The parent spawns it in
its own process group, lets it commit for a random interval, then
SIGKILLs the whole group (python driver + JVM together — a node dying
mid-write), restarts it, and repeats. What that exercises, which no
in-process test can: torn parquet writes (the JVM dies inside
``df.write``), manifests killed between ``mkstemp`` and ``os.link``,
checkpoint folds killed between the ``os.replace`` and the loose-file
deletes, and exactly-once txn replays across real process deaths.

Roles (argv[1]):
  append <cycle>        infinite append loop; journals every committed
                        (cycle, seq, version); runs until killed
  txn <cycle> <n>       exactly-once appender app_id='crashapp': replays
                        txn_version 0..n-1 from scratch every restart
                        (snapshot_write_txn must skip the already-landed
                        prefix); writes <run_dir>/done_txn_<cycle> at end
  stream <cycle>        readStream(json drop dir, 1 file per micro-batch)
                        -> start_exactly_once_sink into the table, shared
                        checkpoint dir across restarts; runs until killed

Protocol: argv = role args..., then <table_path> <run_dir>. The worker
writes <run_dir>/ready_<name> only after its FIRST unit of work lands
(first commit / first micro-batch fully processed), so every kill cycle
is guaranteed to have exercised the write path at least once before the
bullet arrives.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_BATCH = 40


def batch_rows(cycle: int, seq: int):
    base = cycle * 1_000_000 + seq * 1_000
    return [(cycle, seq, base + i, (base + i) % 97) for i in range(ROWS_PER_BATCH)]


def main() -> int:
    role = sys.argv[1]
    *args, table_path, run_dir = sys.argv[2:]
    cycle = int(args[0])
    name = f"{role}_{cycle}"

    from pyspark.sql import SparkSession

    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_write,
        snapshot_write_txn,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"crash-{name}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spec = TableSpec("crash.t", table_path)
    journal = open(os.path.join(run_dir, f"journal_{name}.jsonl"), "a")

    def log(**kw):
        journal.write(json.dumps(kw) + "\n")
        journal.flush()
        os.fsync(journal.fileno())

    def ready():
        open(os.path.join(run_dir, f"ready_{name}"), "w").close()

    def mkdf(rows):
        return spark.createDataFrame(rows, ["cycle", "seq", "k", "val"])

    if role == "append":
        seq = 0
        while True:  # killed by the parent, never exits
            v = snapshot_write(mkdf(batch_rows(cycle, seq)), spec, mode="append")
            log(cycle=cycle, seq=seq, version=v)
            if seq == 0:
                ready()
            seq += 1

    elif role == "txn":
        n = int(args[1])
        # every restart replays the FULL 0..n-1 range — the txn map must
        # turn the replayed prefix into no-ops (exactly-once contract)
        for i in range(n):
            v = snapshot_write_txn(
                mkdf(batch_rows(cycle, i)), spec, app_id="crashapp", txn_version=i
            )
            log(cycle=cycle, txn_version=i, version=v)
            if i == 0:
                ready()
            time.sleep(0.05)  # widen the kill window between txns
        open(os.path.join(run_dir, f"done_txn_{cycle}"), "w").close()
        # idle so the parent controls teardown (a clean exit mid-kill
        # would race the killpg with process-group reuse)
        while True:
            time.sleep(0.5)

    elif role == "mview":
        # append-then-refresh loop made to be killed: each iteration
        # appends one batch to the SOURCE table then refreshes the VIEW
        # (table_path is the source; the view lives beside it). The kill
        # lands inside the append, inside the delta computation, or
        # between them — the view's txn-map watermark must make every
        # replayed refresh exact.
        from creatorops_lakehouse_spark.sources.matview import (
            create_agg_view,
            refresh_agg_view,
        )
        from creatorops_lakehouse_spark.sources.snapshots import (
            current_version,
            last_txn_version,
        )

        view = TableSpec("crash.v", os.path.join(run_dir, "view"))
        keys, sums, row_key = ["grp"], {"sum_k": "k"}, ["k"]

        def vrows(c, s):
            base = c * 1_000_000 + s * 1_000
            return [
                (c, s, base + i, (base + i) % 7) for i in range(ROWS_PER_BATCH)
            ]

        def vdf(rows):
            return spark.createDataFrame(rows, ["cycle", "seq", "k", "grp"])

        from creatorops_lakehouse_spark.sources.snapshots import (
            SnapshotConflictError,
        )

        if current_version(spec) is None:
            snapshot_write(vdf(vrows(cycle, 0)), spec)
        if last_txn_version(view, f"matview:{view.name}") is None:
            create_agg_view(spark, spec, view, keys, sums)
        seq = 1
        while True:
            snapshot_write(vdf(vrows(cycle, seq)), spec)
            try:
                v, mode = refresh_agg_view(
                    spark, spec, view, keys, sums, row_key
                )
                log(cycle=cycle, seq=seq, src_version=v, mode=mode)
            except SnapshotConflictError as e:
                # retry exhaustion under flat-out contention is a
                # legitimate optimistic-concurrency outcome (Delta's
                # ConcurrentAppendException shape): journal it and loop —
                # the next refresh re-reads the watermark and catches up
                log(cycle=cycle, seq=seq, tolerated=str(e)[:160])
            if seq == 1:
                ready()
            seq += 1

    elif role == "maint":
        # maintenance loop made to be killed: OPTIMIZE -> checkpoint fold
        # -> vacuum, round-robin forever. Every one of these ops has a
        # multi-step on-disk footprint (optimize: data write + commit;
        # fold: c<n>.json replace + loose deletes + old-checkpoint sweep;
        # vacuum: rmtree walk + manifest removals + checkpoint rewrite) —
        # the kill lands between those steps for real.
        from creatorops_lakehouse_spark.sources.snapshots import (
            SnapshotConflictError,
            checkpoint_manifest,
            optimize_snapshots,
            vacuum_snapshots,
        )

        i = 0
        while True:
            try:
                op = ("optimize", "checkpoint", "vacuum")[i % 3]
                if op == "optimize":
                    optimize_snapshots(spark, spec)
                elif op == "checkpoint":
                    checkpoint_manifest(spec)
                else:
                    vacuum_snapshots(spec, keep_last=6, orphan_grace_s=30.0)
                log(op=op, i=i)
                if i == 0:
                    ready()
            except (SnapshotConflictError, ValueError) as e:
                # a fold/optimize racing this process's own previous
                # incarnation's survivors; journal and continue
                log(tolerated=f"{type(e).__name__}: {e}"[:200], i=i)
            i += 1

    elif role == "stream":
        from creatorops_lakehouse_spark.streaming.pipeline import (
            start_exactly_once_sink,
        )

        input_dir = os.path.join(run_dir, "stream_in")
        ckpt = os.path.join(run_dir, "stream_ckpt")
        stream = (
            spark.readStream.schema("cycle int, seq int, k long, val long")
            .option("maxFilesPerTrigger", 1)
            .json(input_dir)
        )
        q = start_exactly_once_sink(
            stream, spec, ckpt, app_id="crashstream", trigger_once=False
        )
        # ready once the first micro-batch has fully committed
        while q.lastProgress is None or q.lastProgress["batchId"] < 1:
            if q.exception() is not None:
                log(error=str(q.exception()))
                return 1
            time.sleep(0.1)
        ready()
        q.awaitTermination()  # killed by the parent

    else:
        raise SystemExit(f"unknown role {role!r}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
