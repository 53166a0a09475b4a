"""Cross-PROCESS chaos worker for the snapshot log (see
tests/test_chaos_multiprocess.py).

Every prior conflict/race test interleaved writers inside ONE Python
process, where the GIL and deterministic call ordering hide real
filesystem races. This worker runs as its OWN OS process with its OWN
SparkSession and hammers a shared table directory; the os.link
put-if-absent publish, the append/DML rebase loops, checkpoint folding,
and vacuum all get raced by genuinely concurrent syscalls.

Roles (argv[1]):
  append  <wid> <n_batches>   exactly-once appender, app_id=app<wid>
  shared  <tag> <n_batches>   two processes share app_id=shared: per
                              txn_version exactly ONE commit may land
  dml     <n_rounds>          serial DELETE/UPDATE/DV-DELETE over its
                              own key range (k >= 9_000_000)
  mview                       matview refresher loop: create-if-absent,
                              then refresh until stop — races the DML
                              worker for the classic IVM lost-delta
                              window (delete landing between the CDF
                              read and the view commit)
  optimize                    OPTIMIZE loop until the stop file appears
  checkpoint                  checkpoint-fold loop until stop
  vacuum                      vacuum loop (keep_last deep enough that a
                              racing reader/rewriter never loses its
                              read set mid-flight — the documented
                              Delta VACUUM retention contract)

Protocol: argv = role args..., then <table_path> <run_dir>.
The worker writes <run_dir>/ready_<name> after Spark init, blocks on
<run_dir>/go, then runs and journals every COMMITTED op as a JSON line
in <run_dir>/journal_<name>.jsonl; tolerated losses (SnapshotConflict
after retries) are journaled as {"conflict": ...} and retried. Any
other exception is journaled as {"error": ...} and fails the test.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_BATCH = 50
DML_BASE = 9_000_000
DML_ROWS = 200


def appender_rows(writer: str, base: int, batch: int):
    return [
        (writer, batch, base + batch * 1000 + i, (base + batch * 1000 + i) % 97)
        for i in range(ROWS_PER_BATCH)
    ]


def main() -> int:
    role = sys.argv[1]
    *args, table_path, run_dir = sys.argv[2:]
    name = role + ("_" + args[0] if role in ("append", "shared") else "")

    from pyspark.sql import SparkSession

    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        checkpoint_manifest,
        optimize_snapshots,
        snapshot_delete_where,
        snapshot_update_where,
        snapshot_write,
        snapshot_write_txn,
        vacuum_snapshots,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"chaos-{name}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spec = TableSpec("chaos.t", table_path)
    # tight-retention mode (test_chaos_aggressive_vacuum): vacuum runs
    # keep_last so small that in-flight readers/rewriters may lose their
    # read set mid-op — ALLOWED by the documented VACUUM retention
    # contract (retention must exceed the longest transaction). Workers
    # then tolerate the read-crash classes; the WRITE protocol's
    # invariants (no lost/dup commit, unique versions) must still hold.
    tight = os.environ.get("CHAOS_TIGHT") == "1"

    def is_retention_race(e: Exception) -> bool:
        txt = f"{type(e).__name__}: {e}"
        return (
            isinstance(e, FileNotFoundError)
            or "FileNotFoundException" in txt
            or "unknown snapshot version" in txt
            or "PATH_NOT_FOUND" in txt
        )

    journal = open(os.path.join(run_dir, f"journal_{name}.jsonl"), "w")

    def log(**kw):
        journal.write(json.dumps(kw) + "\n")
        journal.flush()

    def mkdf(rows):
        return spark.createDataFrame(rows, ["writer", "batch", "k", "val"])

    # barrier: everyone finishes JVM boot, then hammers simultaneously
    open(os.path.join(run_dir, f"ready_{name}"), "w").close()
    go = os.path.join(run_dir, "go")
    while not os.path.exists(go):
        time.sleep(0.05)

    stop = os.path.join(run_dir, "stop")

    def until_committed(fn, what, skip_on_race=False):
        """Retry a write whose OUTER call lost every in-call rebase; the
        exactly-once txn record (or idempotent predicate) makes the
        retry safe."""
        while True:
            try:
                return fn()
            except SnapshotConflictError as e:
                log(conflict=what, msg=str(e)[:120])
                time.sleep(0.05)
            except Exception as e:  # noqa: BLE001
                if tight and is_retention_race(e):
                    log(retention_race=what, msg=str(e)[:120])
                    if skip_on_race:
                        return None
                    time.sleep(0.1)
                    continue
                raise

    try:
        if role in ("append", "shared"):
            wid, n_batches = args[0], int(args[1])
            app_id = f"app{wid}" if role == "append" else "shared"
            writer = app_id if role == "append" else "shared"
            base = (int(wid) + 1) * 1_000_000 if role == "append" else 8_000_000
            for b in range(n_batches):
                df = mkdf(appender_rows(writer, base, b))
                v = until_committed(
                    lambda: snapshot_write_txn(df, spec, app_id=app_id, txn_version=b),
                    f"append b{b}",
                )
                if role == "append":
                    # sole writer of this app_id: the returned version IS
                    # the commit this batch won
                    log(op="append", batch=b, version=v)
                    if b % 5 == 4:  # at-least-once redelivery: must no-op
                        v2 = snapshot_write_txn(df, spec, app_id=app_id, txn_version=b)
                        log(op="redeliver", batch=b, version=v2)
                else:
                    # two processes race this app_id: a skip returns the
                    # current version, indistinguishable from a win — the
                    # verifier checks table content, not this journal
                    log(op="shared_maybe", batch=b, version=v)
        elif role == "dml":
            n_rounds = int(args[0])
            seed = [
                ("dml", -1, DML_BASE + i, (DML_BASE + i) % 97)
                for i in range(DML_ROWS)
            ]
            v = until_committed(  # txn: a retried seed can never double
                lambda: snapshot_write_txn(
                    mkdf(seed), spec, app_id="dml_seed", txn_version=0
                ),
                "dml seed",
            )
            log(op="dml_seed", version=v)
            for r in range(n_rounds):
                lo = DML_BASE + (r * 17) % DML_ROWS
                hi = lo + 6
                kind = ("delete", "update", "dv_delete")[r % 3]
                if kind == "delete":
                    v = until_committed(
                        lambda: snapshot_delete_where(
                            spark, spec, {"k": (lo, hi)}, rewrite=True
                        ),
                        f"dml delete r{r}", skip_on_race=True,
                    )
                elif kind == "dv_delete":
                    v = until_committed(
                        lambda: snapshot_delete_where(
                            spark, spec, {"k": (lo, hi)}, rewrite=False
                        ),
                        f"dml dv r{r}", skip_on_race=True,
                    )
                else:
                    v = until_committed(
                        lambda: snapshot_update_where(
                            spark, spec, {"k": (lo, hi)}, {"val": "val + 1000"}
                        ),
                        f"dml update r{r}", skip_on_race=True,
                    )
                if v is None:
                    continue
                log(op=kind, lo=lo, hi=hi, version=v)
        elif role == "mview":
            from creatorops_lakehouse_spark.sources.matview import (
                create_agg_view,
                refresh_agg_view,
            )
            from creatorops_lakehouse_spark.sources.snapshots import (
                last_txn_version,
            )

            view = TableSpec("chaos.v", table_path + "_view")
            keys, sums, row_key = ["writer"], {"sum_val": "val"}, ["k"]
            # the view also carries a CMS frequency sketch: the linear ±
            # fold goes through the SAME raced CDF fallback, so the duel
            # exercises sketch maintenance under concurrent DML too
            cmss = {"f_val": "val"}
            if last_txn_version(view, "matview:chaos.v") is None:
                v = until_committed(
                    lambda: create_agg_view(
                        spark, spec, view, keys, sums, cmss=cmss
                    ),
                    "mview create",
                )
                log(op="mview_create", version=v)
            while not os.path.exists(stop):
                try:
                    v, mode = refresh_agg_view(
                        spark, spec, view, keys, sums, row_key, cmss=cmss
                    )
                    if mode != "noop":
                        log(op="mview_refresh", version=v, mode=mode)
                except SnapshotConflictError as e:
                    log(conflict="mview", msg=str(e)[:120])
                except Exception as e:  # noqa: BLE001
                    if tight and is_retention_race(e):
                        log(retention_race="mview", msg=str(e)[:120])
                    else:
                        raise
                time.sleep(0.25)
        elif role == "cascade":
            # GOLD view over the mview role's silver view (matview
            # cascade, VERDICT r11 item 5): this process races the
            # PARENT's refresher — every parent overwrite it spans folds
            # as the parent's key-level CDF between two pinned versions,
            # and both levels' commits carry the expected_version CAS,
            # so any interleaving converges with no double-fold.
            import pyspark.sql.functions as F

            from creatorops_lakehouse_spark.sources.matview import (
                create_agg_view,
                refresh_agg_view,
            )
            from creatorops_lakehouse_spark.sources.snapshots import (
                current_version,
                last_txn_version,
            )

            parent = TableSpec("chaos.v", table_path + "_view")
            gold = TableSpec("chaos.g", table_path + "_gold")
            keys = ["wband"]
            sums = {"sum_val": "sum_val", "silver_rows": "n_rows"}
            row_key = ["writer"]

            def enrich(df):
                return df.withColumn("wband", F.substring("writer", 1, 3))

            while (
                current_version(parent) is None
                and not os.path.exists(stop)
            ):
                time.sleep(0.2)
            if current_version(parent) is not None:
                if last_txn_version(gold, "matview:chaos.g") is None:
                    v = until_committed(
                        lambda: create_agg_view(
                            spark, parent, gold, keys, sums, enrich=enrich
                        ),
                        "cascade create",
                    )
                    log(op="cascade_create", version=v)
                while not os.path.exists(stop):
                    try:
                        v, mode = refresh_agg_view(
                            spark, parent, gold, keys, sums, row_key,
                            enrich=enrich,
                        )
                        if mode != "noop":
                            log(op="cascade_refresh", version=v, mode=mode)
                    except SnapshotConflictError as e:
                        log(conflict="cascade", msg=str(e)[:120])
                    time.sleep(0.3)
        elif role == "optimize":
            while not os.path.exists(stop):
                try:
                    v = optimize_snapshots(spark, spec, max_dirs=6)
                    if v is not None:
                        log(op="optimize", version=v)
                except SnapshotConflictError as e:
                    log(conflict="optimize", msg=str(e)[:120])
                except Exception as e:  # noqa: BLE001
                    if tight and is_retention_race(e):
                        log(retention_race="optimize", msg=str(e)[:120])
                    else:
                        raise
                time.sleep(0.3)
        elif role == "checkpoint":
            while not os.path.exists(stop):
                try:
                    n = checkpoint_manifest(spec)
                    log(op="checkpoint", upto=n)
                except SnapshotConflictError as e:
                    log(conflict="checkpoint", msg=str(e)[:120])
                except Exception as e:  # noqa: BLE001
                    if tight and is_retention_race(e):
                        log(retention_race="checkpoint", msg=str(e)[:120])
                    else:
                        raise
                time.sleep(0.4)
        elif role == "vacuum":
            keep_last = int(args[0]) if args else 40
            pause = 0.1 if tight else 0.6
            while not os.path.exists(stop):
                try:
                    deleted = vacuum_snapshots(spec, keep_last=keep_last)
                    log(op="vacuum", n_deleted=len(deleted))
                except Exception as e:  # noqa: BLE001
                    if tight and is_retention_race(e):
                        log(retention_race="vacuum", msg=str(e)[:120])
                    else:
                        raise
                time.sleep(pause)
        else:
            raise ValueError(f"unknown role {role}")
        log(done=True)
        return 0
    except Exception:  # noqa: BLE001 — journaled; the test fails on it
        log(error=traceback.format_exc())
        return 1
    finally:
        journal.close()
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
