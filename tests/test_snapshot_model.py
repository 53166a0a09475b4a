"""Model-based property test for the snapshot log: random operation
sequences applied both to the REAL log and to a trivial in-memory
reference model, with full-state equality after every step plus time
travel spot-checks against the model's history.

The hand-written suites (test_snapshots.py, the lifecycle verdict) pin
CHOSEN sequences; hypothesis explores the composition space — DV deletes
under later updates, rollback over a rolled-back state, vacuum trimming
history a rollback then must refuse, optimize rewriting a DV'd file set,
an update hitting an empty table — where cross-op contract bugs live.

Model: content = {k: val} (keys unique by construction — appends draw
fresh keys), history = {version: frozen content} for time travel,
retained = the version set vacuum has not dropped.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from creatorops_lakehouse_spark.sources.snapshots import (
    checkpoint_manifest,
    current_version,
    optimize_snapshots,
    rollback,
    snapshot_delete_where,
    snapshot_merge,
    snapshot_read,
    snapshot_update_where,
    snapshot_write,
    vacuum_snapshots,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec

# each op draws: (kind selector, a, b) — interpreted per kind so one
# strategy shape covers every op without combinatorial strategy nesting
OPS = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 19), st.integers(1, 5)),
    min_size=3,
    max_size=12,
)


def _read_state(spark, spec, version=None):
    return {
        r.k: r.val for r in snapshot_read(spark, spec, version).collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_snapshot_log_matches_reference_model(spark, tmp_path_factory, ops):
    import pyspark.sql.functions as F  # noqa: F401  (parity with suite style)

    tmp = tmp_path_factory.mktemp("model")
    spec = TableSpec("model.t", str(tmp / "t"))

    next_key = [0]

    def fresh_rows(n):
        rows = [(next_key[0] + i, (next_key[0] + i) * 7 % 101) for i in range(n)]
        next_key[0] += n
        return rows

    def write(rows, mode):
        return snapshot_write(
            spark.createDataFrame(rows, "k long, val long"), spec, mode=mode
        )

    # seed so every op has a table
    content = dict(fresh_rows(3))
    v = write(list(content.items()), "append")
    history = {v: dict(content)}
    retained = {v}

    for kind, a, b in ops:
        if kind in (0, 1, 2):  # append (most common op in real logs)
            rows = fresh_rows(b)
            content.update(rows)
            v = write(rows, "append")
        elif kind == 3:  # overwrite
            rows = fresh_rows(b)
            content = dict(rows)
            v = write(rows, "overwrite")
        elif kind == 4:  # copy-on-write DELETE over a key band
            lo, hi = a, a + b
            doomed = [k for k in content if lo <= k <= hi]
            for k in doomed:
                del content[k]
            v = snapshot_delete_where(spark, spec, {"k": (lo, hi)})
        elif kind == 5:  # merge-on-read (deletion-vector) DELETE
            lo, hi = a, a + b
            for k in [k for k in content if lo <= k <= hi]:
                del content[k]
            v = snapshot_delete_where(
                spark, spec, {"k": (lo, hi)}, rewrite=False
            )
        elif kind == 6:  # UPDATE ... SET val = val + 1000 over a band
            lo, hi = a, a + b
            for k in content:
                if lo <= k <= hi:
                    content[k] += 1000
            v = snapshot_update_where(
                spark, spec, {"k": (lo, hi)}, {"val": "val + 1000"}
            )
        elif kind == 7:  # OPTIMIZE (content-preserving rewrite)
            v2 = optimize_snapshots(spark, spec)
            v = v2 if v2 is not None else v
        elif kind == 10:  # MERGE upsert: half existing-band keys
            # (matched → take source row), half fresh keys (insert)
            lo, hi = a, a + b
            src = {k: content[k] + 50_000 for k in content if lo <= k <= hi}
            src.update(fresh_rows(2))
            content.update(src)
            v = snapshot_merge(
                spark,
                spec,
                spark.createDataFrame(
                    list(src.items()), "k long, val long"
                ),
                keys=["k"],
            )
        elif kind == 8:  # rollback to a random RETAINED version
            target = sorted(retained)[a % len(retained)]
            content = dict(history[target])
            v = rollback(spec, target)
        else:  # checkpoint fold + vacuum trim
            checkpoint_manifest(spec)
            keep = max(2, b)
            vacuum_snapshots(spec, keep_last=keep)
            live = sorted(retained | {v})[-keep:]
            retained = set(live)
        cur = current_version(spec)
        assert cur >= max(retained)  # monotone head, never rolls backward
        v = cur
        history[v] = dict(content)
        retained.add(v)
        # full-state equality with the model after EVERY op
        assert _read_state(spark, spec) == content

    # time travel: every retained version reads back its frozen model
    # state; at most 4 probes to bound runtime
    for tv in sorted(retained)[-4:]:
        assert _read_state(spark, spec, tv) == history[tv], f"v{tv}"
    # vacuumed versions must refuse, not misread
    dropped = sorted(set(history) - retained)
    if dropped:
        with pytest.raises(Exception, match="unknown snapshot version"):
            snapshot_read(spark, spec, dropped[0]).collect()
