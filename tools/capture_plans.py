"""Capture ``.explain("formatted")`` output for named queries.

    python tools/capture_plans.py <tag> <query>[,<query>...] [sf_dir]

Writes ``plans/r13/<query>_<tag>.txt`` for each query — the before/after
plan evidence for the optimization round. Run it EXCLUSIVE of any other
local Spark JVM (same rule as bench.py).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from creatorops_lakehouse_spark.queries import all_queries
    from creatorops_lakehouse_spark.session import build_spark

    spark = build_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ({tag}) ==\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
