"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted-column schema,
and an order-insensitive value hash. Use while iterating:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash) of a
    pandas DataFrame, normalizing dtypes the way a driver plausibly would."""
    import pandas as pd

    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype(float).round(6).map(lambda v: f"{v:.6f}")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64").astype(str)
        else:
            out[c] = s.astype(str)
    rows = sorted("\x01".join(r) for r in out.itertuples(index=False, name=None))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as ent
    from creatorops_lakehouse_spark.session import build_spark

    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = positional[0] if positional else "/root/testdata/sf0.001"
    only = set(positional[1:])

    spark = build_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            report[name] = {"status": "err", "err": str(e)[:200]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            report[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            print(f"okro {name}: rows={len(sdf)} (rows-only, {spark_t:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            report[name] = {"status": "err", "err": f"duckdb: {str(e)[:200]}"}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sn, on_ = normalize(sdf), normalize(odf)
        status = "ok  " if sn == on_ else "FAIL"
        if sn != on_:
            failures.append(name)
        report[name] = {
            "status": "hash_green" if sn == on_ else "MISMATCH",
            "spark_rows": sn[0],
            "oracle_rows": on_[0],
            "value_hash": sn[2],
            "oracle_hash": on_[2],
            "cols_match": sn[1] == on_[1],
        }
        print(f"{status} {name}: spark={sn[0]} oracle={on_[0]} "
              f"hash {sn[2]} vs {on_[2]} cols_match={sn[1] == on_[1]} ({spark_t:.1f}s)")
        if sn != on_ and sn[1] != on_[1]:
            print(f"     spark cols:  {sn[1]}")
            print(f"     oracle cols: {on_[1]}")
    out_json = None
    for a in sys.argv:
        if a.startswith("--json="):
            out_json = a.split("=", 1)[1]
    if out_json:
        import json

        if only:
            print(f"note: writing PARTIAL report ({len(report)} queries) to {out_json}")
        with open(out_json, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n": len(report), "partial": bool(only), "results": report},
                f,
                indent=1,
                sort_keys=True,
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
