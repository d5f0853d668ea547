"""Driver-replica correctness check: run each `queries()` entry on Spark and
its `oracle_sql()` twin on DuckDB over the same parquet tables, then compare
row count, sorted-column schema, and sorted-row values (exact on non-floats,
1e-6 relative on floats). Usage:

    python tools/oracle_replay.py [sf_dir] [entry ...]

No entries -> all oracled entries. Exits nonzero on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [c for c in sorted(cols)], out


def _close(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return a == b


def main() -> int:
    import __spark_entry__ as entry
    from my_crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    qs, os_ = entry.queries(), entry.oracle_sql()
    if not names:
        names = [n for n in qs if n in os_]

    spark = get_spark(app_name="oracle-replay")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in os_:
                print(f"{name}: rows-only, {len(srows)} rows")
                continue
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
            sc, sr = _norm(srows, scols)
            oc, orr = _norm(orows, ocols)
            ok = len(sr) == len(orr) and sc == oc
            if ok:
                for a, b in zip(sr, orr):
                    if len(a) != len(b) or not all(_close(x, y) for x, y in zip(a, b)):
                        ok = False
                        break
            status = "OK" if ok else "FAIL"
            print(f"{name}: {status} spark={len(sr)} oracle={len(orr)}")
            if not ok:
                if sc != oc:
                    print(f"  schema: spark={sc} oracle={oc}")
                for a, b in list(zip(sr, orr))[:5]:
                    if not all(_close(x, y) for x, y in zip(a, b)):
                        print(f"  spark={a}\n  oracle={b}")
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
