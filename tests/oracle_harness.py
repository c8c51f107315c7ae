"""Local re-implementation of the driver's correctness gate: run each
registry query on Spark and its oracle on DuckDB, compare row count,
column names, and order-insensitive values.

Usage:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x1f".join(vals))
    return sorted(out)


def main():
    import duckdb

    from covsonar_spark.registry import REGISTRY
    from covsonar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-harness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok?  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            cs, co = canon(srows, scols), canon(orows, ocols)
            if cs != co:
                diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"OK   {name}: rows={len(srows)}")
        else:
            failures.append(name)
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match the oracle")


if __name__ == "__main__":
    main()
