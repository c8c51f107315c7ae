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


def make_duckdb(sf_dir: str):
    """DuckDB connection with the testdata tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_query(spark, con, fn, sql, sf_dir):
    """Run one registry query on Spark and its twin on DuckDB.

    Returns (ok: bool, detail: str).  A query without an oracle twin
    (sql is None) passes with a rows-only note, mirroring the external
    driver's weaker check for non-SQL-expressible operators.
    """
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        return True, f"rows={len(srows)} (no oracle; rows-only check)"
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, f"cols spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"rows spark={len(srows)} oracle={len(orows)}"
    cs, co = canon(srows, scols), canon(orows, ocols)
    if cs != co:
        diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"rows={len(srows)}"


def main():
    from covsonar_spark.registry import REGISTRY
    from covsonar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-harness")
    con = make_duckdb(sf_dir)

    from covsonar_spark.registry import clear_run_memos

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            # same discipline as bench.py: every checked invocation
            # computes from the parquet inputs, no cross-query memos
            clear_run_memos()
            ok, detail = compare_query(spark, con, fn, sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"error {e}"
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {detail}")
        if not ok:
            failures.append(name)
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match the oracle")


if __name__ == "__main__":
    main()
