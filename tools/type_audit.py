"""Strict output-type parity audit: for each registry query, compare the
Spark result schema against the DuckDB oracle's result types using an
exact width-sensitive mapping (the external harness hashes values in a
type-width-sensitive way; HUGEINT vs BIGINT hash-fails even when the
decimal values match).

Usage: python tools/type_audit.py [sf_dir] [n_queries] [query ...]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# DuckDB type string -> equivalent Spark simpleString
EQUIV = {
    "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
    "TINYINT": "tinyint", "DOUBLE": "double", "FLOAT": "float",
    "VARCHAR": "string", "DATE": "date", "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary", "UBIGINT": "decimal(20,0)",
}


def duck_to_spark(t: str) -> str:
    t = str(t).upper()
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if t.endswith("[]"):
        return f"array<{duck_to_spark(t[:-2])}>"
    return EQUIV.get(t, f"?{t}?")


def main():
    import duckdb

    from covsonar_spark.registry import REGISTRY
    from covsonar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # default: the WHOLE registry — the old first-50 default let width
    # mismatches hide in rows 51+ for three rounds
    n = int(sys.argv[2]) if len(sys.argv) > 2 else len(REGISTRY)
    only = set(sys.argv[3:])

    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    bad = []
    for i, (name, (fn, sql)) in enumerate(REGISTRY.items()):
        if i >= n or (only and name not in only):
            continue
        if sql is None:
            print(f"skip {name} (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = dict(sdf.dtypes)
            rel = con.sql(sql)
            otypes = {c: duck_to_spark(t) for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            bad.append(name)
            continue
        mism = {c: (stypes.get(c), otypes.get(c))
                for c in set(stypes) | set(otypes)
                if stypes.get(c) != otypes.get(c)}
        if mism:
            print(f"MISM {name}: {mism}")
            bad.append(name)
        else:
            print(f"ok   {name}")
    print()
    if bad:
        print(f"{len(bad)} TYPE MISMATCHES: {bad}")
        sys.exit(1)
    print("all audited queries type-match the oracle")


if __name__ == "__main__":
    main()
