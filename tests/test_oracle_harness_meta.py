"""Meta-tests for the correctness gate itself: the canonical-form
comparison must detect the mismatch classes it claims to (value flip,
row order independence, float formatting) — a gate that can't fail is
no gate."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import canon


def test_canon_is_row_order_insensitive():
    a = canon([(1, "x"), (2, "y")], ["id", "v"])
    b = canon([(2, "y"), (1, "x")], ["id", "v"])
    assert a == b


def test_canon_is_column_order_insensitive():
    a = canon([(1, "x")], ["id", "v"])
    b = canon([("x", 1)], ["v", "id"])
    assert a == b


def test_canon_detects_value_flip():
    a = canon([(1, "x")], ["id", "v"])
    b = canon([(1, "X")], ["id", "v"])
    assert a != b


def test_canon_float_repr_distinguishes_ulp():
    """Floats compare by repr — a last-ulp difference MUST fail, which
    is why every float column in the registry is rounded identically
    in both engines before comparison."""
    x = 0.1 + 0.2
    a = canon([(x,)], ["v"])
    b = canon([(0.3,)], ["v"])
    assert a != b
    assert canon([(round(x, 6),)], ["v"]) == canon([(round(0.3, 6),)], ["v"])


def test_doc_counts_match_registry():
    """The query counts quoted in the docs must match len(REGISTRY) —
    guards against the count drift flagged in round 1's advice."""
    import re

    from covsonar_spark.registry import REGISTRY

    n = len(REGISTRY)
    n_oracle = sum(1 for _, s in REGISTRY.values() if s)
    docstring = open("covsonar_spark/registry.py").read(2000)
    m = re.search(r"\((\d+) queries, (\d+) with full oracles\)", docstring)
    assert m and (int(m.group(1)), int(m.group(2))) == (n, n_oracle)
    arch = open("ARCHITECTURE.md").read()
    m = re.search(r"registry\.py\s+(\d+) registry queries \((\d+) oracle", arch)
    assert m and (int(m.group(1)), int(m.group(2))) == (n, n_oracle)


def test_no_oracle_twin_produces_int128():
    """DuckDB types sum(int) as HUGEINT (int128), which the external
    harness's width-sensitive value hasher rejects against Spark's
    BIGINT.  Guard: no twin's result schema may contain HUGEINT — cast
    integer sums to BIGINT in the SQL (round 1 failed 4 queries this
    way)."""
    import duckdb

    from covsonar_spark.registry import REGISTRY

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    offenders = {}
    for name, (_fn, sql) in REGISTRY.items():
        if sql is None:
            continue
        rel = con.sql(sql)
        bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
               if "HUGEINT" in str(t).upper()]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
