"""Pytest face of the DuckDB oracle twin gate: every registry query is
value-checked (rows + column names + order-insensitive values) against
its ANSI-SQL twin at sf0.01 — the same comparison the external driver
runs for its 50-slot window, extended to the full registry so the
remaining queries are gated every CI run rather than only when someone
runs ``tests/oracle_harness.py`` by hand.

Queries without an oracle twin (sql is None — genuinely non-SQL-
expressible operators) get the driver's weaker rows-only check: the
Spark side must execute and collect without error.
"""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import compare_query, make_duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_TWIN_SF_DIR", "/root/testdata/sf0.01")


def _registry():
    from covsonar_spark.registry import REGISTRY

    return REGISTRY


@pytest.fixture(scope="module")
def duck():
    con = make_duckdb(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(_registry()))
def test_oracle_twin(spark, duck, name):
    fn, sql = _registry()[name]
    ok, detail = compare_query(spark, duck, fn, sql, SF_DIR)
    assert ok, f"{name}: {detail}"
