"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship profile-match query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry
(covsonar_spark.registry) for the duckdb-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covsonar_spark.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: covsonar-style profile
    match (token AND-group + metadata negation) with grouped counts."""
    from covsonar_spark.registry import match_profile_and

    return match_profile_and(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
