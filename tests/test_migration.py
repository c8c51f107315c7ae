"""S11 — store schema versioning and stepwise migration (reference
``upgrade_db`` lib/sonardb.py:1383-1421 + lib/migrate/4.sql): a
pre-versioning store (unpartitioned genomes, string dates, no
submission_date column) must open cleanly as a current-version store
with no data loss."""

from __future__ import annotations

import os

import pytest

from covsonar_spark.store import SCHEMA_VERSION, SonarStore


def _write_v1_store(spark, root):
    """Simulate a store written before versioning: genomes lacks
    submission_date, carries string-typed dates, and is unpartitioned."""
    rows = [
        ("ACC1", "d1", "hashA", "B.1.1.7", "2021-01-15"),
        ("ACC2", "d2", "hashB", "B.1.617.2", "2021-06-02"),
        ("ACC3", None, "hashA", None, None),
    ]
    df = spark.createDataFrame(
        rows, "accession: string, description: string, seqhash: string, "
              "lineage: string, date: string")
    df.coalesce(1).write.parquet(os.path.join(root, "genomes"))


def test_v1_store_upgrades_on_open(spark, tmp_path):
    root = str(tmp_path / "db")
    _write_v1_store(spark, root)
    assert SonarStore.version(root) == 1

    st = SonarStore.open(spark, root)
    assert SonarStore.version(root) == SCHEMA_VERSION

    g = st.table("genomes")
    assert "submission_date" in g.columns
    types = dict(g.dtypes)
    assert types["date"] == "date"
    assert types["submission_date"] == "date"
    rows = {r["accession"]: r for r in g.collect()}
    assert set(rows) == {"ACC1", "ACC2", "ACC3"}
    assert str(rows["ACC1"]["date"]) == "2021-01-15"
    assert rows["ACC3"]["date"] is None
    # physical rewrite: genomes now partitioned by date_month
    parts = os.listdir(os.path.join(root, "genomes"))
    assert any(p.startswith("date_month=") for p in parts)


def test_upgrade_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "db")
    _write_v1_store(spark, root)
    assert SonarStore.upgrade(spark, root) == (1, SCHEMA_VERSION)
    assert SonarStore.upgrade(spark, root) == (SCHEMA_VERSION, SCHEMA_VERSION)


def test_fresh_store_marks_current_version(spark, tmp_path):
    root = str(tmp_path / "fresh")
    SonarStore.open(spark, root)
    with open(os.path.join(root, "VERSION")) as fh:
        assert int(fh.read()) == SCHEMA_VERSION


def test_newer_store_is_refused(spark, tmp_path):
    root = str(tmp_path / "future")
    os.makedirs(root)
    with open(os.path.join(root, "VERSION"), "w") as fh:
        fh.write(str(SCHEMA_VERSION + 1))
    with pytest.raises(ValueError, match="newer than this engine"):
        SonarStore.upgrade(spark, root)
