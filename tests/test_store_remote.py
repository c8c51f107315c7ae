"""Scheme-portability of the store's READ path (ARCHITECTURE.md "Store
commit protocol"): file listing, manifest pruning, table scans and
match() work through the Hadoop FileSystem API on a non-``file:``
scheme — here ``viewfs://`` mounted over a local directory, which
exercises the full URI code path (qualified listings, percent-encoded
``input_file_name()`` URIs, basePath resolution) without needing a
daemon.  Mutations refuse remote roots up front."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from covsonar_spark.store import (SonarStore, _SCHEMAS, hadoop_list_files,
                                  norm_uri)


def _mount(spark, name: str, local_root: str) -> str:
    """Mount ``viewfs://<name>/db`` over ``local_root`` and return the
    remote-scheme store root."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set(f"fs.viewfs.mounttable.{name}.link./db", "file://" + local_root)
    return f"viewfs://{name}/db"


def _write_clustered_store(spark, root: str, n: int = 80) -> SonarStore:
    """Local store with a (lineage, date)-clustered multi-file genomes
    table plus a profiles table (same shape as test_manifest's)."""
    st = SonarStore.open(spark, root)
    rows = []
    for i in range(n):
        k = i % 4
        rows.append((f"ACC{i}", None, f"h{i}", f"L.{k}",
                     str(10000 * (k + 1) + i),
                     datetime.date(2021, 2 * k + 1, 1 + i % 27),
                     None, None, None, None, None, None, None, None,
                     None, None, None, None, None, None))
    spark.createDataFrame(rows, schema=_SCHEMAS["genomes"]) \
        .repartitionByRange(4, "lineage", "date") \
        .write.parquet(os.path.join(root, "genomes"))
    profiles = [(f"h{i}", [f"C{100 + i % 9}T"], [], [], None, None)
                for i in range(n)]
    spark.createDataFrame(profiles, schema=_SCHEMAS["profiles"]) \
        .coalesce(1).write.parquet(os.path.join(root, "profiles"))
    return st


def test_listing_and_pruning_match_on_viewfs(spark, tmp_path):
    """_data_files and manifest pruning agree with input_file_name()
    URIs on a viewfs:// root, and whole files are skipped losslessly."""
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    _write_clustered_store(spark, root)
    uri = _mount(spark, "vtestprune", root)
    stv = SonarStore(spark, uri)

    files = stv._data_files("genomes")
    assert files and all(f.startswith("viewfs://vtestprune/db/genomes")
                         for f in files)
    scanned = {norm_uri(r[0]) for r in
               spark.read.parquet(uri + "/genomes")
               .select(F.input_file_name()).distinct().collect()}
    assert {norm_uri(f) for f in files} == scanned

    # manifest built THROUGH the mount: its file column carries
    # viewfs:// URIs from input_file_name(), which pruning must match
    n_files = stv.build_manifest("genomes")
    assert n_files == len(files)
    q = MatchQuery(lineages=["L.2"])
    pruned = stv._match_genomes(q)
    assert pruned is not None
    kept = pruned.inputFiles()
    assert 0 < len(kept) < n_files            # whole files skipped
    assert all(k.startswith("viewfs://") for k in kept)
    exp = sorted(r["accession"] for r in
                 spark.read.parquet(uri + "/genomes")
                 .where(F.col("lineage") == "L.2")
                 .select("accession").collect())
    got = sorted(r["accession"] for r in
                 pruned.where(F.col("lineage") == "L.2")
                 .select("accession").collect())
    assert got == exp and exp


def test_match_end_to_end_on_viewfs(spark, tmp_path):
    """Full match() over a remote-scheme root equals the local run —
    the query-only contract for object-store/HDFS deployments."""
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    st_local = _write_clustered_store(spark, root)
    uri = _mount(spark, "vtestmatch", root)
    stv = SonarStore(spark, uri)
    stv.build_manifest("genomes")

    q = MatchQuery(lineages=["L.1"], dates=["2021-03-01:2021-03-31"])
    exp = sorted(r["accession"] for r in st_local.match(q).collect())
    got = sorted(r["accession"] for r in stv.match(q).collect())
    assert got == exp and exp

    # absent table on a remote root: empty with the canonical schema
    assert stv.table("dna_variants").count() == 0


def test_mutations_refuse_remote_roots(spark, tmp_path):
    root = str(tmp_path / "db")
    _write_clustered_store(spark, root, n=8)
    uri = _mount(spark, "vtestmut", root)
    stv = SonarStore(spark, uri)
    with pytest.raises(ValueError, match="query-only"):
        stv.optimize()


def test_hadoop_listing_filters_hidden_and_sizes(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.range(10).coalesce(1).write.parquet(d)
    os.makedirs(os.path.join(d, "_temporary/0"), exist_ok=True)
    with open(os.path.join(d, "_temporary/0/part-x.parquet"), "w") as fh:
        fh.write("junk")
    vis = hadoop_list_files(spark, d)
    assert vis and all("_temporary" not in p and "_SUCCESS" not in p
                       for p in vis)
    sized = hadoop_list_files(spark, d, include_hidden=True, with_size=True)
    assert any("_SUCCESS" in p for p, _s in sized)
    total = sum(s for _p, s in sized)
    # LocalFileSystem hides its .crc checksum sidecars from listings;
    # compare against the dot-file-free disk sum
    disk = sum(os.path.getsize(os.path.join(b, f))
               for b, _dirs, fs in os.walk(d) for f in fs
               if not f.startswith("."))
    assert total == disk
