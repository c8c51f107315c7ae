"""File-level data-skipping manifest (sources/manifest.py + the store
integration): pruning must be lossless, actually skip files on a
clustered layout, survive a stale manifest, and degrade to the full
scan when no manifest exists."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from covsonar_spark.sources.manifest import (build_manifest, prune_files,
                                             read_pruned)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """16 lineages with disjoint-ish token bands, one file per
    lineage-range — the layout where file skipping must bite."""
    d = str(tmp_path_factory.mktemp("man") / "profiles")
    df = (spark.range(16_000)
          .withColumn("lineage", (F.col("id") % 16).cast("int"))
          .withColumn("dna_profile", F.expr(
              "transform(sequence(1, 20), j -> concat('C', cast("
              "(lineage*200 + pmod(hash(id, j), 180)) as string), 'T'))")))
    df.repartitionByRange(16, "lineage").write.parquet(d)
    return d


@pytest.fixture(scope="module")
def manifest(spark, clustered):
    return build_manifest(spark, clustered, token_cols=("dna_profile",),
                          key_cols=("id",)).cache()


def _exact(tokens):
    pred = None
    for t in tokens:
        p = F.array_contains("dna_profile", t)
        pred = p if pred is None else pred & p
    return pred


def test_pruned_scan_is_lossless(spark, clustered, manifest):
    toks = ["C612T", "C655T", "C701T"]      # lineage-3 band
    full = spark.read.parquet(clustered)
    expect = sorted(r["id"] for r in full.where(_exact(toks))
                    .select("id").collect())
    got = sorted(r["id"] for r in
                 read_pruned(spark, clustered, manifest,
                             "dna_profile_bloom", toks)
                 .where(_exact(toks)).select("id").collect())
    assert got == expect and expect        # non-trivial result


def test_pruning_skips_files_on_clustered_layout(spark, clustered, manifest):
    n_files = manifest.count()
    assert n_files >= 8                     # layout produced real files
    kept = prune_files(manifest, "dna_profile_bloom",
                       ["C612T", "C655T", "C701T"])
    assert 0 < len(kept) < n_files          # skipped at least one file


def test_no_match_prunes_everything(spark, clustered, manifest):
    out = read_pruned(spark, clustered, manifest, "dna_profile_bloom",
                      ["NOT_A_TOKEN"])
    assert out.count() == 0
    assert out.columns == spark.read.parquet(clustered).columns


def test_store_manifest_stale_append_is_safe(spark, tmp_path):
    """A data file appended AFTER the manifest build is not covered by
    it — pruned_table must always keep uncovered files, so a stale
    manifest can cause extra reads, never missing rows."""
    from covsonar_spark.store import SonarStore

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    rows = [(f"h{i}", [f"C{100 + i}T", "C1T"], [], [], None, None)
            for i in range(8)]
    df = spark.createDataFrame(rows, schema=_profiles_schema())
    pdir = os.path.join(root, "profiles")
    df.coalesce(2).write.parquet(pdir)
    assert st.build_manifest("profiles") == 2

    # append a new part file the manifest has never seen: clone an
    # existing part under a new name but with DIFFERENT content by
    # writing a fresh one-row dataset and moving its part in
    extra = spark.createDataFrame(
        [("hx", ["C999T", "C1T"], [], [], None, None)],
        schema=_profiles_schema())
    tmp_out = str(tmp_path / "extra")
    extra.coalesce(1).write.parquet(tmp_out)
    part = next(f for f in os.listdir(tmp_out)
                if f.endswith(".parquet") and not f.startswith(("_", ".")))
    shutil.copy(os.path.join(tmp_out, part),
                os.path.join(pdir, "part-appended.parquet"))

    got = (st.pruned_table("profiles", "dna_profile_bloom", ["C999T"])
           .where(F.array_contains("dna_profile", "C999T"))
           .select("seqhash").collect())
    assert [r["seqhash"] for r in got] == ["hx"]


def test_pruned_table_without_manifest_falls_back(spark, tmp_path):
    from covsonar_spark.store import SonarStore

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    df = spark.createDataFrame(
        [("h0", ["C5T"], [], [], None, None)], schema=_profiles_schema())
    df.write.parquet(os.path.join(root, "profiles"))
    assert st.pruned_table("profiles", "dna_profile_bloom",
                           ["C5T"]).count() == 1


def _profiles_schema():
    from covsonar_spark.store import _SCHEMAS
    return _SCHEMAS["profiles"]


def _mini_store(spark, root: str, n: int = 60):
    """A store with real genomes+profiles tables: 4 lineage bands, each
    with its own token band, profiles written one file per band."""
    from covsonar_spark.store import SonarStore, _SCHEMAS

    st = SonarStore.open(spark, root)
    genomes = [(f"ACC{i}", None, f"h{i}", f"L.{i % 4}", None, None, None,
                None, None, None, None, None, None, None, None, None,
                None, None, None, None) for i in range(n)]
    profiles = [(f"h{i}",
                 [f"C{(i % 4) * 100 + 10 + (i % 7)}T",
                  f"C{(i % 4) * 100 + 50}T"],
                 [], [], None, None) for i in range(n)]
    spark.createDataFrame(genomes, schema=_SCHEMAS["genomes"]) \
        .coalesce(1).write.parquet(os.path.join(root, "genomes"))
    gdf = spark.createDataFrame(profiles, schema=_profiles_schema())
    gdf = gdf.withColumn("band", F.expr(
        "cast(substring(seqhash, 2) as int) % 4"))
    gdf.repartitionByRange(4, "band").drop("band") \
        .write.parquet(os.path.join(root, "profiles"))
    return st


def test_store_match_uses_manifest_losslessly(spark, tmp_path):
    """store.match() through the manifest-pruned profiles side returns
    exactly the rows of the unpruned match, and the pruned side reads
    strictly fewer files for a band-local AND group."""
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    st = _mini_store(spark, root)
    q = MatchQuery(profiles=[["C250T", "C211T"]])   # band-2 tokens
    before = sorted(r["accession"] for r in st.match(q).collect())

    n_files = st.build_manifest("profiles")
    assert n_files >= 3
    pruned = st._match_profiles(q)
    assert pruned is not None
    n_inputs = len(pruned.inputFiles())
    assert 0 < n_inputs < n_files           # whole files skipped
    after = sorted(r["accession"] for r in st.match(q).collect())
    assert after == before and before       # non-trivial, identical


def test_optimize_clustering_makes_manifest_selective(spark, tmp_path):
    """On a band-INTERLEAVED layout every file contains every band's
    tokens, so the manifest can skip nothing.  optimize() range-clusters
    profiles by their position-sorted profile string (same-lineage rows
    share prefixes) and rebuilds the manifest — after which a band-local
    query keeps strictly fewer files.  Match results are identical
    before and after (clustering is layout-only)."""
    from covsonar_spark.operators.match import MatchQuery
    from covsonar_spark.store import SonarStore, _SCHEMAS

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    n = 60
    genomes = [(f"ACC{i}", None, f"h{i}", f"L.{i % 4}", None, None, None,
                None, None, None, None, None, None, None, None, None,
                None, None, None, None) for i in range(n)]
    profiles = [(f"h{i}",
                 [f"C{(i % 4) * 100 + 10 + (i % 7)}T",
                  f"C{(i % 4) * 100 + 50}T"],
                 [], [], None, None) for i in range(n)]
    spark.createDataFrame(genomes, schema=_SCHEMAS["genomes"]) \
        .coalesce(1).write.parquet(os.path.join(root, "genomes"))
    # interleaved: round-robin hash spreads every band over every file
    spark.createDataFrame(profiles, schema=_profiles_schema()) \
        .repartition(4, "seqhash") \
        .write.parquet(os.path.join(root, "profiles"))

    # C250T is carried by EVERY band-2 row (15 docs): interleaved over
    # 4 files it lands in all of them — nothing skippable pre-cluster
    q = MatchQuery(profiles=[["C250T"]])
    before = sorted(r["accession"] for r in st.match(q).collect())
    assert len(before) == 15

    n_files = st.build_manifest("profiles")
    pruned = st._match_profiles(q)
    interleaved_kept = len(pruned.inputFiles())
    assert interleaved_kept == n_files      # nothing skippable

    res = st.optimize(rows_per_file=15)     # 4 clustered files
    assert res["profiles"] == 4
    assert res["manifest_files"] >= 2       # manifest auto-rebuilt
    clustered_kept = len(st._match_profiles(q).inputFiles())
    assert clustered_kept < res["manifest_files"]
    after = sorted(r["accession"] for r in st.match(q).collect())
    assert after == before


def test_store_match_prunes_on_aa_tokens(spark, tmp_path):
    """The aa_profile_bloom path: an amino-acid token query prunes on
    the aa manifest column and returns the unpruned result."""
    from covsonar_spark.operators.match import MatchQuery
    from covsonar_spark.store import SonarStore, _SCHEMAS

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    n = 40
    genomes = [(f"ACC{i}", None, f"h{i}", None, None, None, None,
                None, None, None, None, None, None, None, None, None,
                None, None, None, None) for i in range(n)]
    profiles = [(f"h{i}", [f"C{(i % 4) * 100 + 50}T"],
                 [f"S:N{(i % 4) * 100 + 501}Y"], [], None, None)
                for i in range(n)]
    spark.createDataFrame(genomes, schema=_SCHEMAS["genomes"]) \
        .coalesce(1).write.parquet(os.path.join(root, "genomes"))
    gdf = spark.createDataFrame(profiles, schema=_profiles_schema())
    gdf.withColumn("band", F.expr("cast(substring(seqhash, 2) as int) % 4")) \
        .repartitionByRange(4, "band").drop("band") \
        .write.parquet(os.path.join(root, "profiles"))

    q = MatchQuery(profiles=[["S:N701Y"]])      # band-2's aa token
    before = sorted(r["accession"] for r in st.match(q).collect())
    assert len(before) == 10

    n_files = st.build_manifest("profiles")
    pruned = st._match_profiles(q)
    assert pruned is not None
    assert 0 < len(pruned.inputFiles()) < n_files
    after = sorted(r["accession"] for r in st.match(q).collect())
    assert after == before

    # an aa token present nowhere prunes everything and matches nothing
    none_q = MatchQuery(profiles=[["S:N999Y"]])
    assert st.match(none_q).count() == 0

    # IUPAC ambiguity: C250Y expands to {C250C, C250T, C250Y}; the file
    # condition must OR the expansion's bits (any-bit atom), keeping
    # band-2 files via the stored C250T and matching the unpruned rows
    amb_q = MatchQuery(profiles=[["C250Y"]])
    amb_full = sorted(r["accession"] for r in st.match(amb_q).collect())
    assert amb_full == before    # same band-2 rows (dna C250T carriers)


def _meta_store(spark, root: str, n: int = 80):
    """A store whose genomes table is (lineage, date)-clustered into 4
    files: lineage L.k carries dates in month 2k+1 of 2021 and zips in
    the 10k*(k+1) range — the layout where metadata min/max pruning
    must bite."""
    import datetime

    from covsonar_spark.store import SonarStore, _SCHEMAS

    st = SonarStore.open(spark, root)
    rows = []
    for i in range(n):
        k = i % 4
        rows.append((f"ACC{i}", None, f"h{i}", f"L.{k}",
                     str(10000 * (k + 1) + i),
                     datetime.date(2021, 2 * k + 1, 1 + i % 27),
                     datetime.date(2021, 2 * k + 2, 1 + i % 27),
                     None, None, None, None, None, None, None, None,
                     None, None, None, float(10 * k + i % 5), None))
    gdf = spark.createDataFrame(rows, schema=_SCHEMAS["genomes"])
    gdf.repartitionByRange(4, "lineage", "date") \
        .write.parquet(os.path.join(root, "genomes"))
    profiles = [(f"h{i}", [f"C{100 + i % 9}T"], [], [], None, None)
                for i in range(n)]
    spark.createDataFrame(profiles, schema=_profiles_schema()) \
        .coalesce(1).write.parquet(os.path.join(root, "profiles"))
    return st


def test_store_match_metadata_pruned_lineage_date(spark, tmp_path):
    """A lineage+date query over the clustered genomes layout skips
    whole files via the metadata min/max manifest and returns exactly
    the unpruned match rows."""
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    st = _meta_store(spark, root)
    q = MatchQuery(lineages=["L.2"], dates=["2021-05-01:2021-05-31"])
    before = sorted(r["accession"] for r in st.match(q).collect())
    assert before                                # non-trivial result

    n_files = st.build_manifest("genomes")
    assert n_files >= 3
    pruned = st._match_genomes(q)
    assert pruned is not None
    assert 0 < len(pruned.inputFiles()) < n_files  # whole files skipped
    after = sorted(r["accession"] for r in st.match(q).collect())
    assert after == before

    # date-only, zip-prefix, and ct-range queries prune too, losslessly
    for q2 in (MatchQuery(dates=["2021-01-01:2021-01-31"]),
               MatchQuery(zips=["30"]),
               MatchQuery(min_ct=20.0, max_ct=24.0)):
        exp = sorted(r["accession"] for r in
                     _unpruned_match(st, q2).collect())
        p2 = st._match_genomes(q2)
        assert p2 is not None and 0 < len(p2.inputFiles()) < n_files
        got = sorted(r["accession"] for r in st.match(q2).collect())
        assert got == exp and exp


def _unpruned_match(st, q):
    """The same match evaluated WITHOUT manifest pruning (full tables)."""
    from covsonar_spark.operators.match import MatchEngine

    return MatchEngine(st.essence(), st.sublineage_map).run(q)


def test_store_match_metadata_pruned_wildcard_and_negation(spark, tmp_path):
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    st = _meta_store(spark, root)
    st.build_manifest("genomes")

    # wildcard expansion over the full table is a superset of the
    # engine's over the pruned essence — identical results
    q = MatchQuery(lineages=["L.1%"], dates=["2021-03-01:2021-03-31"])
    exp = sorted(r["accession"] for r in _unpruned_match(st, q).collect())
    got = sorted(r["accession"] for r in st.match(q).collect())
    assert got == exp and exp

    # a wildcard matching nothing drops the engine's lineage predicate
    # — pruning must not drop it either (no lineage cond, no date cond
    # -> no pruning at all)
    q_none = MatchQuery(lineages=["ZZZ%"])
    assert st._match_genomes(q_none) is None
    assert st.match(q_none).count() == _unpruned_match(st, q_none).count()

    # exclude-only specs never prune
    q_exc = MatchQuery(lineages=["^L.2"], dates=["^2021-05-01:2021-05-31"])
    assert st._match_genomes(q_exc) is None
    exp = sorted(r["accession"] for r in _unpruned_match(st, q_exc).collect())
    got = sorted(r["accession"] for r in st.match(q_exc).collect())
    assert got == exp and exp


def test_wildcard_prune_divergence(spark, tmp_path):
    """Round-5 review (high): when date/zip/ct pruning removes EVERY
    file holding a %-wildcard's matching lineages, the engine's
    expansion must NOT come back empty (which would drop the lineage
    predicate and return rows the unpruned match excludes) — wildcards
    resolve once over the FULL table (store._resolved_lineages)."""
    import datetime

    from covsonar_spark.operators.match import MatchQuery
    from covsonar_spark.store import SonarStore, _SCHEMAS

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    # file 0: all B.1.1.7, dated 2021-01;  file 1: all XX.1, dated
    # 2022-06 — an ANTI-correlated layout: the date range selects only
    # the file holding NONE of the wildcard's lineages
    rows = []
    for i in range(20):
        rows.append((f"A{i}", None, f"h{i}", "B.1.1.7", None,
                     datetime.date(2021, 1, 1 + i % 27), None, None,
                     None, None, None, None, None, None, None, None,
                     None, None, None, None))
        rows.append((f"B{i}", None, f"g{i}", "XX.1", None,
                     datetime.date(2022, 6, 1 + i % 27), None, None,
                     None, None, None, None, None, None, None, None,
                     None, None, None, None))
    gdf = spark.createDataFrame(rows, schema=_SCHEMAS["genomes"])
    gdf.repartitionByRange(2, "lineage") \
        .write.parquet(os.path.join(root, "genomes"))
    profiles = [(f"h{i}", ["C100T"], [], [], None, None) for i in range(20)] \
        + [(f"g{i}", ["C200T"], [], [], None, None) for i in range(20)]
    spark.createDataFrame(profiles, schema=_profiles_schema()) \
        .coalesce(1).write.parquet(os.path.join(root, "profiles"))
    n_files = st.build_manifest("genomes")
    assert n_files >= 2

    # B.% expands to {B.1.1.7} over the full table; no B.1.1.7 row is
    # in the date range → the match is EMPTY, pruned or not
    q = MatchQuery(lineages=["B.%"], dates=["2022-06-01:2022-06-30"])
    assert _unpruned_match(st, q).count() == 0
    assert st.match(q).count() == 0            # the old bug returned 20

    # control: same wildcard with its own date range matches file 0
    q_ok = MatchQuery(lineages=["B.%"], dates=["2021-01-01:2021-01-31"])
    got = sorted(r["accession"] for r in st.match(q_ok).collect())
    assert got == sorted(f"A{i}" for i in range(20))

    # same divergence shape with --with-sublineage: closure runs on the
    # full-table expansion, not the pruned one
    st.sublineage_map = {"B.1.1.7": ["B.1.1.7.1"]}
    q_sub = MatchQuery(lineages=["B.%"], with_sublineage=True,
                       dates=["2022-06-01:2022-06-30"])
    assert st.match(q_sub).count() == 0


def test_both_sides_pruned_compose_losslessly(spark, tmp_path):
    """A query with BOTH an include-profile group and include
    lineage/date specs prunes the profiles side (vocabulary bloom) AND
    the genomes side (metadata min/max) in one match, returning exactly
    the unpruned rows."""
    import datetime

    from covsonar_spark.operators.match import MatchQuery
    from covsonar_spark.store import SonarStore, _SCHEMAS

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    n = 80
    genomes, profiles = [], []
    for i in range(n):
        k = i % 4
        genomes.append((f"ACC{i}", None, f"h{i}", f"L.{k}", None,
                        datetime.date(2021, 2 * k + 1, 1 + i % 27),
                        None, None, None, None, None, None, None, None,
                        None, None, None, None, None, None))
        profiles.append((f"h{i}", [f"C{k * 100 + 10 + i % 7}T",
                                   f"C{k * 100 + 50}T"],
                         [], [], None, None))
    spark.createDataFrame(genomes, schema=_SCHEMAS["genomes"]) \
        .repartitionByRange(4, "lineage") \
        .write.parquet(os.path.join(root, "genomes"))
    gdf = spark.createDataFrame(profiles, schema=_profiles_schema())
    gdf.withColumn("band", F.expr("cast(substring(seqhash, 2) as int) % 4")) \
        .repartitionByRange(4, "band").drop("band") \
        .write.parquet(os.path.join(root, "profiles"))

    q = MatchQuery(profiles=[["C250T"]], lineages=["L.2"],
                   dates=["2021-05-01:2021-05-31"])
    before = sorted(r["accession"] for r in st.match(q).collect())
    assert before

    n_p = st.build_manifest("profiles")
    n_g = st.build_manifest("genomes")
    pp, gp = st._match_profiles(q), st._match_genomes(q)
    assert pp is not None and 0 < len(pp.inputFiles()) < n_p
    assert gp is not None and 0 < len(gp.inputFiles()) < n_g
    after = sorted(r["accession"] for r in st.match(q).collect())
    assert after == before


def test_optimize_builds_genomes_manifest(spark, tmp_path):
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    st = _meta_store(spark, root)
    res = st.optimize(rows_per_file=20)
    assert res.get("genomes_manifest_files", 0) >= 2
    q = MatchQuery(lineages=["L.0"])
    pruned = st._match_genomes(q)
    assert pruned is not None
    assert len(pruned.inputFiles()) < res["genomes_manifest_files"]
    exp = sorted(r["accession"] for r in _unpruned_match(st, q).collect())
    assert sorted(r["accession"] for r in st.match(q).collect()) == exp


def test_prune_with_null_verdict_keeps_file(spark, tmp_path):
    """A NULL keep-verdict (e.g. a manifest built with a different
    bloom width making element_at return NULL under non-ANSI Spark)
    must KEEP the file — pruning only on a definite False is the
    lossless direction."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "db")
    st = _mini_store(spark, root)
    st.build_manifest("profiles")
    man = st._manifest("profiles")
    total = st.table("profiles").count()

    null_cond = F.lit(None).cast("boolean")
    assert st._prune_with("profiles", man, null_cond).count() == total

    false_cond = F.lit(False)
    assert st._prune_with("profiles", man, false_cond).count() == 0


def test_store_match_exclude_only_not_pruned(spark, tmp_path):
    from covsonar_spark.operators.match import MatchQuery

    root = str(tmp_path / "db")
    st = _mini_store(spark, root)
    st.build_manifest("profiles")
    q = MatchQuery(exclude_profiles=[["C250T"]])
    assert st._match_profiles(q) is None    # negation cannot skip files
    n = st.match(q).count()
    assert n > 0                            # non-band-2 genomes survive
