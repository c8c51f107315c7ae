"""Flagship-query scale probe: the match engine's profile-token scan
at 1M synthetic genomes, measuring the stored bloom-fingerprint
prefilter against the plain array predicate.

Builds a genomes+profiles parquet layout (token arrays drawn
deterministically from a 2000-token vocabulary, bloom fingerprint
column written at ingest like the real store), then times:

  plain   — AND-of-array_contains over the token arrays
  bloom   — the (dna_bloom & mask) = mask integer prescreen in front
            of the same exact predicate (lossless; store schema v3)

Also measures the IO side of the prescreen (the 100 TB story): a
bitmask test has no min/max row-group pruning, so the scan-byte win
comes from COLUMN pruning — the prescreen pass reads only the 8-byte
bloom long (plus the key), measured from the parquet footers as the
compressed column-chunk bytes each projection must fetch, and the
exact array check then runs on the few-% surviving candidate set
(two-phase variant, broadcast semi-join back).

Usage:  python tools/stress_match.py [n_genomes]   (default 1_000_000)
Measured 2026-08 (local[32], 1M genomes x ~30 tokens): plain ~0.25 s,
bloom ~0.17 s per query steady-state (cold first run 1.2 s vs 0.45 s)
— the 3-token AND over a million profile arrays is already a
sub-second scan, and the prefilter's one-long bitmask shaves ~30%
here (more on wider arrays or colder storage, where skipping the
array column entirely dominates).  10M-genome numbers (round 4) are
recorded in ARCHITECTURE.md.
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from covsonar_spark.operators import predicates as P  # noqa: E402
from covsonar_spark.session import get_spark  # noqa: E402

VOCAB = 2000
TOKENS_PER = 30


def build(spark, n: int, path: str) -> None:
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS_PER)),
        lambda j: F.concat(
            F.lit("C"),
            (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                               F.lit(":"), j.cast("string"))),
                                1, 8), 16, 10) % VOCAB).cast("string"),
            F.lit("T")))
    df = (spark.range(n)
          .select(F.col("id").alias("accession"),
                  F.array_distinct(toks).alias("dna_profile"))
          .withColumn("dna_bloom", P.token_bloom("dna_profile")))
    df.repartition(32).write.mode("overwrite").parquet(path)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("stress-match")
    d = tempfile.mkdtemp(prefix="match_stress_") + "/profiles"
    t0 = time.perf_counter()
    build(spark, n, d)
    print(f"built {n} genomes in {time.perf_counter()-t0:.1f}s")
    df = spark.read.parquet(d)

    query = ["C17T", "C291T", "C1033T"]          # AND group
    exact = None
    for t in query:
        p = F.array_contains("dna_profile", t)
        exact = p if exact is None else (exact & p)

    from covsonar_spark.metrics import exec_metrics

    for label, pred in (("plain", exact),
                        ("bloom", P.bloom_prefilter("dna_bloom", query) & exact)):
        for i in range(3):
            t0 = time.perf_counter()
            sel = df.where(pred)
            c = sel.count()
            dt = time.perf_counter() - t0
            if i == 2:
                m = exec_metrics(sel)
                print(f"{label} run{i}: {dt:.2f}s rows={c} "
                      f"bytes_planned={m.file_bytes_planned:,} "
                      f"files={m.files_read}")
            else:
                print(f"{label} run{i}: {dt:.2f}s rows={c}")

    # prescreen selectivity: how many rows the one-long bitmask test
    # removes before the array predicate ever evaluates
    n_rows = df.count()
    n_pass = df.where(P.bloom_prefilter("dna_bloom", query)).count()
    print(f"bloom prescreen: {n_pass:,}/{n_rows:,} rows pass "
          f"({100.0 * n_pass / n_rows:.3f}%) -> array predicate "
          f"evaluates on {n_pass:,} rows only")

    # IO pruning (column, not row-group — a bitmask test has no
    # min/max stats): the prescreen PASS reads only (accession,
    # dna_bloom) vs the token-array column the exact predicate needs.
    # Hadoop FileSystem byte counters miss the vectorized parquet
    # reader's IO in local mode, so measure what each column-pruned
    # scan MUST read from the parquet footers: the compressed
    # column-chunk bytes of the projected columns (what a remote
    # object store would serve).
    import glob as _glob

    import pyarrow.parquet as pq

    col_bytes: dict[str, int] = {}
    for part in _glob.glob(d + "/part-*.parquet"):
        md = pq.ParquetFile(part).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                root = c.path_in_schema.split(".", 1)[0]
                col_bytes[root] = (col_bytes.get(root, 0)
                                   + c.total_compressed_size)
    narrow = col_bytes["accession"] + col_bytes["dna_bloom"]
    full = sum(col_bytes.values())
    print(f"column-pruned scan bytes (compressed, from footers): "
          f"prescreen pass {narrow:,} vs full-row scan {full:,} "
          f"({full / narrow:.1f}x less IO for the narrow phase; "
          f"dna_profile column alone {col_bytes['dna_profile']:,})")

    # two-phase variant (narrow scan -> broadcast semi-join back):
    # slower here where the page cache hides the wide column's IO,
    # but the shape a cold object-store read wants — the wide
    # dna_profile bytes are only fetched for the <5% candidate set
    for i in range(3):
        t0 = time.perf_counter()
        cand = (df.select("accession", "dna_bloom")
                  .where(P.bloom_prefilter("dna_bloom", query))
                  .select("accession"))
        sel2 = df.join(F.broadcast(cand), "accession", "left_semi") \
                 .where(exact)
        c2 = sel2.count()
        dt = time.perf_counter() - t0
        print(f"two-phase run{i}: {dt:.2f}s rows={c2}")

    # ---- file-level manifest skipping on a CLUSTERED layout ----------
    # The row-bloom prescreen still scans every file.  The manifest
    # (sources/manifest.py) drops whole files driver-side — but only a
    # token-correlated layout makes per-file vocabularies narrow, so
    # rebuild the corpus clustered by lineage (each lineage owns a
    # token band, the realistic correlation) and measure skip rate +
    # scan bytes avoided.
    from covsonar_spark.sources.manifest import (build_manifest,
                                                 prune_files, read_pruned)

    N_LINEAGES = 128
    dc = tempfile.mkdtemp(prefix="match_clustered_") + "/profiles"
    lineage = (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                      16, 10) % N_LINEAGES).cast("int")
    toks_c = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS_PER)),
        lambda j: F.concat(
            F.lit("C"),
            ((F.col("lin") * 40
              + F.conv(F.substring(F.md5(F.concat(
                  F.col("id").cast("string"), F.lit(":"),
                  j.cast("string"))), 1, 8), 16, 10) % 60)
             % F.lit(VOCAB * 3)).cast("string"),
            F.lit("T")))
    t0 = time.perf_counter()
    (spark.range(n)
     .withColumn("lin", lineage)
     .select(F.col("id").alias("accession"), F.col("lin"),
             F.array_distinct(toks_c).alias("dna_profile"))
     .withColumn("dna_bloom", P.token_bloom("dna_profile"))
     .repartitionByRange(32, "lin")
     .write.mode("overwrite").parquet(dc))
    print(f"clustered build: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    man = build_manifest(spark, dc, token_cols=("dna_profile",),
                         key_cols=("accession",)).cache()
    n_files = man.count()
    print(f"manifest build: {time.perf_counter()-t0:.1f}s over "
          f"{n_files} files")

    # a lineage-77 AND group: tokens from one band
    q_band = [f"C{77 * 40 + k}T" for k in (3, 17, 42)]
    kept = prune_files(man, "dna_profile_bloom", q_band)

    def _norm(p: str) -> str:
        # input_file_name() yields percent-encoded file: URIs; compare
        # normalized full paths (same rule as store._prune_with), not
        # basenames, which could collide across directories
        if p.startswith("file:"):
            from urllib.parse import unquote, urlparse

            p = unquote(urlparse(p).path)
        return __import__("os").path.normpath(p)

    kept_paths = {_norm(k) for k in kept}
    kept_bytes = 0      # bytes of KEPT (i.e. scanned) files
    total_bytes = 0
    for part in _glob.glob(dc + "/part-*.parquet"):
        sz = __import__("os").path.getsize(part)
        total_bytes += sz
        if _norm(part) in kept_paths:
            kept_bytes += sz
    print(f"manifest prune: kept {len(kept)}/{n_files} files "
          f"({kept_bytes:,} of {total_bytes:,} bytes = "
          f"{100.0 * kept_bytes / max(total_bytes, 1):.1f}% scanned)")

    exact_c = None
    for t in q_band:
        p = F.array_contains("dna_profile", t)
        exact_c = p if exact_c is None else exact_c & p
    dfc = spark.read.parquet(dc)
    for label, frame in (
            ("full-scan", dfc.where(exact_c)),
            ("manifest", read_pruned(spark, dc, man, "dna_profile_bloom",
                                     q_band).where(exact_c))):
        for i in range(3):
            t0 = time.perf_counter()
            c = frame.count()
            dt = time.perf_counter() - t0
            print(f"clustered {label} run{i}: {dt:.2f}s rows={c}")
    a = sorted(r["accession"] for r in dfc.where(exact_c)
               .select("accession").collect())
    b = sorted(r["accession"] for r in
               read_pruned(spark, dc, man, "dna_profile_bloom", q_band)
               .where(exact_c).select("accession").collect())
    print("manifest lossless:", a == b, f"(rows={len(a)})")

    # ---- metadata min/max manifest skipping (round 5) -----------------
    # The genomes-side twin: a (lineage, date)-clustered layout (what
    # store.optimize() writes) + per-file min/max stats; a lineage IN +
    # date range query must skip whole files losslessly.
    from covsonar_spark.sources.manifest import (files_where,
                                                 stat_in_condition,
                                                 stat_range_condition)

    n = dfc.count()
    dm = tempfile.mkdtemp(prefix="match_meta_") + "/genomes"
    lin_col = (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                      16, 10) % N_LINEAGES).cast("int")
    t0 = time.perf_counter()
    (spark.range(n)
     .withColumn("lin", lin_col)
     .select(F.col("id").alias("accession"),
             F.concat(F.lit("L."), F.col("lin").cast("string"))
             .alias("lineage"),
             F.date_add(F.lit("2020-01-01").cast("date"),
                        (F.col("lin") * 7 + F.col("id") % 7).cast("int"))
             .alias("date"))
     .repartitionByRange(32, "lineage", "date")
     .sortWithinPartitions("lineage", "date")
     .write.mode("overwrite").parquet(dm))
    print(f"metadata clustered build: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    mman = build_manifest(spark, dm, token_cols=(),
                          key_cols=("lineage", "date")).cache()
    mn_files = mman.count()
    print(f"metadata manifest build: {time.perf_counter()-t0:.1f}s "
          f"over {mn_files} files")
    lins = ["L.77", "L.78"]
    cond = (stat_in_condition("lineage", lins)
            & stat_range_condition("date", [("2021-06-01", "2021-08-31")],
                                   cast="date"))
    mkept = files_where(mman, cond)
    kept_b = sum(sz for p, sz in
                 ((q, __import__("os").path.getsize(q)) for q in
                  _glob.glob(dm + "/part-*.parquet"))
                 if _norm(p) in {_norm(k) for k in mkept})
    total_b = sum(__import__("os").path.getsize(p)
                  for p in _glob.glob(dm + "/part-*.parquet"))
    print(f"metadata prune: kept {len(mkept)}/{mn_files} files "
          f"({kept_b:,} of {total_b:,} bytes = "
          f"{100.0 * kept_b / max(total_b, 1):.1f}% scanned)")
    meta_pred = (F.col("lineage").isin(lins)
                 & F.col("date").between("2021-06-01", "2021-08-31"))
    dfm = spark.read.parquet(dm)
    pruned_df = (spark.read.option("basePath", dm).parquet(*mkept)
                 if mkept else dfm.limit(0))
    for label, frame in (("meta full-scan", dfm.where(meta_pred)),
                         ("meta manifest", pruned_df.where(meta_pred))):
        for i in range(3):
            t0 = time.perf_counter()
            c = frame.count()
            print(f"{label} run{i}: {time.perf_counter()-t0:.2f}s rows={c}")
    ma = sorted(r["accession"] for r in dfm.where(meta_pred)
                .select("accession").collect())
    mb = sorted(r["accession"] for r in pruned_df.where(meta_pred)
                .select("accession").collect())
    print("metadata manifest lossless:", ma == mb, f"(rows={len(ma)})")
    assert ma == mb


if __name__ == "__main__":
    main()
