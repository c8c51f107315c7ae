"""VCF export — the `var2vcf` surface re-expressed aggregation-first.

Reference behavior (lib/sonartoVCF_v2.py:368-455, 136-346, 99-118,
121-133): pull (accession, start, end, ref, alt) rows from `dna_view`
filtered by accession / date, shift to 1-based POS, drop deletions and
out-of-range rows, then build a POS × samples genotype matrix per
worker, assign GT indices in ALT-encounter order, compute
``INFO=AN=..;AC=..;TYPE=..`` by counting genotype values, and merge the
per-worker VCFs with external bcftools.

Spark design — no genotype matrix, no bcftools, no driver loop:

1. ``calls``: one row per (accession, pos, ref, alt) — the long format.
2. ``site_table``: two aggregations. First ``groupBy(pos, bucket)``
   collects the per-site ALT vocabulary (small output → broadcast back),
   then per-call GT = ``array_position(alts, alt)`` and a second
   ``groupBy(pos, bucket)`` folds AN/AC. Both aggregations combine
   map-side; the big calls relation is never joined shuffle-to-shuffle.
3. The dense sample-genotype matrix exists only in the optional
   ``genotype_matrix`` pivot (guarded by a sample-count cap — a dense
   matrix over millions of samples is the reference's known scaling
   wall, README.md:296) and in the final text sink.

Deliberate divergences from the reference, for determinism at scale:
* ALT order (hence GT numbering) is lexicographic per site, not
  encounter order — encounter order depends on worker scheduling.
* AC counts are emitted in GT order. (The reference sorts genotype
  values as *strings* via np.unique, so GT 10 would sort before GT 2;
  sites with >9 ALTs don't occur in practice.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from covsonar_spark.operators import predicates as P

VCF_HEADER = (
    "##fileformat=VCFv4.2\n"
    '##FILTER=<ID=PASS,Description="All filters passed">\n'
    '##INFO=<ID=AN,Number=1,Type=Integer,Description="Total number of alleles in called genotypes">\n'
    '##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count in genotypes">\n'
    '##INFO=<ID=TYPE,Number=A,Type=String,Description="Variant type">\n'
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
    "##contig=<ID={chrom}>\n"
)


def variant_type(ref: Column, alt: Column) -> Column:
    """T16 — SNP/INS/DEL/INDEL from ref/alt lengths
    (lib/sonartoVCF_v2.py:121-133)."""
    lr, la = F.length(ref), F.length(alt)
    return (
        F.when((lr == 1) & (la == 1), F.lit("SNP"))
        .when((lr < la) & (la > 0),
              F.when(ref == F.substring(alt, 1, 1), F.lit("INS"))
               .otherwise(F.lit("INDEL")))
        .when((lr > la) & (lr > 0), F.lit("DEL"))
        .otherwise(F.lit("Unknown"))
    )


def dna_view(genomes: DataFrame, dna_variants: DataFrame) -> DataFrame:
    """J2 — the reference's `dna_view`: per-(accession, variant) rows via
    the seqhash bridge (lib/db.sqlite:125-155)."""
    return genomes.select("accession", "seqhash", "date").join(
        dna_variants, "seqhash")


def calls_from_dna_view(view: DataFrame, accessions: list[str] | None = None,
                        dates: list[str] | None = None,
                        ref_len: int = 29903) -> DataFrame:
    """Filter + 1-base the view into the long ``calls`` relation
    (lib/sonartoVCF_v2.py:386-439).  Deletion rows (empty ALT) are
    dropped unconditionally like the reference v2 — emitting them
    would need anchored re-encoding (REF=anchor+deleted, ALT=anchor)
    to stay valid VCF, which requires the reference base before each
    site; out of scope for the v2-parity exporter."""
    df = view
    if accessions:
        df = df.where(F.col("accession").isin(accessions))
    if dates:
        df = df.where(P.date_ranges(F.col("date"), dates))
    df = df.withColumn("pos", F.col("start") + 1) \
           .where((F.col("pos") >= 1) & (F.col("pos") <= ref_len))
    df = df.where(F.col("alt") != "")
    return df.select("accession", "pos", "ref", "alt")


def site_table(calls: DataFrame, chrom: str = "NC_045512.2") -> DataFrame:
    """The aggregation-first core: calls → one VCF row per (pos, bucket).

    SNPs at one position share one row (multi-allelic, comma-joined
    ALT); each indel type gets its own row keyed (pos, type) — the
    reference's final_snp_df / final_indel_df split
    (lib/sonartoVCF_v2.py:136-346) without the dense matrix.
    """
    typed = calls.withColumn("vcf_type", variant_type(F.col("ref"), F.col("alt")))
    typed = typed.where(F.col("vcf_type") != "Unknown")

    # AC per genotype index == call count per distinct alt (gt is just the
    # alt's rank in the sorted alt vocabulary), so the site vocabulary and
    # the AN/AC stats are ONE aggregation chain: calls → per-alt counts
    # (map-side combine collapses the call set to the distinct-variant
    # vocabulary before the shuffle) → per-site rollup. No per-call
    # genotype-index join, no second pass over the calls.
    # ref rides in the GROUP KEY, not a min() buffer: (pos, ref, alt) IS
    # the variant identity (the reference's own row key), so ref is
    # functionally determined within a (pos, vcf_type, alt) group and
    # grouping by it is value-identical — while a min(string) aggregate
    # buffer forces SortAggregate (strings are not mutable fixed-width),
    # i.e. a full sort of the call table per aggregate.  With count as
    # the only buffer both aggregate passes run as HashAggregate
    # (plan: 4 SortAggregate + their Sorts -> HashAggregate, r10).
    per_alt = typed.groupBy("pos", "vcf_type", "alt", "ref").agg(
        F.count(F.lit(1)).alias("c"))
    sites = per_alt.groupBy("pos", "vcf_type").agg(
        F.array_sort(F.collect_list(F.struct("alt", "c"))).alias("ac_pairs"),
        F.min("ref").alias("ref"),
        F.sum("c").cast("long").alias("an"),
    ).select(
        "pos", "vcf_type", "ref", "an",
        F.transform("ac_pairs", lambda s: s["alt"]).alias("alts"),
        F.concat_ws(",", F.transform(
            "ac_pairs", lambda s: s["c"].cast("string"))).alias("ac"),
    )

    pos_str = F.col("pos").cast("string")
    return (
        sites
        .select(
            F.lit(chrom).alias("chrom"),
            "pos",
            F.concat_ws(";", F.transform(
                "alts", lambda a: F.concat(F.col("ref"), pos_str, a))).alias("vcf_id"),
            "ref",
            F.concat_ws(",", "alts").alias("alt"),
            F.lit(".").alias("qual"),
            F.lit(".").alias("filter"),
            F.concat(F.lit("AN="), F.col("an").cast("string"), F.lit(";AC="),
                     F.col("ac"), F.lit(";TYPE="), F.col("vcf_type")).alias("info"),
            "an", "ac", "vcf_type",
        )
    )


def sample_genotypes(calls: DataFrame) -> DataFrame:
    """Long-format per-sample genotypes (the scale path: no pivot)."""
    typed = calls.withColumn("vcf_type", variant_type(F.col("ref"), F.col("alt")))
    typed = typed.where(F.col("vcf_type") != "Unknown")
    sites = typed.groupBy("pos", "vcf_type").agg(
        F.array_sort(F.collect_set("alt")).alias("alts"))
    return typed.join(F.broadcast(sites), ["pos", "vcf_type"]) \
                .select("accession", "pos", "vcf_type",
                        F.array_position(F.col("alts"), F.col("alt")).alias("gt"))


def genotype_matrix(calls: DataFrame, max_samples: int = 2000) -> DataFrame:
    """Dense POS × samples pivot — reference parity output shape; only
    valid for small cohorts (the pivot is a hard wall at scale, which is
    why it is capped instead of being the default path)."""
    samples = [r["accession"] for r in
               calls.select("accession").distinct().limit(max_samples + 1).collect()]
    if len(samples) > max_samples:
        raise ValueError(
            f"genotype_matrix caps at {max_samples} samples; "
            "use sample_genotypes() (long format) at scale")
    gts = sample_genotypes(calls)
    mat = gts.groupBy("pos", "vcf_type").pivot("accession", sorted(samples)) \
             .agg(F.first("gt"))
    for s in sorted(samples):
        # backticks: accessions routinely contain '.' (NC_045512.2) and a
        # bare F.col would parse it as struct-field access
        c = F.col(f"`{s}`")
        mat = mat.withColumn(
            s, F.when(c.isNull(), ".").otherwise(c.cast("string")))
    return mat


def _open_vcf_text(path: str, compress: bool):
    """Text sink for VCF output: plain file, or BGZF (bgzip/tabix-
    compatible, sources/bgzf.py — the reference shells out to bgzip,
    lib/sonartoVCF.py:129-144; this needs no external tools)."""
    if compress:
        from covsonar_spark.sources.bgzf import bgzf_text_writer

        return bgzf_text_writer(path)
    return open(path, "w")


def write_vcf(sites: DataFrame, calls: DataFrame, path: str,
              chrom: str = "NC_045512.2", max_samples: int = 2000,
              mode: str = "auto") -> None:
    """Merged multi-sample VCF text file (replaces the bcftools
    merge pipeline, lib/sonartoVCF.py:226-303).  A ``path`` ending in
    ``.gz`` is written as BGZF (bgzip/tabix-compatible) — the same
    deliverable the reference produces via external bgzip.

    ``mode="driver"`` pivots and collects on the driver — the
    small-cohort parity path.  ``mode="distributed"`` builds every
    line executor-side and stream-concatenates ordered text parts
    (:func:`write_vcf_merged_distributed`) — no pivot, no
    sites × samples driver materialization.  ``"auto"`` (default)
    picks driver at or below ``max_samples`` samples, distributed
    above — large cohorts now write instead of hitting the
    ``genotype_matrix`` cap error."""
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        n = calls.select("accession").distinct().limit(max_samples + 1).count()
        mode = "driver" if n <= max_samples else "distributed"
    from covsonar_spark.metrics import record_mode
    record_mode("write_vcf", mode)
    if mode == "distributed":
        write_vcf_merged_distributed(sites, calls, path, chrom=chrom)
        return
    mat = genotype_matrix(calls, max_samples=max_samples)
    samples = sorted(c for c in mat.columns if c not in ("pos", "vcf_type"))
    merged = sites.join(mat, ["pos", "vcf_type"]).orderBy("pos", "vcf_type")
    rows = merged.collect()
    with _open_vcf_text(path, path.endswith(".gz")) as fh:
        fh.write(VCF_HEADER.format(chrom=chrom))
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(samples) + "\n")
        for r in rows:
            fh.write("\t".join(
                [r["chrom"], str(r["pos"]), r["vcf_id"], r["ref"], r["alt"],
                 r["qual"], r["filter"], r["info"], "GT"]
                + [r[s] for s in samples]) + "\n")


def write_vcf_merged_distributed(sites: DataFrame, calls: DataFrame,
                                 path: str, chrom: str = "NC_045512.2",
                                 n_partitions: int = 32) -> int:
    """Merged multi-sample VCF with no driver-side pivot or row collect
    — the large-cohort path ``write_vcf`` dispatches to above its cap.

    Plan shape: ``sample_genotypes`` long format → per-sample column
    index (driver-assigned over the Python-``sorted()`` SAMPLE
    dimension — n_samples rows, never sites × samples; same order as
    the driver path) → one
    ``groupBy(pos, vcf_type)`` folds each site's sparse s_idx→gt map →
    the dense tab-separated genotype block expands JVM-side
    (``transform`` over 0..n-1 with a map lookup, missing samples
    print '.') → lines ``repartitionByRange(pos)`` + sorted within
    partitions, written as text parts whose range order makes
    lexicographic file order the global POS order → parts
    stream-concatenated behind the header.  Driver memory is
    O(n_samples) (the #CHROM header line must name every sample —
    the format's own cost), never O(sites × samples).

    Reference parity: lib/sonartoVCF.py:226-303 merges per-worker VCFs
    with external bcftools; this emits the same merged shape (sample
    columns in lexicographic accession order, '.' for absent calls)
    with no external tools.  Returns the number of samples."""
    import glob
    import os
    import shutil

    gts = sample_genotypes(calls)
    # Sample index assigned on the driver from the SAME Python
    # ``sorted()`` order the driver path uses (codepoint order, not
    # Spark's UTF8 collation) so auto-mode column order can't change
    # when a cohort crosses max_samples.  n_samples rows is
    # driver-safe by construction — the #CHROM header must name every
    # sample anyway.
    acc_sorted = sorted(
        r["accession"] for r in calls.select("accession").distinct().collect())
    n_samples = len(acc_sorted)
    samples = calls.sparkSession.createDataFrame(
        [(a, i) for i, a in enumerate(acc_sorted)],
        "accession string, s_idx int")
    # duplicate calls at the same (pos, vcf_type) for one accession are
    # folded with min() BEFORE map_from_entries — the default
    # mapKeyDedupPolicy=EXCEPTION would otherwise crash on dirty data
    # the driver path (pivot + first) tolerates; min is the
    # deterministic counterpart of the driver path's first()
    per_site = (gts.join(F.broadcast(samples), "accession")
                .groupBy("pos", "vcf_type", "s_idx")
                .agg(F.min("gt").alias("gt"))
                .groupBy("pos", "vcf_type")
                .agg(F.map_from_entries(F.collect_list(
                    F.struct(F.col("s_idx"),
                             F.col("gt").cast("string")))).alias("m")))
    block = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(n_samples - 1)),
                    lambda i: F.coalesce(F.element_at(F.col("m"), i),
                                         F.lit("."))), "\t")
    lines = (sites.join(per_site, ["pos", "vcf_type"])
             .select("pos", "vcf_type",
                     F.concat_ws("\t", "chrom", F.col("pos").cast("string"),
                                 "vcf_id", "ref", "alt", "qual", "filter",
                                 "info", F.lit("GT"), block).alias("value")))
    parts_dir = path + ".parts"
    (lines.repartitionByRange(n_partitions, "pos", "vcf_type")
     .sortWithinPartitions("pos", "vcf_type")
     .select("value")
     .write.mode("overwrite").text(parts_dir))
    tmp = path + ".tmp"
    with _open_vcf_text(tmp, path.endswith(".gz")) as fh:
        fh.write(VCF_HEADER.format(chrom=chrom))
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t")
        fh.write("\t".join(acc_sorted))
        fh.write("\n")
        for p in sorted(glob.glob(os.path.join(parts_dir, "part-*"))):
            with open(p) as src:
                shutil.copyfileobj(src, fh)
    os.replace(tmp, path)
    shutil.rmtree(parts_dir, ignore_errors=True)
    return n_samples


def write_sample_vcfs(calls: DataFrame, out_dir: str,
                      chrom: str = "NC_045512.2",
                      compress: bool = False) -> int:
    """S8 (v1 semantics) — one single-sample VCF per accession, written
    as a partitioned distributed job (reference forks a worker per
    accession and shells out to bgzip/tabix, lib/sonartoVCF.py:92-144;
    here one ``partitionBy(accession)`` text write, no subprocesses).
    ``compress`` emits ``<acc>.vcf.gz`` in BGZF (the reference's bgzip
    deliverable) instead of plain text.  Returns the number of samples
    written."""
    typed = calls.withColumn("vcf_type", variant_type(F.col("ref"), F.col("alt"))) \
                 .where(F.col("vcf_type") != "Unknown")
    header = VCF_HEADER.format(chrom=chrom)
    lines = typed.select(
        "accession",
        F.col("pos").alias("_pos"),
        F.concat_ws("\t",
                    F.lit(chrom), F.col("pos").cast("string"),
                    F.concat(F.col("ref"), F.col("pos").cast("string"), F.col("alt")),
                    F.col("ref"), F.col("alt"), F.lit("."), F.lit("."),
                    F.concat(F.lit("TYPE="), F.col("vcf_type")),
                    F.lit("GT"), F.lit("1")).alias("value"),
    )
    (lines.repartition("accession")
     .sortWithinPartitions("accession", "_pos")
     .select("accession", "value")
     .write.mode("overwrite").partitionBy("accession").text(out_dir))
    # prepend headers driver-side (tiny: one line-block per sample dir)
    import glob
    import os

    n = 0
    for d in glob.glob(os.path.join(out_dir, "accession=*")):
        parts = sorted(glob.glob(os.path.join(d, "part-*")))
        acc = os.path.basename(d).split("=", 1)[1]
        out_name = f"{acc}.vcf.gz" if compress else f"{acc}.vcf"
        with _open_vcf_text(os.path.join(d, out_name), compress) as fh:
            fh.write(header)
            fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                     + acc + "\n")
            import shutil
            for p in parts:          # stream, never buffer a whole body
                with open(p) as src_fh:
                    shutil.copyfileobj(src_fh, fh)
        for p in parts:
            os.remove(p)
        n += 1
    return n


def export_vcf(store, path: str, accessions: list[str] | None = None,
               dates: list[str] | None = None, chrom: str = "NC_045512.2",
               index: bool = True) -> DataFrame:
    """End-to-end `var2vcf`: store → filtered calls → site table + text
    file; returns the site table for inspection.  A ``.gz`` deliverable
    additionally gets its tabix ``.tbi`` sidecar (sources/tabix.py) —
    the reference produces it via external ``tabix -p vcf``,
    lib/sonartoVCF.py:129-144."""
    import contextlib

    with getattr(store, "read_snapshot", contextlib.nullcontext)():
        # one commit snapshot across genomes + dna_variants (no-op on
        # posix layouts)
        view = dna_view(store.table("genomes"), store.table("dna_variants"))
    # persist: the filtered calls subtree feeds the sample census, the
    # genotype pivot, the site aggregation, and the final merge join —
    # four actions that would otherwise re-run the genomes⋈variants scan
    calls = calls_from_dna_view(view, accessions, dates).persist()
    sites = site_table(calls, chrom=chrom)
    write_vcf(sites, calls, path, chrom=chrom)
    if index and path.endswith(".gz"):
        from covsonar_spark.sources.tabix import build_tabix_index

        build_tabix_index(path)
    calls.unpersist()
    return sites
