"""Ingest stage (P1-P3): harmonize + SEGUID (JVM-side expressions),
seqhash dedup, and the fused align→diff→profile pandas UDF — the
engine's only heavy Python stage, Arrow-batched over distinct sequences.

Reference pipeline (SURVEY §3.2): per-record python loop → file cache →
multiprocessing pool → per-sequence EMBOSS subprocess → pickle → serial
SQLite import.  Spark shape: everything becomes four DataFrame stages
with the aligner running inside mapInPandas; dedup-by-seqhash
(dropDuplicates) guarantees the expensive stage runs once per distinct
sequence regardless of how many accessions share it
(sonar.py:607-641 semantics).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from covsonar_spark.functions.genetics import CDS

PROFILE_RESULT_SCHEMA = T.StructType([
    T.StructField("seqhash", T.StringType(), False),
    T.StructField("dna_profile", T.ArrayType(T.StringType()), False),
    T.StructField("aa_profile", T.ArrayType(T.StringType()), False),
    T.StructField("fs_profile", T.ArrayType(T.StringType()), False),
    T.StructField("dna_vars", T.ArrayType(T.StructType([
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("ref", T.StringType(), False),
        T.StructField("alt", T.StringType(), False),
    ])), False),
    T.StructField("prot_vars", T.ArrayType(T.StructType([
        T.StructField("protein", T.StringType(), False),
        T.StructField("locus", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("ref", T.StringType(), False),
        T.StructField("alt", T.StringType(), False),
    ])), False),
    T.StructField("error", T.StringType(), True),
])


def harmonized(col):
    """T1 as a pure column expression: upper, trim, U→T."""
    return F.translate(F.upper(F.trim(col)), "U", "T")


def seguid_col(col):
    """T2 SEGUID as JVM expressions: base64(sha1-bytes), padding stripped
    (no Python UDF in the hot path)."""
    return F.regexp_replace(F.base64(F.unhex(F.sha1(col))), "=+$", "")


def derive_profiles(sequences: DataFrame, ref_seq: str, cds_list: list[CDS],
                    band_extra: int = 200,
                    cell_budget: int | None = None) -> DataFrame:
    """The P2 stage: (seqhash, sequence) → profiles + variant lists.

    mapInPandas so one python worker handles an Arrow batch of sequences
    with a single aligner instance (scoring matrix built once); errors
    (non-IUPAC letters, pathological alignments) are captured per row in
    ``error`` instead of failing the stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports inside the worker: keep the task closure small
        from covsonar_spark.functions.genetics import non_iupac_chars
        from covsonar_spark.operators.align import BandedGotoh
        from covsonar_spark.operators.variants import process_sequence

        aligner = BandedGotoh(cell_budget=cell_budget)
        for pdf in batches:
            # Phase 1: screen inputs, then align the WHOLE Arrow batch
            # in one batched call — the tiny per-indel DP windows from
            # every genome in the batch are solved together in a single
            # lockstep numpy loop (align.align_many), which is where
            # the old per-genome path burned numpy dispatch overhead.
            rows = list(zip(pdf["seqhash"], pdf["sequence"]))
            screened: list[str | None] = []
            align_in = []
            for _seqhash, seq in rows:
                bad = non_iupac_chars(seq)
                if bad:
                    screened.append(f"non-IUPAC characters: {sorted(bad)}")
                else:
                    screened.append(None)
                    align_in.append((seq, ref_seq))
            try:
                aligned = aligner.align_many(align_in, band_extra=band_extra)
            except Exception:  # noqa: BLE001 — batch-path failure must
                # not poison the Arrow batch (the per-row isolation
                # contract): degrade to the scalar per-pair path, which
                # re-establishes one error column entry per bad genome
                aligned = []
                for q, t in align_in:
                    try:
                        aligned.append(aligner.align(q, t,
                                                     band_extra=band_extra))
                    except Exception as exc:  # noqa: BLE001
                        aligned.append(exc)

            out = []
            ai = 0
            for (seqhash, seq), err in zip(rows, screened):
                if err is not None:
                    out.append((seqhash, [], [], [], [], [], err))
                    continue
                res_a = aligned[ai]
                ai += 1
                if isinstance(res_a, Exception):
                    out.append((seqhash, [], [], [], [], [],
                                f"{type(res_a).__name__}: {res_a}"))
                    continue
                try:
                    res = process_sequence(seq, ref_seq, cds_list,
                                           band_extra=band_extra,
                                           alignment=res_a)
                except Exception as exc:  # noqa: BLE001 — per-row isolation
                    out.append((seqhash, [], [], [], [], [], f"{type(exc).__name__}: {exc}"))
                    continue
                dna_vars = [
                    (s, (e if e is not None else s + 1), r, a)
                    for r, a, s, e, _p, _l in res["dna_vars"]
                ]
                prot_vars = [
                    (p, l, s, (e if e is not None else s + 1), r, a)
                    for r, a, s, e, p, l in res["prot_vars"]
                ]
                out.append((
                    seqhash,
                    res["dna_profile"].split(" ") if res["dna_profile"] else [],
                    res["prot_profile"].split(" ") if res["prot_profile"] else [],
                    res["fs_profile"].split(" ") if res["fs_profile"] else [],
                    dna_vars,
                    prot_vars,
                    None,
                ))
            yield pd.DataFrame(out, columns=[f.name for f in PROFILE_RESULT_SCHEMA.fields])

    return sequences.mapInPandas(run, PROFILE_RESULT_SCHEMA)


def explode_dna_variants(profiled: DataFrame) -> DataFrame:
    """profiled → long-format dna_variants table (reference dna +
    sequence2dna bridge, exploded; SURVEY §1.3)."""
    return profiled.select("seqhash", F.explode("dna_vars").alias("v")) \
                   .select("seqhash", "v.start", "v.end", "v.ref", "v.alt")


def explode_prot_variants(profiled: DataFrame) -> DataFrame:
    return profiled.select("seqhash", F.explode("prot_vars").alias("v")) \
                   .select("seqhash", "v.protein", "v.locus", "v.start", "v.end",
                           "v.ref", "v.alt")
