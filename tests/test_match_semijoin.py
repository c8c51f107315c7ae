"""The inverted-index semi-join strategy for profile matching must be
EXACTLY equivalent to the array_contains predicate path — including the
wildcard any-mode quirk, multi-group OR, and mixed dna+aa groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.match import (profile_predicate,
                                            profile_semijoin_keys,
                                            profiles_to_tokens_long)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def profiles(spark):
    """Synthetic profiles table: dna/aa token arrays drawn from document
    words so overlap structure is non-trivial."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = F.array_distinct(F.split("text", " "))
    return docs.select(
        F.col("doc_id").cast("string").alias("seqhash"),
        F.slice(toks, 1, 12).alias("dna_profile"),
        F.transform(F.slice(toks, 13, 8), lambda t: F.upper(t)).alias("aa_profile"),
    ).cache()


def _both_paths(profiles, groups):
    pred = profile_predicate(groups)
    via_pred = {r["seqhash"] for r in profiles.where(pred).select("seqhash").collect()}
    keys = profile_semijoin_keys(profiles_to_tokens_long(profiles), groups)
    via_semi = {r["seqhash"] for r in keys.collect()}
    return via_pred, via_semi


def _some_tokens(profiles, col, n):
    row = profiles.select(F.explode(col).alias("t")) \
                  .groupBy("t").count().orderBy(F.desc("count"), "t").limit(n).collect()
    return [r["t"] for r in row]


def test_and_group(profiles):
    t = _some_tokens(profiles, "dna_profile", 3)
    groups = [{"dna": [[t[0]], [t[1]], [t[2]]], "aa": []}]
    via_pred, via_semi = _both_paths(profiles, groups)
    assert via_pred, "fixture produced an empty match — pick different tokens"
    assert via_semi == via_pred


def test_or_groups_and_mixed_fields(profiles):
    d = _some_tokens(profiles, "dna_profile", 4)
    a = _some_tokens(profiles, "aa_profile", 2)
    groups = [
        {"dna": [[d[0]], [d[1]]], "aa": [[a[0]]]},   # dna AND dna AND aa
        {"dna": [[d[2]], [d[3]]], "aa": []},
    ]
    via_pred, via_semi = _both_paths(profiles, groups)
    assert via_pred
    assert via_semi == via_pred


def test_wildcard_any_mode(profiles):
    """A trailing-N dna token flips the whole field to OR in both paths."""
    d = _some_tokens(profiles, "dna_profile", 2)
    wild = d[1] + "N"   # not present in any profile, but flips the mode
    groups = [{"dna": [[d[0]], [wild]], "aa": []}]
    via_pred, via_semi = _both_paths(profiles, groups)
    # any-mode: d[0] alone suffices, so the match set is non-empty even
    # though `wild` matches nothing (under AND it would be empty)
    assert via_pred
    assert via_semi == via_pred


def test_iupac_expansion_atoms(profiles):
    """Multi-token expansions (IUPAC pinpointing) behave as one atom."""
    d = _some_tokens(profiles, "dna_profile", 3)
    groups = [{"dna": [[d[0], "zzz-not-a-token"], [d[1]]], "aa": []}]
    via_pred, via_semi = _both_paths(profiles, groups)
    assert via_pred
    assert via_semi == via_pred
