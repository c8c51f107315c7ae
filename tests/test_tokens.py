"""Unit tests for the pure-Python token grammar / rewrite layer, pinned
to the reference's documented behavior (doctests in
/root/reference/lib/sonardb.py)."""

from __future__ import annotations

import pytest

from covsonar_spark.functions import tokens as TK


def test_is_dna_aa_del():
    g = TK.DEFAULT_GRAMMAR
    assert g.is_dna("A101T")
    assert g.is_dna("C40CTT")
    assert g.is_dna("del:21765:6")
    assert not g.is_dna("S:N501Y")
    assert g.is_aa("S:N501Y")
    assert g.is_aa("S:del:68:3")
    assert not g.is_aa("A101T")
    assert g.is_del("del:100:18")
    assert g.is_del("ORF1b:del:5:2")
    assert not g.is_del("del:100-118")


def test_pinpoint_nt_wildcard():
    # golden from reference doctest (lib/sonardb.py:3041-3049)
    got = sorted(TK.pinpoint_mutation("A5001N", TK.IUPAC_NT))
    assert got == ["A5001A", "A5001B", "A5001C", "A5001D", "A5001G", "A5001H",
                   "A5001K", "A5001M", "A5001N", "A5001R", "A5001S", "A5001T",
                   "A5001V", "A5001W", "A5001Y"]


def test_pinpoint_explicit_identity():
    assert TK.pinpoint_mutation("N501Y", TK.IUPAC_AA) == {"N501Y"}


def test_pinpoint_deletion_passthrough():
    assert TK.pinpoint_mutation("del:21765:6", TK.IUPAC_NT) == {"del:21765:6"}


def test_pinpoint_ambiguous_nt():
    # W covers A,T (plus itself)
    assert TK.pinpoint_mutation("A5001W", TK.IUPAC_NT) == {"A5001W", "A5001A", "A5001T"}


def test_classify_group_routes_and_expands():
    g = TK.classify_group(["A101T", "S:N501Y", "A5001W"])
    assert g["aa"] == [["S:N501Y"]]
    assert g["dna"] == [["A101T"], ["A5001A", "A5001T", "A5001W"]]


def test_inject_wildcard_groups():
    groups = TK.inject_wildcard_groups([["S:E484X", "C241T"]])
    # original group retained, plus one singleton group per pinpointed aa variant
    assert ["S:E484X", "C241T"] in groups
    singles = {tuple(g) for g in groups if len(g) == 1}
    assert ("S:E484K",) in singles and ("S:E484X",) in singles
    # dna token with no wildcard injects nothing by itself
    assert all(len(g) == 1 or g == ["S:E484X", "C241T"] for g in groups)


def test_group_any_mode_quirk():
    assert TK.group_any_mode(["C241T", "A5001N"], "dna")
    assert not TK.group_any_mode(["C241T", "A5001T"], "dna")
    assert TK.group_any_mode(["S:E484X"], "aa")
    # aa tokens are checked against X, not N (routing happens before this)
    assert not TK.group_any_mode(["S:Y501N"], "aa")


def test_validate_rejects_garbage():
    with pytest.raises(ValueError):
        TK.rewrite_profiles([["FOO:bar"]])
    with pytest.raises(ValueError):
        TK.rewrite_profiles([["del:100-118"]])
