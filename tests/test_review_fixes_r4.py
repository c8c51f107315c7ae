"""Regression tests for the round-4 self-review findings: PPJoin
float-boundary losslessness, aligner budget accept/reject parity and
per-pair isolation, the store's no-silent-empty contract, and the
row-count cache's in-place-rewrite invalidation."""

from __future__ import annotations

import os

import numpy as np
import pytest

from covsonar_spark.operators.align import AlignmentBudgetError, BandedGotoh
from covsonar_spark.operators.dedup import (ngram_jaccard_pairs,
                                            ngram_jaccard_prefix_pairs)


# -- PPJoin float boundaries ---------------------------------------------

def test_prefix_filter_exact_integer_boundary(spark):
    """J(A,B) = 7/100 with threshold 0.07: the length-filter product
    n_b * t evaluates to 7.000000000000001 in float, so an unguarded
    <= dropped this qualifying pair — the lossless contract's exact
    failure mode at integer boundaries."""
    words = [f"w{i}" for i in range(102)]
    doc_a = " ".join(words[:9])       # 9 words -> 7 distinct 3-shingles
    doc_b = " ".join(words)           # 102 words -> 100, superset of A's
    docs = spark.createDataFrame([(0, doc_a), (1, doc_b)],
                                 "doc_id: long, text: string")
    t = 0.07                          # == 7/100 exactly (as a double)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
    pref = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_prefix_pairs(docs, threshold=t).collect()}
    assert (0, 1) in exact            # the boundary pair qualifies
    assert pref == exact


@pytest.mark.parametrize("t", [0.07, 0.13, 0.14, 0.16, 0.28])
def test_prefix_equals_exact_at_hazard_thresholds(spark, t):
    """Thresholds whose float products round just above exact integers
    (the over-ceil set found by an arithmetic sweep) must still be
    lossless on a real corpus slice."""
    docs = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .limit(120))
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
    pref = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_prefix_pairs(docs, threshold=t).collect()}
    assert pref == exact


# -- aligner: budget parity + isolation ----------------------------------

def _window_pair() -> tuple[str, str]:
    """A pair whose alignment needs exactly one small DP window (a
    scrambled ~85-base region, shorter than the ref's 90, inside
    matching flanks)."""
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, 3000))
    q = ref[:1500] + "".join(rng.choice(bases, 85)) + ref[1590:]
    return q, ref


def test_align_many_budget_parity_with_scalar():
    """align() and align_many() must agree on accept/reject for every
    budget: both charge small windows the scalar _dp cell count.
    Before the fix align_many charged the (narrower) full-coverage
    band, accepting pairs scalar align() rejected near the budget."""
    q, ref = _window_pair()
    probe = BandedGotoh()
    res = probe.align(q, ref)
    used = probe._cells_used
    assert used > 0                   # not the gap-free fast path

    enough = BandedGotoh(cell_budget=used)
    assert enough.align(q, ref) == res
    assert enough.align_many([(q, ref)]) == [res]

    short = BandedGotoh(cell_budget=used - 1)
    with pytest.raises(AlignmentBudgetError):
        short.align(q, ref)
    out = short.align_many([(q, ref)])
    assert len(out) == 1 and isinstance(out[0], AlignmentBudgetError)


def test_align_many_isolates_decompose_errors():
    """An exception raised in the per-pair decompose phase (here: a
    non-ASCII byte) must land in THAT pair's slot, leaving the other
    pairs' results intact — not abort the whole batch."""
    aligner = BandedGotoh()
    q, ref = _window_pair()
    out = aligner.align_many([(q, ref), ("ACGTéAC", "ACGTAAC"),
                              (q, ref)])
    assert out[0] == out[2]
    assert not isinstance(out[0], Exception)
    assert isinstance(out[1], Exception)


# -- store: unreadable-but-data-bearing must raise, not return empty -----

def test_unreadable_table_raises_not_silent_empty(spark, tmp_path):
    from covsonar_spark.store import SonarStore, StoreReadError

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    gdir = os.path.join(root, "genomes")
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "part-00000.parquet"), "wb") as fh:
        fh.write(b"PAR1 garbage that is not a parquet footer")
    with pytest.raises(StoreReadError):
        st.table("genomes")


def test_unreadable_table_serves_old_snapshot_when_present(spark, tmp_path):
    """Mid-swap shape: the final dir is corrupt but the pre-swap .old
    snapshot survives — the reader must serve .old, not raise and not
    return empty."""
    from covsonar_spark.store import SonarStore, _SCHEMAS

    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)
    gdir = os.path.join(root, "genomes")
    rows = [("A1", None, "h1", None, None, None, None, None, None, None,
             None, None, None, None, None, None, None, None, None, None)]
    spark.createDataFrame(rows, schema=_SCHEMAS["genomes"]) \
        .coalesce(1).write.parquet(gdir + ".old")
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "part-00000.parquet"), "wb") as fh:
        fh.write(b"PAR1 torn footer")
    got = st.table("genomes").select("accession").collect()
    assert [r["accession"] for r in got] == ["A1"]


# -- registry row-count cache: in-place part rewrite invalidates ---------

def test_nrows_refreshes_after_inplace_part_rewrite(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from covsonar_spark.registry import _nrows

    d = tmp_path / "tbl.parquet"
    d.mkdir()
    pq.write_table(pa.table({"x": [1, 2, 3]}), str(d / "part-00.parquet"))
    assert _nrows(str(tmp_path), "tbl") == 3
    # same filename, new contents — the parent dir's mtime is unchanged
    pq.write_table(pa.table({"x": [1, 2, 3, 4, 5]}),
                   str(d / "part-00.parquet"))
    assert _nrows(str(tmp_path), "tbl") == 5
