"""Deterministic sf1 testdata generator: tiles /root/testdata/sf0.1
10x with re-keyed ids (VERDICT r3 #1 — prove the scale story above
sf0.1 without touching the read-only driver testdata).

Design notes (why each table scales the way it does):

* TPC-H-ish tables (customer/orders/lineitem/part/supplier/events):
  replica k in 0..R-1 adds k*stride to every key column, stride =
  the table's key cardinality at sf0.1, so FK joins stay consistent
  (an orders replica joins exactly its customer replica's rows for
  replicated dims... no: dims are re-keyed with the SAME stride their
  FK uses, so the join graph of replica k is isomorphic to sf0.1's).
  Key-derived name columns (c_name, s_name) are re-derived from the
  new key so name<->key consistency holds.  nation/region stay as-is
  (real deployments don't grow the country list 10x).
* events: user_id/event_id re-keyed per replica, timestamps kept —
  same 30-day window at 10x density (more users, not a longer
  history), which is how real event volume grows; windowed aggs get
  10x rows per window, sessionize gets 10x users.
* documents: replica 0 is the original corpus (sf1 is a superset of
  sf0.1); replicas k>=1 resample each doc's words from the empirical
  vocabulary with an RNG keyed by (k, hash(original text)) — docs
  that were exact duplicates in the original stay exact duplicates
  within each replica (dup groups scale linearly), while near-dup
  pairs are planted explicitly per replica (PLANT_NEAR_DUPS light
  word-edits) so MinHash/Jaccard/SimHash outputs also scale
  linearly instead of being frozen at replica 0's planted pairs.
  lang/source/length distributions are inherited row-for-row.
* embeddings: the sf0.1 vectors are i.i.d. random unit vectors (no
  label structure — measured: within-label and cross-label cosine
  are both N(0, 1/sqrt(64))), so replicas are fresh seeded unit
  vectors with the same distribution.  NOTE: exact-pair operators
  (embed_near_dup) are O(n^2) BY SEMANTICS — output and work grow
  ~100x when rows grow 10x; that is the operator's contract, not a
  scaling bug (the 100 TB path is the LSH family).

Usage:  python tools/gen_sf.py [out_dir] [replicas]
Default: out_dir=testdata_sf1 (repo root), replicas=10.
Pure duckdb + numpy/pyarrow — no Spark needed to generate.
"""

from __future__ import annotations

import os
import shutil
import sys
import zlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key strides = sf0.1 cardinalities (keys are 0..stride-1, verified)
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
}

# key-derived name columns re-formatted from the shifted key
NAME_FMT = {
    "customer": ("c_name", "Customer#%09d", "c_custkey"),
    "supplier": ("s_name", "Supplier#%09d", "s_suppkey"),
}

PLANT_NEAR_DUPS = 25          # near-dup pairs planted per replica
EDIT_FRACTION = 0.05          # words replaced in a planted near-dup


def _fresh_dir(path: str) -> str:
    """Recreate a dataset directory empty.  Writers emit part-{k} files
    for the REQUESTED replica count only — re-running with a smaller
    count into an existing directory would leave the old higher-k parts
    behind, and every reader (Spark, pyarrow, duckdb glob) would
    silently see the union of two generations."""
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


def tile_sql(con: duckdb.DuckDBPyConnection, table: str, out: str,
             replicas: int) -> int:
    cols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    shifted = dict(STRIDES[table])
    selects = []
    for k in range(replicas):
        exprs = []
        for c in cols:
            if c in shifted:
                e = f"({c} + {k * shifted[c]})"
                if table == "events" or c.endswith("key"):
                    e = f"CAST({e} AS BIGINT)"
                exprs.append(f"{e} AS {c}")
            else:
                exprs.append(c)
        if table in NAME_FMT:
            name_col, fmt, key = NAME_FMT[table]
            exprs = [
                f"printf('{fmt}', CAST({key} + {k * shifted[key]} AS BIGINT))"
                f" AS {name_col}" if e.endswith(f"AS {name_col}")
                or e == name_col else e
                for e in exprs]
        selects.append(
            f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'")
    # one file per replica inside a directory dataset: a single small
    # parquet file gives Spark ONE input split, serializing every
    # CPU-bound stage — unrepresentative of any real deployment, where
    # data arrives as many files.  Spark and pyarrow.dataset both read
    # the directory transparently.
    tdir = f"{out}/{table}.parquet"
    _fresh_dir(tdir)
    for k, sel in enumerate(selects):
        con.sql(f"COPY ({sel}) TO '{tdir}/part-{k:02d}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)")
    return con.sql(f"SELECT count(*) FROM '{tdir}/*.parquet'") \
        .fetchone()[0]


def gen_documents(out: str, replicas: int) -> int:
    tab = pq.read_table(f"{SRC}/documents.parquet")
    texts = tab["text"].to_pylist()
    langs = tab["lang"].to_pylist()
    sources = tab["source"].to_pylist()
    n0 = len(texts)
    vocab = sorted({w for t in texts for w in t.split(" ")})
    vocab_arr = np.array(vocab)
    word_counts = np.array([len(t.split(" ")) for t in texts])

    all_ids, all_txt, all_lang, all_src = [], [], [], []
    for k in range(replicas):
        if k == 0:
            rep_txt = list(texts)
        else:
            rep_txt = []
            for i, t in enumerate(texts):
                # keyed by (k, original text) so exact-dup groups in the
                # original stay exact-dup groups in every replica
                seed = (k << 32) ^ zlib.crc32(t.encode())
                rng = np.random.default_rng(seed)
                nw = word_counts[i]
                rep_txt.append(" ".join(
                    vocab_arr[rng.integers(0, len(vocab_arr), nw)]))
            # plant near-dup pairs: light word-edit copies, same-lang
            prng = np.random.default_rng(1_000_003 * k + 7)
            for _ in range(PLANT_NEAR_DUPS):
                a, b = prng.integers(0, n0, 2)
                words = rep_txt[a].split(" ")
                n_edit = max(1, int(len(words) * EDIT_FRACTION))
                for j in prng.integers(0, len(words), n_edit):
                    words[j] = vocab_arr[prng.integers(0, len(vocab_arr))]
                rep_txt[b] = " ".join(words)
        all_ids.extend(range(k * n0, (k + 1) * n0))
        all_txt.extend(rep_txt)
        all_lang.extend(langs)
        all_src.extend(sources)

    ddir = f"{out}/documents.parquet"
    _fresh_dir(ddir)
    for k in range(replicas):  # one file per replica (see tile_sql)
        lo, hi = k * n0, (k + 1) * n0
        pq.write_table(pa.table({
            "doc_id": pa.array(all_ids[lo:hi], pa.int64()),
            "text": pa.array(all_txt[lo:hi], pa.string()),
            "lang": pa.array(all_lang[lo:hi], pa.string()),
            "source": pa.array(all_src[lo:hi], pa.string()),
            "n_chars": pa.array([len(t) for t in all_txt[lo:hi]],
                                pa.int64()),
        }), f"{ddir}/part-{k:02d}.parquet")
    return len(all_ids)


def gen_embeddings(out: str, replicas: int) -> int:
    tab = pq.read_table(f"{SRC}/embeddings.parquet")
    v0 = np.array(tab["embedding"].to_pylist(), dtype=np.float32)
    lab0 = np.array(tab["label"].to_pylist(), dtype=np.int32)
    n0, dim = v0.shape
    vecs, labs = [v0], [lab0]
    for k in range(1, replicas):
        rng = np.random.default_rng(97 + k)
        v = rng.standard_normal((n0, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        vecs.append(v)
        labs.append(rng.integers(0, 10, n0).astype(np.int32))
    edir = f"{out}/embeddings.parquet"
    _fresh_dir(edir)
    for k in range(replicas):  # one file per replica (see tile_sql)
        pq.write_table(pa.table({
            "vec_id": pa.array(range(k * n0, (k + 1) * n0), pa.int64()),
            "embedding": pa.array(list(vecs[k]), pa.list_(pa.float32())),
            "label": pa.array(labs[k], pa.int32()),
        }), f"{edir}/part-{k:02d}.parquet")
    return replicas * n0


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "testdata_sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t in STRIDES:
        print(f"{t}: {tile_sql(con, t, out, replicas)} rows")
    print(f"documents: {gen_documents(out, replicas)} rows")
    print(f"embeddings: {gen_embeddings(out, replicas)} rows")


if __name__ == "__main__":
    main()
