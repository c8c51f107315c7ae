"""Mechanism probe for the light shingle consumers (round-11 item 1):
decontaminate and boilerplate_ratio run 1.5-1.8x SLOWER at 32 cores
than at 8 (driver scaling block, round 10) — the only anti-scaling
rows.  Both route through shingle_sets(floor=True) + a scoped persist.

This times all four (floor x persist) variants of each query shape in
ONE session, interleaved (memo-cleared per run, bench discipline), so
the mechanism — the repartition exchange, the cache populate, or both
— is identified before any code change.  Run at SPARK_GRAFT_CPUS=32
and =8.

Usage: python tools/ab_lightshingle.py [SF_DIR] [N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from covsonar_spark.operators.dedup import _persist_scoped, shingle_sets
    from covsonar_spark.registry import clear_run_memos
    from covsonar_spark.session import get_spark

    spark = get_spark("sparksonar-ab-lightshingle")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def _warm(s):
        return s

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, 4 * n_workers, 1, n_workers).select(_warm("id")).count()

    def docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def decon(floor: bool, persist: bool):
        sh = shingle_sets(docs(), "text", "doc_id", 3, floor=floor)
        if persist:
            sh = _persist_scoped("probe_decon", sh)
        shingled = sh.select(F.col("doc_id"),
                             F.explode("shingles").alias("shingle"))
        is_eval = (F.col("doc_id") % 10) == 0
        train = shingled.where(~is_eval)
        ev = shingled.where(is_eval).select("shingle").distinct()
        return (train.join(ev, "shingle")
                .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
                .orderBy("doc_id"))

    def boiler(floor: bool, persist):
        df = docs()
        sh = shingle_sets(df.select("doc_id", "source", "text"),
                          "text", "doc_id", 3, floor=floor)
        if persist == "pre":
            # persist the 5000-row pre-explode arrays (the decon shape)
            # instead of the ~260k-row exploded frame
            sh = _persist_scoped("probe_boiler_pre", sh)
        per_doc = (df.select("doc_id", "source").join(sh, "doc_id")
                   .select("source", "doc_id",
                           F.explode("shingles").alias("shingle")))
        if persist is True:
            per_doc = _persist_scoped("probe_boiler", per_doc)
        n_docs = df.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        sdf = (per_doc.groupBy("source", "shingle")
               .agg(F.count(F.lit(1)).alias("sdf")))
        frac = F.col("sdf").cast("double") / F.col("n_docs")
        flagged = (sdf.join(F.broadcast(n_docs), "source")
                   .where(F.round(frac, 4) >= 0.08)
                   .select("source", "shingle"))
        hits = (per_doc.join(flagged, ["source", "shingle"], "left_semi")
                .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_boiler")))
        n_sh = per_doc.groupBy("doc_id", "source").agg(
            F.count(F.lit(1)).alias("n_sh"))
        return (n_sh.join(hits, "doc_id", "left")
                .select("doc_id", "source", "n_sh",
                        F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"))
                .orderBy("doc_id"))

    out: dict[str, dict] = {"cpus": n_workers, "decon": {}, "boiler": {}}
    for shape, builder in (("decon", decon), ("boiler", boiler)):
        variants = [(fl, pe) for fl in (True, False) for pe in (True, False)]
        if shape == "boiler":
            variants += [(True, "pre"), (False, "pre")]
        res = {v: [] for v in variants}
        for _ in range(n_runs):
            for v in variants:
                clear_run_memos()
                t0 = time.perf_counter()
                rows = builder(*v).count()
                res[v].append(round(time.perf_counter() - t0, 3))
        out[shape] = {f"floor={v[0]},persist={v[1]}":
                      {"best": min(ts), "times": ts} for v, ts in res.items()}
        out[shape]["rows"] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
