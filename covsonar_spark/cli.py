"""Thin CLI over the engine — the reference's subcommand surface
(sonar.py:31-486: add, update, match, restore, var2vcf, remove, info,
optimize, update-lineage-info) as batch Spark jobs over a store
directory.

Every subcommand is a pure function of (store, args) → DataFrame/side
effect; argument names and semantics mirror the reference CLI so its
users can switch (`--db` is a parquet directory instead of an SQLite
file, `--ref`/`--gff` seed the reference assets on first use).
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import sys

from covsonar_spark.operators.match import MatchQuery
from covsonar_spark.store import SonarStore


def _store(spark, args) -> SonarStore:
    return SonarStore.open(
        spark, args.db, getattr(args, "ref", None), getattr(args, "gff", None),
        getattr(args, "lineages", None))


def rows_to_csv(df, out, sep: str = ","):
    """S6 — stream match rows as csv/tsv (reference sonar.rows_to_csv,
    sonar.py:924-931); array columns print space-joined like the
    reference's profile strings."""
    cols = df.columns
    w = csv_mod.writer(out, delimiter=sep, lineterminator="\n")
    w.writerow(cols)
    for row in df.toLocalIterator():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, list):
                vals.append(" ".join(v))
            elif v is None:
                vals.append("")
            else:
                vals.append(v)
        w.writerow(vals)


def cmd_add(spark, args):
    import glob as glob_mod

    from covsonar_spark.sources.fasta import read_fasta

    st = _store(spark, args)
    paths = list(args.file or [])
    for d in args.dir or []:
        for pat in ("*.fasta", "*.fna"):
            paths.extend(sorted(glob_mod.glob(f"{d}/{pat}")))
    if not paths:
        raise SystemExit("add needs --file or --dir")
    defaults = {k: getattr(args, k) for k in ("source", "lab", "collection")
                if getattr(args, k, None)}
    rep = st.add_fasta_df(read_fasta(spark, paths, compressed=args.compressed),
                          force=args.force, paranoid=not args.no_paranoid,
                          metadata_defaults=defaults or None)
    if not args.quiet:
        print(f"added {rep['added_accessions']} accession(s), "
              f"{rep['new_sequences']} new sequence(s)", file=sys.stderr)
        for seqhash, err in rep["errors"].items():
            print(f"error: {seqhash}: {err}", file=sys.stderr)
    return rep


def _accs_from(args) -> list[str]:
    """--acc list plus --file (one accession per line), reference
    restore/var2vcf/remove input convention."""
    accs = list(args.acc or [])
    if getattr(args, "acc_file", None):
        with open(args.acc_file) as fh:
            accs.extend(ln.strip() for ln in fh if ln.strip())
    return accs


def _match_query(args) -> MatchQuery:
    fs = 0
    if args.no_frameshifts:
        fs = -1
    elif args.only_frameshifts:
        fs = 1
    return MatchQuery(
        profiles=args.include or [], exclude_profiles=args.exclude or [],
        accessions=args.acc or [], lineages=args.lineage or [],
        with_sublineage=args.with_sublineage, zips=args.zip or [],
        dates=args.date or [], submission_dates=args.submission_date or [],
        labs=args.lab or [], sources=args.source or [],
        collections=args.collection or [], technologies=args.technology or [],
        platforms=args.platform or [], chemistries=args.chemistry or [],
        materials=args.material or [], software=args.software,
        software_version=args.version, min_ct=args.min_ct, max_ct=args.max_ct,
        seqhashes=args.seqhash or [], frameshifts=fs, count=args.count,
        ambig=args.ambig)


def cmd_match(spark, args):
    st = _store(spark, args)
    q = _match_query(args)
    res = (st.match_at(q, args.at_version)
           if getattr(args, "at_version", None) is not None else st.match(q))
    if args.debug:
        # reference --debug prints the generated SQL (sonar.py:340-343);
        # the Spark twin is the optimized physical plan
        print(res._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")), file=sys.stderr)
    if args.count:
        print(res.collect()[0]["count"])
        return
    sep = "\t" if args.tsv else ","
    if args.out:
        with open(args.out, "w") as fh:
            rows_to_csv(res, fh, sep)
    else:
        rows_to_csv(res, sys.stdout, sep)


def cmd_sql(spark, args):
    """Run arbitrary SQL over the store's registered views (genomes /
    sequences / profiles / dna_variants / prot_variants / essence) —
    the functional version of the reference's dead `view` subcommand
    (sonar.py:868-870, 1190-1191: handler with no registered parser)."""
    st = _store(spark, args)
    st.register_views()
    res = spark.sql(args.query)
    sep = "\t" if args.tsv else ","
    if args.out:
        with open(args.out, "w") as fh:
            rows_to_csv(res, fh, sep)
    else:
        rows_to_csv(res, sys.stdout, sep)


def cmd_dq(spark, args):
    """Constraint audit over the store (quality.store_dq_audit):
    engine-side stand-in for sqlite's DDL-enforced PK/FK constraints."""
    from covsonar_spark.operators.quality import store_dq_audit

    st = _store(spark, args)
    rows = store_dq_audit(st).collect()   # one execution serves both outputs
    sep = "\t" if getattr(args, "tsv", False) else ","
    print(sep.join(rows[0].asDict().keys()))
    for r in rows:
        print(sep.join(str(v) for v in r))
    if any(not r["ok"] for r in rows):
        sys.exit(1)


def cmd_restore(spark, args):
    import contextlib

    from covsonar_spark.operators.restore import restore_genomes, to_fasta_lines

    st = _store(spark, args)
    pin = (st.at_version(args.at_version)
           if getattr(args, "at_version", None) is not None
           else contextlib.nullcontext())
    with pin:
        lines = to_fasta_lines(restore_genomes(st, _accs_from(args) or None))
    out = open(args.out, "w") if args.out else sys.stdout
    try:
        for r in lines.toLocalIterator():
            print(r["text"], file=out)
    finally:
        if args.out:
            out.close()


def cmd_var2vcf(spark, args):
    import contextlib

    from covsonar_spark.operators.vcf import export_vcf

    st = _store(spark, args)
    pin = (st.at_version(args.at_version)
           if getattr(args, "at_version", None) is not None
           else contextlib.nullcontext())
    with pin:
        export_vcf(st, args.out, accessions=_accs_from(args) or None,
                   dates=args.date or None)
    print(f"wrote {args.out}", file=sys.stderr)


def cmd_update(spark, args):
    from covsonar_spark.sources.metadata import (read_metadata_csv,
                                                 read_pangolin_csv)

    st = _store(spark, args)
    if args.pangolin:
        upd = read_pangolin_csv(spark, args.pangolin)
    else:
        path = args.tsv or args.csv
        if not path or not args.fields:
            raise SystemExit("update needs --pangolin or --csv/--tsv with --fields")
        fields = dict(kv.split("=", 1) for kv in args.fields)
        sep = "\t" if args.tsv else ","
        from covsonar_spark.sources.metadata import validate_ct

        bad = validate_ct(spark, path, fields, sep)
        if bad:
            raise SystemExit(
                f"metadata error: invalid ct value(s) for accession(s) {bad[:5]}")
        upd = read_metadata_csv(spark, path, fields, sep=sep)
    n = st.update_metadata(upd)
    print(f"updated {n} genome(s)", file=sys.stderr)


def cmd_remove(spark, args):
    st = _store(spark, args)
    accs = _accs_from(args)
    if not accs:
        raise SystemExit("remove needs --acc or --file")
    rep = st.remove(accs)
    print(f"removed {rep['removed_accessions']} genome(s), "
          f"gc'd {rep['gc_seqhashes']} sequence(s)", file=sys.stderr)


def cmd_info(spark, args):
    st = _store(spark, args)
    for k, v in st.info().items():
        if k != "by_source_collection":
            print(f"{k}: {v}")


def cmd_optimize(spark, args):
    st = _store(spark, args)
    print(st.optimize(), file=sys.stderr)


def cmd_history(spark, args):
    """Commit history of the store (any root since the round-7
    protocol unification) — the audit/time-travel companion of
    match/restore/var2vcf --at-version."""
    import datetime as _dt

    st = _store(spark, args)
    hist = st.history(limit=getattr(args, "limit", None))
    if not hist:
        print("no commit history (legacy layout: run a mutation or "
              "`optimize` to adopt the store into the commit log)",
              file=sys.stderr)
        return
    for h in hist:
        ts = _dt.datetime.fromtimestamp(
            h["committed_at"]).isoformat(timespec="seconds")             if h.get("committed_at") else "?"
        tables = " ".join(f"{t}={n}" for t, n in sorted(h["tables"].items()))
        print(f"version {h['version']}	{ts}	{tables}")


def cmd_vacuum(spark, args):
    """Reap data dirs no retained commit references (uncommitted
    garbage from crashed/conflicted writers, versions past retention,
    superseded adopted legacy dirs) — the standalone version of the
    GC optimize() performs; --retain/--min-age-hours bound how far
    back `--at-version` time travel keeps working.  Runs under the
    writer lease (SonarStore.vacuum) so it can never reap a concurrent
    in-flight mutation's freshly staged dirs."""
    st = _store(spark, args)
    n = st.vacuum(retain_last=args.retain,
                  min_age_s=args.min_age_hours * 3600.0,
                  lease_wait=args.wait)
    print(f"vacuumed {n} unreferenced data dir(s) "
          f"(retained last {max(args.retain, 1)} version(s))",
          file=sys.stderr)


def cmd_db_upgrade(spark, args):
    from covsonar_spark.store import SonarStore

    before, after = SonarStore.upgrade(spark, args.db)
    print(f"store schema version {before} -> {after}"
          + (" (already current)" if before == after else ""), file=sys.stderr)


PANGO_LINEAGES_URL = ("https://raw.githubusercontent.com/cov-lineages/"
                      "pango-designation/master/lineages.csv")
PANGO_ALIAS_URL = ("https://raw.githubusercontent.com/cov-lineages/"
                   "pango-designation/master/pango_designation/"
                   "alias_key.json")


def _fetch_text(url: str, timeout: float = 30.0) -> str:
    """Download one pango-designation asset; a network failure raises a
    CLEAN, actionable error instead of a stack trace (sandboxed and
    air-gapped deployments hit this first)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.read().decode()
    except (urllib.error.URLError, OSError, TimeoutError) as exc:
        raise SystemExit(
            f"update-lineage-info --fetch could not download {url}: {exc}. "
            f"This environment appears offline; download lineages.csv and "
            f"alias_key.json yourself and pass them via --input / "
            f"--alias-key instead.") from None


def cmd_update_lineage_info(spark, args):
    """Rebuild the sublineage closure table.  The reference's
    update-lineage-info always downloads fresh pango-designation data
    (lib/Lineages_UPDATER.py:87-164); this engine defaults to LOCAL
    input files (the sandbox/production-safe contract) and offers the
    networked behavior behind --fetch, which errors cleanly offline."""
    import json

    from covsonar_spark.operators.lineage import build_sublineage_table

    st = _store(spark, args)
    if args.fetch:
        if args.input or args.alias_key:
            # a user pinning a designation snapshot via --input must not
            # have it silently discarded for a network download
            raise SystemExit(
                "update-lineage-info: --fetch conflicts with "
                "--input/--alias-key — drop --fetch to use the local "
                "files, or drop the local files to download")
        lineages_text = _fetch_text(PANGO_LINEAGES_URL)
        alias_text = _fetch_text(PANGO_ALIAS_URL)
    else:
        if not args.input:
            raise SystemExit(
                "update-lineage-info needs --input lineages.csv (pango "
                "designation export: header line, lineage name first "
                "column) or --fetch to download it")
        with open(args.input) as fh:
            lineages_text = fh.read()
        alias_text = None
        if args.alias_key:
            with open(args.alias_key) as fh:
                alias_text = fh.read()
    alias = {}
    if alias_text is not None:
        raw = json.loads(alias_text)
        alias = {k: (v if isinstance(v, str) else "") for k, v in raw.items()}
    lineages = [ln.strip().split(",")[0]
                for ln in lineages_text.splitlines() if ln.strip()][1:]
    table = build_sublineage_table(spark, lineages, alias)
    with open(args.out, "w") as fh:
        fh.write("lineage\tsublineage\n")
        for r in table.toLocalIterator():
            fh.write(f"{r['lineage']}\t{r['sublineage']}\n")
    print(f"wrote {args.out}", file=sys.stderr)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sparksonar")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--db", required=True)
        sp.add_argument("--ref", help="reference FASTA (first use)")
        sp.add_argument("--gff", help="reference GFF3 (first use)")
        sp.add_argument("--lineages", help="lineage.all.tsv (first use)")
        # reference general flag (sonar.py:48-54); Spark sizes its own
        # pool — honored via SPARK_GRAFT_CPUS before session creation
        sp.add_argument("--cpus", type=int, default=None)

    sp = sub.add_parser("add")
    common(sp)
    grp = sp.add_mutually_exclusive_group()
    grp.add_argument("-f", "--file", nargs="+")
    grp.add_argument("-d", "--dir", nargs="+",
                     help="ingest every *.fasta / *.fna in the director(ies)")
    sp.add_argument("-c", "--cache", default=None,
                    help="accepted for compatibility; the Spark engine has no "
                         "file cache (shuffle/persist replace it)")
    sp.add_argument("-t", "--timeout", type=int, default=600,
                    help="accepted for compatibility; the banded aligner is "
                         "deterministic-time, no per-sequence subprocess to kill")
    sp.add_argument("--compressed", choices=["none", "gz", "xz", "auto"],
                    default="auto")
    sp.add_argument("--force", action="store_true")
    sp.add_argument("--no-paranoid", action="store_true")
    sp.add_argument("--noprogress", "-p", action="store_true")
    sp.add_argument("--quiet", "-q", action="store_true")
    sp.add_argument("--source")
    sp.add_argument("--lab")
    sp.add_argument("--collection")
    sp.set_defaults(fn=cmd_add)

    sp = sub.add_parser("match")
    common(sp)
    sp.add_argument("-i", "--include", nargs="+", action="append")
    sp.add_argument("-e", "--exclude", nargs="+", action="append")
    for flag in ("--acc", "--lineage", "--zip", "--date", "--submission_date",
                 "--lab", "--source", "--collection", "--technology",
                 "--platform", "--chemistry", "--material", "--seqhash"):
        sp.add_argument(flag, nargs="+")
    sp.add_argument("--software")
    sp.add_argument("--version")
    sp.add_argument("--min_ct", type=float)
    sp.add_argument("--max_ct", type=float)
    sp.add_argument("--with-sublineage", dest="with_sublineage", action="store_true")
    sp.add_argument("--no_frameshifts", action="store_true")
    sp.add_argument("--only_frameshifts", action="store_true")
    sp.add_argument("--count", action="store_true")
    sp.add_argument("--ambig", action="store_true")
    sp.add_argument("--tsv", action="store_true")
    sp.add_argument("--debug", action="store_true")
    sp.add_argument("--no-lineage-update", dest="no_lineage_update",
                    action="store_true",
                    help="accepted for compatibility; this engine never "
                         "auto-downloads the taxonomy at match time")
    sp.add_argument("-o", "--out")
    sp.add_argument("--at-version", dest="at_version", type=int,
                    help="time travel: evaluate against the store as of "
                         "this commit version (see `history`)")
    sp.set_defaults(fn=cmd_match)

    sp = sub.add_parser("restore")
    common(sp)
    sp.add_argument("--acc", nargs="+")
    sp.add_argument("-f", "--file", dest="acc_file",
                    help="file with one accession per line")
    sp.add_argument("-o", "--out")
    sp.add_argument("--at-version", dest="at_version", type=int,
                    help="time travel: restore from this commit version")
    sp.set_defaults(fn=cmd_restore)

    sp = sub.add_parser("var2vcf")
    common(sp)
    sp.add_argument("--acc", nargs="+")
    sp.add_argument("-f", "--file", dest="acc_file",
                    help="file with one accession per line")
    sp.add_argument("--date", nargs="+")
    sp.add_argument("-o", "--out", "--output", required=True)
    sp.add_argument("--betaV2", action="store_true",
                    help="accepted for compatibility; this engine is always "
                         "aggregation-first (the v2 semantics)")
    sp.add_argument("--at-version", dest="at_version", type=int,
                    help="time travel: export from this commit version")
    sp.set_defaults(fn=cmd_var2vcf)

    sp = sub.add_parser("update")
    common(sp)
    sp.add_argument("--pangolin")
    sp.add_argument("--csv")
    sp.add_argument("--tsv")
    sp.add_argument("--fields", nargs="+")
    sp.add_argument("--compressed", choices=["none", "gz", "xz", "auto"],
                    default="auto",
                    help="accepted for compatibility; csv/tsv codecs are "
                         "detected from the extension")
    sp.set_defaults(fn=cmd_update)

    sp = sub.add_parser("remove")
    common(sp)
    sp.add_argument("--acc", nargs="+")
    sp.add_argument("-f", "--file", dest="acc_file",
                    help="file with one accession per line")
    sp.set_defaults(fn=cmd_remove)

    sp = sub.add_parser("dq")
    common(sp)
    sp.add_argument("--tsv", action="store_true")
    sp.set_defaults(fn=cmd_dq)

    sp = sub.add_parser("sql")
    common(sp)
    sp.add_argument("query", help="SQL over genomes/profiles/…/essence views")
    sp.add_argument("--tsv", action="store_true")
    sp.add_argument("-o", "--out")
    sp.set_defaults(fn=cmd_sql)

    sp = sub.add_parser("info")
    common(sp)
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("optimize")
    common(sp)
    sp.set_defaults(fn=cmd_optimize)

    sp = sub.add_parser("db-upgrade")
    common(sp)
    sp.set_defaults(fn=cmd_db_upgrade)

    def _positive_int(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--limit must be >= 1")
        return n

    sp = sub.add_parser("history")
    sp.add_argument("--limit", type=_positive_int, default=None,
                    help="show only the newest N commits (reads only "
                         "those commit files)")
    common(sp)
    sp.set_defaults(fn=cmd_history)

    sp = sub.add_parser("vacuum")
    common(sp)
    sp.add_argument("--retain", type=int, default=2,
                    help="keep the last N versions time-travelable "
                         "(default 2; the latest is always kept)")
    sp.add_argument("--min-age-hours", type=float, default=1.0,
                    help="never delete anything younger than this "
                         "(default 1h; guards in-flight writers and "
                         "pinned readers)")
    sp.add_argument("--wait", type=float, default=None,
                    help="seconds to wait for the writer lease "
                         "(default outlasts the lease staleness "
                         "threshold so GC succeeds on first try even "
                         "right after a writer crash; against a LIVE "
                         "writer the lease stays heartbeat-fresh and "
                         "vacuum blocks the full wait — a periodic "
                         "stderr line reports which case you are in)")
    sp.set_defaults(fn=cmd_vacuum)

    sp = sub.add_parser(
        "update-lineage-info",
        description="Rebuild the lineage→sublineage closure table. "
        "Input contract: --input is the pango-designation lineages.csv "
        "export (one header line; lineage name in the first column), "
        "--alias-key its alias_key.json (optional; maps alias prefixes "
        "to full lineage paths). The reference downloads these itself "
        "every run; this engine reads LOCAL files by default and only "
        "downloads with --fetch, which fails with a clean error when "
        "offline.")
    common(sp)
    sp.add_argument("--input",
                    help="lineages.csv (pango designation export; "
                         "required unless --fetch)")
    sp.add_argument("--alias-key", help="alias_key.json")
    sp.add_argument("--fetch", action="store_true",
                    help="download lineages.csv + alias_key.json from "
                         "the public pango-designation repository "
                         "(errors cleanly offline)")
    sp.add_argument("-o", "--out", required=True)
    sp.set_defaults(fn=cmd_update_lineage_info)

    return p


def main(argv: list[str] | None = None, spark=None):
    args = build_parser().parse_args(argv)
    if spark is None:
        import os

        from covsonar_spark.session import get_spark

        if getattr(args, "cpus", None):
            os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
        spark = get_spark("sparksonar-cli")
    return args.fn(spark, args)


if __name__ == "__main__":
    main()
