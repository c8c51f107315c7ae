"""The `match` engine — covsonar's flagship query re-expressed as one
Catalyst expression tree over the essence DataFrame.

Reference lifecycle (SURVEY §3.1): driver-side rewrite (IUPAC expansion,
X/N injection, wildcard lineage, sublineage closure) → WHERE-fragment
assembly (lib/sonardb.py:1682-2006) → SQLite scan → python post-filter.
Spark shape: the same rewrite feeds a single boolean Column tree; the
ambiguity post-filter becomes a higher-order array filter that runs
distributed; projection/count stay in the plan.

Deliberate divergences from reference bugs (SURVEY §7):
  * exclude-profile clause joining the wrong list when a group mixes
    dna+aa tokens (lib/sonardb.py:1970) — we AND the per-field clauses;
  * `filter_ambig`'s keep-set being dict keys instead of the searched
    tokens (lib/sonardb.py:3469-3482) — we keep the searched tokens.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covsonar_spark.functions import tokens as TK
from covsonar_spark.operators import closure as CL
from covsonar_spark.operators import predicates as P
from covsonar_spark.schemas import ESSENCE_COLUMNS

# metadata dimensions filtered with IN/NOT IN semantics (reference
# sonarDBManager.match call sites, lib/sonardb.py:1726-1924)
# dimensions upper-cased by the CLI before matching (sonar.py:1068-1087)
UPPERCASED_FIELDS = frozenset(
    {"lineage", "lab", "source", "collection", "technology", "platform",
     "chemistry", "material", "software"}
)


def split_negations(values: Sequence[str]) -> tuple[list[str], list[str]]:
    """Split ``^``-prefixed excludes from includes (lib/sonardb.py:3295-3358)."""
    inc = [v for v in values if not v.startswith("^")]
    exc = [v[1:] for v in values if v.startswith("^")]
    return inc, exc


@dataclass
class MatchQuery:
    """Declarative match request — mirrors the reference CLI surface
    (sonar.py:153-344)."""

    profiles: list[list[str]] = dc_field(default_factory=list)         # -i groups
    exclude_profiles: list[list[str]] = dc_field(default_factory=list)  # -e groups
    accessions: list[str] = dc_field(default_factory=list)
    lineages: list[str] = dc_field(default_factory=list)
    with_sublineage: bool = False
    zips: list[str] = dc_field(default_factory=list)
    dates: list[str] = dc_field(default_factory=list)
    submission_dates: list[str] = dc_field(default_factory=list)
    labs: list[str] = dc_field(default_factory=list)
    sources: list[str] = dc_field(default_factory=list)
    collections: list[str] = dc_field(default_factory=list)
    technologies: list[str] = dc_field(default_factory=list)
    platforms: list[str] = dc_field(default_factory=list)
    chemistries: list[str] = dc_field(default_factory=list)
    materials: list[str] = dc_field(default_factory=list)
    software: str | None = None
    software_version: str | None = None
    min_ct: float | None = None
    max_ct: float | None = None
    seqhashes: list[str] = dc_field(default_factory=list)
    frameshifts: int = 0          # 0 any, -1 none-only, 1 only
    count: bool = False
    ambig: bool = False           # True = keep ambiguous calls in output


def expand_lineages(over: DataFrame, lineages: list[str], with_sublineage: bool,
                    sublineage_map: dict[str, list[str]] | None,
                    threshold: int | None = None) -> list[str] | DataFrame:
    """F13 wildcard expansion + F14 sublineage closure, in ONE place
    (reference lib/sonardb.py:3365-3425).

    ``over`` must be the FULL genomes/essence frame: a store that prunes
    files before matching must expand wildcards against the unpruned
    table, or pruning that removes every file holding a wildcard's
    lineages silently drops the engine's lineage predicate and the
    pruned match diverges from the unpruned one (round-5 review
    finding; regression test
    tests/test_manifest.py::test_wildcard_prune_divergence).

    Returns a plain list below ``threshold`` (default
    :data:`predicates.IN_SEMIJOIN_THRESHOLD`) — preserving the
    reference's empty-expansion-drops-the-predicate semantics — or a
    single-column DataFrame of distinct values above it, which stays
    distributed end-to-end (``predicates.apply_in_frame``)."""
    if threshold is None:
        threshold = P.IN_SEMIJOIN_THRESHOLD
    literals = [v for v in lineages if "%" not in v]
    patterns = [v for v in lineages if "%" in v]
    out = list(literals)
    overflow = len(out) > threshold
    for pat in patterns:
        if overflow:
            break
        vals = P.distinct_values_matching(over, "lineage", pat,
                                          limit=threshold)
        if vals is None or len(out) + len(vals) > threshold:
            overflow = True
        else:
            out.extend(vals)
    if not overflow:
        if with_sublineage:
            out = CL.bfs_closure(sublineage_map or {}, out)
        return out
    spark = over.sparkSession
    frames = []
    if literals:
        frames.append(spark.createDataFrame(
            [(v,) for v in literals], "lineage: string"))
    for pat in patterns:
        frames.append(over.select("lineage")
                      .where(F.col("lineage").like(pat)).distinct())
    vals_df = reduce(DataFrame.unionByName, frames).dropDuplicates()
    if with_sublineage:
        vals_df = CL.closure_frame(sublineage_map or {}, vals_df, "lineage")
    return vals_df


def _profile_field_pred(col: str, expansions: list[list[str]], kind: str, negate: bool) -> Column:
    """One field's clause for one group — AND across user tokens, flipped
    to OR by the trailing-N/X wildcard quirk (lib/sonardb.py:1623-1639).

    Each user token is one atom: ``array_contains`` when it expanded to
    itself only, else ``arrays_overlap`` against its IUPAC expansion set
    (one pass over the profile array instead of k contains-scans).
    Negated atoms are the complement; join logic is unchanged."""
    any_mode = TK.group_any_mode(expansions, kind)
    atoms = []
    for exp in expansions:
        if len(exp) == 1:
            a = F.array_contains(F.col(col), exp[0])
        else:
            a = F.arrays_overlap(F.col(col), F.array(*[F.lit(t) for t in exp]))
        atoms.append(~a if negate else a)
    op = (lambda a, b: a | b) if any_mode else (lambda a, b: a & b)
    return reduce(op, atoms)


def profile_predicate(groups: list[dict[str, list[list[str]]]], negate: bool = False) -> Column | None:
    """OR over groups; within a group the dna clause AND the aa clause
    (lib/sonardb.py:1927-1976, with the :1970 bug fixed)."""
    group_preds = []
    for g in groups:
        parts = []
        if g["dna"]:
            parts.append(_profile_field_pred("dna_profile", g["dna"], "dna", negate))
        if g["aa"]:
            parts.append(_profile_field_pred("aa_profile", g["aa"], "aa", negate))
        if parts:
            group_preds.append(reduce(lambda a, b: a & b, parts))
    if not group_preds:
        return None
    return reduce(lambda a, b: a | b, group_preds)


def profile_bloom_prefilter(groups: list[dict[str, list[list[str]]]]) -> Column | None:
    """SURVEY §4's flagged scale rewrite (a): a necessary-condition
    bitmask test over the STORED 64-bit bloom fingerprint columns,
    prepended to the exact include predicate.

    Per group and field: AND-mode single-token atoms fold into one
    required-bits mask (``bloom & m == m``); IUPAC-expanded atoms and
    wildcard-OR groups degrade to an any-bit test over their token
    union (``bloom & m != 0``) — still necessary, never sufficient, so
    the exact array predicate behind it keeps full semantics and the
    rewrite is LOSSLESS. Groups OR together like the exact predicate;
    a group that yields no usable mask makes the whole prefilter
    vacuous (returns None). The payoff at 100 TB: the common
    no-wildcard screen reads one fixed-width long per row and rejects
    non-matches with two integer ops in codegen, touching the token
    arrays only for candidate rows.
    """
    group_preds: list[Column] = []
    for g in groups:
        parts: list[Column] = []
        for field, col in (("dna", "dna_bloom"), ("aa", "aa_bloom")):
            exps = g.get(field) or []
            if not exps:
                continue
            if TK.group_any_mode(exps, field):
                union = [t for exp in exps for t in exp]
                m = P.bloom_mask(union)
                parts.append(F.col(col).bitwiseAND(F.lit(m)) != 0)
            else:
                single_mask = 0
                for exp in exps:
                    if len(exp) == 1:
                        single_mask |= P.bloom_mask(exp)
                    else:
                        m = P.bloom_mask(exp)
                        parts.append(F.col(col).bitwiseAND(F.lit(m)) != 0)
                if single_mask:
                    parts.append(
                        F.col(col).bitwiseAND(F.lit(single_mask)) == F.lit(single_mask))
        if not parts:
            return None
        group_preds.append(reduce(lambda a, b: a & b, parts))
    if not group_preds:
        return None
    return reduce(lambda a, b: a | b, group_preds)


def profile_semijoin_keys(tokens_long: DataFrame,
                          groups: list[dict[str, list[list[str]]]],
                          key_col: str = "seqhash") -> DataFrame:
    """The 100 TB execution strategy for the F7/F8 include predicate
    (SURVEY §4's flagged rewrite): instead of scanning every profile
    array with ``array_contains`` (per-row work ∝ corpus size), look the
    query up in a long-format token table ``(key, field, token)``
    bucketed/partitioned by token — broadcast the query atoms, equi-join
    them against the token table (token-partition pruning reads only the
    query tokens' buckets, i.e. work ∝ token selectivity, not corpus
    size), and count satisfied atoms per key:

      * per (key, group, field): distinct atoms hit; a field is
        satisfied when hits == all its atoms (AND) or ≥ 1 (the
        wildcard any-mode quirk, lib/sonardb.py:1626-1637);
      * per (key, group): every present field satisfied (dna AND aa);
      * any group satisfied → key matches (OR across `-i` groups).

    Returns the distinct matching keys — ``left_semi``-join essence
    against it.  Exact same semantics as ``profile_predicate`` (equality
    is asserted in tests and against the driver oracle); the predicate
    path stays the default below the scale where the token table pays
    for itself.
    """
    spark = tokens_long.sparkSession
    atoms, reqs, nfields = [], [], {}
    for gi, g in enumerate(groups):
        for fld in ("dna", "aa"):
            exps = g.get(fld) or []
            if not exps:
                continue
            any_mode = TK.group_any_mode(exps, fld)
            reqs.append((gi, fld, 1 if any_mode else len(exps)))
            nfields[gi] = nfields.get(gi, 0) + 1
            for ai, exp in enumerate(exps):
                atoms.extend((gi, fld, ai, t) for t in exp)
    if not atoms:
        raise ValueError("profile_semijoin_keys needs at least one include atom")
    atoms_df = spark.createDataFrame(
        atoms, "group_idx: int, field: string, atom_idx: int, token: string")
    reqs_df = spark.createDataFrame(reqs, "group_idx: int, field: string, required: int")
    nf_df = spark.createDataFrame(sorted(nfields.items()), "group_idx: int, n_fields: int")

    hits = (
        tokens_long.join(F.broadcast(atoms_df), ["field", "token"])
        .groupBy(key_col, "group_idx", "field")
        .agg(F.countDistinct("atom_idx").alias("hit"))
    )
    field_ok = hits.join(F.broadcast(reqs_df), ["group_idx", "field"]) \
                   .where(F.col("hit") >= F.col("required"))
    group_ok = (
        field_ok.groupBy(key_col, "group_idx")
        .agg(F.count(F.lit(1)).alias("fields_ok"))
        .join(F.broadcast(nf_df), "group_idx")
        .where(F.col("fields_ok") == F.col("n_fields"))
    )
    return group_ok.select(key_col).distinct()


def profiles_to_tokens_long(profiles: DataFrame, key_col: str = "seqhash") -> DataFrame:
    """Long-format token table from the profiles table — the structure a
    cluster deployment materializes once, partitioned by token, to feed
    ``profile_semijoin_keys``."""
    dna = profiles.select(F.col(key_col), F.lit("dna").alias("field"),
                          F.explode("dna_profile").alias("token"))
    aa = profiles.select(F.col(key_col), F.lit("aa").alias("field"),
                         F.explode("aa_profile").alias("token"))
    return dna.unionByName(aa).distinct()


def _ambig_output_filter(col: str, ambig_letters: frozenset[str], keep: list[str],
                         del_pattern: str) -> Column:
    """F15 — distributed re-expression of the reference's driver-side
    `filter_ambig` (lib/sonardb.py:2994-3032): drop tokens whose terminal
    letter is an ambiguity code, unless the token was searched for or is
    a deletion.  Runs as a higher-order array filter in the scan stage."""
    keep_arr = F.array(*[F.lit(t) for t in keep]) if keep else F.array().cast("array<string>")
    ambig_arr = F.array(*[F.lit(c) for c in sorted(ambig_letters)])
    return F.filter(
        F.col(col),
        lambda t: F.array_contains(keep_arr, t)
        | t.rlike(del_pattern)
        | ~F.array_contains(ambig_arr, F.substring(t, -1, 1))
        | ~F.substring(t, -1, 1).rlike("[A-Z]$"),
    )


class MatchEngine:
    """Executes MatchQuery against essence (genomes ⟕ profiles on seqhash).

    ``essence`` must expose the 22 ESSENCE_COLUMNS with ArrayType
    profiles.  ``sublineage_map`` is the lineage→children dict (broadcast
    -sized sidecar, reference lib/lineage.all.tsv).
    """

    def __init__(self, essence: DataFrame, sublineage_map: dict[str, list[str]] | None = None,
                 grammar: TK.TokenGrammar = TK.DEFAULT_GRAMMAR):
        self.essence = essence
        self.sublineage_map = sublineage_map or {}
        self.grammar = grammar

    # -- rewrite ----------------------------------------------------------

    def _expand_lineages(self, lineages: list[str],
                         with_sublineage: bool) -> list[str] | DataFrame:
        """F13/F14 over this engine's own essence — correct when the
        essence IS the full table (standalone engines); a store whose
        essence is file-pruned resolves against the full table instead
        and passes the result via ``run(..., resolved_lineages=…)``."""
        return expand_lineages(self.essence, lineages, with_sublineage,
                               self.sublineage_map)

    # -- plan construction ------------------------------------------------

    @staticmethod
    def _norm(field: str, values):
        """CLI-style upper-casing of categorical query values
        (sonar.py:1068-1087); `^` negation prefixes survive."""
        if values and field in UPPERCASED_FIELDS:
            return [v.upper() for v in values]
        return values

    def plan(self, q: MatchQuery,
             resolved_lineages: tuple | None = None) -> DataFrame:
        preds: list[Column] = []

        inc_prof = TK.rewrite_profiles(q.profiles, self.grammar) if q.profiles else []
        exc_prof = TK.rewrite_profiles(q.exclude_profiles, self.grammar) if q.exclude_profiles else []
        if inc_prof:
            # cheap stored-fingerprint prefilter first (codegen && is
            # left-to-right, so the two-integer-op test short-circuits
            # the array scans for non-candidates)
            if "dna_bloom" in self.essence.columns:
                bp = profile_bloom_prefilter(inc_prof)
                if bp is not None:
                    preds.append(bp)
            p = profile_predicate(inc_prof)
            if p is not None:
                preds.append(p)
        if exc_prof:
            p = profile_predicate(exc_prof, negate=True)
            if p is not None:
                preds.append(p)

        # metadata IN/NOT IN dims
        dims = {
            "accession": q.accessions,
            "lineage": None,  # handled below (wildcard/sublineage expansion)
            "lab": q.labs, "source": q.sources, "collection": q.collections,
            "technology": q.technologies, "platform": q.platforms,
            "chemistry": q.chemistries, "material": q.materials,
            "seqhash": q.seqhashes,
        }
        # IN/NOT-IN dims route through apply_in_filter: a literal isin
        # below the threshold (identical plan to inlining the pred), a
        # broadcast semi/anti join above it — the sublineage closure or
        # an accession sample file expanding to 100k+ values must not
        # inject a 100k-literal IN into the plan
        in_filters: list[tuple[str, list, bool]] = []
        if resolved_lineages is not None:
            # the store resolved wildcards/closure over the FULL table
            # (its essence here may be file-pruned — see expand_lineages)
            inc_lin, exc_lin = resolved_lineages
        else:
            inc_lin, exc_lin = split_negations(self._norm("lineage", q.lineages))
            inc_lin = self._expand_lineages(inc_lin, q.with_sublineage)
            exc_lin = self._expand_lineages(exc_lin, False)
        # a DataFrame-valued resolution (expansion overflow) always
        # filters; an empty LIST drops the predicate (reference
        # empty-expansion semantics, lib/sonardb.py:3365-3388)
        if isinstance(inc_lin, DataFrame) or inc_lin:
            in_filters.append(("lineage", inc_lin, False))
        if isinstance(exc_lin, DataFrame) or exc_lin:
            in_filters.append(("lineage", exc_lin, True))

        for fld, vals in dims.items():
            if not vals:
                continue
            inc, exc = split_negations(self._norm(fld, vals))
            if inc:
                in_filters.append((fld, inc, False))
            if exc:
                in_filters.append((fld, exc, True))

        inc_zip, exc_zip = split_negations(q.zips)
        if inc_zip:
            preds.append(P.prefix_any("zip", inc_zip))
        if exc_zip:
            preds.append(P.prefix_any("zip", exc_zip, negate=True))

        for fld, specs in (("date", q.dates), ("submission_date", q.submission_dates)):
            if not specs:
                continue
            inc, exc = split_negations(specs)
            if inc:
                preds.append(P.date_ranges(fld, inc))
            if exc:
                preds.append(P.date_ranges(fld, exc, negate=True))

        if q.software is not None:
            preds.append(P.equals("software", q.software.upper()))
            if q.software_version is not None:
                preds.append(P.equals("software_version", q.software_version.upper()))
        elif q.software_version is not None:
            raise ValueError("matching a software version needs a software defined")

        if q.min_ct is not None or q.max_ct is not None:
            preds.append(P.numeric_between("ct", q.min_ct, q.max_ct))

        if q.frameshifts == -1:
            preds.append(P.empty_array("fs_profile", empty=True))
        elif q.frameshifts == 1:
            preds.append(P.empty_array("fs_profile", empty=False))

        df = self.essence.where(P.and_all(preds)) if preds else self.essence
        for fld, vals, neg in in_filters:
            df = P.apply_in_filter(df, fld, vals, negate=neg)

        if q.count:
            return df.agg(F.count(F.lit(1)).alias("count"))

        if not q.ambig:
            keep = [t for g in inc_prof for exps in g.values() for exp in exps for t in exp]
            import re as _re

            # escape symbols like TokenGrammar.__post_init__ does — a
            # custom grammar with regex metacharacters in a symbol name
            # must not corrupt (or crash) the rlike pattern
            sym = "(?:" + "|".join(_re.escape(s) for s in self.grammar.symbols) + ")"
            del_pat = rf"^(?:{sym}:)?del:[0-9]+:[0-9]+$"
            df = df.withColumn(
                "dna_profile", _ambig_output_filter("dna_profile", TK.AMBIG_NT, keep, del_pat)
            ).withColumn(
                "aa_profile", _ambig_output_filter("aa_profile", TK.AMBIG_AA, keep, del_pat)
            )
        return df.select(*ESSENCE_COLUMNS)

    def run(self, q: MatchQuery,
            resolved_lineages: tuple | None = None) -> DataFrame:
        return self.plan(q, resolved_lineages=resolved_lineages)


def build_essence(genomes: DataFrame, profiles: DataFrame) -> DataFrame:
    """essence = genomes ⟕ profiles on seqhash (reference view
    lib/db.sqlite:95-123).  Both sides bucketed by seqhash at write time
    → no shuffle; empty arrays substituted for missing profiles. Stored
    bloom fingerprint columns ride along (match uses them as a cheap
    necessary-condition prefilter; they never reach the output)."""
    e = genomes.join(profiles, "seqhash", "left")
    empty = F.array().cast("array<string>")
    for c in ("dna_profile", "aa_profile", "fs_profile"):
        e = e.withColumn(c, F.coalesce(F.col(c), empty))
    extra = [c for c in ("dna_bloom", "aa_bloom") if c in e.columns]
    for c in extra:
        # NULL fingerprint = unknown (profile row absent or pre-v3):
        # all-ones passes every necessary-condition test, so the exact
        # array predicate keeps sole authority for such rows
        e = e.withColumn(c, F.coalesce(F.col(c), F.lit(-1).cast("long")))
    return e.select(*ESSENCE_COLUMNS, *extra)
