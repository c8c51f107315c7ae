"""Filter/predicate builders — the `match` WHERE-layer re-expressed as
Catalyst column expressions (reference: sonarDBManager.match,
/root/reference/lib/sonardb.py:1623-2006).

Every builder returns a :class:`pyspark.sql.Column` boolean expression, so
predicates compose with ``&``/``|``/``~`` into one expression tree that
Catalyst pushes into the Parquet scan wherever possible.  None of these
functions trigger a job; they are pure plan construction.

Include/exclude convention (reference ``^`` prefix, lib/sonardb.py:3295-3358):
callers split values into include/exclude lists; excludes negate the same
predicate shape (IN → NOT IN with AND-joined semantics, LIKE → NOT LIKE…).
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def true_lit() -> Column:
    return F.lit(True)


def in_list(col: str | Column, values: Sequence) -> Column:
    """F2 — ``field IN (…)`` (lib/sonardb.py:1641-1645)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(list(values))


def not_in_list(col: str | Column, values: Sequence) -> Column:
    """F2 negated — ``field NOT IN (…)``."""
    return ~in_list(col, values)


def equals(col: str | Column, value) -> Column:
    """F3 — scalar equality (lib/sonardb.py:1647-1649)."""
    c = F.col(col) if isinstance(col, str) else col
    return c == F.lit(value)


def numeric_between(col: str | Column, lo=None, hi=None) -> Column:
    """F4 — numeric range, either bound optional (lib/sonardb.py:1651-1657)."""
    c = F.col(col) if isinstance(col, str) else col
    conds = []
    if lo is not None:
        conds.append(c >= F.lit(lo))
    if hi is not None:
        conds.append(c <= F.lit(hi))
    return reduce(lambda a, b: a & b, conds) if conds else F.lit(True)


def prefix_any(col: str | Column, prefixes: Sequence[str], negate: bool = False) -> Column:
    """F5 — zip-style prefix match: OR over ``startswith`` for includes,
    AND over negated for excludes (lib/sonardb.py:1659-1665)."""
    c = F.col(col) if isinstance(col, str) else col
    if negate:
        return reduce(lambda a, b: a & b, [~c.startswith(p) for p in prefixes])
    return reduce(lambda a, b: a | b, [c.startswith(p) for p in prefixes])


def date_ranges(col: str | Column, specs: Sequence[str], negate: bool = False) -> Column:
    """F6 — date point/range filter (lib/sonardb.py:1667-1680).

    Each spec is ``YYYY-MM-DD`` (point) or ``a:b`` (inclusive range).
    Includes OR-join; excludes negate each and AND-join.
    """
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    _d = r"\d{4}-\d{2}-\d{2}"
    preds = []
    for spec in specs:
        # validate eagerly (same regex discipline as the reference CLI,
        # sonar.py:1048-1060): a malformed spec would cast to NULL and
        # silently match nothing instead of erroring
        if not _re.fullmatch(rf"{_d}(:{_d})?", spec):
            raise ValueError(
                f"invalid date spec {spec!r}: use YYYY-MM-DD or "
                f"YYYY-MM-DD:YYYY-MM-DD")
        if ":" in spec:
            a, b = spec.split(":", 1)
            p = c.between(F.lit(a).cast("date"), F.lit(b).cast("date"))
        else:
            p = c == F.lit(spec).cast("date")
        preds.append(p)
    if negate:
        return reduce(lambda a, b: a & b, [~p for p in preds])
    return reduce(lambda a, b: a | b, preds)


def token_contains(col: str | Column, token: str) -> Column:
    """F7 atom — exact-token membership in an array<string> profile column.

    The reference stores profiles as space-padded strings and matches with
    ``LIKE '% tok %'`` (lib/sonardb.py:1623-1639); on an ArrayType column
    the exact equivalent is ``array_contains`` — same semantics, no
    substring pitfalls, and eligible for Catalyst optimizations.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_contains(c, token)


def profile_group(col: str | Column, tokens: Sequence[str], any_mode: bool = False) -> Column:
    """F7 group — AND across tokens of one ``-i`` group, unless the
    reference's wildcard quirk flips the group to OR (``any_mode``;
    lib/sonardb.py:1626-1637: any token ending in N/X switches the whole
    group's conjunction to disjunction).

    OR-mode uses ``arrays_overlap`` against the token set — one pass over
    the array instead of k ``array_contains`` scans.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not tokens:
        return F.lit(True)
    if any_mode:
        return F.arrays_overlap(c, F.array(*[F.lit(t) for t in tokens]))
    return reduce(lambda a, b: a & b, [F.array_contains(c, t) for t in tokens])


def or_groups(groups: Iterable[Column]) -> Column:
    """F8 — multiple include groups OR-ed (lib/sonardb.py:1927-1976)."""
    groups = list(groups)
    if not groups:
        return F.lit(True)
    return reduce(lambda a, b: a | b, groups)


def and_all(preds: Iterable[Column]) -> Column:
    preds = [p for p in preds if p is not None]
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def empty_array(col: str | Column, empty: bool = True) -> Column:
    """F9 — frameshift tri-state: profile array empty / non-empty
    (lib/sonardb.py:1978-1982)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(c) == 0 if empty else F.size(c) > 0


# Above this many IN-list values the literal list stops being a win:
# it bloats the plan (serialized to every task, re-parsed per stage)
# and the optimizer gains nothing from pushdown it can't use on a
# thousands-wide OR.  A broadcast semi-join against a values frame is
# the scale-safe shape.  Module-level (read at call time) so tests and
# deployments can tune it.
IN_SEMIJOIN_THRESHOLD = 10_000


def apply_in_filter(df: DataFrame, col: str, values: Sequence,
                    negate: bool = False,
                    threshold: int | None = None) -> DataFrame:
    """``field IN (…)`` / ``NOT IN (…)`` at any list size.

    Below :data:`IN_SEMIJOIN_THRESHOLD` this is the plain literal
    ``isin`` predicate (partition-prunable, pushes to the scan).
    Above it — e.g. a sublineage closure or an accession sample file
    expanding to 100k+ values (reference --sample files,
    /root/reference/lib/sonardb.py:3365-3425) — it flips to a
    broadcast left_semi (or left_anti) join against a deduplicated
    values frame, preserving exact IN/NOT-IN semantics: NULL field
    values match neither IN nor NOT IN, so the anti path filters them
    explicitly (a bare anti-join would keep them)."""
    if isinstance(values, DataFrame):
        return apply_in_frame(df, col, values, negate=negate)
    values = list(values)
    if threshold is None:
        threshold = IN_SEMIJOIN_THRESHOLD   # module global: tunable
    if len(values) <= threshold:
        return df.where(not_in_list(col, values) if negate
                        else in_list(col, values))
    vals = df.sparkSession.createDataFrame(
        [(v,) for v in dict.fromkeys(values)],
        df.select(col).schema)
    if negate:
        return df.where(F.col(col).isNotNull()) \
                 .join(F.broadcast(vals), col, "left_anti")
    return df.join(F.broadcast(vals), col, "left_semi")


def apply_in_frame(df: DataFrame, col: str, values: DataFrame,
                   negate: bool = False) -> DataFrame:
    """``field IN (subquery)`` against a DISTRIBUTED single-column values
    frame — the wildcard-expansion overflow path: the value set never
    touches the driver.  Exact IN/NOT-IN semantics match
    :func:`apply_in_filter`'s join path (NULL field values match
    neither).  No broadcast hint: the values side is usually a distinct
    set of a categorical column and AQE picks broadcast on its measured
    size — a pathological expansion over a high-cardinality column must
    not be forced driver-resident."""
    vals = values.toDF(col).dropDuplicates()
    if negate:
        return df.where(F.col(col).isNotNull()).join(vals, col, "left_anti")
    return df.join(vals, col, "left_semi")


def distinct_values_matching(df: DataFrame, col: str, sql_like_pattern: str,
                             limit: int | None = None) -> list | None:
    """F13 — lineage ``%`` wildcard expansion: collect DISTINCT values
    matching a SQL LIKE pattern (lib/sonardb.py:1608-1614).  Driver-side
    collect of a tiny distinct set; the result feeds :func:`in_list` so the
    final scan predicate stays a static IN-list (partition-prunable).

    With ``limit``, at most ``limit + 1`` rows are fetched and **None**
    is returned when the distinct set exceeds it — the caller's signal
    to stay distributed (``apply_in_frame``) instead of collecting an
    unbounded expansion of a high-cardinality column."""
    q = df.select(col).where(F.col(col).like(sql_like_pattern)).distinct()
    if limit is not None:
        rows = q.limit(limit + 1).collect()
        if len(rows) > limit:
            return None
        return [r[0] for r in rows]
    return [r[0] for r in q.collect()]


# ---------------------------------------------------------------------------
# Bloom-fingerprint pre-filter (SURVEY §4's flagged scale rewrite (a):
# turn array_contains conjunctions into a pushable cheap test)
# ---------------------------------------------------------------------------

BLOOM_BITS = 64


def token_index_col(t: Column, bits: int) -> Column:
    """JVM-side bloom bit index of a token: md5-hex-prefix hash mod
    ``bits``.  THE single definition of the hash→bit mapping — the
    per-row bloom uses it at bits=64, the file-manifest bloom
    (sources/manifest.py) at 8192.  ``token_index`` below is its exact
    Python twin; any change must land in both or stored fingerprints
    stop matching query masks and pruning silently drops rows."""
    return (F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
            .cast("long") % bits)


def token_index(token: str, bits: int) -> int:
    """Driver-side twin of ``token_index_col`` (same md5 derivation)."""
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % bits


def token_bloom(tokens_col: str | Column) -> Column:
    """64-bit bloom fingerprint of a token-array column: OR of
    ``1 << (md5(token) % 64)`` — md5-derived so the ingest-side column
    and the driver-side query mask use the same hash everywhere.

    Stored next to the profile arrays at ingest, this turns an
    AND-of-array_contains profile query into a single-long bitmask
    test ``(bloom & mask) = mask`` that (1) reads ONE fixed-width
    column instead of the token array, (2) runs in whole-stage codegen
    as two integer ops, and (3) is a *necessary* condition — false
    positives fall through to the exact array_contains check, false
    negatives are impossible, so the rewrite is lossless."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # call_function, not F.shiftleft: the Python wrapper only accepts a
    # literal int for numBits, the SQL resolver takes a column
    bit = lambda t: F.call_function(  # noqa: E731
        "shiftleft", F.lit(1).cast("long"),
        token_index_col(t, BLOOM_BITS).cast("int"))
    return F.aggregate(c, F.lit(0).cast("long"),
                       lambda acc, t: acc.bitwiseOR(bit(t)))


def bloom_mask(tokens: Sequence[str]) -> int:
    """Driver-side query mask: same md5 bit mapping as token_bloom."""
    mask = 0
    for t in tokens:
        mask |= 1 << token_index(t, BLOOM_BITS)
    # two's-complement fold: bit 63 makes the JVM long negative, and
    # F.lit rejects unsigned values above Long.MAX_VALUE
    return mask - (1 << 64) if mask >= (1 << 63) else mask


def bloom_prefilter(bloom_col: str | Column, tokens: Sequence[str]) -> Column:
    """Cheap necessary-condition test for an AND token group:
    every query token's bit must be set in the row's fingerprint."""
    c = F.col(bloom_col) if isinstance(bloom_col, str) else bloom_col
    mask = bloom_mask(tokens)
    return c.bitwiseAND(F.lit(mask)) == F.lit(mask)
