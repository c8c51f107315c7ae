"""File-level data-skipping manifest — one stats row per parquet data
file, consulted driver-side to drop whole files BEFORE the scan starts.

Reference parity: none (beyond-parity scale feature).  At 100 TB a
table is tens of thousands of files; Spark's built-in min/max pruning
happens only after a file's footer is opened, and a token-containment
predicate (`array_contains` AND-groups, the match engine's hot path)
has no min/max statistics at all.  This is the same lever Delta's
file statistics / Iceberg manifests provide, specialized for the
profile-token workload:

* per file: row count, min/max of the declared key columns, and a
  WIDE bloom (default 8192 bits = 128 longs) OR-folded over every
  row's token array — the file's token vocabulary fingerprint.
* losslessness: a file whose bloom lacks a queried token's bit cannot
  contain any row with that token, so dropping it cannot drop results;
  kept files still run the exact predicate (false keeps are harmless).
* the row-level analogue is operators/predicates.py:token_bloom (64
  bits, per row).  The file bloom must be much wider because it
  accumulates the file's whole vocabulary: at ~5k distinct tokens per
  file (a lineage-clustered layout) 8192 bits sits near 50% fill —
  ~12% false-keep for a 3-token AND; a randomly-sharded layout
  saturates ANY per-file fingerprint, so skipping effectiveness is a
  property of clustering (write profiles sorted/partitioned by
  lineage), which the store's optimize() layout already encourages.

Scale shape: the manifest build is one column-pruned scan (token
array + keys) with a two-level aggregation keyed on (file, slot) —
fully distributed, no driver state beyond the final one-row-per-file
result.  Pruning filters the MANIFEST (tiny) and collects only the
surviving file list, never file contents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_BITS = 8192   # 128 longs per token column per file


def _py_slot_mask(token: str, bits: int) -> tuple[int, int]:
    """(slot, single-bit mask) for a token — built on the ONE shared
    hash→bit mapping (operators/predicates.py:token_index, whose JVM
    twin token_index_col also produces the stored file blooms)."""
    from covsonar_spark.operators.predicates import token_index

    slot, bit = divmod(token_index(token, bits), 64)
    mask = 1 << bit
    # two's-complement fold: bit 63 is negative in a JVM long
    if mask >= (1 << 63):
        mask -= 1 << 64
    return slot, mask


def build_manifest(spark: SparkSession, table_path: str | Sequence[str],
                   token_cols: Sequence[str] = ("dna_profile",),
                   key_cols: Sequence[str] = (),
                   bits: int = MANIFEST_BITS) -> DataFrame:
    """One row per data file of ``table_path`` (one directory, or the
    live directory list of a commit-log table): n_rows, min/max of each
    key column, and a ``{tc}_bloom`` array<long> per token column.

    Cost: one stats pass plus one column-pruned pass PER TOKEN COLUMN
    (profiles with dna+aa blooms = 3 passes), each reading only the
    token/key columns — the wide payload columns are never touched.
    The (file, slot) pre-aggregation keeps each pass's shuffle at
    |files| x |occupied slots| rows regardless of row count (map-side
    bit_or combine does the heavy folding)."""
    from covsonar_spark.operators.predicates import token_index_col

    n_longs = bits // 64
    paths = ([table_path] if isinstance(table_path, str)
             else list(table_path))
    df = spark.read.parquet(*paths)
    base = df.select(F.input_file_name().alias("file"),
                     *[F.col(c) for c in dict.fromkeys((*token_cols,
                                                        *key_cols))])
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for k in key_cols:
        aggs += [F.min(k).alias(f"min_{k}"), F.max(k).alias(f"max_{k}")]
    out = base.groupBy("file").agg(*aggs)

    for tc in token_cols:
        tok = (base.select("file", F.explode(tc).alias("tok"))
               .select("file",
                       token_index_col(F.col("tok"), bits).alias("h")))
        slots = (tok.select("file",
                            (F.col("h") / 64).cast("int").alias("slot"),
                            F.call_function(
                                "shiftleft", F.lit(1).cast("long"),
                                (F.col("h") % 64).cast("int")).alias("b"))
                 .groupBy("file", "slot").agg(F.bit_or("b").alias("b"))
                 .groupBy("file")
                 .agg(F.map_from_entries(
                     F.collect_list(F.struct("slot", "b"))).alias("m"))
                 .select("file", F.expr(
                     f"transform(sequence(0, {n_longs - 1}),"
                     f" i -> coalesce(m[i], 0L))").alias(f"{tc}_bloom")))
        out = out.join(slots, "file", "left").withColumn(
            f"{tc}_bloom",
            F.coalesce(f"{tc}_bloom",
                       F.expr(f"array_repeat(0L, {n_longs})")))
    return out


def prune_files(manifest: DataFrame, bloom_col: str,
                tokens: Sequence[str],
                bits: int = MANIFEST_BITS) -> list[str]:
    """File paths that MAY contain rows where every token of the AND
    group appears — the complement set provably cannot and is skipped.
    Filters the manifest (one row per file) and collects only paths."""
    cond = None
    for t in tokens:
        slot, mask = _py_slot_mask(t, bits)
        c = (F.element_at(F.col(bloom_col), slot + 1)
             .bitwiseAND(F.lit(mask)) != 0)
        cond = c if cond is None else cond & c
    pruned = manifest if cond is None else manifest.where(cond)
    return [r["file"] for r in pruned.select("file").collect()]


def files_where(manifest: DataFrame, cond) -> list[str]:
    """File paths whose stats row does not DEFINITELY fail ``cond`` —
    a NULL verdict (all-NULL stat columns) keeps the file, the lossless
    direction.  One collect over the tiny one-row-per-file manifest."""
    rows = manifest.select("file", cond.alias("keep")).collect()
    return [r["file"] for r in rows if r["keep"] is not False]


def file_group_condition(groups: list[dict[str, list[list[str]]]],
                         col_of: dict[str, str],
                         bits: int = MANIFEST_BITS):
    """File-level necessary condition for a rewritten profile query —
    the manifest twin of operators/match.py:profile_bloom_prefilter,
    over the wide per-file blooms instead of the per-row long.

    ``groups`` is the rewrite_profiles output (OR of groups; within a
    group AND across fields/atoms, an atom being a token's IUPAC
    expansion set).  ``col_of`` maps field name -> manifest bloom
    column.  Per atom the file must contain ANY of the expansion's
    bits; AND-mode folds atoms with AND, the wildcard-OR quirk with
    OR; groups OR together.  Returns None (prune nothing) when any
    group yields no usable parts — same vacuousness rule as the row
    prefilter, so pruning is always a superset of the rows the exact
    predicate keeps."""
    from functools import reduce

    from covsonar_spark.functions import tokens as TK

    def bit_test(col: str, token: str):
        slot, mask = _py_slot_mask(token, bits)
        return (F.element_at(F.col(col), slot + 1)
                .bitwiseAND(F.lit(mask)) != 0)

    group_preds = []
    for g in groups:
        parts = []
        for field, col in col_of.items():
            exps = g.get(field) or []
            if not exps:
                continue
            atoms = []
            for exp in exps:
                if not exp:
                    return None
                atoms.append(reduce(lambda a, b: a | b,
                                    [bit_test(col, t) for t in exp]))
            if TK.group_any_mode(exps, field):
                parts.append(reduce(lambda a, b: a | b, atoms))
            else:
                parts.append(reduce(lambda a, b: a & b, atoms))
        if not parts:
            return None
        group_preds.append(reduce(lambda a, b: a & b, parts))
    if not group_preds:
        return None
    return reduce(lambda a, b: a | b, group_preds)


# ---------------------------------------------------------------------------
# Metadata min/max conditions (the manifest twin of the reference's
# B-tree metadata indexes, /root/reference/lib/db.sqlite:34-50): per-file
# min/max stats turn point/IN/range/prefix predicates into whole-file
# skips.  Every builder returns a NECESSARY condition of the exact
# row predicate — a file where it is definitely False cannot hold a
# matching row; NULL verdicts (all-NULL stat columns) keep the file
# (store._prune_with prunes only on definite False).
# ---------------------------------------------------------------------------


def stat_in_condition(key: str, values: Sequence, max_terms: int = 256):
    """File may contain a row with ``key IN values``: some v must fall
    inside [min_key, max_key].  Above ``max_terms`` values the OR chain
    would bloat the plan (the sublineage closure can expand to
    thousands), so it degrades to the coarser—but still necessary—
    bracket overlap [min(values), max(values)]."""
    from functools import reduce

    vals = [v for v in values if v is not None]
    if not vals:
        return None
    lo_c, hi_c = F.col(f"min_{key}"), F.col(f"max_{key}")
    if len(vals) > max_terms:
        return (lo_c <= F.lit(max(vals))) & (hi_c >= F.lit(min(vals)))
    return reduce(lambda a, b: a | b,
                  [(lo_c <= F.lit(v)) & (hi_c >= F.lit(v)) for v in vals])


def stat_range_condition(key: str, ranges: Sequence[tuple], cast: str | None = None):
    """File may contain a row with ``key`` in ANY inclusive [lo, hi]
    range (either bound None = open): the file's [min, max] must
    overlap it.  An unbounded range can never prune — returns None."""
    from functools import reduce

    def lit(v):
        c = F.lit(v)
        return c.cast(cast) if cast else c

    preds = []
    for lo, hi in ranges:
        parts = []
        if hi is not None:
            parts.append(F.col(f"min_{key}") <= lit(hi))
        if lo is not None:
            parts.append(F.col(f"max_{key}") >= lit(lo))
        if not parts:
            return None          # open range: nothing prunable anywhere
        preds.append(reduce(lambda a, b: a & b, parts))
    if not preds:
        return None
    return reduce(lambda a, b: a | b, preds)


def _prefix_upper(p: str) -> str | None:
    """Smallest string greater than EVERY string with prefix ``p``
    (increment the last incrementable codepoint, skipping the surrogate
    range so the literal stays a valid UTF-8 string); None when no such
    string exists (all codepoints maxed)."""
    for i in reversed(range(len(p))):
        nxt = ord(p[i]) + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000         # > every valid continuation of p[i]
        if nxt <= 0x10FFFF:
            return p[:i] + chr(nxt)
    return None


def stat_prefix_condition(key: str, prefixes: Sequence[str]):
    """File may contain a row where ``key`` starts with ANY prefix:
    s startswith p implies p <= s < prefix_upper(p), so the file's
    [min, max] must intersect that half-open interval."""
    from functools import reduce

    preds = []
    for p in prefixes:
        parts = [F.col(f"max_{key}") >= F.lit(p)]
        up = _prefix_upper(p)
        if up is not None:
            parts.append(F.col(f"min_{key}") < F.lit(up))
        preds.append(reduce(lambda a, b: a & b, parts))
    if not preds:
        return None
    return reduce(lambda a, b: a | b, preds)


def read_pruned(spark: SparkSession, table_path: str, manifest: DataFrame,
                bloom_col: str, tokens: Sequence[str],
                bits: int = MANIFEST_BITS) -> DataFrame:
    """The manifest-pruned scan: read only files that can match the AND
    token group.  Callers still apply the exact predicate — pruning is
    a necessary condition, identical results guaranteed.  ``basePath``
    keeps partition-directory columns intact when explicit files are
    read from a partitioned layout."""
    files = prune_files(manifest, bloom_col, tokens, bits)
    if not files:
        return spark.read.parquet(table_path).limit(0)
    return spark.read.option("basePath", table_path).parquet(*files)
