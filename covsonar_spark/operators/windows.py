"""Event-time windowed aggregation and sessionization (batch forms).

The reference has no streaming surface (SURVEY §2.8); these are the
engine's event-analytics extensions.  Streaming twins live in
``covsonar_spark.streaming`` and share the same column logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts", key_col: str = "event_type",
                    val_col: str = "value") -> DataFrame:
    """Tumbling event-time window aggregation: count + value sum per
    (window, key).  Uses the native ``window`` function so the same
    expression works under Structured Streaming with a watermark."""
    return (
        events.groupBy(F.window(ts_col, width).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              tolerance: int | None = None) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``right_ts`` ≤ ``left_ts`` within the same key
    (DuckDB/kdb/pandas ``merge_asof`` semantics; Spark has no native
    form — SURVEY §2.3 notes the reference has none either, this is
    beyond-parity surface for event attribution).

    Physical strategy is the union+window trick, NOT a range join: tag
    both sides, union them, and per key take the running "last right
    payload seen" ordered by (ts, side) — right rows sort before left
    rows at equal ts, so ties match (>= semantics). ONE shuffle on the
    key, no range-condition join (which Spark would execute as a
    broadcast-nested-loop or an inequality sort-merge with per-key
    fanout — the union+window plan is O(n log n) per key and
    skew-safe under AQE).

    ``tolerance`` (in the ts column's own units, for numeric ts): right
    matches older than ``left_ts - tolerance`` are nulled out, matching
    pandas ``merge_asof(tolerance=...)``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in set(key_cols) | {right_ts}]
    payload = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c) for c in right_cols])
    # a NULL right timestamp would sort before every real row (ASC is
    # NULLS FIRST) and leak its payload into unmatched left rows —
    # pandas merge_asof drops NaT rows; so do we
    r = right.where(F.col(right_ts).isNotNull()).select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"))
    # the window runs over a union that KEEPS the left columns (right
    # rows hold nulls there) and filters back to left rows afterwards —
    # a synthetic-row-id join-back would cost a second shuffle.
    l_full = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"))
    left_types = dict(left.dtypes)
    r_full = r
    for c in left.columns:
        if c not in set(key_cols):
            r_full = r_full.withColumn(c, F.lit(None).cast(left_types[c]))
    unioned = l_full.unionByName(r_full, allowMissingColumns=True)
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col("__ts").asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w))
    out = matched.where(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__match",
            F.when(F.col("__match").isNotNull()
                   & (F.col("__ts") - F.col("__match.__rts") <= F.lit(tolerance)),
                   F.col("__match")))
    # a payload column that collides with a left column (or a left
    # column named matched_ts) would be silently OVERWRITTEN — suffix
    # collisions like pandas merge_asof's _y instead
    left_names = set(left.columns)
    for c in right_cols:
        dst = f"{c}_right" if c in left_names else c
        out = out.withColumn(dst, F.col(f"__match.{c}"))
    ts_dst = "matched_ts_right" if "matched_ts" in left_names else "matched_ts"
    out = out.withColumn(ts_dst, F.col("__match.__rts"))
    return out.drop("__ts", "__side", "__payload", "__match")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bin_width: int) -> DataFrame:
    """Interval-overlap join via binning — the scalable plan for a
    big × big range join, which Spark would otherwise execute as a
    broadcast-nested-loop (O(n·m)) or a one-sided sort-merge with a
    residual inequality. Spark has no native interval join; the
    reference has no range joins at all (SURVEY §2.3).

    Each interval is exploded into the fixed-width bins it touches;
    the join is then a plain EQUI-join on the bin id plus the exact
    overlap predicate as a residual filter. Work is O(candidates) where
    candidates share a bin — pick ``bin_width`` near the typical
    interval length so most intervals touch O(1) bins. A pair spanning
    several shared bins would appear once per bin, so the join keeps
    only the pair's FIRST shared bin (greatest of the two start-bins) —
    dedup by construction, no distinct() shuffle afterwards.

    Returns all left×right column pairs that overlap:
    max(start) ≤ min(end) (closed intervals).
    """
    def binned(df: DataFrame, s: str, e: str, prefix: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
            F.explode(F.sequence(
                F.floor(F.col(s) / bin_width).cast("long"),
                F.floor(F.col(e) / bin_width).cast("long"))).alias("__bin"))

    a = binned(left, l_start, l_end, "")
    b = binned(right, r_start, r_end, "")
    dup = set(left.columns) & set(right.columns)
    for c in dup:
        b = b.withColumnRenamed(c, f"r_{c}")
    rs, re = (f"r_{r_start}" if r_start in dup else r_start,
              f"r_{r_end}" if r_end in dup else r_end)
    first_shared = F.greatest(
        F.floor(F.col(l_start) / bin_width).cast("long"),
        F.floor(F.col(rs) / bin_width).cast("long"))
    return (
        a.join(b, "__bin")
        .where((F.col(l_start) <= F.col(re)) & (F.col(rs) <= F.col(l_end)))
        .where(F.col("__bin") == first_shared)
        .drop("__bin")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id",
               tiebreak_col: str | None = "event_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``.  Classic two-window plan:
    lag → boundary flag → running sum = session id (one shuffle on user).
    ``tiebreak_col`` pins ordering of same-timestamp events (pass None
    for inputs without one)."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    boundary = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = events.withColumn("session_seq", F.sum(boundary).over(w))
    return (
        with_sess.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
