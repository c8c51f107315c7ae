"""Time-series operators over the events table: grid resampling with
forward fill, EWMA (a genuinely order-dependent fold), OHLC bars, and
two-pass z-score anomaly flagging.

The reference has no time-series surface at all (its only temporal op
is date-range filtering, SURVEY.md §2.2 F6; lib/sonardb.py:3302-3340) —
but a training-data/events pipeline needs resampling and smoothing.
Everything here is expressed with built-in JVM expressions (zero Python
UDFs): the EWMA uses ``F.aggregate`` (a Catalyst higher-order function,
whole-stage-codegen'd) over a per-key sorted array, which is the
Spark-first way to run an inherently sequential recurrence without
falling out of the JVM.

Scale notes (100 TB):
  * gap_fill densifies per-key grids with ``sequence()`` + explode —
    the grid is generated AFTER the per-(key,bucket) aggregate, so the
    explode fan-out is bounded by #keys x #buckets, never by raw rows;
  * the forward fill is last_value(IGNORE NULLS) over an UNBOUNDED
    PRECEDING frame — one shuffle on the key, running state O(1);
  * EWMA's collect_list holds one key's series in one task — that is
    inherent to the recurrence; for skewed keys the chunked-fold trick
    (fold per day-chunk, then fold the chunk results scaled by
    (1-a)^chunk_len) re-parallelizes it, noted below, not needed at
    this key cardinality;
  * zscore is the histogram pattern: tiny mergeable moment aggregate
    broadcast back into a single big scan — no wide shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

US_PER_DAY = 86_400_000_000

_TS_US = "epoch_us(CAST(ts AS TIMESTAMP))"


# ---------------------------------------------------------------------------
# gap fill / resample
# ---------------------------------------------------------------------------

def ts_gap_fill(ev: DataFrame) -> DataFrame:
    """Daily resample per user with forward fill, reported per cohort:
    for each user, build the dense day grid [first_day .. last_day],
    attach each day's LAST value (row_number over (ts_us, event_id) —
    a total order, so deterministic), forward-fill missing days, then
    roll up to user_id%10 cohorts: observed days, filled (gap) days,
    and the sum of the forward-filled series."""
    day = (F.col("ts_us") / F.lit(US_PER_DAY)).cast("bigint")
    w_last = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc())
    per_day = (
        ev.withColumn("day", day)
        .withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("day_value"))
    )
    spans = per_day.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    w_fill = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, 0))
    filled = (
        grid.join(per_day, ["user_id", "day"], "left")
        .withColumn("filled_value",
                    F.last("day_value", ignorenulls=True).over(w_fill))
        .withColumn("is_gap", F.col("day_value").isNull())
    )
    return (
        filled.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n_days"),
             F.sum(F.col("is_gap").cast("int")).alias("n_gap_days"),
             F.round(F.sum("filled_value"), 2).alias("sum_filled"))
        .orderBy("cohort")
    )


TS_GAP_FILL_SQL = f"""
WITH per_day AS (
  SELECT user_id, day, value AS day_value FROM (
    SELECT user_id, {_TS_US} // {US_PER_DAY} AS day, value,
           row_number() OVER (PARTITION BY user_id, {_TS_US} // {US_PER_DAY}
                              ORDER BY {_TS_US} DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), grid AS (
  SELECT user_id, unnest(range(d0, d1 + 1)) AS day
  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM per_day GROUP BY user_id)
), filled AS (
  SELECT g.user_id, g.day, p.day_value,
         last_value(p.day_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
         p.day_value IS NULL AS is_gap
  FROM grid g LEFT JOIN per_day p USING (user_id, day)
)
SELECT user_id % 10 AS cohort, count(*) AS n_days,
       CAST(sum(CAST(is_gap AS INT)) AS BIGINT) AS n_gap_days,
       round(sum(filled_value), 2) AS sum_filled
FROM filled GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------

ALPHA = 0.3


def ts_ewma(ev: DataFrame) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha=0.3) of
    `value` in event order — an order-dependent recurrence no plain
    window frame can express.  Spark-first form: array_sort the
    (ts_us, event_id, value) structs per key (struct sort = total
    order), then F.aggregate — a codegen'd left fold, never leaving
    the JVM.  Init is the FIRST element (pandas ewm-adjust=False
    convention) so the DuckDB list_reduce twin (which folds from the
    head) computes the identical trajectory.  For a skewed key, fold
    day-chunks then combine chunk folds scaled by (1-a)^len — the
    recurrence is linear, so the combine is exact."""
    a = F.lit(ALPHA)
    sorted_vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "value"))),
        lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(sorted_vals, 2, F.greatest(F.size(sorted_vals) - 1, F.lit(0))),
        F.element_at(sorted_vals, 1).cast("double"),
        lambda acc, x: acc * (F.lit(1.0) - a) + a * x)
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(ewma, 4).alias("ewma_value"))
        .groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n_users"),
             F.sum("n_events").alias("n_events"),
             F.round(F.sum("ewma_value"), 4).alias("sum_ewma"))
        .orderBy("cohort")
    )


TS_EWMA_SQL = f"""
WITH per_user AS (
  SELECT user_id, count(*) AS n_events,
         round(list_reduce(list(value ORDER BY {_TS_US}, event_id),
                           (acc, x) -> acc * {1.0 - ALPHA} + {ALPHA} * x), 4) AS ewma_value
  FROM events GROUP BY user_id
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS n_events, round(sum(ewma_value), 4) AS sum_ewma
FROM per_user GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# OHLC bars
# ---------------------------------------------------------------------------

def ts_ohlc(ev: DataFrame) -> DataFrame:
    """Daily OHLC bars per user: open/close via one window pass
    (first/last over the full frame with (ts_us, event_id) total
    order), high/low/volume in the same downstream aggregate.  One
    shuffle on (user, day) serves both the window and the group-by —
    Spark reuses the partitioning, no second Exchange."""
    day = (F.col("ts_us") / F.lit(US_PER_DAY)).cast("bigint")
    w = (Window.partitionBy("user_id", "day")
         .orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    bars = (
        ev.withColumn("day", day)
        .withColumn("open", F.first("value").over(w))
        .withColumn("close", F.last("value").over(w))
        .groupBy("user_id", "day")
        .agg(F.round(F.first("open"), 4).alias("open"),
             F.round(F.max("value"), 4).alias("high"),
             F.round(F.min("value"), 4).alias("low"),
             F.round(F.first("close"), 4).alias("close"),
             F.count(F.lit(1)).alias("volume"))
    )
    return (
        bars.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n_bars"),
             F.sum("volume").alias("volume"),
             F.round(F.sum("open"), 4).alias("sum_open"),
             F.round(F.sum("high"), 4).alias("sum_high"),
             F.round(F.sum("low"), 4).alias("sum_low"),
             F.round(F.sum("close"), 4).alias("sum_close"))
        .orderBy("cohort")
    )


TS_OHLC_SQL = f"""
WITH ranked AS (
  SELECT user_id, day, value,
         row_number() OVER (PARTITION BY user_id, day
                            ORDER BY ts_us, event_id) AS rn_asc,
         row_number() OVER (PARTITION BY user_id, day
                            ORDER BY ts_us DESC, event_id DESC) AS rn_desc
  FROM (SELECT *, {_TS_US} AS ts_us, {_TS_US} // {US_PER_DAY} AS day FROM events)
), bars AS (
  SELECT user_id, day,
         round(max(CASE WHEN rn_asc = 1 THEN value END), 4) AS open,
         round(max(value), 4) AS high,
         round(min(value), 4) AS low,
         round(max(CASE WHEN rn_desc = 1 THEN value END), 4) AS close,
         count(*) AS volume
  FROM ranked GROUP BY user_id, day
)
SELECT user_id % 10 AS cohort, count(*) AS n_bars, CAST(sum(volume) AS BIGINT) AS volume,
       round(sum(open), 4) AS sum_open, round(sum(high), 4) AS sum_high,
       round(sum(low), 4) AS sum_low, round(sum(close), 4) AS sum_close
FROM bars GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# z-score anomalies
# ---------------------------------------------------------------------------

Z_CUT = 2.0


def ts_anomaly_zscore(ev: DataFrame) -> DataFrame:
    """Two-pass anomaly flagging: per-event-type mean/stddev (tiny
    mergeable moment aggregate) broadcast back into one scan that flags
    |z| > 2.  The same shape as the histogram bounds pass — the scale-
    correct alternative to a global window."""
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd"))
    # sd == 0 (constant series) -> no anomalies, not ANSI DIVIDE_BY_ZERO
    z = F.when(F.col("sd") != 0, (F.col("value") - F.col("mu")) / F.col("sd"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum((F.abs(F.col("z")) > Z_CUT).cast("int")).alias("n_anomalies"),
             F.round(F.max("z"), 4).alias("max_z"),
             F.round(F.min("z"), 4).alias("min_z"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# gaps-and-islands / SCD2 intervals
# ---------------------------------------------------------------------------

def ts_islands_scd2(ev: DataFrame) -> DataFrame:
    """Gaps-and-islands: collapse each user's consecutive runs of the
    same event_type into SCD2-style validity intervals — the classic
    change-capture shape (lag-change flag -> running sum -> island id),
    the same two-window one-shuffle plan as sessionization but keyed on
    VALUE change, not time gap.  Intervals then roll up per (cohort,
    event_type): island count, row count, and total in-island dwell
    time.  One shuffle on user_id serves both windows AND the island
    aggregate (same partitioning)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)), 1).otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
           .rowsBetween(Window.unboundedPreceding, 0))
    islands = (
        ev.withColumn("chg", chg)
        .withColumn("island", F.sum("chg").over(run))
        .groupBy("user_id", "island", "event_type")
        .agg(F.min("ts_us").alias("valid_from"),
             F.max("ts_us").alias("valid_to"),
             F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        islands.groupBy((F.col("user_id") % 10).alias("cohort"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_islands"),
             F.sum("n_rows").alias("n_events"),
             F.sum(F.col("valid_to") - F.col("valid_from")).alias("dwell_us"))
        .orderBy("cohort", "event_type")
    )


TS_ISLANDS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, ts_us,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
  FROM (SELECT user_id, event_id, event_type, {_TS_US} AS ts_us FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), runs AS (
  SELECT user_id, event_type, ts_us,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), islands AS (
  SELECT user_id, island, event_type,
         min(ts_us) AS valid_from, max(ts_us) AS valid_to, count(*) AS n_rows
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id % 10 AS cohort, event_type, count(*) AS n_islands,
       CAST(sum(n_rows) AS BIGINT) AS n_events, CAST(sum(valid_to - valid_from) AS BIGINT) AS dwell_us
FROM islands GROUP BY 1, 2 ORDER BY 1, 2
"""


# the CASE guard mirrors the Spark side: a constant series (sd = 0)
# yields NULL z-scores in both engines (DuckDB would otherwise produce
# inf and count every row as an anomaly)
TS_ANOMALY_SQL = f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY event_type
), z AS (
  SELECT e.event_type, CASE WHEN sd = 0 THEN NULL
                            ELSE (value - mu) / sd END AS zv
  FROM events e JOIN stats USING (event_type)
)
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(abs(zv) > {Z_CUT} AS INT)) AS BIGINT) AS n_anomalies,
       round(max(zv), 4) AS max_z,
       round(min(zv), 4) AS min_z
FROM z GROUP BY event_type ORDER BY event_type
"""
