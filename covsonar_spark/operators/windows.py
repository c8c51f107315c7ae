"""Event-time windowed aggregation and sessionization (batch forms).

The reference has no streaming surface (SURVEY §2.8); these are the
engine's event-analytics extensions.  Streaming twins live in
``covsonar_spark.streaming`` and share the same column logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Tumbling event-time window aggregation: count + value sum per
    (window, key).  Uses the native ``window`` function so the same
    expression works under Structured Streaming with a watermark."""
    return (
        events.groupBy(F.window(ts_col, width).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``.  Classic two-window plan:
    lag → boundary flag → running sum = session id (one shuffle on user)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
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
