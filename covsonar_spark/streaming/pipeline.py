"""Structured Streaming over the events table: windowed aggregation
with watermarks, native session windows, and a custom stateful
sessionizer via ``applyInPandasWithState``.

The reference is batch-only (SURVEY §2.8) — this extends the same
event-table semantics to streams. Every operator here has a batch twin
in the registry (events_window_agg / events_sessionize), and the tests
drive both paths and compare results: the streaming plan with
``availableNow`` must reproduce the batch answer.

Scale notes:
  * watermark bounds state: windows older than (max event time − delay)
    are finalized and dropped — state size is O(active windows), not
    O(stream history).
  * session windows shuffle once on user_id; state per key is one open
    session struct. applyInPandasWithState holds the same state
    explicitly (Arrow-batched per key group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from covsonar_spark.session import ensure_nanos_readable

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet. The table has shipped with ts
    as TIMESTAMP(NANOS) (read nanos-as-long) and TIMESTAMP(MICROS)
    (TIMESTAMP_NTZ in Spark 4); peek at the batch schema and normalize
    either to integer ``ts_us`` + proper timestamp ``event_time``."""
    import os

    ensure_nanos_readable(spark, f"{sf_dir}/events.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        # multi-file layout (sf1's generated tile): stream the table
        # directory itself — a name glob on the parent would match NO
        # part files and silently stream 0 rows (caught at sf1: the
        # stream queries read empty while the batch twins read 1M rows)
        raw = spark.readStream.schema(schema).parquet(path)
    else:
        # single-file layout (driver sf dirs): the glob picks the one
        # table file out of the shared directory
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema.fields)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts_us", F.expr("ts div 1000"))
    else:  # timestamp / timestamp_ntz; session tz is UTC so the cast is exact
        raw = raw.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    return raw.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts per event_type with a
    watermark bounding state."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts_native(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions via the built-in session_window — the
    idiomatic Spark form of the batch lag/running-sum sessionizer."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts_us").alias("session_start_us"),
             F.max("ts_us").alias("session_end_us"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


def attribution_join_stream(events: DataFrame, lookback: str = "30 minutes",
                            watermark: str = "2 hours") -> DataFrame:
    """Stream-stream time-bounded join: every purchase joined to ALL
    of the same user's clicks within the lookback window — the live
    multi-touch attribution feed.  (A last-touch reduction — one max
    click per purchase — is a downstream batch/foreachBatch aggregate
    over this feed; a streaming query cannot express the per-purchase
    max in the same plan.)

    This is the Structured Streaming capability the batch as-of /
    interval joins can't give: both sides arrive continuously, and the
    watermarks bound the buffered state (clicks older than watermark +
    lookback are evicted — state is O(recent events), not O(stream)).
    The time-range condition makes Spark derive the state-cleanup
    predicate automatically. Batch twin = the identical inequality
    join on the static frames; the test drives both and compares.
    """
    clicks = (events.where(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts_us").alias("click_ts_us"),
                      F.col("event_time").alias("click_time"))
              .withWatermark("click_time", watermark))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts_us",
                         F.col("event_time").alias("purchase_time"))
                 .withWatermark("purchase_time", watermark))
    return purchases.join(
        clicks,
        F.expr(f"""
            user_id = c_user AND
            click_time >= purchase_time - interval {lookback} AND
            click_time <= purchase_time
        """),
    ).select("user_id", "event_id", "ts_us", "click_id", "click_ts_us")


def sessionize_stateful(events: DataFrame, gap_us: int = 1800 * 1_000_000,
                        flush_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful sessionization with ``applyInPandasWithState``:
    per user, keep one open session (start, end, count); emit a row per
    closed session.

    This is the template for reference-style custom stateful operators
    the built-ins can't express (e.g. per-key paranoid checks on a
    stream of incoming genomes).

    ``flush_timeout_ms`` enables ProcessingTimeTimeout so idle users'
    open sessions flush — KNOWN ISSUE: in pyspark 4.1.2 the
    ProcessingTimeTimeout path hard-crashes the Python worker
    (Arrow reader dies before any user code runs), so it stays off by
    default; with NoTimeout the open tail session simply stays in
    state, which is the correct semantics for a continuous stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    out_schema = "user_id long, session_start_us long, session_end_us long, n_events long"
    state_schema = "start_us long, end_us long, n long"

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user_id, s, e, n))
                state.remove()
        else:
            cur = tuple(state.get) if state.exists else None
            ts_all = []
            for pdf in pdf_iter:
                ts_all.extend(int(t) for t in pdf["ts_us"])
            for t in sorted(ts_all):
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_us:
                    closed.append((user_id, *cur))
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], t, cur[2] + 1)
            if cur is not None:
                state.update(cur)
                if flush_timeout_ms:
                    state.setTimeoutDuration(flush_timeout_ms)
        yield pd.DataFrame(closed, columns=["user_id", "session_start_us",
                                            "session_end_us", "n_events"])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if flush_timeout_ms
               else GroupStateTimeout.NoTimeout)
    # project to the two columns the stateful fn reads BEFORE the state
    # shuffle (guide §4.1/§2.3): applyInPandasWithState is opaque to
    # column pruning, so without this every events column — including
    # the fat props JSON string — rides the user_id exchange and the
    # Arrow boundary into Python just to be ignored
    events = events.select("user_id", "ts_us")
    return events.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=timeout)


def stream_add_genomes(store, watch_dir: str,
                       checkpoint_dir: str | None = None):
    """Streaming ingest: FASTA files landing in ``watch_dir`` flow
    through the full add pipeline (harmonize → dedup → align → profile
    → paranoid) one micro-batch at a time via ``foreachBatch``.

    The batch path IS the streaming path — ``foreachBatch`` hands each
    micro-batch to ``store.add_fasta_df`` unchanged, so every
    correctness guarantee (conflict checks, round-trip validation)
    holds per batch. Returns the started query; callers trigger with
    availableNow for drain-style tests or leave it running for a
    landing-zone deployment.
    """
    from covsonar_spark.sources.fasta import iter_fasta_records

    spark = store.spark

    def parse_batch(batch_df: DataFrame, batch_id: int) -> None:
        paths = [r["value"] for r in batch_df.select("value").collect()]
        recs = []
        for p in paths:
            for acc, desc, seq in iter_fasta_records(p):
                recs.append((acc, desc, seq))
        if recs:
            df = spark.createDataFrame(
                recs, "accession string, description string, sequence string")
            store.add_fasta_df(df)

    # one row per landed file path (text stream of a manifest dir);
    # binaryFile streaming would ship payloads through the plan — the
    # manifest keeps the stream tiny and the FASTA read distributed-ready
    files = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.manifest")
        .load(watch_dir)
    )
    w = files.writeStream.foreachBatch(parse_batch).trigger(availableNow=True)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


_MEMORY_SINKS: dict[tuple[int, str], str] = {}


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a stream into an in-memory table with availableNow (one
    micro-batch sweep over all currently-available files) and return the
    query handle; caller reads ``spark.table(name)``.

    Memory sinks hold their rows in the session until dropped; repeated
    callers (bench best-of-N, the registry) must not accumulate them —
    each call drops the PREVIOUS sink registered under the same logical
    prefix, where the prefix strips only a trailing NUMERIC sequence
    segment (``reg_stream_sessions_7`` → ``reg_stream_sessions``;
    ``sess_native`` keeps its full name, so unrelated sinks sharing a
    word prefix never evict each other).  Bookkeeping is keyed by
    session so multi-session processes drop only their own views."""
    spark = stream_df.sparkSession
    head, _, tail = name.rpartition("_")
    prefix = head if head and tail.isdigit() else name
    key = (id(spark), prefix)
    old = _MEMORY_SINKS.pop(key, None)
    if old is not None and old != name:
        try:
            spark.catalog.dropTempView(old)
        except Exception:  # noqa: BLE001 — already gone
            pass
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    _MEMORY_SINKS[key] = name
    return q
