"""SparkSession factory.

Local test profile: one JVM, N threads (``local[N]``). The settings below
are chosen so the same logical plans scale to a multi-executor cluster:
AQE handles skew/coalescing at runtime, shuffle partitions sized for the
local core count (on a real cluster this would be ~2-3x total cores or
left to AQE), Arrow enabled for the pandas-UDF alignment stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _executor_pythonpath() -> str:
    """PYTHONPATH for Python workers: the directory containing this
    package (so ``spark.python.daemon.module=covsonar_spark.pydaemon``
    resolves in the worker interpreter) plus any inherited PYTHONPATH."""
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inherited = os.environ.get("PYTHONPATH", "")
    return pkg_parent + (os.pathsep + inherited if inherited else "")


def get_spark(app_name: str = "sparksonar", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Python workers run our daemon wrapper (covsonar_spark/pydaemon.py):
        # stock workers pay ~250 ms CPU PER TASK re-reading the immutable
        # pyspark.zip directories (importlib.invalidate_caches) and full-heap
        # gc.collect()s in the reuse loop — measured 4-5x total Python-side
        # CPU on trivial 32-task jobs.  Workers must be able to import the
        # package, so its parent dir is prepended to the executor PYTHONPATH.
        .config("spark.python.daemon.module", "covsonar_spark.pydaemon")
        .config("spark.executorEnv.PYTHONPATH", _executor_pythonpath())
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) columns (events.ts in some testdata
        # generations) are rejected by the reader unless read as long;
        # set once at session birth so no query mutates shared state
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARKSONAR_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


CLUSTER_PROFILE = {
    # A concrete starting point for the 1000-executor / 100 TB
    # deployment this engine is designed for (local[N] testing keeps
    # the same logical plans; these knobs only resize the physical
    # execution).  Rationale per knob:
    #   shuffle.partitions ~ 2-3x total cores so every core gets a few
    #     waves and AQE can coalesce down; with 1000 executors x 4
    #     cores -> 12000.  AQE's advisoryPartitionSizeInBytes then
    #     targets ~128-256 MB per post-shuffle partition, the sweet
    #     spot between task overhead and spill risk.
    #   files.maxPartitionBytes 256m: scan tasks sized so a row-group
    #     plus decode headroom fits executor memory alongside shuffle
    #     buffers.
    #   autoBroadcastJoinThreshold 64m: dims (nation/supplier/taxonomy/
    #     codebooks) broadcast; fact-fact joins shuffle.  Runtime bloom
    #     filters (on by default) prune selective-dim SMJ probes.
    #   skewJoin thresholds: AQE splits partitions >256 MB and >5x
    #     median — the salting operators cover the aggregate cases AQE
    #     does not.
    "spark.sql.shuffle.partitions": "12000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "192m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
    "spark.sql.files.maxPartitionBytes": "256m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def cluster_conf() -> dict:
    """The documented cluster deployment profile (see CLUSTER_PROFILE);
    apply via ``SparkSession.builder.config(map=cluster_conf())`` on a
    real cluster submit — kept out of get_spark() so local tests stay
    sized for local[N]."""
    return dict(CLUSTER_PROFILE)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Load the driver's parquet tables as DataFrames keyed by name."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def ensure_nanos_readable(spark: SparkSession, parquet_path: str) -> None:
    """Sessions built by :func:`get_spark` set
    ``spark.sql.legacy.parquet.nanosAsLong`` at birth; externally-owned
    sessions (the correctness driver brings its own) may not.  The flag
    has no per-read option, so if — and only if — the file actually
    carries a TIMESTAMP(NANOS) column that the reader would reject, set
    it before the read.  On micros/NTZ data this never touches conf."""
    try:
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true":
            return
    except Exception:  # noqa: BLE001 — unreadable conf: fall through
        pass
    try:
        import glob as _glob
        import os as _os
        import pyarrow.parquet as _pq

        paths = sorted(_glob.glob(parquet_path)) or [parquet_path]
        # a Spark-written "file" is a DIRECTORY of part files — peek
        # inside (recursively, skipping _SUCCESS etc.)
        files = []
        for p in paths:
            if _os.path.isdir(p):
                files.extend(sorted(_glob.glob(
                    _os.path.join(p, "**", "*.parquet"), recursive=True)))
            else:
                files.append(p)
        nanos = False
        # bounded probe: footers are KB-sized but a 100 TB dir can hold
        # 100k part files — probe the first 64 (one writer job is
        # schema-uniform; a mixed-generation dir beyond the probe
        # surfaces as a LOUD reader error, not silent data loss)
        for f in files[:64]:
            schema = _pq.read_schema(f)
            if any(str(t).startswith("timestamp[ns") for t in schema.types):
                nanos = True
                break
        if nanos:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — footer peek failed: fail CLOSED
        # we cannot prove the file is nanos-free, and the flag's only
        # effect is on nanos columns — set it so the read cannot crash
        # (the behavior of the unconditional set this helper replaced)
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001
            pass
