"""Python worker daemon with the per-task fixed costs removed.

Launched by the JVM as ``python -m covsonar_spark.pydaemon`` when
``spark.python.daemon.module`` points here (set by ``session.get_spark``;
externally-owned sessions — e.g. the correctness driver's — keep the
stock daemon and identical results, this is a pure perf knob).

Two measured per-task overheads in the stock worker loop, each paid by
EVERY Python-boundary task (pandas UDF / mapInPandas / RDD op), ~250 ms
CPU per task on this host (tools/ab_scanfloor.py methodology; a 32-task
trivial mapInPandas burned 8.5-9.2 CPU-seconds in the workers with the
stock daemon, 1.8-2.2 with this one):

1. ``worker_util.setup_spark_files`` runs ``importlib.invalidate_caches()``
   per task; with ``pyspark.zip``/``py4j.zip`` on every worker's
   ``sys.path`` each call re-reads the zip central directories
   (``zipimport._read_directory`` — ~80k buffered reads per task).  The
   Spark runtime zips are immutable for the application's lifetime, so
   the re-read buys nothing: drop it by no-op'ing
   ``zipimporter.invalidate_caches``.  Directory-based finders keep
   their stock invalidation, so ``--py-files`` style dynamic code on
   real directories still works.

2. ``daemon.py``'s reuse loop runs a full ``gc.collect()`` after every
   task; once pandas/numpy/pyarrow are imported that walk visits
   hundreds of thousands of objects.  After each task we collect once
   and ``gc.freeze()`` the surviving warm heap (the CPython API built
   for exactly this), so the loop's own collect traverses only the next
   task's young objects.
"""

from __future__ import annotations

import gc
import zipimport

from pyspark import daemon as _daemon

zipimport.zipimporter.invalidate_caches = (  # type: ignore[method-assign]
    lambda self: None)

_stock_worker = _daemon.worker


def worker(sock, authenticated):
    code = _stock_worker(sock, authenticated)
    gc.collect()   # reap this task's garbage while it is still young
    gc.freeze()    # exempt survivors from all future collection walks
    return code


# daemon.manager() resolves ``worker`` through the module global, so the
# wrapper takes effect for every forked worker's task loop
_daemon.worker = worker

manager = _daemon.manager


if __name__ == "__main__":
    manager()
