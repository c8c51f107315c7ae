"""Skew mitigation helpers — salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) covers
sort-merge joins at runtime; these helpers cover the two cases AQE
does not:

* ``salted_join`` — an equi-join against a dimension too big to
  broadcast where a handful of keys dominate the fact side: the fact
  side gets a deterministic salt, the dimension is replicated per
  salt, and the shuffle spreads each hot key over ``n_salt``
  partitions.
* ``salted_collect_list`` — aggregation state (collect_list/set) is
  not reduced map-side, so one hot key concentrates its entire state
  in one task; two-phase salting builds partial lists per (key, salt)
  and flattens them in a second, small aggregation.

Salts are derived from xxhash64 of salt-source columns (deterministic,
no RNG — reruns and resumed stages agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salt: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_join(fact: DataFrame, dim: DataFrame, key: str, n_salt: int = 8,
                salt_source: list[str] | None = None) -> DataFrame:
    """fact ⋈ dim on ``key`` with the fact side salted; result equals
    the plain join. ``salt_source`` columns (default: all non-key fact
    columns) must vary within a hot key for the salt to spread it."""
    src = salt_source or [c for c in fact.columns if c != key]
    if src:
        salt_col = _salt(src, n_salt)
    else:
        # key-only fact frame: no payload to hash — spread same-key
        # rows by their physical row id instead (salting only changes
        # DISTRIBUTION, never the join result, so any spreader works)
        salt_col = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    f = fact.withColumn("_salt", salt_col)
    salts = fact.sparkSession.range(n_salt).select(F.col("id").cast("long").alias("_salt"))
    d = dim.crossJoin(F.broadcast(salts))
    return f.join(d, [key, "_salt"]).drop("_salt")


def salted_collect_list(df: DataFrame, key: str, value: str,
                        n_salt: int = 8) -> DataFrame:
    """groupBy(key).agg(collect_list(value)) in two phases so a hot
    key's state spreads over ``n_salt`` tasks; element order within the
    list is not guaranteed (same as collect_list itself)."""
    partial = (
        df.withColumn("_salt", _salt([value], n_salt))
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return partial.groupBy(key).agg(
        F.flatten(F.collect_list("_part")).alias(f"{value}_list"))


def diagnose(df: DataFrame, key_cols: list[str], top_k: int = 5) -> DataFrame:
    """Key-distribution diagnosis for a prospective join/agg key — the
    measurement that decides between a plain shuffle, AQE skew-join,
    and explicit salting.  Returns the ``top_k`` heaviest keys, each
    annotated with the global distribution stats (rows, distinct keys,
    max/avg rows per key, skew ratio, the share of all rows owned by
    that key).  Two skinny aggregates over one shuffle on the key:
    the per-key counts feed both the top-k and the 1-row stats, which
    broadcast back onto the top-k rows.

    Reading: skew_ratio = max_key_rows / avg_key_rows.  ~1 → uniform;
    >> #partitions → one task dominates the stage and salting (or a
    broadcast, if the other side allows) is warranted."""
    from pyspark.sql.window import Window

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("key_rows"))
    stats = counts.agg(
        F.sum("key_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("key_rows").alias("max_key_rows"),
        (F.sum("key_rows") / F.count(F.lit(1))).alias("avg_key_rows"))
    # top-k via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heaps, no global sort); the rank window then runs over ≤ top_k
    # rows, never over the full key-count frame
    w = Window.orderBy(F.col("key_rows").desc(), *key_cols)
    top = (counts.orderBy(F.col("key_rows").desc(), *key_cols).limit(top_k)
           .withColumn("rank", F.row_number().over(w)))
    return (
        top.crossJoin(F.broadcast(stats))
        .select(F.col("rank").cast("long").alias("rank"),
                *key_cols, "key_rows",
                F.round(F.col("key_rows") / F.col("total_rows"), 6).alias("row_share"),
                "n_keys",
                F.round(F.col("max_key_rows") / F.col("avg_key_rows"), 4).alias("skew_ratio"))
        .orderBy("rank")
    )
