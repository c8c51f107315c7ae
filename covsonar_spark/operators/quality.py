"""Data-quality constraint audit and snapshot diff (CDC) — the table
-health operators a 100 TB lakehouse runs before/after every pipeline
stage.

Reference parity note: covsonar validates every import with
`be_paranoid` (/root/reference/lib/sonardb.py:3684-3819 — restore each
genome and byte-compare) and enforces PK/UNIQUE constraints in the
sqlite DDL (/root/reference/lib/db.sqlite:6-93).  On parquet there is
no engine-enforced constraint, so the engine provides the audit as a
query: declarative rules -> violation counts in a fixed, tiny result.

Scale design (100 TB):
  * all scalar rules (null, domain, range, PK uniqueness) compile into
    ONE aggregate-only pass over the fact — conditional counts merge
    map-side, the shuffled state is a single row.  No per-rule scans.
  * referential integrity is the only rule that needs a second
    relation; it is a broadcast LEFT ANTI join (dim side small) —
    at bigger dims this becomes a shuffled anti-join on the key, still
    one shuffle, and Spark's runtime bloom filter prunes the probe.
  * snapshot diff is one co-partitioned FULL OUTER join on the key;
    change detection compares only the tracked columns (scan prunes to
    key + tracked), and unchanged rows are dropped BEFORE the tiny
    classification aggregate, so the shuffle after the join carries
    only the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# constraint audit
# ---------------------------------------------------------------------------

_STATUS_DOMAIN = ("O", "F", "P")


def dq_audit(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Constraint audit over the orders fact: one row per rule with its
    violation count.  Rules: PK uniqueness, FK orders->customer,
    NOT NULL, value domain, numeric range.

    Plan shape: the four scalar rules are conditional aggregates in a
    single scan (one partial-agg row per partition); PK uniqueness
    rides the same pass as count(*) - count(DISTINCT key); the FK rule
    is a broadcast anti-join counted into one row; the two one-row
    frames cross-join (1x1) and unpivot via ``stack`` into the rule
    table — no collect, no per-rule scan.
    """
    scalar = orders.agg(
        F.count(F.lit(1)).alias("rows_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dups"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_orderdate"),
        F.count(F.when(~F.col("o_orderstatus").isin(*_STATUS_DOMAIN), 1)
                .when(F.col("o_orderstatus").isNull(), 1)).alias("bad_status"),
        F.count(F.when(~(F.col("o_totalprice") > 0), 1)
                .when(F.col("o_totalprice").isNull(), 1)).alias("bad_price"),
    )
    fk = (
        orders.select("o_custkey")
        .join(F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
              "o_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    wide = scalar.crossJoin(fk)
    rules = wide.selectExpr(
        "rows_checked",
        "stack(5, "
        "'pk_unique_o_orderkey', pk_dups, "
        "'fk_orders_customer', fk_orphans, "
        "'not_null_o_orderdate', null_orderdate, "
        "'domain_o_orderstatus', bad_status, "
        "'range_o_totalprice_positive', bad_price"
        ") AS (rule, violations)",
    )
    return (
        rules.select(
            "rule",
            F.col("violations").cast("long").alias("violations"),
            F.col("rows_checked").cast("long").alias("rows_checked"),
            (F.col("violations") == 0).alias("ok"),
        )
        .orderBy("rule")
    )


DQ_AUDIT_SQL = """
WITH scalar AS (
  SELECT count(*) AS rows_checked,
         count(*) - count(DISTINCT o_orderkey) AS pk_dups,
         count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_orderdate,
         count(CASE WHEN o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS bad_status,
         count(CASE WHEN o_totalprice IS NULL
                      OR NOT (o_totalprice > 0) THEN 1 END) AS bad_price
  FROM orders
), fk AS (
  SELECT count(*) AS fk_orphans
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), rules AS (
  SELECT 'pk_unique_o_orderkey' AS rule, pk_dups AS violations, rows_checked
  FROM scalar
  UNION ALL SELECT 'fk_orders_customer', fk_orphans, rows_checked FROM scalar, fk
  UNION ALL SELECT 'not_null_o_orderdate', null_orderdate, rows_checked FROM scalar
  UNION ALL SELECT 'domain_o_orderstatus', bad_status, rows_checked FROM scalar
  UNION ALL SELECT 'range_o_totalprice_positive', bad_price, rows_checked FROM scalar
)
SELECT rule, CAST(violations AS BIGINT) AS violations,
       CAST(rows_checked AS BIGINT) AS rows_checked,
       violations = 0 AS ok
FROM rules ORDER BY rule
"""


def dq_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_audit(_t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer"))


# ---------------------------------------------------------------------------
# snapshot diff (CDC)
# ---------------------------------------------------------------------------


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  tracked: tuple[str, ...]) -> DataFrame:
    """Classify rows between two table snapshots as added / removed /
    changed — the batch CDC primitive behind incremental pipelines.

    One co-partitioned FULL OUTER join on the key; change detection is
    a null-safe column-by-column compare of only the ``tracked``
    columns (so the scans prune to key+tracked); unchanged rows are
    filtered out before anything downstream sees them.  Returns the
    per-key delta stream (key, change_type).
    """
    # literal presence markers, NOT key nullness: a row whose key is
    # genuinely NULL would otherwise be classified onto the wrong side
    o = old.select(key, *tracked, F.lit(1).alias("_in_old")).alias("o")
    n = new.select(key, *tracked, F.lit(1).alias("_in_new")).alias("n")
    joined = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")),
                    "full_outer")
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(F.col("o._in_old").isNull(), F.lit("added"))
        .when(F.col("n._in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            change.alias("change_type"),
        )
        .where(F.col("change_type").isNotNull())
    )


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff demo on deterministic snapshots derived from
    orders: old = keys with key%10 != 0 (so %10==0 keys are "added"),
    new = keys with key%10 != 1 ("removed"), and new flips
    o_orderstatus to 'R' where key%7 == 0 ("changed").  Result:
    per-class row counts + a key checksum, value-checked against the
    DuckDB FULL OUTER JOIN twin.
    """
    orders = _t(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 10 != 0)
    new = (
        orders.where(F.col("o_orderkey") % 10 != 1)
        .withColumn("o_orderstatus",
                    F.when(F.col("o_orderkey") % 7 == 0, F.lit("R"))
                    .otherwise(F.col("o_orderstatus")))
    )
    delta = snapshot_diff(old, new, "o_orderkey",
                          ("o_orderstatus", "o_orderpriority"))
    return (
        delta.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("o_orderkey").alias("key_checksum"))
        .orderBy("change_type")
    )


CDC_SNAPSHOT_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
  WHERE o_orderkey % 10 <> 0
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 1
), delta AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
              THEN 'changed' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM delta WHERE change_type IS NOT NULL
GROUP BY change_type ORDER BY change_type
"""


QUERIES = {
    "dq_constraint_audit": (dq_audit_query, DQ_AUDIT_SQL),
    "cdc_snapshot_diff": (cdc_snapshot_diff, CDC_SNAPSHOT_SQL),
}


def store_dq_audit(store) -> DataFrame:
    """The constraint audit applied to the genome store itself — the
    engine-side replacement for the reference's sqlite DDL constraints
    (PK/UNIQUE/FK, /root/reference/lib/db.sqlite:6-93), runnable at
    any time over the parquet tables:

      * pk_unique_accession     genomes.accession is unique
      * fk_genomes_sequences    every genomes.seqhash exists in sequences
      * fk_profiles_sequences   every profiles.seqhash exists in sequences
      * not_null_seqhash        no genome row lost its content hash
      * range_ct_positive       ct, when present, is > 0

    Same plan shape as dq_audit: scalar rules fuse into one genomes
    pass; each FK is one anti-join counted to a row.
    """
    genomes = store.table("genomes")
    sequences = store.table("sequences").select("seqhash")
    profiles = store.table("profiles").select("seqhash")
    scalar = genomes.agg(
        F.count(F.lit(1)).alias("rows_checked"),
        (F.count(F.lit(1)) - F.countDistinct("accession")).alias("pk_dups"),
        F.count(F.when(F.col("seqhash").isNull(), 1)).alias("null_seqhash"),
        F.count(F.when(F.col("ct").isNotNull() & ~(F.col("ct") > 0), 1))
         .alias("bad_ct"),
    )
    fk_g = (genomes.select("seqhash").where(F.col("seqhash").isNotNull())
            .join(F.broadcast(sequences), "seqhash", "left_anti")
            .agg(F.count(F.lit(1)).alias("fk_genomes")))
    fk_p = (profiles.join(F.broadcast(sequences), "seqhash", "left_anti")
            .agg(F.count(F.lit(1)).alias("fk_profiles")))
    wide = scalar.crossJoin(fk_g).crossJoin(fk_p)
    rules = wide.selectExpr(
        "rows_checked",
        "stack(5, "
        "'pk_unique_accession', pk_dups, "
        "'fk_genomes_sequences', fk_genomes, "
        "'fk_profiles_sequences', fk_profiles, "
        "'not_null_seqhash', null_seqhash, "
        "'range_ct_positive', bad_ct"
        ") AS (rule, violations)",
    )
    return (rules.select(
        "rule", F.col("violations").cast("long").alias("violations"),
        F.col("rows_checked").cast("long").alias("rows_checked"),
        (F.col("violations") == 0).alias("ok")).orderBy("rule"))
