"""Incremental view maintenance (IVM): keep a grouped-aggregate
materialized view current by merging delta batches — never recomputing
from scratch.

The trick is the standard partial-aggregation algebra Spark itself
uses map-side, lifted to table level: store the MERGEABLE STATE
(count, decimal sum, min, max), not the finished answer.  States
merge associatively/commutatively:

    cnt+cnt, sum+sum, min(min), max(max)

so ``merge(state(A), state(B)) == state(A ∪ B)`` for ANY split of the
input — the property the registry oracle value-checks by replaying
the orders table in three chunks against a one-shot GROUP BY.
Finishing functions (avg = sum/cnt) apply only at read time.

Non-mergeable aggregates and their scale paths: DISTINCT -> HLL
registers (operators/sketches.hll_registers, max-merge — the
streaming variant already maintains exactly that view);
percentiles -> t-digest-style sketches; collect_list -> append logs.
DELETEs need retractions (negative-count deltas) — supported here for
count/sum (pass delta with negate=True); min/max are NOT
retractable from state alone (a deleted extremum forces a rescan of
its group), which is why warehouse IVM engines keep min/max views
partition-segmented: the segmented API below
(:func:`agg_state_segmented` / :func:`retract_segmented` /
:func:`finalize_segmented`) implements exactly that — state is kept
per (group, segment), a delete retracts count/sum algebraically and
re-scans min/max only for the touched (group, segment) cells, and the
readable view rolls segments up at read time.  With the segment
column chosen as the fact table's partition column the rescan prunes
to the deleted rows' partitions, never the table.

Scale notes: the view is |groups| rows; each delta merge shuffles
only (delta states ∪ view) on the group key — independent of the
base table's size.  That is the entire point: a 100 TB fact with a
1 M-group view maintains in delta-sized work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "sum_dec", "mn", "mx")


def agg_state(df: DataFrame, group_cols: list[str], value_col: str,
              negate: bool = False) -> DataFrame:
    """Mergeable aggregate state of one batch.  ``negate=True`` turns
    the batch into a retraction delta (count/sum flip sign; min/max
    are nulled — see module docstring)."""
    sign = F.lit(-1) if negate else F.lit(1)
    mn = F.lit(None).cast("double") if negate else F.min(value_col)
    mx = F.lit(None).cast("double") if negate else F.max(value_col)
    return df.groupBy(*group_cols).agg(
        (sign * F.count(value_col)).alias("cnt"),
        (sign.cast("decimal(18,2)")
         * F.sum(F.col(value_col).cast("decimal(18,2)"))).alias("sum_dec"),
        mn.alias("mn") if negate else F.min(value_col).alias("mn"),
        mx.alias("mx") if negate else F.max(value_col).alias("mx"))


def merge_states(base: DataFrame | None, delta: DataFrame,
                 group_cols: list[str]) -> DataFrame:
    """state(A) ⊕ state(B) — one shuffle on the group key over
    |groups| + |delta groups| rows."""
    both = delta if base is None else base.unionByName(delta)
    return both.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"))


def finalize(state: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finishing functions over the state — the readable view.
    A group whose count was retracted to zero IS a deleted row: it is
    filtered out rather than divided by (Spark 4's ANSI default turns
    sum/0 into a job-killing DIVIDE_BY_ZERO)."""
    state = state.where(F.col("cnt") != 0)
    return state.select(
        *group_cols,
        F.col("cnt").alias("n"),
        F.round(F.col("sum_dec").cast("double"), 2).alias("total"),
        F.round((F.col("sum_dec") / F.col("cnt")).cast("double"), 4).alias("avg_val"),
        F.round("mn", 2).alias("min_val"),
        F.round("mx", 2).alias("max_val"))


def agg_state_segmented(df: DataFrame, group_cols: list[str], value_col: str,
                        segment_col: str) -> DataFrame:
    """Mergeable aggregate state kept per (group, segment) — the
    granularity that makes min/max RETRACTABLE: a deleted extremum
    only invalidates its own segment's mn/mx, so the repair rescan is
    segment-sized, not group-sized.  Choose ``segment_col`` to mirror
    the fact table's physical partitioning (date bucket, file id) so
    the rescan becomes a pruned partition read at scale.  Inserts
    merge with :func:`merge_states` over group_cols + [segment_col]."""
    return agg_state(df, [*group_cols, segment_col], value_col)


def retract_segmented(state: DataFrame, deletes: DataFrame,
                      fact_remaining: DataFrame, group_cols: list[str],
                      value_col: str, segment_col: str) -> DataFrame:
    """Apply a DELETE delta to segmented state.

    count/sum retract algebraically (the negative delta merges in);
    mn/mx of exactly the TOUCHED (group, segment) cells are recomputed
    from ``fact_remaining`` restricted to those cells — the
    partition-segmented rescan warehouse IVM engines use.  Work is
    |delete delta| for the algebra plus a scan of only the touched
    segments (a broadcast semi-restriction that partition-prunes when
    ``segment_col`` is the fact's partition column); untouched
    segments are never read.  A segment retracted to zero rows
    disappears from the state (its cnt hits 0).
    """
    keys = [*group_cols, segment_col]
    neg = deletes.groupBy(*keys).agg(
        (-F.count(value_col)).alias("d_cnt"),
        (-F.sum(F.col(value_col).cast("decimal(18,2)"))).alias("d_sum"))
    touched = deletes.select(*keys).distinct().withColumn("_touched", F.lit(True))
    rescan = (fact_remaining
              .join(F.broadcast(touched.select(*keys)), keys)
              .groupBy(*keys)
              .agg(F.min(value_col).alias("r_mn"), F.max(value_col).alias("r_mx")))
    return (state
            .join(F.broadcast(neg), keys, "left")
            .join(F.broadcast(touched), keys, "left")
            .join(F.broadcast(rescan), keys, "left")
            .select(*keys,
                    (F.col("cnt") + F.coalesce(F.col("d_cnt"), F.lit(0))).alias("cnt"),
                    (F.col("sum_dec") + F.coalesce(
                        F.col("d_sum"), F.lit(0).cast("decimal(18,2)"))).alias("sum_dec"),
                    F.when(F.col("_touched"), F.col("r_mn"))
                     .otherwise(F.col("mn")).alias("mn"),
                    F.when(F.col("_touched"), F.col("r_mx"))
                     .otherwise(F.col("mx")).alias("mx"))
            .where(F.col("cnt") > 0))


def finalize_segmented(state: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll per-(group, segment) states up to groups (cnt+cnt, sum+sum,
    min(mn), max(mx) — the same merge algebra), then finish."""
    rolled = state.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"))
    return finalize(rolled, group_cols)


def join_delta(a_old: DataFrame | None, delta_a: DataFrame | None,
               b_old: DataFrame | None, delta_b: DataFrame | None,
               on: list[str]) -> DataFrame:
    """Delta of an inner equi-join view V = A ⋈ B under inserts.

    The classic differential rule:

        ΔV = ΔA ⋈ (B_old ∪ ΔB)  ∪  A_old ⋈ ΔB

    (ΔA meets the NEW B so ΔA⋈ΔB appears exactly once.)  Appending ΔV
    to the stored view maintains it without ever re-joining the full
    bases: each step's work is delta-sized on one side — the property
    the registry oracle value-checks by replaying chunked inserts into
    both sides against a one-shot join.

    Scale notes: both terms are ordinary equi-joins, so Catalyst
    broadcasts a small delta against the big base (the common case:
    today's inserts vs years of history) and AQE handles the skew; the
    big⋈big one-shot join never happens after bootstrap.  DELETEs
    extend the same algebra with retraction rows (multiplicity ±1) —
    count-annotated views subtract; not needed for append-only facts.
    """
    if delta_a is None and delta_b is None:
        raise ValueError("no delta provided (delta_a and delta_b both None)")
    terms = []
    if delta_a is not None:
        b_new = (b_old.unionByName(delta_b) if b_old is not None and delta_b is not None
                 else (delta_b if b_old is None else b_old))
        if b_new is None:
            raise ValueError(
                "delta_a given but no B relation to join (pass an EMPTY "
                "DataFrame for an empty-but-known relation; None means "
                "'no relation', which makes the join schema underivable)")
        terms.append(delta_a.join(b_new, on))
    if delta_b is not None:
        if a_old is not None:
            terms.append(a_old.join(delta_b, on))
        elif delta_a is None:
            raise ValueError(
                "delta_b given but no A relation to join (pass an EMPTY "
                "DataFrame for an empty-but-known relation)")
        # a_old None with delta_a present: A_old is empty by contract,
        # so the A_old ⋈ ΔB term is correctly absent
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def join_delta_counted(a_old: DataFrame | None, delta_a: DataFrame | None,
                       b_old: DataFrame | None, delta_b: DataFrame | None,
                       on: list[str], m_col: str = "m") -> DataFrame:
    """Multiplicity-annotated join-view delta — the retractable form.

    Every relation carries an ``m`` multiplicity column (+1 insert,
    -1 delete).  The differential rule is the same as
    :func:`join_delta` but multiplicities MULTIPLY across the join
    (bag semantics), so a deleted left row retracts every joined
    output it ever produced:

        ΔV = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB,   m_v = m_a · m_b

    Consolidate with :func:`consolidate` (sum m per row-value, drop
    zeros) to read the net view.  This is the kernel every
    DBSP/differential-dataflow-style maintainer is built on, expressed
    as two ordinary Catalyst equi-joins.
    """
    ma = f"_{m_col}_a"
    mb = f"_{m_col}_b"

    def _mul(left: DataFrame, right: DataFrame) -> DataFrame:
        l2 = left.withColumnRenamed(m_col, ma)
        r2 = right.withColumnRenamed(m_col, mb)
        return (l2.join(r2, on)
                .withColumn(m_col, F.col(ma) * F.col(mb))
                .drop(ma, mb))

    if delta_a is None and delta_b is None:
        raise ValueError("no delta provided (delta_a and delta_b both None)")
    terms = []
    if delta_a is not None:
        parts = [p for p in (b_old, delta_b) if p is not None]
        if not parts:
            raise ValueError(
                "delta_a given but no B relation to join (pass an EMPTY "
                "DataFrame for an empty-but-known relation)")
        b_new = parts[0]
        for p in parts[1:]:
            b_new = b_new.unionByName(p)
        terms.append(_mul(delta_a, b_new))
    if delta_b is not None:
        if a_old is not None:
            terms.append(_mul(a_old, delta_b))
        elif delta_a is None:
            raise ValueError(
                "delta_b given but no A relation to join (pass an EMPTY "
                "DataFrame for an empty-but-known relation)")
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def consolidate(view: DataFrame, m_col: str = "m") -> DataFrame:
    """Net multiplicity per distinct row value; rows retracted to zero
    disappear.  One shuffle on the full row value — run periodically
    (compaction), not per delta."""
    cols = [c for c in view.columns if c != m_col]
    return (view.groupBy(*cols).agg(F.sum(m_col).alias(m_col))
            .where(F.col(m_col) != 0))
