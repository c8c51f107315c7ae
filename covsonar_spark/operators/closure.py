"""Hierarchy / taxonomy closure operators.

covsonar's ``--with-sublineage`` expands a lineage to all descendants via
a BFS over a lineage→sublineages dict (/root/reference/lib/sonardb.py:
3390-3425), and its taxonomy *builder* is an O(n³) python loop
(/root/reference/lib/Lineages_UPDATER.py:105-164).  Spark-first, both
collapse to prefix joins over dotted-path names:

  * descendants(parent)  = paths startswith parent + '.'
  * closure table        = self-join on the prefix condition

The closure table is tiny (thousands of rows) → always broadcast; the
final genome filter stays a broadcast semi-join or a static IN-list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def descendants(taxa: DataFrame, parent: str, path_col: str = "path",
                include_self: bool = True) -> DataFrame:
    """All taxa whose dotted path is ``parent`` or starts with ``parent.``."""
    c = F.col(path_col)
    cond = c.startswith(parent + ".")
    if include_self:
        cond = cond | (c == parent)
    return taxa.where(cond)


def closure_table(taxa: DataFrame, path_col: str = "path") -> DataFrame:
    """(ancestor, descendant) closure via prefix self-join — replaces the
    reference's O(n³) driver loop with one join the optimizer can plan."""
    a = taxa.select(F.col(path_col).alias("ancestor"))
    d = taxa.select(F.col(path_col).alias("descendant"))
    cond = (F.col("descendant") == F.col("ancestor")) | F.col("descendant").startswith(
        F.concat(F.col("ancestor"), F.lit("."))
    )
    return a.join(d, cond)


def closure_frame(children: dict[str, list[str]], roots: DataFrame,
                  col: str = "lineage") -> DataFrame:
    """Distributed --with-sublineage closure of a single-column ``roots``
    frame against the (broadcast-sized) taxonomy child-map — the overflow
    twin of :func:`bfs_closure` for wildcard expansions too large to
    collect: the transitive (ancestor → descendant) pairs of the SMALL
    taxonomy are enumerated driver-side (thousands of rows), broadcast,
    and joined against the distributed roots; the roots themselves never
    reach the driver."""
    spark = roots.sparkSession
    r = roots.toDF(col).dropDuplicates()
    pairs = [(a, d) for a in children
             for d in bfs_closure(children, [a]) if d != a]
    if not pairs:
        return r
    edges = spark.createDataFrame(pairs, f"__anc: string, {col}: string")
    desc = r.join(F.broadcast(edges), r[col] == edges["__anc"]) \
            .select(edges[col])
    return r.unionByName(desc).dropDuplicates()


def bfs_closure(children: dict[str, list[str]], roots: list[str]) -> list[str]:
    """Driver-side BFS closure over a broadcastable child-map — the exact
    semantics of the reference's --with-sublineage expansion
    (lib/sonardb.py:3390-3425): fixpoint, order-preserving dedup."""
    seen: dict[str, None] = {}
    frontier = list(roots)
    while frontier:
        nxt: list[str] = []
        for lin in frontier:
            if lin in seen:
                continue
            seen[lin] = None
            nxt.extend(children.get(lin, []))
        frontier = nxt
    return list(seen)
