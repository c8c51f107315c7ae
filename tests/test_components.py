"""Connected components (duplicate-cluster formation) vs a driver-side
union-find on synthetic graphs: chains (worst case for plain label
propagation — exercises pointer jumping), stars, isolated pairs, and a
random Erdős–Rényi-ish graph."""

from __future__ import annotations

import random

from covsonar_spark.operators.dedup import connected_components


def union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id per component
    comps = {}
    for n in parent:
        comps[n] = find(n)
    return comps


def spark_components(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    return {r["node"]: r["comp"] for r in connected_components(df).collect()}


def test_chain_star_and_pairs(spark):
    edges = (
        [(i, i + 1) for i in range(100, 130)]            # 31-node chain
        + [(500, x) for x in range(501, 511)]            # star
        + [(900, 901), (910, 911)]                       # isolated pairs
        + [(700, 701), (701, 702), (700, 702)]           # triangle
    )
    assert spark_components(spark, edges) == union_find_components(edges)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)]
    assert spark_components(spark, edges) == union_find_components(edges)


def test_label_is_component_minimum(spark):
    edges = [(7, 3), (3, 9), (20, 21)]
    comps = spark_components(spark, edges)
    assert comps[7] == comps[3] == comps[9] == 3
    assert comps[20] == comps[21] == 20
