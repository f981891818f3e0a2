"""Connected components vs a plain-Python union-find oracle."""

from __future__ import annotations

import random

from pdfmef_spark.operators.components import connected_components


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.component for r in connected_components(df).collect()}
    oracle = _union_find_oracle(edges)
    # canonical rep = min of component in both cases
    comp_of = {}
    for x, r in oracle.items():
        comp_of.setdefault(r, []).append(x)
    expected = {x: min(comp_of[r]) for x, r in oracle.items()}
    assert got == expected


def test_small_graphs(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    _check(spark, [("a", "a1"), ("a1", "a2"), ("a2", "a3"), ("z", "a3")])


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(200)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_long_chain(spark):
    """Pathological diameter — exercises the O(log n) convergence."""
    edges = [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(120)]
    _check(spark, edges)
