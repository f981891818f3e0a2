"""Triangle counting: brute-force oracle, orientation invariants."""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest

from pdfmef_spark.operators.triangles import triangle_count, triangles


def _random_graph(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        pairs.add((f"n{a}", f"n{b}"))
    return pd.DataFrame(sorted(pairs), columns=["src", "dst"])


def _brute_triangles(edges: pd.DataFrame) -> int:
    adj: dict[str, set[str]] = {}
    for s, d in edges.itertuples(index=False):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    return sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def test_matches_bruteforce(spark):
    edges = _random_graph(40, 220, seed=3)
    got = triangle_count(spark.createDataFrame(edges)).collect()[0].n_triangles
    assert got == _brute_triangles(edges)


def test_each_triangle_exactly_once(spark):
    # K4 has exactly 4 triangles; duplicate + reversed edges collapse
    e = pd.DataFrame(
        [(a, b) for a, b in itertools.permutations("pqrs", 2)],
        columns=["src", "dst"],
    )
    rows = triangles(spark.createDataFrame(e)).collect()
    assert len(rows) == 4
    assert len({tuple(sorted((r.x, r.v, r.w))) for r in rows}) == 4


def test_hub_clique_with_pendant_spokes(spark):
    # a 12-clique plus 500 pendant spokes off one hub node: degree
    # orientation must keep the wedge explosion on the clique side
    clique = [(f"c{i}", f"c{j}") for i in range(12) for j in range(i + 1, 12)]
    spokes = [("c0", f"leaf{k}") for k in range(500)]
    e = pd.DataFrame(clique + spokes, columns=["src", "dst"])
    got = triangle_count(spark.createDataFrame(e)).collect()[0].n_triangles
    assert got == 12 * 11 * 10 // 6


def test_node_clustering_matches_bruteforce(spark):
    from pdfmef_spark.operators.triangles import node_clustering

    edges = _random_graph(30, 140, seed=11)
    adj: dict[str, set[str]] = {}
    for s, d in edges.itertuples(index=False):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    got = {
        r.node: (r.degree, r.n_tri, r.coef)
        for r in node_clustering(spark.createDataFrame(edges)).collect()
    }
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            assert v not in got
            continue
        t = sum(1 for p, q in itertools.combinations(sorted(nb), 2) if q in adj[p])
        coef = round(2.0 * t / (d * (d - 1)), 6)
        assert got[v] == (d, t, pytest.approx(coef, abs=1e-9)), v


def test_two_hop_reach_matches_bruteforce_with_cap(spark):
    from pdfmef_spark.operators.reach import two_hop_reach

    edges = _random_graph(35, 150, seed=5)
    adj: dict[str, set[str]] = {}
    for s, d in edges.itertuples(index=False):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    for cap in (None, 6):
        got = {
            r.node: r.reach2
            for r in two_hop_reach(
                spark.createDataFrame(edges), hub_cap=cap
            ).collect()
        }
        want = {}
        for v, nb in adj.items():
            r = set(nb)
            for m in nb:
                if cap is None or len(adj[m]) <= cap:
                    r |= adj[m]
            r.discard(v)
            want[v] = len(r)
        assert got == want, f"cap={cap}"
