"""PageRank: numpy ground truth, DuckDB bit-parity, dangling mass.

The operator's contract (operators/pagerank.py) is that rounding the
two per-iteration aggregation results makes ranks bit-identical across
engines — so the DuckDB comparison here is exact equality on doubles,
not approx.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdfmef_spark.operators.pagerank import pagerank, pagerank_oracle_sql

DAMP, ITERS, DP = 0.85, 4, 9


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    pairs = {
        (f"n{rng.randrange(n_nodes)}", f"n{rng.randrange(n_nodes)}")
        for _ in range(n_edges)
    }
    return pd.DataFrame(sorted(pairs), columns=["src", "dst"])


def _numpy_pagerank(edges: pd.DataFrame) -> dict[str, float]:
    """Same formula, same per-iteration rounding, dense matvec."""
    nodes = sorted(set(edges.src) | set(edges.dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = edges.groupby("src").size().to_dict()
    r = np.full(n, 1.0 / n)
    for _ in range(ITERS):
        contrib = np.zeros(n)
        for s, d_ in edges.itertuples(index=False):
            contrib[idx[d_]] += r[idx[s]] / deg[s]
        contrib = np.round(contrib, DP)
        dang = round(sum(r[idx[v]] for v in nodes if v not in deg), DP)
        r = (1.0 - DAMP) / n + DAMP * (contrib + dang / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def edges_pd() -> pd.DataFrame:
    return _random_edges(n_nodes=120, n_edges=400, seed=7)


def test_matches_numpy_reference(spark, edges_pd):
    got = {
        r.node: r.pr
        for r in pagerank(
            spark.createDataFrame(edges_pd), iterations=ITERS, damping=DAMP, round_dp=DP
        ).collect()
    }
    want = _numpy_pagerank(edges_pd)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_duckdb_bit_parity(spark, edges_pd, tmp_path):
    p = str(tmp_path / "edges.parquet")
    edges_pd.to_parquet(p)
    sql = pagerank_oracle_sql(
        f"SELECT src, dst FROM read_parquet('{p}')",
        iterations=ITERS, damping=DAMP, round_dp=DP,
    )
    oracle = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    got = {
        r.node: r.pr
        for r in pagerank(
            spark.createDataFrame(edges_pd), iterations=ITERS, damping=DAMP, round_dp=DP
        ).collect()
    }
    assert got == oracle  # exact double equality — the hash-gate contract


def test_dangling_mass_conserved(spark):
    # chain a->b->c with c dangling: mass must be redistributed, sum ~ 1
    edges = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    )
    rows = pagerank(edges, iterations=6).collect()
    total = sum(r.pr for r in rows)
    assert total == pytest.approx(1.0, abs=1e-6)
    by = {r.node: r.pr for r in rows}
    assert by["c"] > by["b"] > by["a"]  # downstream accumulates


def test_checkpoint_path_equivalent(spark, edges_pd):
    df = spark.createDataFrame(edges_pd)
    a = {r.node: r.pr for r in pagerank(df, iterations=6, checkpoint_every=2).collect()}
    b = {r.node: r.pr for r in pagerank(df, iterations=6, checkpoint_every=0).collect()}
    assert a == b


def test_weighted_matches_numpy(spark):
    rng = random.Random(21)
    rows = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}", rng.randrange(1, 6))
        for _ in range(150)
    ]
    edges = pd.DataFrame(rows, columns=["src", "dst", "w"]).groupby(
        ["src", "dst"], as_index=False
    )["w"].sum()

    nodes = sorted(set(edges.src) | set(edges.dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    strength = edges.groupby("src")["w"].sum().to_dict()
    r = np.full(n, 1.0 / n)
    for _ in range(ITERS):
        contrib = np.zeros(n)
        for s, d_, w in edges.itertuples(index=False):
            contrib[idx[d_]] += r[idx[s]] * w / strength[s]
        contrib = np.round(contrib, DP)
        dang = round(sum(r[idx[v]] for v in nodes if v not in strength), DP)
        r = (1.0 - DAMP) / n + DAMP * (contrib + dang / n)
    want = {v: r[idx[v]] for v in nodes}

    got = {
        row.node: row.pr
        for row in pagerank(
            spark.createDataFrame(edges),
            iterations=ITERS, damping=DAMP, round_dp=DP, weight="w",
        ).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_weighted_duckdb_bit_parity(spark, tmp_path):
    rng = random.Random(33)
    rows = [
        (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}", rng.randrange(1, 5))
        for _ in range(100)
    ]
    edges = pd.DataFrame(rows, columns=["src", "dst", "w"]).groupby(
        ["src", "dst"], as_index=False
    )["w"].sum()
    path = str(tmp_path / "wedges.parquet")
    edges.to_parquet(path)
    sql = pagerank_oracle_sql(
        f"SELECT src, dst, w FROM read_parquet('{path}')",
        iterations=ITERS, damping=DAMP, round_dp=DP, weighted=True,
    )
    oracle = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    got = {
        r.node: r.pr
        for r in pagerank(
            spark.createDataFrame(edges),
            iterations=ITERS, damping=DAMP, round_dp=DP, weight="w",
        ).collect()
    }
    assert got == oracle
