"""Similarity search: brute-force exactness vs numpy, IVF recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdfmef_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )


@pytest.fixture(scope="module")
def queries(spark, emb):
    rows = emb.limit(3).collect()
    return emb.sparkSession.createDataFrame(
        [(r.vec_id, r.embedding) for r in rows], "q_id long, q_vec array<double>"
    )


def test_brute_force_matches_numpy(spark, emb, queries):
    got = similarity.brute_force_topk(emb, queries, k=5).collect()
    data = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    for q in queries.collect():
        qv = np.array(q.q_vec)
        sims = {
            vid: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            for vid, v in data.items()
        }
        expect = sorted(sims, key=lambda i: (-round(sims[i], 9), i))[:5]
        mine = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.q_id == q.q_id]
        assert mine == expect


def test_ivf_exhaustive_probe_equals_brute_force(spark, emb, queries):
    bf = similarity.brute_force_topk(emb, queries, k=10).collect()
    ivf = similarity.ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8).collect()
    key = lambda rows: sorted((r.q_id, r.vec_id, r.rank) for r in rows)  # noqa: E731
    assert key(ivf) == key(bf)


def test_ivf_recall_at_10(spark, emb, queries):
    bf = similarity.brute_force_topk(emb, queries, k=10).collect()
    ivf = similarity.ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=8).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r.q_id, set()).add(r.vec_id)
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [len(bf_sets[q] & ivf_sets.get(q, set())) / 10 for q in bf_sets]
    # testdata embeddings are ~isotropic random (within-label cosine ~0.02),
    # the worst case for IVF: probing half the cells must still recover the
    # (always-probed) self-cell neighbors plus ~nprobe/n of the rest.
    assert sum(recalls) / len(recalls) >= 0.75, recalls


def test_ivf_256_centroids_scales(spark):
    """The rewritten (pandas_udf argmax) centroid assignment must work at
    a realistic centroid count — the old unrolled expression chain could
    not compile past a few dozen. Exhaustive probe == brute force proves
    the bucketed union is lossless at 256 cells; plan stays one Arrow
    batch, not a kilometer-long Project."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    queries = emb.sparkSession.createDataFrame(
        [(r.vec_id, r.embedding) for r in emb.limit(3).collect()],
        "q_id long, q_vec array<double>",
    )
    bf = similarity.brute_force_topk(emb, queries, k=10)
    ivf = similarity.ivf_topk(emb, queries, k=10, n_centroids=256, nprobe=256)
    key = lambda rows: sorted((r.q_id, r.vec_id, r.rank) for r in rows)  # noqa: E731
    assert key(ivf.collect()) == key(bf.collect())
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert len(plan) < 200_000  # unrolled 256x64 literals would be megabytes


def test_approx_quantiles_within_tolerance(spark):
    """percentile_approx(accuracy=10000) must land within 1% relative
    error of the exact percentile on the events table (the 100 TB
    swap-in contract for event_value_quantiles_approx). Checked at
    sf0.01: the sketch returns an actual data element while the exact
    percentile interpolates, so on a tiny per-group sample (sf0.001,
    tail quantiles of a handful of rows) the DEFINITIONAL gap alone is
    tens of percent — the error contract is only meaningful once groups
    have enough mass, which is exactly the regime the sketch exists for."""
    from pdfmef_spark.plans import queries as Q

    sf_dir = "/root/testdata/sf0.01"
    exact = {r.event_type: r for r in Q.catalog()["event_value_quantiles"](spark, sf_dir).collect()}
    approx = {r.event_type: r for r in Q.catalog()["event_value_quantiles_approx"](spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        for q in ("p25", "p50", "p90", "p99"):
            ev, av = getattr(e, q), getattr(a, q)
            denom = max(abs(ev), 1e-9)
            assert abs(av - ev) / denom <= 0.01, (et, q, ev, av)


def test_hll_reach_within_tolerance(spark):
    """approx_count_distinct(rsd=0.02) reach must track the exact reach:
    every node within 10% relative error, mean error under 3% (the
    HyperBall swap-in contract for kg_two_hop_reach_hll)."""
    import pyspark.sql.functions as F

    from pdfmef_spark.operators import reach

    # deterministic random-ish graph, big enough for real HLL paths
    g = spark.range(30_000).select(
        F.pmod(F.xxhash64("id"), F.lit(4000)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 3), F.lit(4000)).alias("dst"),
    )
    exact = reach.two_hop_reach(g, hub_cap=None).withColumnRenamed("reach2", "e")
    approx = reach.two_hop_reach(g, hub_cap=None, approx_rsd=0.02).withColumnRenamed(
        "reach2", "a"
    )
    j = exact.join(approx, "node").select(
        (F.abs(F.col("a") - F.col("e")) / F.col("e")).alias("err")
    )
    stats = j.agg(F.max("err").alias("mx"), F.avg("err").alias("mean")).first()
    assert stats.mx <= 0.10, stats
    assert stats.mean <= 0.03, stats
