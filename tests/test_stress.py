"""Vocabulary-growth linking stress: determinism and recall bounds."""

from __future__ import annotations

from pdfmef_spark.operators.linking import link_entities
from pdfmef_spark.plans import stress


def test_stress_mentions_vocabulary_grows(spark):
    m1 = stress.stress_mentions(spark, 200)
    m2 = stress.stress_mentions(spark, 800)
    d1 = m1.select("surface").distinct().count()
    d2 = m2.select("surface").distinct().count()
    assert d1 == 3 * 200 and d2 == 3 * 800  # distinct surfaces scale with n


def test_stress_linking_recall_and_precision(spark):
    """Every deterministically-blocked planted pair (canonical~initialed via
    the shared-last-token block, canonical~extended via the two-token-prefix
    block) must be recovered; no cross-entity pair may score above the
    threshold (zero-padded equal-length last names never prefix-match)."""
    n = 500
    links = link_entities(stress.stress_mentions(spark, n)).collect()
    got = {frozenset((r.src, r.dst)) for r in links}
    assert 2 * n <= len(got) <= 3 * n

    import hashlib

    for e in range(n):
        first = f"fn{e % 37}"
        last = "ln" + hashlib.md5(str(e).encode()).hexdigest()[:8]
        canonical = f"{first} {last}"
        initialed = f"f {last}"
        extended = f"{first} {last} labs"
        assert frozenset((canonical, initialed)) in got, e
        assert frozenset((canonical, extended)) in got, e

    # precision: both sides of every link share the entity's padded last name
    for pair in got:
        a, b = sorted(pair)
        la = next(t for t in a.split() if t.startswith("ln"))
        lb = next(t for t in b.split() if t.startswith("ln"))
        assert la == lb, pair


def test_stress_embeddings_deterministic_and_clustered(spark):
    """Embedding components are pure functions of (vec_id, j): identical at
    any parallelism, and clustered (same pmod-cluster vectors are near one
    another, cross-cluster vectors are not) so IVF has real structure."""
    a = stress.stress_embeddings(spark, 256).repartition(1).collect()
    b = stress.stress_embeddings(spark, 256).repartition(7).collect()
    assert {r.vec_id: r.embedding for r in a} == {r.vec_id: r.embedding for r in b}

    import math

    vecs = {r.vec_id: r.embedding for r in a}

    def dist(u, v):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(u, v)))

    same = dist(vecs[0], vecs[64])  # 64 = one full cluster cycle -> same center
    cross = dist(vecs[0], vecs[1])
    assert same < cross


def test_ann_scaling_harness_small(spark):
    """The bench harness itself: both sizes report recall vs brute force,
    and the planted clustered corpus keeps IVF recall high at both."""
    out = stress.ann_scaling(spark, n_small=2000, growth=2, reps=1, n_queries=4)
    assert out["small"]["vectors"] == 2000 and out["large"]["vectors"] == 4000
    assert out["small"]["recall_at_k"] >= 0.9
    assert out["large"]["recall_at_k"] >= 0.9
    assert out["time_ratio"] > 0


def test_streaming_tick_scaling_harness(spark):
    """3 accumulated drops: every url lands in the ledger exactly once,
    every tick produces a wall + ledger-probe measurement, and the final
    graph is non-trivial (the stream really ran the pipeline)."""
    out = stress.streaming_tick_scaling(spark, n_batches=3, total_docs=120)
    assert out["batches"] == 3
    assert out["urls_in_ledger"] == 120
    assert len(out["tick_secs"]) == 3
    assert len(out["ledger_probe_secs"]) == 3
    assert out["edges"] > 0
    # per-stage decomposition rides along: every pipeline stage has a
    # first-3/last-3 growth row with nonzero wall
    assert "links" in out["stage_growth"]
    assert out["stage_growth"]["links"]["last3_mean_sec"] > 0
