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
