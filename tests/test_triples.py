"""Triple extraction: P/R >= 0.95 vs golden triples (the north_rule gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfmef_spark.operators import extract, triples as triples_op
from pdfmef_spark.sources import store

KEY = ["url", "subj", "pred", "obj"]


def _pipeline_triples(spark, pages):
    ext = extract.extract_pages(pages)
    return triples_op.extract_triples(ext)


def test_triple_precision_recall(spark, smoke_pages):
    got = _pipeline_triples(spark, smoke_pages).select(*KEY).dropDuplicates(KEY)
    gold = store.read_golden(spark, 0.001, "golden_triples").select(*KEY).dropDuplicates(KEY)
    n_got = got.count()
    n_gold = gold.count()
    tp = got.join(gold, KEY, "inner").count()
    precision = tp / n_got
    recall = tp / n_gold
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_spans_point_at_subject(spark, smoke_pages):
    """Non-DOC subject spans must slice the extracted text to the surface."""
    ext = extract.extract_pages(smoke_pages)
    t = triples_op.extract_triples(ext)
    joined = (
        t.filter(F.col("subj_type") != "DOC")
        .join(ext.select("url", "text"), "url")
        .withColumn("seg", F.expr("substring(text, span_start + 1, span_end - span_start)"))
    )
    bad = joined.filter(F.col("seg") != F.col("subj")).count()
    assert bad == 0


def test_lang_gate(spark, smoke_pages):
    """Non-en pages contribute no triples (filter-gated execution;
    reference analog: runnables.py:14-31 dependency gating)."""
    t = _pipeline_triples(spark, smoke_pages)
    non_en = smoke_pages.filter(F.col("lang") != "en").select("url")
    assert t.join(non_en, "url", "left_semi").count() == 0


def test_mentions(spark, smoke_pages):
    t = _pipeline_triples(spark, smoke_pages)
    m = triples_op.mentions_from_triples(t)
    gold = store.read_golden(spark, 0.001, "golden_surfaces").select("url", "surface").distinct()
    got = m.select("url", "surface").distinct()
    tp = got.join(gold, ["url", "surface"], "inner").count()
    assert tp / gold.count() >= 0.95
    assert tp / got.count() >= 0.95


def test_triple_pr_at_sf001(spark):
    """P/R gate re-run at 10x corpus (5k pages) — the driver's sf."""
    pages = store.read_pages(spark, 0.01)
    got = _pipeline_triples(spark, pages).select(*KEY).dropDuplicates(KEY)
    gold = store.read_golden(spark, 0.01, "golden_triples").select(*KEY).dropDuplicates(KEY)
    n_got, n_gold = got.count(), gold.count()
    tp = got.join(gold, KEY, "inner").count()
    assert tp / n_got >= 0.95 and tp / n_gold >= 0.95


def test_figures_exact_vs_planted(spark, smoke_pages):
    """hasFigure captions (figcaption / img-alt shapes) must exactly match
    the planted truth — the reference's per-doc figure entities
    (figures2.py:39-52)."""
    t = _pipeline_triples(spark, smoke_pages)
    got = t.filter(F.col("pred") == "hasFigure").select(*KEY).distinct()
    gold = (
        store.read_golden(spark, 0.001, "golden_triples")
        .filter(F.col("pred") == "hasFigure").select(*KEY).distinct()
    )
    n_got, n_gold = got.count(), gold.count()
    tp = got.join(gold, KEY, "inner").count()
    assert n_gold > 0
    assert tp == n_got == n_gold, (n_got, n_gold, tp)


def test_affiliation_ordering_exact(spark, smoke_pages):
    """Multi-unit affiliations: emitted affiliationString must be the
    institution > department > laboratory pipe-join regardless of the
    (shuffled) sentence order; the affiliatedWith object must be the
    institution unit (reference orgName comparator, tei.py:124-143)."""
    t = _pipeline_triples(spark, smoke_pages)
    gold = store.read_golden(spark, 0.001, "golden_triples")
    for pred in ["affiliationString", "affiliatedWith"]:
        got = t.filter(F.col("pred") == pred).select(*KEY).distinct()
        g = gold.filter(F.col("pred") == pred).select(*KEY).distinct()
        tp = got.join(g, KEY, "inner").count()
        assert g.count() > 0
        assert tp == got.count() == g.count(), (pred, got.count(), g.count(), tp)
    # every emitted string is rank-sorted: dept never precedes institution etc.
    rows = t.filter(F.col("pred") == "affiliationString").select("obj").collect()
    from pdfmef_spark.operators.triples import _affil_rank
    for r in rows:
        ranks = [_affil_rank(u) for u in r.obj.split(" | ")]
        assert ranks == sorted(ranks), r.obj


def test_affil_all_units_ranked_keeps_sentence_order():
    """If every unit matches a dept/lab suffix (e.g. a real institution
    named 'Lincoln Laboratory'), the suffix heuristic must not demote it:
    sentence order is kept and the first unit is the institution
    (ADVICE r4 guard on the tei.py:124-143 comparator analog)."""
    text = ("T\nAda Lovelace is affiliated with the Lincoln Laboratory, "
            "the Computing Department.")
    rels = triples_op.extract_relations(text)
    by_pred = {p: o for (_, p, o, *_rest) in rels}
    assert by_pred["affiliatedWith"] == "Lincoln Laboratory"
    assert by_pred["affiliationString"] == "Lincoln Laboratory | Computing Department"
    # and the normal case still rank-sorts: institution first
    text2 = ("T\nAda Lovelace is affiliated with the Computing Department, "
             "Acme University.")
    rels2 = triples_op.extract_relations(text2)
    by_pred2 = {p: o for (_, p, o, *_rest) in rels2}
    assert by_pred2["affiliatedWith"] == "Acme University"
    assert by_pred2["affiliationString"] == "Acme University | Computing Department"


def test_fast_path_matches_legacy(spark, smoke_pages):
    """The round-6 fast path (JVM-exploded cites/hasFigure rows, Python
    relations over (url, text) only) must emit exactly the legacy
    all-Python loop's triple set. Forcing the legacy path via a
    distinct-but-identical relation_fn object keeps both semantics
    live in the test."""
    from pdfmef_spark.operators import extract

    ext = extract.extract_pages(smoke_pages)
    fast = triples_op.extract_triples(ext)
    legacy = triples_op.extract_triples(
        ext, relation_fn=lambda t: triples_op.extract_relations(t)
    )
    cols = ["url", "subj", "pred", "obj", "subj_type", "obj_type", "conf"]
    f = sorted(tuple(r) for r in fast.select(*cols).collect())
    l = sorted(tuple(r) for r in legacy.select(*cols).collect())
    assert f == l
