"""Algorithm-block extraction (M9 analog): exact P/R vs planted truth,
ref-sentence counting, and the no-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfmef_spark.operators import algorithms, extract
from pdfmef_spark.sources import store

SF = 0.001


def test_algorithms_exact_vs_golden(spark):
    pages = store.read_pages(spark, SF)
    got = algorithms.extract_algorithms(extract.extract_pages(pages))
    golden = store.read_golden(spark, SF, "golden_algorithms")
    g = {(r.url, r.algo_id, r.caption, r.n_refs) for r in got.collect()}
    e = {(r.url, r.algo_id, r.caption, r.n_refs) for r in golden.collect()}
    assert len(e) > 0
    assert g == e  # P = R = 1.0


def test_algorithms_ref_counting(spark):
    rows = [
        ("u1", "Title\nAlgorithm 2: A merging pass.\n"
               "As shown in Algorithm 2, merges commute. Algorithm 2 is fast.",
         "en", None, []),
        ("u2", "Title\nAlgorithm 1: Solo, never referenced.", "en", None, []),
        ("u3", "No definitions here, just Algorithm 9 talk.", "en", None, []),
        ("u4", "Algorithm 3: Gated away.", "de", None, []),
    ]
    df = spark.createDataFrame(
        rows, "url string, text string, lang string, error string, links array<string>"
    )
    got = {(r.url, r.algo_id, r.n_refs) for r in algorithms.extract_algorithms(df).collect()}
    assert got == {("u1", 2, 2), ("u2", 1, 0)}


def test_algorithms_plan_is_map_only(spark):
    pages = store.read_pages(spark, SF)
    plan = (
        algorithms.extract_algorithms(extract.extract_pages(pages))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # projection + explode only — no shuffle
