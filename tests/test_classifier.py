"""Broadcast-model classifier gate: determinism, accuracy, path parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfmef_spark.operators import classifier

SF_DIR = "/root/testdata/sf0.001"


def test_weights_deterministic_and_model_accurate():
    w1 = classifier.trained_weights()
    classifier.trained_weights.cache_clear()
    w2 = classifier.trained_weights()
    assert w1 == w2
    # held-out accuracy: different seed, same generator
    rows = classifier.training_rows(n=400, seed="holdout-7")
    import numpy as np

    w, b = w1
    x = np.array([classifier.py_features(t) for t, _ in rows])
    y = np.array([lbl for _, lbl in rows])
    pred = (x @ np.array(w) + b) >= 0
    acc = float((pred == (y == 1)).mean())
    assert acc >= 0.95, acc


def test_udf_path_matches_expr_path(spark):
    """The pandas_udf broadcast-model path and the inlined-expression
    path must agree — proves the Arrow scoring shape without giving up
    codegen for linear models."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    a = classifier.classifier_gate(docs, use_udf=False).select(
        "doc_id", F.col("clf_prob").alias("p_expr")
    )
    b = classifier.classifier_gate(docs, use_udf=True).select(
        "doc_id", F.col("clf_prob").alias("p_udf")
    )
    joined = a.join(b, "doc_id")
    bad = joined.filter(F.abs(F.col("p_expr") - F.col("p_udf")) > 1e-9).count()
    assert bad == 0


def test_gate_separates_content_from_junk(spark):
    rows = classifier.training_rows(n=200, seed="gate-check")
    df = spark.createDataFrame(
        [(i, t, lbl) for i, (t, lbl) in enumerate(rows)], "doc_id long, text string, y int"
    )
    out = classifier.classifier_gate(df)
    agg = {r.y: r.rate for r in out.groupBy("y").agg(
        F.avg(F.col("clf_pass").cast("double")).alias("rate")).collect()}
    assert agg[1] >= 0.95  # content passes
    assert agg[0] <= 0.05  # junk rejected
