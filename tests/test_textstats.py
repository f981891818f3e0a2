"""Text analysis: lang-ID accuracy on labeled testdata, stat sanity,
multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfmef_spark.operators import multimodal, textstats

SF_DIR = "/root/testdata/sf0.001"


def test_lang_id_accuracy(spark, smoke_pages):
    """Lang-id vs the corpus lang label (pages text is genuinely in the
    labeled language; the testdata `documents.lang` column is random
    metadata over English word soup, so it is not usable as truth)."""
    pages = smoke_pages.filter(F.length("text") > 0)
    prof = pages.withColumn("lang_pred", textstats.lang_id(F.col("text")))
    agg = prof.withColumn("hit", (F.col("lang_pred") == F.col("lang")).cast("int")).agg(
        F.avg("hit").alias("acc")
    ).collect()[0]
    assert agg.acc >= 0.9, f"lang-id accuracy {agg.acc:.3f}"


def test_profile_is_single_projection(spark):
    """The whole profile must stay one codegen'd map — no shuffle, no Python."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = textstats.document_profile(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stats_sanity(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prof = textstats.document_profile(docs)
    row = prof.agg(
        F.min("n_tokens").alias("mn"),
        F.max("quality").alias("qmax"),
        F.min("quality").alias("qmin"),
        F.countDistinct("fingerprint").alias("nfp"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.mn >= 1
    assert 0.0 <= row.qmin <= row.qmax <= 1.0
    # fingerprints nearly unique on distinct texts
    assert row.nfp >= row.n * 0.95


def test_fingerprint_robust_to_leading_noise(spark):
    df = spark.createDataFrame(
        [("x", "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu")],
        "id string, text string",
    )
    base = df.select(textstats.rolling_fingerprint(F.col("text")).alias("fp")).collect()[0].fp
    noisy = df.select(
        textstats.rolling_fingerprint(F.concat(F.lit("zzz "), F.col("text"))).alias("fp")
    ).collect()[0].fp
    # min-of-rolling-hash survives a small prefix edit with high probability
    assert base == noisy


def test_multimodal_features(spark):
    media = multimodal.synthetic_media(spark, n=32, kind="image")
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(r.error is None and len(r.feature) == 16 for r in rows)
    # determinism: same payload -> same features
    again = {r.media_id: r.feature for r in multimodal.extract_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == r.feature


def test_multimodal_error_capture(spark):
    media = multimodal.synthetic_media(spark, n=4, kind="image")
    broken = media.withColumn(
        "payload", F.when(F.col("media_id") == 0, F.lit(None)).otherwise(F.col("payload"))
    )
    rows = multimodal.extract_features(broken).collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].media_id == 0


def test_resize_and_frame_plans(spark):
    media = multimodal.synthetic_media(spark, n=8, kind="video")
    rp = multimodal.resize_plan(media, max_side=100).collect()
    assert all(max(r.target_width, r.target_height) <= 100 for r in rp)
    fp = multimodal.frame_sample_plan(media, every_n=10)
    assert fp.count() == 8 * 3  # 30 frames sampled every 10 -> 0,10,20


def test_keyphrases_topk(spark):
    """Top-5 keyphrases per doc: deterministic ranking, candidates
    filtered (length/charset/stoplist), at most k per doc, scores
    consistent with a python recount."""
    import re
    from pdfmef_spark.operators.textstats import keyphrase_stoplist, keyphrases_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = keyphrases_topk(docs, k=5).collect()
    assert out
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    stop = set(keyphrase_stoplist())
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, rows in per_doc.items():
        assert len(rows) <= 5
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        toks = re.split(r"\s+", texts[doc_id].strip().lower())
        counts = {}
        for t in toks:
            if len(t) >= 4 and re.fullmatch(r"[a-z]+", t) and t not in stop:
                counts[t] = counts.get(t, 0) + 1
        expect = sorted(counts, key=lambda t: (-counts[t] * len(t), t))[:5]
        got = [r.phrase for r in sorted(rows, key=lambda r: r.rank)]
        assert got == expect
        for r in rows:
            assert r.tf == counts[r.phrase] and r.score == r.tf * len(r.phrase)
