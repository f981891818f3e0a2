"""Extract-stage contracts: byte identity, determinism, error-as-data.

Mirrors the reference's test strategy (src/extraction/test/test_core.py):
stage contracts on small inputs, golden comparisons — re-expressed over
DataFrames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfmef_spark.operators import extract
from pdfmef_spark.sources import store


def test_byte_identity_sha(spark, smoke_pages):
    """Extracted text must be byte-identical to golden text per url
    (input_hint per-row invariant; reference analog: sha1 checksums,
    bin/processCrawls.pl:159-170)."""
    ext = extract.extract_pages(smoke_pages)
    got = extract.text_sha256(ext)
    golden = smoke_pages.select("url", "sha256_text")
    n = smoke_pages.count()
    matched = got.join(golden, ["url", "sha256_text"], "inner").count()
    assert matched == n


def test_no_errors_on_corpus(spark, smoke_pages):
    ext = extract.extract_pages(smoke_pages)
    assert ext.filter(F.col("error").isNotNull()).count() == 0


def test_error_is_data_not_failure(spark):
    """A malformed row lands in the error column; the task survives
    (reference analog: RunnableError values, runnables.py:36-51)."""
    bad = spark.createDataFrame(
        [("u1", None, "en"), ("u2", b"<html><body><p>ok</p></body></html>", "en")],
        "url string, html binary, lang string",
    )
    out = extract.extract_pages(bad).orderBy("url").collect()
    assert out[0].error is not None and out[0].text is None
    assert out[1].error is None and out[1].text == "ok"


def test_determinism_across_parallelism(spark):
    """Same corpus generated at different partition counts hashes identically
    (the sandbox stand-in for cluster-size invariance)."""
    from pdfmef_spark import corpus

    a = corpus.pages_df(spark, 100, parallelism=2)
    b = corpus.pages_df(spark, 100, parallelism=16)
    ha = a.select(F.sha2(F.concat_ws("|", "url", "sha256_text"), 256).alias("h"))
    hb = b.select(F.sha2(F.concat_ws("|", "url", "sha256_text"), 256).alias("h"))
    agg = lambda df: df.agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)"))).collect()[0][0]  # noqa: E731
    assert agg(ha) == agg(hb)


def test_empty_and_boilerplate_pages(spark, smoke_pages):
    """Planted edge cases (i%211 in {7,8}) extract to empty text, no error."""
    ext = extract.extract_pages(smoke_pages)
    empties = ext.filter((F.col("text") == "") & F.col("error").isNull()).count()
    assert empties >= 2


def test_extract_plan_is_pure_map(spark, smoke_pages):
    """The extract stage must not shuffle — scan -> ArrowEval/mapInPandas only."""
    plan = extract.extract_pages(smoke_pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_img_alt_quote_variants():
    """alt= values in double quotes, single quotes, and unquoted are all
    captured (valid HTML, common on real web pages — ADVICE r4)."""
    html = (
        '<p>x</p><img src="a.png" alt="Double quoted cap">'
        "<img src='b.png' alt='Single quoted cap'>"
        '<img src=c.png alt=Unquoted>'
        '<figure><img alt=\'Fig alt\'><figcaption>Cap wins</figcaption></figure>'
    )
    caps = extract._figure_captions(html)
    assert caps == ["Double quoted cap", "Single quoted cap", "Unquoted", "Cap wins"]
