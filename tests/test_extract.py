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


def test_cites_edges_matches_python(spark, smoke_pages):
    """The JVM cites derivation (decode + subtree-drop + href regex as
    codegen expressions) must produce exactly the distinct edge set the
    Python extract+triples boundary emits — on the corpus AND on
    adversarial rows (links inside dropped subtrees, single-quoted /
    unquoted attrs around href, non-http schemes, null html, non-en
    lang, mixed case tags)."""
    from pdfmef_spark import schemas
    from pdfmef_spark.operators import triples as triples_op

    adversarial = [
        ("u1", None, b"<html><head><a href=\"http://drop.me/\"></head>"
                     b"<body><A HREF=\"http://keep.me/x\">k</a>"
                     b"<nav><a href=\"https://nav.link/\"></nav>"
                     b"<a class='z' href=\"https://keep2.me/\">v</a>"
                     b"<a href=\"ftp://no.scheme/\">n</a></body></html>",
         None, "en"),
        ("u2", None, None, None, "en"),          # null html -> error row, no links
        ("u3", None, b"<a href=\"http://not-en.example/\">x</a>", None, "fr"),
        ("u4", None, b"<ScRiPt>var a='<a href=\"http://in-script/\">'</sCrIpT>"
                     b"<a  id=1 href=\"http://keep3.me/\">y</a>", None, "en"),
    ]
    adv = spark.createDataFrame(adversarial, schemas.PAGES)
    for pages in (smoke_pages, adv):
        py = (
            triples_op.extract_triples(extract.extract_pages(pages))
            .filter(F.col("pred") == "cites")
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct()
        )
        jvm = extract.cites_edges(pages).distinct()
        assert py.exceptAll(jvm).count() == 0
        assert jvm.exceptAll(py).count() == 0
    got = {tuple(r) for r in extract.cites_edges(adv).collect()}
    assert got == {
        ("u1", "http://keep.me/x"),
        ("u1", "https://keep2.me/"),
        ("u4", "http://keep3.me/"),
    }
