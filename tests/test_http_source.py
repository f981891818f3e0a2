"""HTTP fetch source (S3 analog): byte-identity against the corpus,
retry accounting, permanent-failure error rows, hung-fetch deadline."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pdfmef_spark.sources import http, store

SF = 0.001


def _corpus_transport(spark):
    """Deterministic fake transport serving the real corpus html."""
    served = {
        r.url: bytes(r.html)
        for r in store.read_pages(spark, SF).limit(60).collect()
    }

    def transport(url: str) -> bytes:
        if url not in served:
            raise KeyError(f"404: {url}")
        return served[url]

    return served, transport


def test_fetch_byte_identity(spark):
    served, transport = _corpus_transport(spark)
    urls = spark.createDataFrame([(u,) for u in served], "url string")
    got = http.fetch_pages(urls, transport=transport).collect()
    assert len(got) == len(served)
    for r in got:
        assert r.error is None and r.attempts == 1
        assert bytes(r.html) == served[r.url]  # fetch == source of truth


def test_fetch_retries_then_succeeds(spark):
    served, base = _corpus_transport(spark)

    seen: set = set()  # per-worker state: first attempt per url fails

    def flaky(url: str) -> bytes:
        if url not in seen:
            seen.add(url)
            raise ConnectionError("reset")
        return base(url)

    urls = spark.createDataFrame([(u,) for u in list(served)[:8]], "url string")
    got = http.fetch_pages(
        urls.coalesce(1), transport=flaky, max_retries=2, sleep=lambda s: None
    ).collect()
    for r in got:
        assert r.error is None and r.attempts == 2
        assert bytes(r.html) == served[r.url]


def test_fetch_permanent_failure_is_error_row(spark):
    def dead(url: str) -> bytes:
        raise ConnectionError("refused")

    urls = spark.createDataFrame([("http://x/a",), ("http://x/b",)], "url string")
    got = http.fetch_pages(
        urls, transport=dead, max_retries=2, sleep=lambda s: None
    ).collect()
    assert len(got) == 2
    for r in got:
        assert r.html is None
        assert r.attempts == 3  # 1 + max_retries
        assert "ConnectionError" in r.error


def test_fetch_deadline_kills_hung_transport(spark):
    def hang(url: str) -> bytes:
        if url.endswith("/hang"):
            time.sleep(3600)
        return b"ok"

    urls = spark.createDataFrame(
        [("http://x/fast",), ("http://x/hang",)], "url string"
    )
    t0 = time.time()
    got = {
        r.url: r
        for r in http.fetch_pages(
            urls.coalesce(1), transport=hang, max_retries=0, row_timeout=5.0
        ).collect()
    }
    assert time.time() - t0 < 120
    assert bytes(got["http://x/fast"].html) == b"ok"
    assert got["http://x/hang"].error == "Timeout"
    assert got["http://x/hang"].html is None


def test_fetch_feeds_extract_stage(spark):
    """Fetched bytes drive the same extract stage as the batch source."""
    from pdfmef_spark.operators import extract

    served, transport = _corpus_transport(spark)
    pages = store.read_pages(spark, SF).limit(60)
    joined = http.fetch_pages(pages.select("url"), transport=transport).select(
        "url", "html"
    )
    via_fetch = {
        (r.url, r.text) for r in extract.extract_pages(joined).select("url", "text").collect()
    }
    via_batch = {
        (r.url, r.text)
        for r in extract.extract_pages(pages).select("url", "text").collect()
    }
    assert via_fetch == via_batch
