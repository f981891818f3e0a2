"""Robustness: arbitrary/hostile inputs must produce rows or error rows,
never task failures (the 10^12-row contract)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from pdfmef_spark.operators.extract import extract_html_bytes
from pdfmef_spark.operators.triples import extract_relations

html_ish = st.text(
    alphabet=string.printable + "é漢字🌐<>&\"'", min_size=0, max_size=600
)


@settings(max_examples=300, deadline=None)
@given(html_ish)
def test_extract_never_raises_and_is_deterministic(s):
    raw = s.encode("utf-8", errors="replace")
    out1 = extract_html_bytes(raw)
    out2 = extract_html_bytes(raw)
    assert out1 == out2
    text, links, title, figures, nb = out1
    assert isinstance(text, str) and nb == len([b for b in text.split("\n") if b])
    assert isinstance(figures, list)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.printable + "é漢字", min_size=0, max_size=400))
def test_relations_never_raise(s):
    out = extract_relations(s)
    for (subj, pred, obj, *_rest) in out:
        assert pred in {
            "hasTitle", "hasAuthor", "hasAbstract", "hasKeyword", "worksFor",
            "locatedIn", "foundedBy", "affiliatedWith", "affiliationString",
        }


def test_malformed_rows_in_spark(spark):
    """Garbage pages through the full extract+triples stages: rows out,
    zero task failures."""
    from pdfmef_spark.operators import extract, triples as triples_op
    from pyspark.sql import functions as F

    rows = [
        ("u1", None, "en"),
        ("u2", b"", "en"),
        ("u3", b"\xff\xfe\x00broken", "en"),
        ("u4", b"<html><body><p>ok works for Acme Corp.</p></body></html>", "en"),
        ("u5", ("<p>" * 5000).encode(), "en"),
        ("u6", b"<script>while(1){}</script><p>text</p>", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string")
    ext = extract.extract_pages(pages)
    got = {r.url: r for r in ext.collect()}
    assert got["u1"].error is not None
    assert got["u2"].error is None and got["u2"].text == ""
    assert got["u4"].text == "ok works for Acme Corp."
    assert got["u6"].text == "text"
    trips = triples_op.extract_triples(ext)
    preds = {r.pred for r in trips.collect()}
    assert "worksFor" in preds or "hasTitle" in preds


def test_row_timeout_yields_error_row(spark):
    """SURVEY §4 commitment: a per-element deadline inside the Arrow
    stage — one hostile row becomes error='Timeout', the batch finishes,
    the task never stalls (reference analog: 20-30 s subprocess
    timeouts, pdfbox.py:24)."""
    import time

    from pdfmef_spark.operators import extract

    def sleepy_extract(raw: bytes):
        # stand-in for a pathological row (catastrophic backtracking
        # etc.): a C-level stall no signal can interrupt — only a kill.
        # Nested def: cloudpickle ships it by value to the workers.
        import time as _t

        if b"HANG" in raw:
            _t.sleep(600)
        from pdfmef_spark.operators.extract import extract_html_bytes

        return extract_html_bytes(raw)

    rows = [
        ("ok1", b"<html><body><p>fine page.</p></body></html>", "en"),
        ("bad", b"<p>HANG</p>", "en"),
        ("ok2", b"<html><body><p>also fine.</p></body></html>", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string").coalesce(1)
    t0 = time.time()
    got = {
        r.url: r
        for r in extract.extract_pages(
            pages, row_timeout=3, extract_fn=sleepy_extract
        ).collect()
    }
    assert time.time() - t0 < 60
    assert got["bad"].error == "Timeout" and got["bad"].text is None
    assert got["ok1"].error is None and got["ok1"].text == "fine page."
    assert got["ok2"].error is None and got["ok2"].text == "also fine."


def test_row_timeout_passthrough_matches_default(spark):
    """With a generous deadline the guarded path is byte-identical to the
    in-process path (including genuinely nasty-but-fast inputs)."""
    from pdfmef_spark.operators import extract

    rows = [
        ("u1", ("<p>" * 3000 + "deep " * 50).encode(), "en"),
        ("u2", b"<a href='x" + b"y" * 5000 + b"'>t</a>", "en"),
        ("u3", b"<script>" * 500 + b"<p>tail</p>", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string")
    a = sorted(map(tuple, extract.extract_pages(pages).collect()))
    b = sorted(map(tuple, extract.extract_pages(pages, row_timeout=30).collect()))
    assert a == b


def test_worker_crash_is_error_row_not_task_failure(spark):
    """A worker process that DIES (not raises) must yield an error row and
    the rebuilt pool must keep processing subsequent rows."""
    from pdfmef_spark.operators import extract

    def crashy_extract(raw: bytes):
        import os as _os

        if b"segv" in raw:
            _os._exit(137)  # simulate a native crash / OOM kill
        return raw.decode(), [], None, [], 1

    rows = [
        ("a", b"first ok", "en"),
        ("boom", b"segv here", "en"),
        ("b", b"second ok", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string").coalesce(1)
    got = {
        r.url: r
        for r in extract.extract_pages(
            pages, row_timeout=10, extract_fn=crashy_extract
        ).collect()
    }
    assert "BrokenProcessPool" in got["boom"].error
    assert got["a"].error is None and got["a"].text == "first ok"
    assert got["b"].error is None and got["b"].text == "second ok"  # pool rebuilt


def test_callable_timeout_error_is_data_not_deadline(spark):
    """A TimeoutError RAISED by the callable (socket.timeout-style) is
    recorded as that error, not conflated with deadline expiry."""
    from pdfmef_spark.operators import extract

    def flaky_extract(raw: bytes):
        if b"sock" in raw:
            raise TimeoutError("timed out reading upstream")
        return raw.decode(), [], None, [], 1

    rows = [("s", b"sock", "en"), ("ok", b"fine", "en")]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string").coalesce(1)
    got = {
        r.url: r
        for r in extract.extract_pages(
            pages, row_timeout=30, extract_fn=flaky_extract
        ).collect()
    }
    assert got["s"].error == "TimeoutError: timed out reading upstream"
    assert got["ok"].error is None


def test_error_string_identical_with_and_without_deadline(spark):
    """The error column must not depend on the orthogonal row_timeout flag."""
    from pdfmef_spark.operators import extract

    def bad_extract(raw: bytes):
        raise KeyError("missing thing")

    rows = [("u", b"x", "en")]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string")
    a = extract.extract_pages(pages, extract_fn=bad_extract).first().error
    b = extract.extract_pages(pages, row_timeout=30, extract_fn=bad_extract).first().error
    assert a == b == "KeyError: 'missing thing'"


def test_triples_row_timeout_sentinel_batch_survives(spark):
    """A pathological document in the TRIPLES stage (catastrophic-regex
    stand-in) becomes one pred='__error__' obj='Timeout' sentinel row;
    neighbours extract normally and the sentinel never reaches
    mentions (round-4 advice: the deadline harness covered extract but
    not relation extraction)."""
    import time

    from pdfmef_spark.operators import triples as triples_op

    def sleepy_relations(text: str):
        import time as _t

        if "HANG" in text:
            _t.sleep(600)
        from pdfmef_spark.operators.triples import extract_relations

        return extract_relations(text)

    rows = [
        ("ok1", "T\nAda Lovelace works for Acme Corp.", None, None, "en", None),
        ("bad", "T\nHANG", None, None, "en", None),
        ("ok2", "T\nAcme Corp is located in Berlin.", None, None, "en", None),
    ]
    ext = spark.createDataFrame(
        rows,
        "url string, text string, links array<string>, "
        "figures array<string>, lang string, error string",
    ).coalesce(1)
    t0 = time.time()
    trips = triples_op.extract_triples(
        ext, row_timeout=3, relation_fn=sleepy_relations
    )
    got = trips.collect()
    assert time.time() - t0 < 60
    by_url: dict = {}
    for r in got:
        by_url.setdefault(r.url, []).append(r)
    [bad] = by_url["bad"]
    assert bad.pred == "__error__" and bad.obj == "Timeout" and bad.obj_type == "ERR"
    assert any(r.pred == "worksFor" for r in by_url["ok1"])
    assert any(r.pred == "locatedIn" for r in by_url["ok2"])
    # sentinels are not entity mentions
    m = triples_op.mentions_from_triples(trips)
    assert m.filter(m.surface == "Timeout").count() == 0
    assert m.count() > 0


def test_triples_row_timeout_passthrough_matches_default(spark, smoke_pages):
    """With a generous deadline the guarded triples path is row-identical
    to the in-process path on the real corpus."""
    from pdfmef_spark.operators import extract, triples as triples_op

    ext = extract.extract_pages(smoke_pages.limit(60))
    a = sorted(map(tuple, triples_op.extract_triples(ext).collect()))
    b = sorted(map(tuple, triples_op.extract_triples(ext, row_timeout=30).collect()))
    assert a == b
