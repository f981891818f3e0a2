"""REST-analog serving: bucket-pruned point lookups, verb parity with
the reference service (header/citations/text/file, upload, delete),
HTTP round-trip on the stdlib wrapper."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from pdfmef_spark.service import DocService, render
from pdfmef_spark.sources import store


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    pages = store.read_pages(spark, 0.001).limit(200).drop("bucket")
    s = DocService(spark, str(tmp_path_factory.mktemp("serve") / "docs"), n_buckets=8)
    s.init_from(pages)
    return s


def _some_url(svc):
    return svc.spark.read.parquet(svc.table_dir).select("url").first()["url"]


def test_point_lookup_reads_one_bucket(svc):
    """The GET path lists exactly one bucket=K directory (pruning by
    construction, not by Catalyst)."""
    url = _some_url(svc)
    doc = svc._doc(url)
    files = {r[0] for r in doc.select(F.input_file_name()).collect()}
    assert files and all(f"bucket={svc._bucket(url)}" in f for f in files)


def test_text_and_header_and_citations(svc):
    url = _some_url(svc)
    text = svc.text(url)
    assert text and isinstance(text, str)
    hdr = svc.header(url)
    assert hdr["url"] == url and "hasTitle" in hdr
    cites = svc.citations(url)
    assert isinstance(cites, list)
    assert svc.raw(url).startswith(b"<")


def test_missing_doc_is_none_not_error(svc):
    assert svc.text("https://nope.example/x") is None
    assert svc.header("https://nope.example/x") is None


def test_upload_then_get_then_delete(svc):
    url = "https://uploaded.example/doc1"
    # first block = title (the corpus convention triples.py keys on)
    html = "<html><head><title>Uploaded Doc</title></head><body><h1>Uploaded Doc</h1><p>Alpha beta gamma delta epsilon zeta eta theta.</p></body></html>"
    stats = svc.upload(url, html)
    assert stats["rows_inserted"] == 1
    assert svc.header(url).get("hasTitle") == "Uploaded Doc"
    # idempotent replace (MERGE semantics)
    stats2 = svc.upload(url, html)
    assert stats2["rows_updated"] == 1 and stats2["rows_inserted"] == 0
    del_stats = svc.delete(url)
    assert del_stats["rows_deleted"] == 1
    assert svc.text(url) is None


def test_upload_cap_rejected(svc):
    with pytest.raises(ValueError, match="5 MB"):
        svc.upload("https://big.example/x", "z" * (5 * 1024 * 1024 + 1))


def test_render_xml_json_parity():
    data = {"url": "u", "hasAuthor": ["a", "b"], "hasTitle": "T"}
    ct, body = render(data, "json")
    assert ct == "application/json" and json.loads(body)["hasTitle"] == "T"
    ct, body = render(data, "xml")
    assert body.startswith("<result>") and "<hasTitle>T</hasTitle>" in body
    with pytest.raises(ValueError, match="Unsupported output"):
        render(data, "yaml")


def test_http_round_trip(svc):
    from pdfmef_spark.service import serve

    server = serve(svc, port=0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/hello") as r:
            assert r.read() == b"Hello World!\n"
        url = _some_url(svc)
        q = urllib.parse.quote(url, safe="")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/extractor/{q}/header?output=json"
        ) as r:
            hdr = json.loads(r.read())
            assert hdr["url"] == url
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/extractor/{q}/text"
        ) as r:
            assert len(r.read()) > 0
        # 404 for a missing doc
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/extractor/missing/header"
            )
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
