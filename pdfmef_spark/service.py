"""REST-analog document service (reference V1, src/service.py:43-85).

The reference's WSGI service serves per-document verbs — GET
``/extractor/<id>/(header|citations|text|file)``, POST upload (5 MB
cap), DELETE — re-extracting from a temp-dir file on every GET
(src/service.py:43-85, 110-150). The Spark-first analog serves the
same verbs over the ENGINE's bucket-partitioned document store:

* point lookups compute the url-hash bucket DRIVER-SIDE (the pure-
  python XXH64 that is parity-pinned against Spark's ``xxhash64``,
  functions/xxh64.py) and read exactly ONE hive bucket directory —
  partition pruning by construction, so a GET touches 1/N of the
  table's files no matter how big the store grows;
* header/citations/text run the SAME Arrow-batched operator stages as
  the batch pipeline (operators/extract.py, operators/triples.py) on
  the one-row DataFrame — serving and batch can never drift;
* upload/delete are the MERGE/DELETE sinks (sinks.py), copy-on-write
  over only the affected bucket, with the reference's 5 MB upload cap
  enforced as a rejected request rather than a cgi.maxlen crash;
* xml/json rendering mirrors the reference's ``output=xml|json`` param
  (stdlib only — the reference shells out to xmltodict).

``serve()`` wraps the service in a stdlib ``http.server`` for live
parity demos; in production the driver process owning the SparkSession
would sit behind a real WSGI front exactly like the reference does.
"""

from __future__ import annotations

import json
import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdfmef_spark import sinks
from pdfmef_spark.functions.xxh64 import xxh64_signed

MAX_UPLOAD_BYTES = 5 * 1024 * 1024  # the reference's cgi.maxlen cap
HEADER_PREDS = ("hasTitle", "hasAuthor", "hasKeyword", "affiliatedWith", "hasAbstract")


class DocService:
    """Per-document serving over a bucket-partitioned parquet store."""

    def __init__(self, spark: SparkSession, table_dir: str, n_buckets: int = 8):
        self.spark = spark
        self.table_dir = table_dir
        self.n_buckets = n_buckets

    # -- store management ---------------------------------------------------

    def init_from(self, pages: DataFrame) -> None:
        """Materialize the serving store (hive layout on the url bucket)."""
        (
            pages.withColumn("bucket", sinks.bucket_of(F.col("url"), self.n_buckets))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self.table_dir)
        )

    def _bucket(self, url: str) -> int:
        # python % already yields pmod semantics for positive modulus
        return xxh64_signed(url.encode("utf-8")) % self.n_buckets

    def _doc(self, url: str) -> DataFrame | None:
        """One-bucket point lookup: lists and reads ONLY bucket=<k>."""
        part = f"{self.table_dir}/bucket={self._bucket(url)}"
        if not os.path.isdir(part):
            return None
        df = self.spark.read.parquet(part).filter(F.col("url") == url)
        return df if df.limit(1).count() else None

    # -- GET verbs (reference Extractor.GET methods) ------------------------

    def text(self, url: str) -> str | None:
        """Extracted plain text (reference `method == 'text'`)."""
        from pdfmef_spark.operators import extract

        doc = self._doc(url)
        if doc is None:
            return None
        row = extract.extract_pages(doc).select("text", "error").first()
        if row is None or row["error"] is not None:
            return None
        return row["text"]

    def _triples(self, url: str) -> list | None:
        from pdfmef_spark.operators import extract, triples as triples_op

        doc = self._doc(url)
        if doc is None:
            return None
        # no lang gate here: a point GET is an explicit request for THIS
        # document (the batch gate remains in the pipeline path)
        return triples_op.extract_triples(
            extract.extract_pages(doc), lang_gate=None
        ).collect()

    def header(self, url: str) -> dict | None:
        """Title/authors/keywords/affiliations/abstract as a dict
        (reference `method == 'header'` -> TEItoHeader fields)."""
        rows = self._triples(url)
        if rows is None:
            return None
        out: dict = {"url": url}
        for r in rows:
            if r.pred not in HEADER_PREDS:
                continue
            key = r.pred
            if key in ("hasTitle", "hasAbstract"):
                out[key] = r.obj
            else:
                out.setdefault(key, []).append(r.obj)
        for k in out:
            if isinstance(out[k], list):
                out[k] = sorted(out[k])
        return out

    def citations(self, url: str) -> list[str] | None:
        """Outgoing cites targets (reference `method == 'citations'`)."""
        rows = self._triples(url)
        if rows is None:
            return None
        return sorted({r.obj for r in rows if r.pred == "cites"})

    def raw(self, url: str) -> bytes | None:
        """The stored source bytes (reference `method == 'file'`)."""
        doc = self._doc(url)
        if doc is None:
            return None
        return bytes(doc.select("html").first()["html"])

    # -- mutation verbs -----------------------------------------------------

    def upload(self, url: str, html: str | bytes, warc_ts=None) -> dict:
        """POST analog: MERGE the document into its bucket (one-match
        contract; oversized payloads rejected like the reference's cap).
        The row takes the same PAGES shape the batch/stream ingest uses
        (streaming/ingest.py) — one document schema everywhere."""
        import datetime as _dt
        import hashlib

        from pyspark.sql import types as T

        raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
        if len(raw) > MAX_UPLOAD_BYTES:
            raise ValueError(
                f"upload exceeds {MAX_UPLOAD_BYTES} bytes (reference 5 MB cap)"
            )
        vals = {
            "url": url,
            "warc_ts": warc_ts or _dt.datetime(1970, 1, 1),
            "html": raw,
            "text": "",
            "lang": "en",
            "sha256_text": hashlib.sha256(b"").hexdigest(),
        }
        # the updates row takes the STORE's schema (minus the hive bucket
        # column), nullable for any columns this verb doesn't populate —
        # robust to stores that carry extra per-document columns
        data_fields = [
            T.StructField(f.name, f.dataType, True)
            for f in self.spark.read.parquet(self.table_dir).schema
            if f.name != "bucket"
        ]
        updates = self.spark.createDataFrame(
            [tuple(vals.get(f.name) for f in data_fields)],
            T.StructType(data_fields),
        )
        return sinks.upsert_by_key(
            self.spark, self.table_dir, "url", updates, n_buckets=self.n_buckets
        )

    def delete(self, url: str) -> dict:
        """DELETE analog: copy-on-write delete of one url's bucket."""
        doomed = self.spark.createDataFrame([(url,)], "url string")
        return sinks.delete_by_key(
            self.spark, self.table_dir, "url", doomed, n_buckets=self.n_buckets
        )


# -- output rendering (reference output=xml|json param) ---------------------

def render(data, output: str = "json") -> tuple[str, str]:
    """-> (content_type, body). Mirrors the reference's xml/json switch."""
    if output == "json":
        return "application/json", json.dumps(data, sort_keys=True)
    if output == "xml":
        return "text/xml", _to_xml("result", data)
    raise ValueError(
        'Unsupported output format. Options are: "xml" (default) and "json"'
    )


def _to_xml(tag: str, data) -> str:
    if isinstance(data, dict):
        inner = "".join(_to_xml(k, v) for k, v in sorted(data.items()))
    elif isinstance(data, (list, tuple)):
        inner = "".join(_to_xml("item", v) for v in data)
    else:
        inner = escape("" if data is None else str(data))
    return f"<{tag}>{inner}</{tag}>"


# -- stdlib HTTP wrapper ----------------------------------------------------

def serve(service: DocService, port: int = 0):
    """Serve the reference's URL shape on a stdlib HTTPServer; returns the
    (started, unbound-thread) server — caller shuts it down. Route table
    mirrors src/service.py `urls`:

        GET  /hello                         -> liveness
        GET  /extractor/<id>/(header|citations|text|file)
        POST /extractor                     -> upload (json {url, html})
        DELETE /extractor/<id>
    """
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, unquote, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test runs
            pass

        def _send(self, code: int, ctype: str, body: str) -> None:
            raw = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_GET(self):
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            if u.path == "/hello":
                return self._send(200, "text/plain", "Hello World!\n")
            if len(parts) == 3 and parts[0] == "extractor":
                url, method = unquote(parts[1]), parts[2]
                fmt = parse_qs(u.query).get("output", ["json"])[0]
                fn = {
                    "header": service.header,
                    "citations": service.citations,
                    "text": service.text,
                    "file": service.raw,
                }.get(method)
                if fn is None:
                    return self._send(400, "text/plain", "bad method")
                try:
                    data = fn(url)
                except Exception as exc:  # reference: web.internalerror()
                    return self._send(500, "text/plain", str(exc))
                if data is None:
                    return self._send(404, "text/plain", "not found")
                if method in ("text", "file"):
                    if isinstance(data, bytes):
                        data = data.decode("utf-8", errors="replace")
                    return self._send(200, "text/plain", data)
                try:
                    ctype, body = render(data, fmt)
                except ValueError as exc:
                    return self._send(400, "text/plain", str(exc))
                return self._send(200, ctype, body)
            return self._send(404, "text/plain", "not found")

        def do_POST(self):
            if self.path.rstrip("/") != "/extractor":
                return self._send(404, "text/plain", "not found")
            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_UPLOAD_BYTES:
                return self._send(413, "text/plain", "payload too large")
            try:
                payload = json.loads(self.rfile.read(n))
                stats = service.upload(payload["url"], payload["html"])
            except ValueError as exc:
                return self._send(413, "text/plain", str(exc))
            except Exception as exc:
                return self._send(500, "text/plain", str(exc))
            return self._send(200, "application/json", json.dumps(stats))

        def do_DELETE(self):
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 2 and parts[0] == "extractor":
                try:
                    stats = service.delete(unquote(parts[1]))
                except Exception as exc:
                    return self._send(500, "text/plain", str(exc))
                return self._send(200, "application/json", json.dumps(stats))
            return self._send(404, "text/plain", "not found")

    server = HTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
