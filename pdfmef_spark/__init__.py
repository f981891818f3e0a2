"""pdfmef_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of what SeerLabs/pdfmef computes (multi-entity
extraction over document corpora; see /root/reference) as an idiomatic
Spark DataFrame pipeline over Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
      -> extract   (boilerplate-stripped text, byte-identical per url)
      -> mentions  (typed entity mentions with spans)
      -> triples   (subj, pred, obj) rows
      -> linking   (MinHash-LSH blocking + pair scoring)
      -> components(iterative-join connected components -> entity ids)
      -> graph     (nodes / edges tables)

plus the relational / dedup / similarity / text-analysis operator catalog
in ``pdfmef_spark.plans.queries`` (every entry oracle-checked vs DuckDB).

Nothing here is ported from the reference: pdfmef's multiprocessing pools,
subprocess extractors and XML sinks (reference: src/extraction/core.py)
are replaced by Catalyst-planned DataFrame stages and Arrow-vectorized
pandas UDFs.
"""

__version__ = "0.1.0"

from pdfmef_spark.session import get_spark  # noqa: F401
