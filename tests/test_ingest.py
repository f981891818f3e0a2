"""Streaming upload ingest (S5 analog): stream == batch extraction,
size-cap rejection rows, incremental file pickup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdfmef_spark.operators import extract
from pdfmef_spark.sources import store
from pdfmef_spark.streaming import ingest

SF = 0.001


def _drop(pages_df, path):
    pages_df.coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_matches_batch_extract(spark, tmp_path):
    pages = store.read_pages(spark, SF).limit(40).cache()
    up_dir = str(tmp_path / "uploads")
    _drop(pages, f"{up_dir}/drop1")
    # file source reads a directory tree; write drops as subdirs
    q = ingest.run_upload_ingest(spark, f"{up_dir}/*", query_name="up1")
    q.awaitTermination(120)
    got = {
        (r.url, r.text)
        for r in spark.sql("SELECT url, text FROM up1").collect()
    }
    want = {
        (r.url, r.text)
        for r in extract.extract_pages(pages).select("url", "text").collect()
    }
    assert got == want and len(got) == 40


def test_stream_size_cap_rejects(spark, tmp_path):
    pages = store.read_pages(spark, SF).limit(10)
    big = pages.withColumn(
        "html",
        F.when(F.col("url").endswith("4"), F.concat(F.col("html"), F.lit(b"x" * 4096)))
        .otherwise(F.col("html")),
    )
    up_dir = str(tmp_path / "uploads2")
    _drop(big, f"{up_dir}/drop1")
    q = ingest.run_upload_ingest(spark, f"{up_dir}/*", query_name="up2", cap_bytes=4096)
    q.awaitTermination(120)
    rows = spark.sql("SELECT url, text, error FROM up2").collect()
    assert len(rows) == 10
    rejected = [r for r in rows if r.error and r.error.startswith("TooLarge")]
    extracted = [r for r in rows if r.error is None]
    assert rejected and all(r.text is None for r in rejected)
    assert extracted and all(r.text is not None for r in extracted)
    assert {r.url for r in rejected} == {
        r.url for r in big.collect() if r.url.endswith("4")
    }


def test_stream_picks_up_new_drops(spark, tmp_path):
    pages = store.read_pages(spark, SF).limit(20).cache()
    rows = pages.collect()
    up_dir = str(tmp_path / "uploads3")
    half = spark.createDataFrame(rows[:10], schema=pages.schema)
    rest = spark.createDataFrame(rows[10:], schema=pages.schema)
    _drop(half, f"{up_dir}/drop1")
    q1 = ingest.run_upload_ingest(spark, f"{up_dir}/*", query_name="up3a")
    q1.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM up3a").first().c == 10
    # second drop arrives; a fresh availableNow pass ingests the union
    _drop(rest, f"{up_dir}/drop2")
    q2 = ingest.run_upload_ingest(spark, f"{up_dir}/*", query_name="up3b")
    q2.awaitTermination(120)
    assert spark.sql("SELECT count(DISTINCT url) c FROM up3b").first().c == 20
    assert os.path.isdir(up_dir)


def test_stream_triples_match_batch(spark, tmp_path):
    """The full extract -> triples chain runs unchanged on a stream:
    streamed triple set == batch triple set over the same pages."""
    from pyspark.sql import functions as F

    from pdfmef_spark.operators import triples as triples_op
    from pdfmef_spark.streaming import ingest as ing

    pages = store.read_pages(spark, SF).limit(30).cache()
    up_dir = str(tmp_path / "uploads4")
    _drop(pages, f"{up_dir}/drop1")

    uploads = ing.gate_upload_size(ing.read_page_uploads(spark, f"{up_dir}/*"))
    ok = uploads.filter(F.col("upload_error").isNull())
    streamed = triples_op.extract_triples(extract.extract_pages(ok))
    q = (
        streamed.writeStream.outputMode("append")
        .format("memory")
        .queryName("trip_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.url, r.subj, r.pred, r.obj)
        for r in spark.sql("SELECT url, subj, pred, obj FROM trip_stream").collect()
    }
    want = {
        (r.url, r.subj, r.pred, r.obj)
        for r in triples_op.extract_triples(extract.extract_pages(pages))
        .select("url", "subj", "pred", "obj")
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_kg_updates_equal_batch_graph(spark, tmp_path):
    """Drops -> incremental KG refresh == from-scratch pipeline; a
    replayed drop is a ledger no-op (graph unchanged)."""
    from pdfmef_spark import pipeline as P

    pages = store.read_pages(spark, SF).limit(60).cache()
    first = pages.limit(40)
    rest = pages.subtract(first)
    up_dir = str(tmp_path / "uploads3")
    kg_dir = str(tmp_path / "kg_stream")
    _drop(first, f"{up_dir}/drop1")
    _drop(rest, f"{up_dir}/drop2")

    q = ingest.run_streaming_kg_updates(spark, f"{up_dir}/*", kg_dir)
    q.awaitTermination(180)

    got = {
        (r.src, r.dst, r.pred, r.weight)
        for r in spark.read.parquet(f"{kg_dir}/edges").collect()
    }
    full = P.run_pipeline(spark, pages, str(tmp_path / "kg_full"))
    want = {
        (r.src, r.dst, r.pred, r.weight) for r in full.df("edges").collect()
    }
    assert got == want

    # replay the same drops without a stream checkpoint: the url ledger
    # anti-joins every row away -> graph identical
    q2 = ingest.run_streaming_kg_updates(spark, f"{up_dir}/*", kg_dir)
    q2.awaitTermination(180)
    again = {
        (r.src, r.dst, r.pred, r.weight)
        for r in spark.read.parquet(f"{kg_dir}/edges").collect()
    }
    assert again == want
