"""Explicit schemas for every table the engine reads or writes.

The reference has no schema system (free-form XML trees,
reference: src/extraction/runnables.py:97); here every stage contract
is a fixed StructType so Catalyst can prune/push down and the DuckDB
oracle can compare.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table — shape fixed by BASELINE.json input_hint.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # golden text (input tables carry it; the extract stage must reproduce it)
        T.StructField("lang", T.StringType(), True),
    ]
)

# Output of the extract stage. `text` must be byte-identical to the
# golden text per url (reference analog: sha1 conversion checksums,
# bin/processCrawls.pl:159-170). Errors are data, not task failures
# (reference analog: RunnableError values, src/extraction/runnables.py:46-51).
EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("title", T.StringType(), True),
        # figure captions in document order (<figcaption> text, or <img alt>
        # for caption-less figures / standalone content images) — the
        # reference's per-doc figure entities (csxextract figures2.py:39-52)
        T.StructField("figures", T.ArrayType(T.StringType()), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # PERSON ORG PLACE TERM DOC
        T.StructField("span_start", T.IntegerType(), True),
        T.StructField("span_end", T.IntegerType(), True),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), True),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("span_start", T.IntegerType(), True),
        T.StructField("span_end", T.IntegerType(), True),
        T.StructField("conf", T.DoubleType(), True),
    ]
)

LINKS = T.StructType(
    [
        T.StructField("type", T.StringType(), False),  # entity type partition
        T.StructField("src", T.StringType(), False),   # normalized surface key
        T.StructField("dst", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

NODES = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("canonical", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("n_mentions", T.LongType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("weight", T.LongType(), False),
    ]
)

# Per-partition lineage manifest (generalizes the reference's
# CRAWLED/EXTRACTING/PASS/FAIL state machine,
# src/extractor/python_wrapper/properties.config:27-31).
MANIFEST = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("n_errors", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ]
)
