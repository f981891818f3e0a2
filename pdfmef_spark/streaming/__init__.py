"""Incremental & streaming execution.

The reference is a polling batch daemon (src/extractor/main.py:139-176):
pull a batch of unprocessed ids, extract, mark PASS/FAIL, repeat. Two
Spark-native re-expressions live here:

* `incremental` — incremental batch over snapshots: anti-join new rows
  against the processed ledger, process, append to the ledger. This is
  the production path for the KG pipeline (matches the reference's
  semantics exactly and is Iceberg-snapshot-friendly).

* `stream` — Structured Streaming wrappers (file source -> watermarked
  windowed aggregation) for genuinely unbounded inputs. The KG pipeline
  itself stays batch-incremental (documented non-goal in SURVEY.md §2.2:
  the reference has no streaming operators).
"""
