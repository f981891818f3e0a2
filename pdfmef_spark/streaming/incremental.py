"""Incremental batch: process only rows not yet in the ledger.

Generalizes the reference's work-queue pattern (`SELECT id ... WHERE
state=CRAWLED ... LIMIT batch`, src/extractor/python_wrapper/
wrappers.py:140-156 + update_state writeback, wrappers.py:180-195):

    new = snapshot.join(ledger, key, "left_anti")      # claim
    out = stage(new)                                   # process
    ledger.append(out.select(key, status))             # commit

The anti-join replaces the state-machine UPDATE: idempotent, restart-
safe, and partition-parallel (no driver-side work queue).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class Ledger:
    """Append-only processed-keys table (parquet-backed)."""

    def __init__(self, spark: SparkSession, path: str, key: str = "url"):
        self.spark = spark
        self.path = path
        self.key = key

    def read(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame(
            [], f"{self.key} string, status string, batch_id long"
        )

    def unprocessed(self, snapshot: DataFrame) -> DataFrame:
        return snapshot.join(self.read().select(self.key), self.key, "left_anti")

    def commit(self, processed: DataFrame, batch_id: int, status: str = "PASS") -> None:
        (
            processed.select(self.key)
            .withColumn("status", F.lit(status))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(self.path)
        )


def run_incremental(
    snapshot: DataFrame,
    ledger: Ledger,
    stage_fn,
    batch_id: int,
    sink_fn=None,
) -> DataFrame:
    """One incremental tick: claim -> process -> SINK -> commit; returns
    the processed output.

    The ledger commits strictly AFTER the output is durable: if
    `sink_fn(out)` is given it performs the downstream write; otherwise
    the output is eagerly materialized (localCheckpoint) so stage
    failures surface before any claim is recorded. A crash anywhere
    before commit() leaves the ledger untouched -> the batch reruns in
    full next tick (at-least-once with idempotent downstream writes =
    effectively-once). Committing before the write would silently skip
    rows on a crash between commit and write (at-most-once) — the
    ordering here is the correctness-critical part.
    """
    todo = ledger.unprocessed(snapshot)
    out = stage_fn(todo)
    if sink_fn is not None:
        sink_fn(out)
    else:
        out = out.localCheckpoint(eager=True)
    ledger.commit(todo, batch_id)
    return out
