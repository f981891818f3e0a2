"""Incremental batch (anti-join ledger) + Structured Streaming window agg."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pdfmef_spark.streaming import incremental, stream


def test_incremental_ticks_process_each_row_once(spark, tmp_path):
    snapshot1 = spark.range(0, 100).select(F.concat(F.lit("u"), "id").alias("url"))
    snapshot2 = spark.range(0, 150).select(F.concat(F.lit("u"), "id").alias("url"))
    ledger = incremental.Ledger(spark, str(tmp_path / "ledger"))

    seen: list[int] = []

    def stage(df):
        seen.append(df.count())
        return df

    out1 = incremental.run_incremental(snapshot1, ledger, stage, batch_id=1)
    assert out1.count() == 100
    # second tick over a grown snapshot: only the 50 new rows process
    out2 = incremental.run_incremental(snapshot2, ledger, stage, batch_id=2)
    assert out2.count() == 50
    # third tick, nothing new
    out3 = incremental.run_incremental(snapshot2, ledger, stage, batch_id=3)
    assert out3.count() == 0
    led = ledger.read()
    assert led.count() == 150
    assert led.select("url").distinct().count() == 150


def test_incremental_crash_before_commit_is_safe(spark, tmp_path):
    snapshot = spark.range(0, 40).select(F.concat(F.lit("u"), "id").alias("url"))
    ledger = incremental.Ledger(spark, str(tmp_path / "ledger2"))

    class Boom(Exception):
        pass

    def crashing(df):
        raise Boom()

    try:
        incremental.run_incremental(snapshot, ledger, crashing, batch_id=1)
    except Boom:
        pass
    assert ledger.read().count() == 0  # nothing claimed
    out = incremental.run_incremental(snapshot, ledger, lambda d: d, batch_id=2)
    assert out.count() == 40  # full batch reruns


def test_incremental_crash_in_sink_leaves_ledger_untouched(spark, tmp_path):
    """The ledger commits only AFTER the downstream write succeeds: a
    sink crash must not claim the batch (else rows are silently skipped
    on the next tick — at-most-once instead of at-least-once)."""
    snapshot = spark.range(0, 25).select(F.concat(F.lit("u"), "id").alias("url"))
    ledger = incremental.Ledger(spark, str(tmp_path / "ledger3"))
    sink_path = str(tmp_path / "out")

    class SinkBoom(Exception):
        pass

    def bad_sink(df):
        raise SinkBoom()

    try:
        incremental.run_incremental(snapshot, ledger, lambda d: d, batch_id=1, sink_fn=bad_sink)
    except SinkBoom:
        pass
    assert ledger.read().count() == 0  # write failed -> nothing claimed

    def good_sink(df):
        df.write.mode("overwrite").parquet(sink_path)

    incremental.run_incremental(snapshot, ledger, lambda d: d, batch_id=2, sink_fn=good_sink)
    assert spark.read.parquet(sink_path).count() == 25
    assert ledger.read().count() == 25


def test_streaming_windowed_counts(spark, tmp_path):
    """File-source stream -> watermark + tumbling window -> memory sink."""
    src = tmp_path / "events_in"
    os.makedirs(src)
    rows = [
        {"event_id": i, "ts": f"2024-01-01T00:{i % 50:02d}:00Z", "user_id": i % 5,
         "event_type": "click" if i % 2 == 0 else "view", "value": 1.5, "props": "{}"}
        for i in range(100)
    ]
    with open(src / "part1.json", "w") as fh:
        for r in rows[:60]:
            fh.write(json.dumps(r) + "\n")
    with open(src / "part2.json", "w") as fh:
        for r in rows[60:]:
            fh.write(json.dumps(r) + "\n")

    q = stream.run_stream_to_memory(spark, str(src), query_name="t_counts")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM t_counts")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 100
    # 50 distinct minutes -> 5 ten-minute windows x 2 types
    assert out.count() == 10


def test_stateful_stream_dedup(spark, tmp_path):
    """applyInPandasWithState: duplicated events across micro-batches emit
    exactly once per (user, event_id)."""
    from pdfmef_spark.streaming import stateful, stream as stream_mod

    src = tmp_path / "dup_events"
    os.makedirs(src)
    mk = lambda i: {  # noqa: E731
        "event_id": i, "ts": f"2024-01-01T00:{i % 50:02d}:00Z", "user_id": i % 3,
        "event_type": "click", "value": 1.0, "props": "{}",
    }
    with open(src / "b1.json", "w") as fh:
        for i in list(range(30)) + list(range(10)):  # dups within batch
            fh.write(json.dumps(mk(i)) + "\n")
    with open(src / "b2.json", "w") as fh:
        for i in range(20, 50):  # 20-29 replayed across batches
            fh.write(json.dumps(mk(i)) + "\n")

    events = spark.readStream.schema(stream_mod.EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        stateful.dedup_stream_first_seen(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT event_id, user_id FROM dedup_stream").collect()
    ids = [r.event_id for r in out]
    assert sorted(ids) == list(range(50))  # each id exactly once
