"""Structured Streaming operators: watermarked windowed aggregation over
an unbounded events feed.

Not a reference-parity requirement (pdfmef has no streaming; its daemon
loop maps to `incremental`), but the engine exposes the standard
readStream -> transform -> writeStream surface for event-style inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, input_dir: str, max_files: int = 4) -> DataFrame:
    """File-source stream of event JSON drops (each file = one micro-batch
    chunk). On a cluster this is the same code against Kafka/Kinesis with
    only the source format changing."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(input_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts with late-data handling via watermark.

    Rows later than `watermark` behind the max seen ts are dropped and
    their windows finalized — bounded state regardless of stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, input_dir: str, query_name: str = "event_counts",
    window: str = "10 minutes", watermark: str = "30 minutes",
):
    """Start the stream into an in-memory sink (complete mode) — the test
    harness surface; production would writeStream.format('parquet')."""
    stream = read_event_stream(spark, input_dir)
    agg = windowed_event_counts(stream, window, watermark)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
