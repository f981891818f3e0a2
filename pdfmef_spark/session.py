"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime coalescing + skew-join splitting), Arrow on (every
Python stage is vectorized), shuffle partitions sized to cores rather
than the 200 default, UTC session timezone so DuckDB oracle comparisons
are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Knobs that matter at 100 TB and are harmless at sf0.001. On a real
# cluster the same configs ship via spark-submit --conf; nothing here is
# local-mode-only except master/driver.memory.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size bounds UDF memory per batch (reference analog:
    # batchSize=48 in pdfmef properties.config, but per *Arrow batch*
    # not per process).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Djava.io.tmpdir=/tmp",
}


def get_spark(
    app_name: str = "pdfmef_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's configs.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to max(cores, 32) — right for local; on a real
    cluster you would size to ~2-3x total executor cores or rely on AQE
    coalescing from a higher initial value.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 32)
    # local[N, 4]: allow 4 task attempts — the same resilience a cluster
    # gets from spark.task.maxFailures; a transient python-worker death
    # must not kill a whole run (this sandbox VM occasionally drops one)
    builder = (
        SparkSession.builder.master(f"local[{cores},4]")
        .appName(app_name)
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    )
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
