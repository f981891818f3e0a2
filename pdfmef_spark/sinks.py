"""Row-level delete sink over partitioned parquet tables (K5 analog).

The reference's only index-maintenance surface is an Elasticsearch
`delete_by_query` on paper_id (script/delete_papers.py:1-18). The
engine's tables are bucket-partitioned parquet (Iceberg-style layout,
sources/store.py), so the Spark-first analog is a copy-on-write
row-level delete that rewrites ONLY the partitions that can contain the
doomed keys — at 100 TB a delete of k documents touches O(k) buckets,
never the whole table (on a real Iceberg catalog this same operation is
`DELETE FROM t WHERE key IN (...)`, a metadata-level copy-on-write the
engine would prefer; this module is the explicit parquet-layout
fallback).

Safety: the rewrite never reads and overwrites a path in the same job —
affected partitions are written to a sibling temp dir first, then
swapped in with atomic per-directory renames. Untouched partition
directories are never listed, read, or rewritten (asserted by test).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def bucket_of(key, n_buckets: int):
    """The layout's bucketing function (matches sources/store.py)."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def delete_by_key(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    keys: DataFrame,
    bucket_col: str = "bucket",
    n_buckets: int | None = None,
) -> dict:
    """Delete every row whose `key_col` appears in `keys` (one column).

    If the table is hive-partitioned by `bucket_col` = bucket_of(key)
    (directory layout `bucket_col=N/`), only affected partitions are
    rewritten; otherwise the whole table is rewritten once. Returns
    {"rows_deleted", "partitions_rewritten", "partitions_total"}.
    Idempotent: a second run with the same keys deletes 0 rows and
    rewrites nothing.
    """
    keys = keys.select(F.col(key_col)).distinct()
    part_dirs = sorted(
        d for d in os.listdir(table_dir) if d.startswith(f"{bucket_col}=")
    )
    if part_dirs and n_buckets is not None:
        k = keys.withColumn(bucket_col, bucket_of(F.col(key_col), n_buckets))
        affected = {r[bucket_col] for r in k.select(bucket_col).distinct().collect()}
        targets = [d for d in part_dirs if int(d.split("=", 1)[1]) in affected]
        rows_deleted = 0
        rewritten = 0
        for d in targets:
            src = f"{table_dir}/{d}"
            sub = spark.read.parquet(src)
            doomed = sub.join(F.broadcast(keys), key_col, "left_semi").count()
            if doomed == 0:
                continue
            remaining = sub.join(F.broadcast(keys), key_col, "left_anti")
            tmp = f"{table_dir}/.{d}.tmp-{uuid.uuid4().hex[:8]}"
            remaining.write.mode("overwrite").parquet(tmp)
            old = f"{table_dir}/.{d}.old-{uuid.uuid4().hex[:8]}"
            os.rename(src, old)
            os.rename(tmp, src)
            shutil.rmtree(old)
            rows_deleted += doomed
            rewritten += 1
        return {
            "rows_deleted": rows_deleted,
            "partitions_rewritten": rewritten,
            "partitions_total": len(part_dirs),
        }

    # unpartitioned fallback: one full copy-on-write rewrite
    tbl = spark.read.parquet(table_dir)
    doomed = tbl.join(F.broadcast(keys), key_col, "left_semi").count()
    if doomed == 0:
        return {"rows_deleted": 0, "partitions_rewritten": 0, "partitions_total": 1}
    remaining = tbl.join(F.broadcast(keys), key_col, "left_anti")
    tmp = f"{table_dir}.tmp-{uuid.uuid4().hex[:8]}"
    remaining.write.mode("overwrite").parquet(tmp)
    old = f"{table_dir}.old-{uuid.uuid4().hex[:8]}"
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old)
    return {"rows_deleted": doomed, "partitions_rewritten": 1, "partitions_total": 1}
