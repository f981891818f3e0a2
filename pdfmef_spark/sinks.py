"""Row-level delete + upsert sinks over partitioned parquet tables
(K5 analog; upsert = the MERGE INTO shape of the reference's
update_state writes, wrappers.py update_state).

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
affected partitions are written to a hidden sibling temp dir first,
then swapped in by rename (crash between the two renames leaves the old
data recoverable in a hidden dir; Iceberg's metadata commit makes the
same operation atomic, see _swap_in). Untouched partition directories
are never listed, read, or rewritten (asserted by test).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def bucket_of(key, n_buckets: int):
    """The layout's bucketing function (matches sources/store.py)."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def _part_dirs(table_dir: str, bucket_col: str, n_buckets: int | None) -> list[str]:
    """Bucket partition dirs of the table; refuses to silently flatten a
    partitioned layout when the caller forgot n_buckets."""
    dirs = sorted(
        d for d in os.listdir(table_dir) if d.startswith(f"{bucket_col}=")
    )
    if dirs and n_buckets is None:
        raise ValueError(
            f"{table_dir} is hive-partitioned by {bucket_col!r} but n_buckets "
            "was not given; a full rewrite would flatten the layout and lose "
            "partition pruning. Pass n_buckets matching the write layout."
        )
    return dirs


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
    part_dirs = _part_dirs(table_dir, bucket_col, n_buckets)
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
            _swap_in(spark, src, remaining)
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
    _swap_in(spark, table_dir, remaining)
    return {"rows_deleted": doomed, "partitions_rewritten": 1, "partitions_total": 1}


def _swap_in(spark: SparkSession, target_dir: str, df: DataFrame) -> None:
    """Write df to a hidden temp sibling, then swap it into place with two
    renames (never read-and-overwrite the same path in one job).

    Temp/old dirs are dot-prefixed BASENAMES so Spark partition discovery
    and the `bucket=` listings in this module never see them. The swap is
    two renames, not one atomic exchange: a crash between them leaves the
    data recoverable in the hidden `.<name>.old-*` dir rather than
    committed — on an Iceberg catalog this whole operation is a single
    atomic metadata commit, which is what a production deployment should
    use; this is the explicit plain-parquet fallback.
    """
    parent, base = os.path.dirname(target_dir), os.path.basename(target_dir)
    tmp = os.path.join(parent, f".{base}.tmp-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    old = os.path.join(parent, f".{base}.old-{uuid.uuid4().hex[:8]}")
    os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old)


def upsert_by_key(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    updates: DataFrame,
    bucket_col: str = "bucket",
    n_buckets: int | None = None,
) -> dict:
    """MERGE INTO analog over bucket-partitioned parquet: rows matching an
    update key are replaced, unmatched update rows are inserted — each
    affected bucket rewritten copy-on-write, untouched buckets never read.

    `updates` must carry the table's data columns (everything except the
    hive bucket column). On an Iceberg catalog this is
    `MERGE INTO t USING u ON t.key = u.key WHEN MATCHED THEN UPDATE ...
    WHEN NOT MATCHED THEN INSERT ...`; this is the explicit parquet-layout
    fallback with the same partition-pruning property — including MERGE's
    one-match contract: duplicate keys in `updates` raise (a MERGE with
    multiple source matches per target row errors; silently inserting
    both would leave duplicate rows per key and over-count rows_inserted).
    """
    dup = (
        updates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"upsert_by_key: duplicate key {dup[0][key_col]!r} in updates — "
            "MERGE requires at most one source row per target key "
            "(dropDuplicates the updates first if last-writer-wins is intended)"
        )
    part_dirs = _part_dirs(table_dir, bucket_col, n_buckets)
    if part_dirs and n_buckets is not None:
        up = updates.withColumn(bucket_col, bucket_of(F.col(key_col), n_buckets))
        affected = sorted(
            r[bucket_col] for r in up.select(bucket_col).distinct().collect()
        )
        rows_updated = rows_inserted = rewritten = 0
        for b in affected:
            src = f"{table_dir}/{bucket_col}={b}"
            u = up.filter(F.col(bucket_col) == b).drop(bucket_col)
            if os.path.isdir(src):
                sub = spark.read.parquet(src)
                matched = sub.join(F.broadcast(u.select(key_col)), key_col, "left_semi").count()
                merged = sub.join(
                    F.broadcast(u.select(key_col)), key_col, "left_anti"
                ).unionByName(u)
                _swap_in(spark, src, merged)
            else:  # brand-new bucket: all inserts
                matched = 0
                os.makedirs(src, exist_ok=True)
                _swap_in(spark, src, u)
            n_up = u.count()
            rows_updated += matched
            rows_inserted += n_up - matched
            rewritten += 1
        return {
            "rows_updated": rows_updated,
            "rows_inserted": rows_inserted,
            "partitions_rewritten": rewritten,
            "partitions_total": max(len(part_dirs), rewritten),
        }

    tbl = spark.read.parquet(table_dir)
    matched = tbl.join(F.broadcast(updates.select(key_col)), key_col, "left_semi").count()
    merged = tbl.join(
        F.broadcast(updates.select(key_col)), key_col, "left_anti"
    ).unionByName(updates.select(*tbl.columns))
    _swap_in(spark, table_dir, merged)
    return {
        "rows_updated": matched,
        "rows_inserted": updates.count() - matched,
        "partitions_rewritten": 1,
        "partitions_total": 1,
    }
