"""Skew + layout machinery: salted join == broadcast join; bucketed
tables co-locate a join with zero exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdfmef_spark.functions import salted_join_small_skewed


def test_salted_join_equals_broadcast_join(spark):
    """Deterministic salted replicate-join must produce exactly the rows
    a plain join produces, on a Zipf-skewed fact (70% hub key)."""
    fact = (
        spark.range(0, 30000)
        .withColumn(
            "key",
            F.when(F.col("id") % 10 < 7, F.lit("hub")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 53).cast("string"))
            ),
        )
        .withColumn("v", F.col("id") % 7)
    )
    dim = spark.createDataFrame(
        [("hub", "H")] + [(f"k{i}", f"D{i}") for i in range(53)],
        "key string, label string",
    )
    plain = (
        fact.join(F.broadcast(dim), "key")
        .groupBy("key", "label")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salted_join_small_skewed(fact, dim, "key", n_salts=8)
        .groupBy("key", "label")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default warehouse dir (./spark-warehouse, gitignored) — the
    # warehouse conf is static and cannot be set per-test
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Matching bucket specs -> sort-merge join with ZERO shuffle on
    either side (the Iceberg bucket(url) co-location story, verified)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("o_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        before_agg = plan.split("HashAggregate")[-1]  # join subtree
        assert "SortMergeJoin" in plan
        assert "Exchange" not in before_agg
        # and the result matches the unbucketed join
        li2 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o2 = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        expect = {
            tuple(r)
            for r in li2.join(o2, li2.l_orderkey == o2.o_orderkey)
            .groupBy("o_orderstatus").count().collect()
        }
        assert {tuple(r) for r in joined.collect()} == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
