"""Bucketed co-located joins: the join plan must contain ZERO Exchange.

This is the write-time layout that removes the per-query shuffle from the
engine's keyed joins (seen anti-join, fact joins) at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_crawler_spark.operators.bucketing import write_bucketed
from tests.test_plans import explain_str

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", N_BUCKETS)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        N_BUCKETS,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(b)
            .join(spark.table(a), "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = explain_str(joined)
        # the join itself must be co-located: no shuffle below the join
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in join_part, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    a, b = bucketed_tables
    got = {
        (r.o_orderpriority, round(r.rev, 2))
        for r in spark.table(b)
        .join(spark.table(a), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = {
        (r.o_orderpriority, round(r.rev, 2))
        for r in lineitem.join(orders, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .collect()
    }
    assert got == want


def test_bucket_spec_parses_metadata(spark, bucketed_tables):
    from job_crawler_spark.operators.bucketing import bucket_spec

    a, b = bucketed_tables
    assert bucket_spec(spark, a) == (N_BUCKETS, ["o_orderkey"])
    assert bucket_spec(spark, b) == (N_BUCKETS, ["o_orderkey"])
    # unbucketed table -> None
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.mode(
        "overwrite"
    ).saveAsTable("t_unbucketed")
    try:
        assert bucket_spec(spark, "t_unbucketed") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS t_unbucketed")
