"""table_expectations goldens on deliberately dirty data.

The TPC-H testdata is clean (all five checks pass with 0 violations at
the gate), so the violation-counting arms would go unexercised without
this: a 5-row orders frame carrying one of each defect — NULL key,
duplicate key, bad status, non-positive price, orphan/NULL FK — with
hand-counted expectations. Contract notes pinned here: NULL keys count
against uniqueness (n_rows - COUNT(DISTINCT key) where DISTINCT ignores
NULLs), and a NULL FK counts as a relationship violation in both
engines (anti-join and NOT EXISTS both retain NULL-key probes).
"""

from __future__ import annotations

from pyspark.sql import types as T

from job_crawler_spark.plans.analytics_plans import q_table_expectations

_ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


def test_each_violation_kind_counted(spark, tmp_path):
    orders = [
        (1, 10, "O", 100.0),
        (None, 10, "F", 50.0),  # null key
        (2, 99, "X", 20.0),  # bad status + orphan FK
        (2, 10, "P", -5.0),  # duplicate key + negative price
        (3, None, "O", 0.0),  # zero price + NULL FK
    ]
    spark.createDataFrame(orders, _ORDERS).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    spark.createDataFrame([(10,)], "c_custkey long").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/customer.parquet")
    got = [tuple(r) for r in q_table_expectations(spark, str(tmp_path)).collect()]
    assert got == [
        ("accepted_values_o_orderstatus", 5, 1, False),
        ("not_null_o_orderkey", 5, 1, False),
        ("range_o_totalprice_positive", 5, 2, False),
        ("relationships_o_custkey_customer", 5, 2, False),
        ("unique_o_orderkey", 5, 2, False),
    ]
