"""Z-order layout (operators/layout.py): bit-exactness vs a pure-Python
Morton reference, and the quantitative file-skipping claim the operator
exists for — a 2-D box query must touch far fewer z-ordered partitions
than single-column-sorted ones, because per-partition min/max spans are
hyper-rectangles instead of full-width slabs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_crawler_spark.operators.layout import (
    interleave_bits,
    zorder_key,
    zorder_layout,
    zscale,
)


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_interleave_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 256, 65535) for b in (0, 3, 1024, 65535)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", interleave_bits([F.col("a"), F.col("b")], 16)
    )
    for r in df.collect():
        assert r["z"] == _py_morton([r["a"], r["b"]], 16), (r["a"], r["b"])


def test_interleave_three_dims_and_bounds(spark):
    rows = [(7, 1, 5), (0, 0, 0), (65535, 65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long, c long").withColumn(
        "z", interleave_bits([F.col("a"), F.col("b"), F.col("c")], 16)
    )
    got = {(r["a"], r["b"], r["c"]): r["z"] for r in df.collect()}
    for k, z in got.items():
        assert z == _py_morton(list(k), 16)
    assert got[(65535, 65535, 65535)] == (1 << 48) - 1  # fits a long
    with pytest.raises(ValueError):
        interleave_bits([F.lit(0)] * 4, 16)  # 64 bits would overflow
    with pytest.raises(ValueError):
        interleave_bits([], 16)


def test_zscale_clamps_and_degenerates(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (999.0,)], "x double"
    )
    out = df.select(
        zscale(F.col("x"), 0.0, 100.0, 8).alias("z"),
        zscale(F.col("x"), 7.0, 7.0, 8).alias("const"),
    ).collect()
    zs = [r["z"] for r in out]
    assert zs[0] == 0 and zs[1] == 0          # clamped low / exact low
    assert zs[3] == 255 and zs[4] == 255      # exact high / clamped high
    assert 0 < zs[2] < 255
    assert all(r["const"] == 0 for r in out)  # degenerate range -> no-op


def test_zorder_key_orders_locally(spark):
    # same cell -> identical key; the key is a pure function of the specs
    df = spark.createDataFrame([(10.0, 20.0), (10.0, 20.0)], "x double, y double")
    ks = df.select(
        zorder_key([(F.col("x"), 0.0, 100.0), (F.col("y"), 0.0, 100.0)], 10)
        .alias("k")
    ).collect()
    assert ks[0]["k"] == ks[1]["k"]


def _partition_spans(df, n):
    """Per-partition (min, max) of x and y after a layout: the stats a
    manifest would store for file skipping."""
    withpid = df.withColumn("pid", F.spark_partition_id())
    return {
        r["pid"]: (r["x0"], r["x1"], r["y0"], r["y1"])
        for r in withpid.groupBy("pid")
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        )
        .collect()
    }


def test_zorder_prunes_box_queries_better_than_linear_sort(spark):
    # deterministic 64x64 grid, one row per cell, 64 output "files"
    n, files = 64, 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("double").alias("x"),
        F.floor(F.col("id") / n).cast("double").alias("y"),
    )
    zed = zorder_layout(grid, [("x", 0.0, 63.0), ("y", 0.0, 63.0)], files, bits=6)
    linear = grid.repartitionByRange(files, "x").sortWithinPartitions("x", "y")

    # box query: 8x8 region = 1.6% of the table
    qx0, qx1, qy0, qy1 = 24.0, 31.0, 24.0, 31.0

    def touched(spans):
        return sum(
            1
            for x0, x1, y0, y1 in spans.values()
            if x1 >= qx0 and x0 <= qx1 and y1 >= qy0 and y0 <= qy1
        )

    t_z = touched(_partition_spans(zed, files))
    t_lin = touched(_partition_spans(linear, files))
    # linear layout: every x-slab overlapping the box spans ALL y, so the
    # y-predicate prunes nothing; z-order boxes the key space.
    assert t_z * 2 <= t_lin, (t_z, t_lin)
    assert t_z <= 8, t_z  # the 8x8 box touches a handful of z-tiles

    # layout is a permutation, not a transformation
    assert zed.count() == n * n
    assert zed.select(F.sum("x"), F.sum("y")).collect() == \
        grid.select(F.sum("x"), F.sum("y")).collect()


def test_zorder_layout_plan_single_range_exchange(spark):
    grid = spark.range(100).select(
        (F.col("id") % 10).cast("double").alias("x"),
        F.floor(F.col("id") / 10).cast("double").alias("y"),
    )
    zed = zorder_layout(grid, [("x", 0.0, 9.0), ("y", 0.0, 9.0)], 4, bits=4)
    plan = zed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("rangepartitioning(") == 1, plan
    assert "hashpartitioning(" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
