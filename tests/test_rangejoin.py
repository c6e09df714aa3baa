"""Unit tests for the binned range join operator (operators/rangejoin.py).

Edge semantics pinned: inclusive bounds at both ends, key-group
isolation, multi-bucket intervals matched exactly once (no dedup pass),
empty/NULL intervals dropped, collision suffixes, and the scale plan
shape (equi-join on the bucket key, never a nested-loop or cartesian
plan, no inequality in the join condition).
"""

from __future__ import annotations

from datetime import datetime

from job_crawler_spark.operators.rangejoin import range_join

HOUR = 3600


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(10, 0), "c1"),   # == window start (inclusive)
            (1, _ts(11, 30), "c2"),  # inside
            (1, _ts(12, 0), "c3"),   # == window end (inclusive)
            (1, _ts(12, 1), "c4"),   # just after -> no match
            (1, _ts(9, 59), "c5"),   # just before -> no match
            (2, _ts(11, 0), "c6"),   # other key, window is key 1's
        ],
        "uid long, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, _ts(10), _ts(12), 900)],
        "uid long, ws timestamp, we timestamp, wid long",
    )
    return points, intervals


def test_inclusive_bounds_and_key_isolation(spark):
    points, intervals = _frames(spark)
    out = range_join(
        points, intervals, on=["uid"], point_ts="ts",
        start_ts="ws", end_ts="we", interval_cols=["wid"],
        bucket_seconds=HOUR,
    )
    got = sorted(r["tag"] for r in out.collect())
    assert got == ["c1", "c2", "c3"]


def test_multibucket_interval_emits_each_pair_once(spark):
    """An interval spanning many buckets (span 6h >> W=1h) still matches
    each point exactly once — the point side is never exploded."""
    points = spark.createDataFrame(
        [(1, _ts(h), f"p{h}") for h in range(8, 16)],
        "uid long, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, _ts(9), _ts(15), 1)],
        "uid long, ws timestamp, we timestamp, wid long",
    )
    out = range_join(
        points, intervals, on=["uid"], point_ts="ts",
        start_ts="ws", end_ts="we", interval_cols=["wid"],
        bucket_seconds=HOUR,
    )
    tags = sorted(r["tag"] for r in out.collect())
    assert tags == sorted(f"p{h}" for h in range(9, 16))
    assert len(tags) == len(set(tags))


def test_overlapping_intervals_emit_one_row_each(spark):
    points = spark.createDataFrame(
        [(1, _ts(11), "p")], "uid long, ts timestamp, tag string"
    )
    intervals = spark.createDataFrame(
        [(1, _ts(10), _ts(12), 1), (1, _ts(9), _ts(13), 2)],
        "uid long, ws timestamp, we timestamp, wid long",
    )
    out = range_join(
        points, intervals, on=["uid"], point_ts="ts",
        start_ts="ws", end_ts="we", interval_cols=["wid"],
        bucket_seconds=HOUR,
    )
    assert sorted(r["wid"] for r in out.collect()) == [1, 2]


def test_degenerate_intervals_dropped(spark):
    """end < start and NULL-bounded intervals match nothing (and never
    reach sequence(), which would raise on a descending range)."""
    points = spark.createDataFrame(
        [(1, _ts(11), "p")], "uid long, ts timestamp, tag string"
    )
    intervals = spark.createDataFrame(
        [(1, _ts(12), _ts(10), 1), (1, None, _ts(12), 2),
         (1, _ts(10), None, 3)],
        "uid long, ws timestamp, we timestamp, wid long",
    )
    out = range_join(
        points, intervals, on=["uid"], point_ts="ts",
        start_ts="ws", end_ts="we", interval_cols=["wid"],
        bucket_seconds=HOUR,
    )
    assert out.count() == 0


def test_collision_suffix(spark):
    points = spark.createDataFrame(
        [(1, _ts(11), "L")], "uid long, ts timestamp, val string"
    )
    intervals = spark.createDataFrame(
        [(1, _ts(10), _ts(12), "R")],
        "uid long, ws timestamp, we timestamp, val string",
    )
    out = range_join(
        points, intervals, on=["uid"], point_ts="ts",
        start_ts="ws", end_ts="we", interval_cols=["val"],
        bucket_seconds=HOUR,
    )
    row = out.collect()[0]
    assert row["val"] == "L" and row["val_iv"] == "R"


def test_plan_is_bucket_equijoin_no_nested_loop(spark):
    """The scale contract: the join is a plain equi-join carrying the
    bucket column (hot keys subdivide by time), with the timestamp
    inequalities applied as a post-join filter — never a
    BroadcastNestedLoopJoin or CartesianProduct."""
    points, intervals = _frames(spark)
    out = range_join(
        points, intervals, on=["uid"], point_ts="ts",
        start_ts="ws", end_ts="we", interval_cols=["wid"],
        bucket_seconds=HOUR,
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "__rj_bucket" in plan, plan
