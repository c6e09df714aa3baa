"""Unit tests for the join-free as-of join operator (operators/asof.py).

Edge semantics pinned: inclusive match at equal timestamps, NULL when no
right row qualifies, key-group isolation, deterministic right-side
duplicate resolution (greatest tiebreak), forward direction, and
left-column name collisions (suffix)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from job_crawler_spark.operators.asof import asof_join


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p1"),
            (1, _ts(12), "p2"),
            (1, _ts(8), "p0"),   # before any right row
            (2, _ts(9), "p3"),   # user with no right rows
        ],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100),   # equal-ts: inclusive match for p1
            (1, _ts(11), 101),
            (3, _ts(1), 999),    # other key, never matches
        ],
        "uid long, rts timestamp, rid long",
    )
    return left, right


def test_backward_inclusive_null_and_isolation(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["uid"], left_ts="ts", right_ts="rts",
        right_cols=["rid", "rts"],
    )
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["p1"]["rid"] == 100          # equal ts matches (inclusive)
    assert rows["p2"]["rid"] == 101          # latest prior, not first
    assert rows["p0"]["rid"] is None         # nothing at-or-before
    assert rows["p3"]["rid"] is None         # key isolation
    assert rows["p2"]["rts"] == _ts(11)


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["uid"], left_ts="ts", right_ts="rts",
        right_cols=["rid"], direction="forward",
    )
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["p0"]["rid"] == 100          # earliest at-or-after
    assert rows["p1"]["rid"] == 100          # equal ts inclusive
    assert rows["p2"]["rid"] is None         # nothing at-or-after
    assert rows["p3"]["rid"] is None


def test_right_duplicates_resolve_to_greatest_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts(12))], "uid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 7), (1, _ts(10), 9), (1, _ts(10), 8)],
        "uid long, rts timestamp, rid long",
    )
    out = asof_join(
        left, right, on=["uid"], left_ts="ts", right_ts="rts",
        right_cols=["rid"], tiebreak="rid",
    )
    assert out.collect()[0]["rid"] == 9


def test_null_timestamps_never_match(spark):
    """NULL timestamps are outside the temporal order: a right row with
    NULL right_ts can never satisfy right_ts <= left_ts (or >=), and a
    left row with NULL left_ts matches nothing — in BOTH directions.
    Regression pin: default nulls-first ascending used to sort a NULL-ts
    right row to the partition head, where `last(ignorenulls)` carried its
    payload into every unmatched left row."""
    left = spark.createDataFrame(
        [(1, _ts(8), "early"), (1, _ts(12), "late"), (1, None, "null_l")],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 666), (1, _ts(10), 100)],
        "uid long, rts timestamp, rid long",
    )
    for direction, expect in (
        ("backward", {"early": None, "late": 100, "null_l": None}),
        ("forward", {"early": 100, "late": None, "null_l": None}),
    ):
        out = asof_join(
            left, right, on=["uid"], left_ts="ts", right_ts="rts",
            right_cols=["rid"], direction=direction,
        )
        rows = {r["tag"]: r["rid"] for r in out.collect()}
        assert rows == expect, (direction, rows)


def test_collision_suffix(spark):
    left = spark.createDataFrame(
        [(1, _ts(12), "L")], "uid long, ts timestamp, val string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "R")], "uid long, rts timestamp, val string"
    )
    out = asof_join(
        left, right, on=["uid"], left_ts="ts", right_ts="rts",
        right_cols=["val"],
    )
    row = out.collect()[0]
    assert row["val"] == "L" and row["val_asof"] == "R"


def test_plan_is_join_free_single_shuffle(spark):
    """The scale contract: no Join operator anywhere (the naive range-join
    formulation explodes per key group), exactly one hash shuffle (the
    key window)."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["uid"], left_ts="ts", right_ts="rts",
        right_cols=["rid"],
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Join" not in plan, plan
    assert plan.count("hashpartitioning(") == 1, plan
