"""Max-min fair water-filling (operators/fairshare.py): waterline
goldens, exhaustive parity vs the brute-force replica, degeneracies
(zero budget, covering budget, empty/zero demands, ties), checkpoint
release, and the plan pin (the host frame is never shuffled or
windowed — one hash aggregate builds the histogram; the scalar comes
back by broadcast). The sf-fixture oracle parity runs in
test_oracle_parity.py via the ``host_budget_waterfill`` gate."""

from __future__ import annotations

import pytest

from job_crawler_spark.operators.checkpoints import release_checkpoints
from job_crawler_spark.operators.fairshare import (
    py_waterfill,
    waterfill_alloc,
    waterline,
)


def _demands(spark, vals):
    return spark.createDataFrame(
        [(f"h{i}.example.com", int(v)) for i, v in enumerate(vals)],
        "host string, demand long",
    )


def _line(spark, vals, budget):
    df = waterline(_demands(spark, vals), budget=budget)
    row = df.collect()[0]
    release_checkpoints(df)
    return row["t_star"], row["used"], row["spare"]


def test_waterline_golden(spark):
    # demands [1,3,5], B=7: f(3) = 1+3+3 = 7 <= 7 < f(4) = 8 -> t*=3
    assert _line(spark, [1, 3, 5], 7) == (3, 7, 0)


def test_spare_when_budget_between_levels(spark):
    # [2,2], B=1: t*=0 (f(1)=2 > 1), nothing allocated, spare 1
    assert _line(spark, [2, 2], 1) == (0, 0, 1)


def test_budget_covers_everything(spark):
    assert _line(spark, [4, 9], 100) == (9, 13, 87)


def test_zero_budget_and_zero_demands(spark):
    assert _line(spark, [5, 5], 0) == (0, 0, 0)
    assert _line(spark, [0, 0, 0], 10) == (0, 0, 10)


def test_matches_brute_force_exhaustively(spark):
    """Every (multiset, budget) over a hostile little grid — ties,
    zeros, saturation boundaries — matches the O(t) replica."""
    cases = [
        [1, 1, 1],
        [0, 2, 2, 7],
        [3, 3, 3, 3],
        [1, 2, 4, 8, 16],
        [10, 1, 1, 1, 1, 1],
        [6],
        [0, 0, 5],
    ]
    for vals in cases:
        for budget in range(0, sum(vals) + 3):
            t, allocs, spare = py_waterfill(vals, budget)
            df = waterfill_alloc(_demands(spark, vals), budget=budget)
            rows = sorted(df.collect(), key=lambda r: int(r["host"][1:-12]))
            release_checkpoints(df)
            got_allocs = [r["alloc"] for r in rows]
            assert got_allocs == allocs, (vals, budget)
            assert rows[0]["waterline"] == t, (vals, budget)
            assert rows[0]["spare"] == spare, (vals, budget)
            assert all(
                r["saturated"] == (d <= t) for r, d in zip(rows, vals)
            ), (vals, budget)


def test_alloc_never_exceeds_demand_or_budget(spark):
    df = waterfill_alloc(_demands(spark, [7, 11, 2, 30, 30]), budget=41)
    rows = df.collect()
    release_checkpoints(df)
    assert all(r["alloc"] <= r["demand"] for r in rows)
    assert sum(r["alloc"] for r in rows) + rows[0]["spare"] == 41


def test_validation():
    with pytest.raises(ValueError):
        py_waterfill([1], -1)


def test_negative_budget_rejected(spark):
    with pytest.raises(ValueError):
        waterline(_demands(spark, [1]), budget=-1)


def test_host_frame_never_shuffled(spark):
    """The allocator's output plan over the host frame: a broadcast
    nested-loop attach of the 1-row waterline plus narrow projections —
    no hash exchange, no sort, no window touches the host rows (the
    histogram window runs on the checkpointed value frame, behind the
    broadcast)."""
    df = waterfill_alloc(_demands(spark, [1, 2, 3]), budget=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_checkpoints(df)
    assert "BroadcastNestedLoopJoin" in plan
    # the host-side scan feeds the broadcast join directly: no exchange
    # between the host scan and the join output above it
    host_side = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning" not in host_side
    assert "Window" not in host_side
    assert "Python" not in plan


def test_checkpoints_released(spark):
    from job_crawler_spark.operators.checkpoints import _persistent_ids

    before = _persistent_ids(spark)
    df = waterfill_alloc(_demands(spark, [1, 2, 3]), budget=4)
    df.collect()
    release_checkpoints(df)
    assert _persistent_ids(spark) <= before
