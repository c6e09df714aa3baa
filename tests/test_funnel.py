"""Unit tests for the windowed funnel operator (operators/funnel.py).

Edge semantics pinned: anchored-greedy (horizon measured from the EARLIEST
stage-1 event, not the one that would complete), boundary-inclusive horizon,
equal-timestamp consecutive stages, strict stage order (later-stage events
before the previous stage never count), NULL-monotone chains, and entity
isolation. The gated query's aggregate form is covered by the oracle-parity
suite; these pin the per-entity operator itself.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from job_crawler_spark.operators.funnel import window_funnel

T0 = datetime(2024, 1, 1, 0, 0, 0)
HOUR_US = 3600 * 1_000_000


def _us(dt):
    return int(dt.timestamp() * 1_000_000)


def _run(spark, rows, horizon_us=2 * HOUR_US, stages=("a", "b", "c")):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = window_funnel(df, list(stages), horizon_us)
    return {r.user_id: (r.t1, r.t2, r.t3) for r in out.collect()}


def test_full_completion_and_strict_order(spark):
    rows = [
        # user 1 completes a->b->c in order
        (1, T0, "a"),
        (1, T0 + timedelta(minutes=10), "b"),
        (1, T0 + timedelta(minutes=20), "c"),
        # user 2 has c BEFORE b: c must not count (strict order)
        (2, T0, "a"),
        (2, T0 + timedelta(minutes=20), "c"),
        (2, T0 + timedelta(minutes=30), "b"),
    ]
    got = _run(spark, rows)
    assert got[1] == (
        _us(T0),
        _us(T0 + timedelta(minutes=10)),
        _us(T0 + timedelta(minutes=20)),
    )
    # user 2 reaches b but its only c precedes b -> t3 NULL
    assert got[2] == (_us(T0), _us(T0 + timedelta(minutes=30)), None)


def test_anchor_is_earliest_stage1_event(spark):
    # The user's FIRST 'a' is the anchor; a later 'a' that would complete
    # within horizon does not re-anchor the funnel (anchored-greedy).
    rows = [
        (1, T0, "a"),
        (1, T0 + timedelta(hours=5), "a"),
        (1, T0 + timedelta(hours=5, minutes=10), "b"),  # > T0 + 2h horizon
    ]
    got = _run(spark, rows)
    assert got[1] == (_us(T0), None, None)


def test_horizon_boundary_inclusive_and_exceeded(spark):
    rows = [
        (1, T0, "a"),
        (1, T0 + timedelta(hours=2), "b"),  # exactly anchor + horizon: counts
        (2, T0, "a"),
        (2, T0 + timedelta(hours=2, microseconds=1), "b"),  # 1 us over: no
    ]
    got = _run(spark, rows)
    assert got[1] == (_us(T0), _us(T0 + timedelta(hours=2)), None)
    assert got[2] == (_us(T0), None, None)


def test_equal_timestamp_consecutive_stages(spark):
    # b logged at the same microsecond as a satisfies t2 >= t1.
    rows = [(1, T0, "a"), (1, T0, "b"), (1, T0, "c")]
    got = _run(spark, rows)
    assert got[1] == (_us(T0), _us(T0), _us(T0))


def test_no_stage1_means_all_null_and_entity_isolation(spark):
    rows = [
        (1, T0, "b"),
        (1, T0 + timedelta(minutes=1), "c"),
        (2, T0, "a"),
        (2, T0 + timedelta(minutes=1), "b"),
    ]
    got = _run(spark, rows)
    assert got[1] == (None, None, None)
    assert got[2] == (_us(T0), _us(T0 + timedelta(minutes=1)), None)


def test_earliest_qualifying_event_wins(spark):
    # Two qualifying b events: the earlier one is taken, and c may chain
    # from it even though the later b also qualifies.
    rows = [
        (1, T0, "a"),
        (1, T0 + timedelta(minutes=30), "b"),
        (1, T0 + timedelta(minutes=50), "b"),
        (1, T0 + timedelta(minutes=40), "c"),  # between the two b events
    ]
    got = _run(spark, rows)
    assert got[1] == (
        _us(T0),
        _us(T0 + timedelta(minutes=30)),
        _us(T0 + timedelta(minutes=40)),
    )
