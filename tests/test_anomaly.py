"""MAD outlier detection (operators/anomaly.py): lower-median goldens,
flag boundary (strict k*MAD), MAD-0 degeneracy, tie determinism,
validation, single-exchange plan pin. The sf-fixture parity runs in
test_oracle_parity.py via the event_volume_anomalies gate."""

from __future__ import annotations

import pytest

from job_crawler_spark.operators.anomaly import mad_outliers


def _points(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, n long")


def _run(spark, rows, **kw):
    out = mad_outliers(
        _points(spark, rows), group_cols=["g"], value_col="n", **kw
    )
    return {
        (r["g"], r["t"]): (r["med"], r["mad"], r["dev"], r["is_anomaly"])
        for r in out.collect()
    }


def test_lower_median_and_flag_boundary(spark):
    # g=A values [1,2,3,4,100]: lower median = 3 (rank (5+1)//2 = 3),
    # deviations [2,1,0,1,97] -> MAD = 1 (lower median of sorted devs).
    # k=3 fence: dev > 3 -> only 100 flags; dev == 2 stays (strict >).
    rows = [("A", i, v) for i, v in enumerate([1, 2, 3, 4, 100])]
    got = _run(spark, rows)
    assert got[("A", 4)] == (3, 1, 97, True)
    assert got[("A", 0)] == (3, 1, 2, False)
    assert all(not got[("A", i)][3] for i in range(4))


def test_exact_fence_not_flagged(spark):
    # devs [0,1,2,3,6]: med=3(value), MAD... values [1,2,3,4,9]:
    # med = 3, devs [2,1,0,1,6] sorted [0,1,1,2,6] -> MAD = 1.
    # k=6 fence: dev > 6 -> the dev == 6 row is NOT flagged (inclusive
    # survival at the fence), k=5 flags it.
    rows = [("A", i, v) for i, v in enumerate([1, 2, 3, 4, 9])]
    assert _run(spark, rows, k=6)[("A", 4)][3] is False
    assert _run(spark, rows, k=5)[("A", 4)][3] is True


def test_mad_zero_degeneracy(spark):
    # more than half the group identical -> MAD = 0: any deviation at
    # all flags (standard MAD degeneracy, kept strict not epsilon-fudged)
    rows = [("A", 0, 5), ("A", 1, 5), ("A", 2, 5), ("A", 3, 6)]
    got = _run(spark, rows)
    assert got[("A", 3)] == (5, 0, 1, True)
    assert got[("A", 0)] == (5, 0, 0, False)


def test_even_group_uses_lower_median(spark):
    # [1,2,3,10]: rank (4+1)//2 = 2 -> med = 2 (lower, not mean 2.5)
    rows = [("A", i, v) for i, v in enumerate([1, 2, 3, 10])]
    assert _run(spark, rows)[("A", 0)][0] == 2


def test_groups_are_independent(spark):
    rows = [("A", 0, 1), ("A", 1, 1), ("A", 2, 100),
            ("B", 0, 100), ("B", 1, 100), ("B", 2, 1)]
    got = _run(spark, rows)
    assert got[("A", 2)][3] is True and got[("B", 2)][3] is True
    assert got[("A", 0)][3] is False and got[("B", 0)][3] is False


def test_validation(spark):
    with pytest.raises(ValueError):
        mad_outliers(_points(spark, []), group_cols=[], value_col="n")
    with pytest.raises(ValueError):
        mad_outliers(_points(spark, []), group_cols=["g"], k=0)


def test_single_exchange_plan(spark):
    """Every window shares the group-key partitioning: exactly one hash
    exchange, no Python."""
    out = mad_outliers(
        _points(spark, [("A", 0, 1)]), group_cols=["g"], value_col="n"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan
