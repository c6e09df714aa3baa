"""OLS trend-fit goldens: known daily counts with hand-computable
slope/intercept/r^2, including exact-fit and flat series."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from job_crawler_spark.plans.analytics_plans import q_event_volume_trend


def _rnd(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _write_events(spark, tmp_path, day_counts: dict[str, dict[int, int]]):
    rows = []
    i = 0
    for etype, counts in day_counts.items():
        for day, n in counts.items():
            for _ in range(n):
                rows.append(
                    (
                        i,
                        datetime(2024, 1, 1) + timedelta(days=day, seconds=i % 3600),
                        i % 7,
                        etype,
                        1.0,
                        "{}",
                    )
                )
                i += 1
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_trend_exact_linear_and_noisy(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        {
            # y = 2x + 1 exactly: slope 2, intercept 1, r2 = 1
            "lin": {0: 1, 1: 3, 2: 5, 3: 7},
            # flat: slope 0, intercept = mean, r2 division by zero (var_y=0)
            "noisy": {0: 1, 1: 4, 2: 2, 3: 5},
        },
    )
    got = {r.event_type: r for r in q_event_volume_trend(spark, str(tmp_path)).collect()}

    lin = got["lin"]
    assert (lin.n, lin.slope, lin.intercept, lin.r2) == (4, 2.0, 1.0, 1.0)

    # hand OLS for the noisy series
    xs, ys = [0, 1, 2, 3], [1, 4, 2, 5]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    noisy = got["noisy"]
    assert noisy.slope == _rnd(slope)
    assert noisy.intercept == _rnd((sy - slope * sx) / n)
    assert noisy.r2 == _rnd((cov_n * cov_n) / (var_x * var_y))
    assert 0 < noisy.r2 < 1


def test_trend_constant_series_r2_null(spark, tmp_path):
    # var_y = 0: slope/intercept defined (0 / mean), r2 is 0/0 -> NULL in
    # both engines (Spark double div-by-zero yields NULL; DuckDB likewise)
    _write_events(spark, tmp_path, {"flat": {0: 3, 1: 3, 2: 3}})
    r = q_event_volume_trend(spark, str(tmp_path)).collect()[0]
    assert (r.slope, r.intercept) == (0.0, 3.0)
    assert r.r2 is None
