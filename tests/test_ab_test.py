"""ab_test_eval goldens: hand-computed two-proportion z-test plus every
degenerate guard (zero-variance pool, empty arm) — the gate data is
all-converted (pooled p = 1), so the live z path and the guards need
constructed frames."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import types as T

from job_crawler_spark.plans.analytics_plans import q_ab_test_eval

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _sr(x: float, d: int = 6) -> float:
    scale = 10**d
    return math.floor(x * scale + 0.5) / scale


def _run(spark, tmp_path, rows):
    ts = datetime.datetime(2024, 6, 1, 12, 0)
    spark.createDataFrame(
        [(ts, u, e) for u, e in rows], _SCHEMA
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return tuple(q_ab_test_eval(spark, str(tmp_path)).collect()[0])


def test_hand_computed_z(spark, tmp_path):
    # A = even users 0..18 (10 users), 8 convert; B = odd 1..19, 3 convert
    rows = []
    for u in range(0, 20, 2):
        rows.append((u, "purchase" if u < 16 else "view"))
    for u in range(1, 20, 2):
        rows.append((u, "purchase" if u < 6 else "view"))
    got = _run(spark, tmp_path, rows)
    p_a, p_b = 0.8, 0.3
    pool = 0.55
    se = math.sqrt(pool * (1 - pool) * (1 / 10 + 1 / 10))
    z = _sr((p_a - p_b) / se)
    assert got == (10, 8, 0.8, 10, 3, 0.3, z, abs(z) > 1.96)
    assert got[7] is True  # 0.5 lift on n=10+10 is significant


def test_zero_variance_pool_guard(spark, tmp_path):
    rows = [(u, "purchase") for u in range(6)]
    got = _run(spark, tmp_path, rows)
    assert got == (3, 3, 1.0, 3, 3, 1.0, 0.0, False)


def test_empty_arm_guard(spark, tmp_path):
    rows = [(u, "purchase" if u < 2 else "view") for u in range(0, 8, 2)]
    got = _run(spark, tmp_path, rows)
    assert got == (4, 1, 0.25, 0, 0, 0.0, 0.0, False)
