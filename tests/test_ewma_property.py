"""Property test: the EWMA closed-form window vs the plain recursion.

With alpha = 1/2, integer daily counts <= 50, and <= 12 days, every
intermediate in BOTH the Python recursion (s = 0.5*x + 0.5*s) and the
engine's closed form (0.5 * scaled running sum + 2^-t * x1) is an exact
multiple of 2^-t well inside 53 bits — so the comparison is exact
double equality across randomly generated series, not a tolerance.
"""

from __future__ import annotations

import datetime
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from job_crawler_spark.plans.events_plans import q_daily_ewma

_SCHEMA = T.StructType([T.StructField("ts", T.TimestampType())])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=st.lists(st.integers(1, 50), min_size=1, max_size=12))
def test_closed_form_equals_recursion(spark, tmp_path, counts):
    rows = [
        (datetime.datetime(2024, 7, d + 1, 8, 0, i // 60, i % 60 * 0),)
        for d, n in enumerate(counts)
        for i in range(n)
    ]
    # distinct second-level timestamps are irrelevant — only the day
    # truncation matters; collisions within a day are fine
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{sub}/events.parquet"
    )
    got = [
        (r["n_events"], r["ewma"], r["dev"])
        for r in q_daily_ewma(spark, sub).collect()
    ]
    want = []
    s = None
    for x in counts:
        prev = s
        s = float(x) if s is None else 0.5 * x + 0.5 * s
        want.append((x, s, 0.0 if prev is None else x - prev))
    assert got == want
