"""events_profile goldens: hand-computed per-column stats over a 4-row
frame with NULLs (the testdata events table is null-free, so the gate
alone would leave the null-handling contract unpinned)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from job_crawler_spark.plans.events_plans import q_events_profile

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def test_profile_counts_nulls_and_distincts(spark, tmp_path):
    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, ts, 10, "click", 1.0, '{"a":1}'),
        (2, ts, None, "click", None, None),
        (3, None, 10, "view", 2.0, '{"a":1}'),
        (4, ts, 20, None, 3.0, None),
    ]
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = [tuple(r) for r in q_events_profile(spark, str(tmp_path)).collect()]
    # n_distinct ignores NULLs; min/max ignore NULLs; n_nulls counts them;
    # the double column `value` is deliberately not profiled
    assert got == [
        ("event_id", 4, 0, 4, "1", "4"),
        ("event_type", 4, 1, 2, "click", "view"),
        ("props", 4, 2, 1, '{"a":1}', '{"a":1}'),
        ("ts", 4, 1, 1, "2024-03-01 12:00:00", "2024-03-01 12:00:00"),
        ("user_id", 4, 1, 2, "10", "20"),
    ]
