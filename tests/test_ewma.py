"""daily_ewma goldens: hand-traced recursion, exact doubles.

Daily counts [4, 2, 8] with alpha = 0.5:
  s1 = 4; s2 = 0.5*2 + 0.5*4 = 3; s3 = 0.5*8 + 0.5*3 = 5.5
  dev = [0.0 (contract), 2 - 4 = -2.0, 8 - 3 = 5.0]
All values are exact binary doubles, so the assertions are equality,
not tolerance — the same property the cross-engine hash gate relies on.
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from job_crawler_spark.plans.events_plans import q_daily_ewma

_SCHEMA = T.StructType([T.StructField("ts", T.TimestampType())])


def test_hand_traced_recursion(spark, tmp_path):
    def day(d, n):
        return [
            (datetime.datetime(2024, 5, d, 10, i),) for i in range(n)
        ]

    rows = day(1, 4) + day(2, 2) + day(3, 8)
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = [
        (str(r["day"]), r["n_events"], r["ewma"], r["dev"])
        for r in q_daily_ewma(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2024-05-01", 4, 4.0, 0.0),
        ("2024-05-02", 2, 3.0, -2.0),
        ("2024-05-03", 8, 5.5, 5.0),
    ]
