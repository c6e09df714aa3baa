"""Windowed funnel (ordered sequential-pattern) operator.

The classic conversion-funnel analytic (public analogs: ClickHouse
``windowFunnel``, Snowplow/Amplitude funnel reports): given an ordered list
of stage event types and a horizon, find for each entity the earliest
timestamp at which it reached each stage, where stage k must occur at or
after stage k-1 and within ``horizon`` of the stage-1 anchor.

Semantics (deterministic, "anchored-greedy"):

- the anchor is the entity's EARLIEST stage-1 event (AARRR-report
  convention), not every stage-1 event as a candidate chain start;
- each later stage takes the earliest qualifying event: ``type == stage_k``
  and ``t_{k-1} <= ts <= t_1 + horizon`` (boundaries inclusive);
- equal timestamps are allowed to satisfy consecutive stages (a click
  logged at the same microsecond as the view counts).

Scale shape: ONE hash exchange on the entity column. All stage columns are
whole-partition window minimums (``partitionBy`` only, no ordering), so the
plan is a single Exchange followed by chained Window operators with no Sort,
and the per-entity rollup that follows reuses the same hash partitioning —
no second shuffle. Cost is O(k) passes over each partition, never a
self-join; contrast a naive k-way self-join which shuffles the event table
k times and explodes on hot entities.

Reference scope note: the reference engine (gregorycarnegie/job_crawler,
main.py) has no funnel counterpart; this extends the events analytics layer
(SURVEY.md §2.9) the way as-of/range joins did in round 4.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_funnel(
    df: DataFrame,
    stages: Sequence[str],
    horizon_us: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-entity earliest stage-completion times.

    Returns one row per entity with columns ``t1 .. tK`` — the epoch-micros
    timestamp at which the entity first completed stage k under the anchored
    funnel semantics above — NULL from the first uncompleted stage onward
    (the stage-k condition requires ``t_{k-1}`` non-null, so NULLs are
    monotone along the chain).
    """
    if len(stages) < 2:
        raise ValueError("window_funnel needs at least 2 stages")
    w = Window.partitionBy(entity_col)
    out = df.select(
        entity_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_tsu"),
        F.col(type_col).alias("_ty"),
    )
    for i, stage in enumerate(stages, start=1):
        if i == 1:
            cond = F.col("_ty") == stage
        else:
            prev = F.col(f"t{i - 1}")
            cond = (
                (F.col("_ty") == stage)
                & prev.isNotNull()
                & (F.col("_tsu") >= prev)
                & (F.col("_tsu") <= F.col("t1") + F.lit(horizon_us))
            )
        out = out.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("_tsu"))).over(w)
        )
    return out.groupBy(entity_col).agg(
        *[F.min(f"t{i}").alias(f"t{i}") for i in range(1, len(stages) + 1)]
    )
