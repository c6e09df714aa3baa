"""Binned range (interval) join — match point rows into interval rows.

For each POINT row and INTERVAL row sharing the equality keys, emit the
pair when ``start_ts <= point_ts <= end_ts`` (inclusive both ends) — the
attribution-window / validity-interval / sensor-reading-to-maintenance-
window join.

Expressed naively (equi-join on the keys with the two inequalities as a
residual), Spark evaluates every (point, interval) combination inside a
key group — O(|p| x |i|) per key, degenerate on hot keys, and with no
equality key at all it falls to BroadcastNestedLoopJoin. This
implementation is the BINNED range join (the same strategy Databricks'
range-join optimization and KDB's window join use): quantize time into
fixed-width buckets of ``bucket_seconds``,

1. each point lands in exactly ONE bucket: ``floor(epoch / W)``;
2. each interval EXPLODES to the buckets its span covers —
   ``sequence(floor(start/W), floor(end/W))`` — a bounded fan-out of
   ``ceil(len/W) + 1``; choosing W ~ the maximum interval length caps it
   at 2x;
3. equi-join on ``(*keys, bucket)`` — a plain width-bounded hash shuffle
   both sides, no inequality in the join condition;
4. exact residual filter on the ORIGINAL timestamps.

Per-task work drops from O(per-key points x per-key intervals) to
O(per-bucket points x per-bucket intervals): the bucket axis subdivides
hot keys by time, so a key with a year of data spreads over ~365 tasks
at W = 1 day instead of one. Each qualifying pair is emitted exactly
once (the point side is never exploded), so no dedup pass is needed.
Buckets are computed from truncated epoch seconds; truncation is
monotonic, so a point inside [start, end] always lands inside the
interval's bucket range and the exact filter restores precise bounds.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__rj_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    interval_cols: Sequence[str],
    *,
    bucket_seconds: int,
    suffix: str = "_iv",
) -> DataFrame:
    """Inner range join: every (point, interval) pair with equal ``on``
    keys and ``start_ts <= point_ts <= end_ts`` (inclusive).

    Returns all ``points`` columns plus ``interval_cols`` (suffixed when
    the name collides with a point column). Intervals with
    ``end_ts < start_ts`` or NULL bounds match nothing; points with NULL
    ``point_ts`` match nothing. ``bucket_seconds`` sizes the time
    quantum — set it near the maximum interval length so each interval
    covers at most ~2 buckets.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive: {bucket_seconds}")
    on = list(on)
    interval_cols = list(interval_cols)

    out_names = {
        c: (c + suffix if c in points.columns else c) for c in interval_cols
    }
    w = F.lit(float(bucket_seconds))

    def bucket(col: str) -> F.Column:
        # the ltz cast admits TIMESTAMP_NTZ inputs (ntz -> double is not a
        # legal cast); the mapping is monotonic, which is all bucketization
        # needs — the exact residual filter below restores precise bounds
        return F.floor(
            F.col(col).cast("timestamp").cast("double") / w
        ).cast("long")

    p = points.withColumn(_BKT, bucket(point_ts))
    iv = (
        intervals.filter(
            F.col(start_ts).isNotNull()
            & F.col(end_ts).isNotNull()
            & (F.col(end_ts) >= F.col(start_ts))
        )
        .select(
            *on,
            F.col(start_ts).alias("__rj_start"),
            F.col(end_ts).alias("__rj_end"),
            *[F.col(c).alias(out_names[c]) for c in interval_cols],
            F.explode(
                F.sequence(bucket(start_ts), bucket(end_ts))
            ).alias(_BKT),
        )
    )
    return (
        p.join(iv, on + [_BKT])
        .filter(
            (F.col(point_ts) >= F.col("__rj_start"))
            & (F.col(point_ts) <= F.col("__rj_end"))
        )
        .select(
            *on,
            *[c for c in points.columns if c not in on],
            *[out_names[c] for c in interval_cols],
        )
    )
