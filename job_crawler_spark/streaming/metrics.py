"""Structured Streaming form of the monitoring pipeline.

The reference's monitoring loop (SURVEY.md §2.9, §3.4) is a periodic
unbounded source: health checks every 300 s, windowed per-API aggregation
over the last hour, retention expiry. Its Spark-native form is a Structured
Streaming query; the batch plans in plans/events_plans.py share the exact
same transformations (windowed groupBys are identical code in both modes —
that's the point of the unified API).

The sandbox driver gate runs batch-only, so these builders are exercised by
tests/test_streaming.py via a file-stream source over the events parquet,
with the rate-limited micro-batch trigger standing in for the reference's
sleep-loop cadence (monitoring_service.py:42-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source (each parquet file = one micro-batch).

    Spark's FileStreamSource requires a directory basePath; when handed a
    single parquet *file* (the driver testdata layout) we stage a symlink
    into a private temp dir so the source sees a directory."""
    import os
    import tempfile

    if os.path.isfile(path):
        staged = tempfile.mkdtemp(prefix="jcs_stream_src_")
        os.symlink(path, os.path.join(staged, os.path.basename(path)))
        path = staged
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_type_counts(stream: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """T3: sliding-window per-type counts with late-data watermark — the
    streaming twin of plans/events_plans.q_hourly_event_counts."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def error_rate_alert_stream(stream: DataFrame, threshold: float = 0.05) -> DataFrame:
    """A5/T3 as a stream: per-window error rate with the reference's 5%
    alert bound (monitoring/config.py:16)."""
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        "n_events",
        "n_errors",
        (F.col("n_errors") / F.col("n_events")).alias("error_rate"),
        (F.col("n_errors") / F.col("n_events") > threshold).alias("alert"),
    )


def run_to_completion(query_df: DataFrame, tmp_dir: str) -> list:
    """Drain all available micro-batches into an in-memory sink and return
    the final rows (test/driver harness helper)."""
    q = (
        query_df.writeStream.format("memory")
        .queryName("jcs_stream_sink")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = query_df.sparkSession
    return spark.table("jcs_stream_sink").collect()


def dedup_stream(stream: DataFrame, key_cols: list[str],
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup (T4's streaming twin): first event per key
    wins across micro-batches; the watermark bounds the key state Spark
    keeps (keys older than it are evicted — at 10^10 keys unbounded state
    is the failure mode, which is why the batch engine pairs its streaming
    ingestion with the Bloom/cuckoo + anti-join path instead for
    cross-ROUND history)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
