"""Continuous crawl: Structured Streaming seed ingestion driving the engine.

The batch engine (crawl/round.py) runs discrete resumable rounds. Real
crawls also receive NEW seeds continuously (sitemap pings, submitted URLs,
recrawl schedules). This module closes that loop the Spark-native way:

    seed files land in a directory
      -> readStream (FileStreamSource, one micro-batch per file group)
      -> foreachBatch:
           engine.ingest_seeds(batch)   # canonicalize/dedup/anti-join/append
           engine.run_round(next)       # a full resumable crawl round

Delivery semantics: foreachBatch is at-least-once — after a crash the same
micro-batch can be redelivered. Both calls are replay-safe by construction:
``ingest_seeds`` anti-joins against seen + pending frontier (a replayed
batch admits nothing), and ``run_round`` is the engine's checkpointed
idempotent round (crawl/round.py header). Streaming checkpoint location
tracks the SOURCE offsets; the engine's own catalog tracks table state —
the same split Iceberg + Structured Streaming deployments use.

The reference's miniature ancestor is the monitoring sleep-loop that picks
up new work each cycle (monitoring_service.py:42-60, SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("round", T.IntegerType(), True),
    ]
)


def seed_stream(spark: SparkSession, seed_dir: str) -> DataFrame:
    """File-based seed source: each new parquet file in ``seed_dir`` is a
    micro-batch of submitted URLs."""
    return (
        spark.readStream.schema(SEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seed_dir)
    )


def continuous_crawl(
    engine,
    seed_dir: str,
    checkpoint_dir: str,
    rounds_per_batch: int = 1,
):
    """Start the continuous-crawl streaming query (availableNow trigger:
    drain all currently-available seed files, one engine round per
    micro-batch, then stop — the test/drain mode; a production deployment
    uses a processingTime trigger instead).

    Returns the StreamingQuery; caller awaits termination."""
    spark = engine.spark

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        admitted = engine.ingest_seeds(batch_df)
        for _ in range(rounds_per_batch):
            res = engine.run_round(engine.next_round())
            if res.get("done"):
                break
        # same between-round compaction policy the batch driver (run())
        # applies — a continuous crawl with force_recrawls must not
        # accumulate superseded doc copies unbounded
        engine._maybe_compact()
        engine.stats.append(
            {"stream_batch": int(batch_id), "admitted": int(admitted)}
        )

    return (
        seed_stream(spark, seed_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
