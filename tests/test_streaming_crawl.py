"""Continuous crawl: Structured Streaming seed ingestion + engine rounds."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from job_crawler_spark.catalog import Catalog
from job_crawler_spark.crawl.round import CrawlEngine
from job_crawler_spark.functions.urls import py_canonicalize
from job_crawler_spark.sources import synth
from job_crawler_spark.streaming.crawl_stream import continuous_crawl


def _engine(spark, tmp_path):
    return CrawlEngine(
        spark=spark,
        catalog=Catalog(str(tmp_path / "wh")),
        robots=synth.robots_df(spark),
        round_seconds=3000,
        bloom_shards=8,
        bloom_bits=1 << 16,
        bloom_k=5,
    )


def _stage_seed_file(spark, ids, seed_dir: str, name: str) -> None:
    """One parquet file = one micro-batch of submitted seed URLs."""
    rows = [
        (synth.raw_url_for(i), 0, synth.priority_for(i), 0) for i in ids
    ]
    df = spark.createDataFrame(
        rows, "url string, depth int, priority double, round int"
    )
    staging = seed_dir + f"-stage-{name}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(seed_dir, exist_ok=True)
    part = glob.glob(os.path.join(staging, "*.parquet"))[0]
    shutil.copy(part, os.path.join(seed_dir, f"{name}.parquet"))
    shutil.rmtree(staging)


def test_continuous_crawl_ingests_and_rounds(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.bootstrap(synth.seed_frontier(spark, 100))
    eng.run(1)
    rounds_before = eng.next_round()

    seed_dir = str(tmp_path / "seeds")
    _stage_seed_file(spark, range(100, 150), seed_dir, "batch-a")
    _stage_seed_file(spark, range(150, 200), seed_dir, "batch-b")

    q = continuous_crawl(eng, seed_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()

    # two micro-batches -> two more engine rounds committed
    assert eng.next_round() == rounds_before + 2
    admitted = [s["admitted"] for s in eng.stats if "stream_batch" in s]
    assert len(admitted) == 2 and all(a > 0 for a in admitted)

    # every submitted seed is accounted for: pending or already crawled
    seen = {r.url_canon for r in eng.catalog.read(spark, eng.T_SEEN).collect()}
    pending = {
        r.url_canon for r in eng.catalog.read(spark, eng.T_FRONTIER).collect()
    }
    for i in range(100, 200):
        assert py_canonicalize(synth.raw_url_for(i)) in seen | pending, i

    # redelivery of the SAME seed batches (fresh streaming checkpoint =
    # simulated offset loss) must admit nothing: ingest is idempotent
    q2 = continuous_crawl(eng, seed_dir, str(tmp_path / "ckpt2"))
    q2.awaitTermination()
    admitted2 = [s["admitted"] for s in eng.stats if "stream_batch" in s][2:]
    assert admitted2 == [0, 0]


def test_ingest_seeds_idempotent_batch_level(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.bootstrap(synth.seed_frontier(spark, 50))
    eng.run(1)
    batch = spark.createDataFrame(
        [(synth.raw_url_for(i), 0, synth.priority_for(i), 0)
         for i in range(50, 80)],
        "url string, depth int, priority double, round int",
    )
    assert eng.ingest_seeds(batch) > 0
    assert eng.ingest_seeds(batch) == 0  # replay admits nothing
    # pinned frontier version reflects the append (next round reads it)
    fv, _, _ = eng._pinned_versions(eng.next_round())
    pending = {
        r.url_canon
        for r in eng.catalog.read(spark, eng.T_FRONTIER, version=fv).collect()
    }
    assert py_canonicalize(synth.raw_url_for(51)) in pending
