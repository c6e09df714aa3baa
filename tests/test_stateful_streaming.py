"""applyInPandasWithState operators: state must persist ACROSS micro-batches
(the whole point vs a stateless recompute), verified against a
single-process oracle over the same request sequence."""

from __future__ import annotations

import os

import pandas as pd
import pytest


def _write_batches(spark, src_dir: str, batches: list[list[tuple]]) -> None:
    """One parquet file per micro-batch, mtimes strictly increasing so the
    file stream source processes them in order."""
    os.makedirs(src_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "host string, url_canon string, req_ts double"
        )
        path = f"{src_dir}/batch-{i}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        # flatten: move the part file up as a stable name with ordered mtime
        part = next(p for p in os.listdir(path) if p.endswith(".parquet"))
        final = f"{src_dir}/b{i}.parquet"
        os.rename(f"{path}/{part}", final)
        os.utime(final, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    for i in range(len(batches)):
        import shutil

        shutil.rmtree(f"{src_dir}/batch-{i}", ignore_errors=True)


def _gate_oracle(batches: list[list[tuple]], delay: float) -> dict[str, float]:
    """Reference semantics in plain Python: per host, grants in (req_ts, url)
    order within each batch, last grant carried across batches."""
    last: dict[str, float] = {}
    grants: dict[str, float] = {}
    for rows in batches:
        per_host: dict[str, list[tuple]] = {}
        for h, u, ts in rows:
            per_host.setdefault(h, []).append((ts, u))
        for h, items in per_host.items():
            for ts, u in sorted(items):
                g = ts if h not in last else max(ts, last[h] + delay)
                last[h] = g
                grants[u] = g
    return grants


BATCHES = [
    [("a.com", "a/1", 0.0), ("a.com", "a/2", 0.0), ("b.com", "b/1", 0.0)],
    [("a.com", "a/3", 1.0), ("b.com", "b/2", 100.0)],
    [("a.com", "a/4", 1.5)],
]


@pytest.fixture(scope="module")
def gate_rows(spark, tmp_path_factory):
    from job_crawler_spark.streaming.stateful import politeness_gate

    tmp = tmp_path_factory.mktemp("gate")
    src = f"{tmp}/src"
    _write_batches(spark, src, BATCHES)
    stream = (
        spark.readStream.schema("host string, url_canon string, req_ts double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        politeness_gate(stream, crawl_delay_s=10.0)
        .writeStream.format("memory")
        .queryName("gate_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r.url_canon: r.granted_at for r in spark.table("gate_sink").collect()}


def test_gate_matches_oracle(gate_rows):
    expected = _gate_oracle(BATCHES, delay=10.0)
    assert gate_rows == expected


def test_gate_state_carries_across_batches(gate_rows):
    # a/3 arrives in batch 2 at t=1.0; a/2 was granted at t=10.0 in batch 1.
    # Only persisted state can push a/3 to 20.0 — stateless would grant 1.0.
    assert gate_rows["a/3"] == 20.0
    assert gate_rows["a/4"] == 30.0
    # independent host unaffected by a.com state
    assert gate_rows["b/2"] == 100.0


def test_followup_tracker_state(spark, tmp_path):
    from job_crawler_spark.streaming.stateful import followup_tracker

    day = 86400.0
    batches = [
        [(1, "applied", 0.0), (2, "applied", 0.0)],
        [(1, "applied", 8 * day), (2, "interview", 2 * day)],
        # app 1 heartbeats again past the timeout: the flag must NOT re-fire
        # (at most one alert per applied-spell, carried in state)
        [(1, "applied", 9 * day), (2, "interview", 20 * day)],
    ]
    src = f"{tmp_path}/src"
    os.makedirs(src)
    for i, rows in enumerate(batches):
        pd.DataFrame(rows, columns=["app_id", "status", "event_ts"]).to_parquet(
            f"{src}/b{i}.parquet"
        )
        os.utime(f"{src}/b{i}.parquet", (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema("app_id long, status string, event_ts double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        followup_tracker(stream, timeout_days=7.0)
        .writeStream.format("memory")
        .queryName("fu_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # app 1: still 'applied' 8 days after first_seen=0 -> needs follow-up;
    # exactly ONE alert fires (day-0 too recent, day-9 already flagged)
    got = spark.table("fu_sink").filter("app_id = 1 AND needs_follow_up").collect()
    assert len(got) == 1 and got[0].first_seen == 0.0
    # app 2 changed status at day 2 -> timer reset; day 20 is 18 days into
    # 'interview', but only 'applied' triggers the rule
    assert not spark.table("fu_sink").filter(
        "app_id = 2 AND needs_follow_up"
    ).collect()
