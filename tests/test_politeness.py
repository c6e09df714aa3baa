"""Politeness scheduler: robots, budgets, deterministic order, skew path."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.functions.urls import canonicalize_url_col, host_col
from job_crawler_spark.operators.politeness import py_schedule, schedule_batch
from job_crawler_spark.sources import synth


def _frontier_df(spark, n):
    df = synth.seed_frontier(spark, n)
    return (
        df.withColumn("url_canon", canonicalize_url_col(F.col("url")))
        .withColumn("host", host_col(F.col("url")))  # lowercase host
        .dropDuplicates(["url_canon"])
        .select("url_canon", "host", "depth", "priority", "round")
    )


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_spark_schedule_matches_oracle(spark):
    frontier = _frontier_df(spark, 800)
    robots = synth.robots_df(spark)
    got = schedule_batch(frontier, robots, round_seconds=20).collect()
    want = py_schedule(_rows(frontier), synth.robots_rows(), round_seconds=20)
    got_set = {(r.url_canon, r.host_rank) for r in got}
    want_set = {(r["url_canon"], r["host_rank"]) for r in want}
    assert got_set == want_set
    assert len(got) == len(want)


def test_denied_host_never_scheduled(spark):
    frontier = _frontier_df(spark, 2000)
    robots = synth.robots_df(spark)
    got = schedule_batch(frontier, robots, round_seconds=60).collect()
    hosts = {r.host for r in got}
    assert "talent.search.example" not in hosts  # deny: ["/"]


def test_budget_respected_per_host(spark):
    frontier = _frontier_df(spark, 2000)
    robots = synth.robots_df(spark)
    round_seconds = 10
    got = schedule_batch(frontier, robots, round_seconds=round_seconds).collect()
    from collections import Counter

    per_host = Counter(r.host for r in got)
    rules = {r["host"]: r["crawl_delay"] for r in synth.robots_rows()}
    for host, cnt in per_host.items():
        budget = max(1, round_seconds // rules.get(host, 1))
        assert cnt <= budget, (host, cnt, budget)


def test_rank_is_total_order_and_tie_broken_by_url(spark):
    # priorities are quantized to 1/64 in synth -> ties guaranteed at n=2000
    frontier = _frontier_df(spark, 2000)
    robots = synth.robots_df(spark)
    got = schedule_batch(frontier, robots, round_seconds=60).collect()
    by_host: dict[str, list] = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    saw_tie = False
    for host, items in by_host.items():
        items.sort(key=lambda r: r.host_rank)
        keys = [(-r.priority, r.url_canon) for r in items]
        assert keys == sorted(keys), host
        pr = [r.priority for r in items]
        saw_tie = saw_tie or len(set(pr)) < len(pr)
    assert saw_tie  # the determinism-under-ties case was actually exercised


def test_two_phase_equals_single_phase(spark):
    """Salted two-phase top-k must equal the unsalted global window."""
    frontier = _frontier_df(spark, 3000)
    robots = synth.robots_df(spark)
    salted = schedule_batch(frontier, robots, round_seconds=30, salt_buckets=32)
    unsalted = schedule_batch(frontier, robots, round_seconds=30, salt_buckets=1)
    a = {(r.url_canon, r.host_rank) for r in salted.collect()}
    b = {(r.url_canon, r.host_rank) for r in unsalted.collect()}
    assert a == b
