"""Freshness-driven revisit scheduling: golden histories, interval rule
edges, due projection, single-exchange plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.operators.revisit import due_urls, revisit_schedule

_SCHEMA = "url_canon STRING, round INT, content_hash STRING"


def _hist(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _by_url(df):
    return {r.url_canon: r for r in df.collect()}


def test_golden_histories(spark):
    rows = [
        # never changes after discovery: streak = n-1 = 3, interval 8
        ("u/stable", 1, "a"), ("u/stable", 2, "a"),
        ("u/stable", 3, "a"), ("u/stable", 4, "a"),
        # changes on the last fetch: streak 0, interval resets to base
        ("u/hot", 1, "a"), ("u/hot", 2, "b"), ("u/hot", 3, "c"),
        # change mid-history then stable: streak counts only the tail
        ("u/mid", 1, "a"), ("u/mid", 2, "b"),
        ("u/mid", 3, "b"), ("u/mid", 4, "b"),
        # single fetch: discovery only, streak 0
        ("u/new", 5, "a"),
        # A-B-A flip: a return to an OLD hash is still a change
        ("u/flip", 1, "a"), ("u/flip", 2, "b"), ("u/flip", 3, "a"),
    ]
    out = _by_url(revisit_schedule(_hist(spark, rows), 9, max_interval=64))

    s = out["u/stable"]
    assert (s.n_fetches, s.n_changes, s.stable_streak) == (4, 0, 3)
    assert (s.revisit_interval if hasattr(s, "revisit_interval")
            else s.interval) == 8
    assert (s.last_change_round, s.next_due, s.due) == (1, 12, False)

    h = out["u/hot"]
    assert (h.n_changes, h.stable_streak, h.interval) == (2, 0, 1)
    assert (h.last_change_round, h.next_due, h.due) == (3, 4, True)

    m = out["u/mid"]
    assert (m.n_changes, m.stable_streak, m.interval) == (1, 2, 4)
    assert (m.last_change_round, m.next_due, m.due) == (2, 8, True)

    n = out["u/new"]
    assert (n.n_fetches, n.n_changes, n.stable_streak, n.interval) == (1, 0, 0, 1)
    assert (n.last_change_round, n.next_due, n.due) == (5, 6, True)

    f = out["u/flip"]
    assert (f.n_changes, f.stable_streak, f.last_change_round) == (2, 0, 3)


def test_interval_caps(spark):
    # 10 unchanged fetches: streak 9 -> 2**9 = 512, capped at max_interval
    rows = [("u", r, "a") for r in range(1, 11)]
    row = revisit_schedule(_hist(spark, rows), 99, max_interval=16).first()
    assert (row.stable_streak, row.interval) == (9, 16)
    # base_interval scales the whole ladder before the cap
    row = revisit_schedule(
        _hist(spark, [("u", 1, "a"), ("u", 2, "a")]), 99,
        base_interval=3, max_interval=100,
    ).first()
    assert (row.stable_streak, row.interval, row.next_due) == (1, 6, 8)


def test_due_boundary_is_inclusive(spark):
    # next_due == current_round is due; current_round - 1 is not
    rows = [("u", 4, "a")]  # next_due = 5
    assert revisit_schedule(_hist(spark, rows), 5).first().due
    assert not revisit_schedule(_hist(spark, rows), 4).first().due


def test_due_urls_orders_by_volatility(spark):
    rows = [
        ("u/a", 1, "a"), ("u/a", 2, "b"), ("u/a", 3, "c"),  # 2 changes, due
        ("u/b", 1, "a"), ("u/b", 2, "b"),                   # 1 change, due
        ("u/c", 1, "a"), ("u/c", 2, "a"), ("u/c", 3, "a"),
        ("u/c", 4, "a"), ("u/c", 5, "a"),                   # streak 4, not due
    ]
    sched = revisit_schedule(_hist(spark, rows), 5)
    assert [r.url_canon for r in due_urls(sched).collect()] == ["u/a", "u/b"]


def test_engine_revisit_round_closes_the_loop(spark, tmp_path):
    """Policy -> mechanism: the engine schedules recrawls from its OWN mor
    docs history, force_recrawls the due URLs, and the refetched (stable,
    deterministic-content) copies push their intervals UP — observed
    adaptive backoff end-to-end."""
    from job_crawler_spark.catalog import Catalog
    from job_crawler_spark.crawl.round import CrawlEngine
    from job_crawler_spark.sources import synth

    eng = CrawlEngine(
        spark=spark,
        catalog=Catalog(str(tmp_path / "rw")),
        robots=synth.robots_df(spark),
        round_seconds=30,
        seen_filter="cuckoo",
        bloom_shards=8,
        cuckoo_buckets=1 << 10,
    )
    eng.bootstrap(synth.seed_frontier(spark, 120))
    eng.run(2)

    # every fetched URL has exactly one history row; with max_interval=1
    # all of them are due by the upcoming round
    sched = eng.revisit_due(max_interval=1).cache()
    assert sched.filter(F.col("n_fetches") != 1).count() == 0
    assert sched.filter(~F.col("due")).count() == 0
    n_docs = sched.count()
    sched.unpersist()

    res = eng.revisit_round(max_interval=1, budget=3, priority=50.0)
    assert res["recrawl"] == 3 and res["budget"] == 3

    # victims get refetched within a few rounds (per-host budgets may
    # stagger them); deterministic pages -> same span hash -> a pure
    # stable streak, so the adaptive interval DOUBLES off the refetch
    for _ in range(3):
        eng.run_round(eng.next_round())
    sched2 = eng.revisit_due(max_interval=64)
    twice = [r for r in sched2.collect() if r.n_fetches == 2]
    assert len(twice) == 3
    assert all(
        (r.n_changes, r.stable_streak, r.interval) == (0, 1, 2) for r in twice
    )
    assert n_docs >= 3


def test_engine_revisit_requires_mor(spark, tmp_path):
    from job_crawler_spark.catalog import Catalog
    from job_crawler_spark.crawl.round import CrawlEngine
    from job_crawler_spark.sources import synth

    eng = CrawlEngine(
        spark=spark,
        catalog=Catalog(str(tmp_path / "cw")),
        robots=synth.robots_df(spark),
        round_seconds=30,
        docs_mode="cow",
    )
    import pytest

    with pytest.raises(ValueError, match="mor"):
        eng.revisit_due()


def test_single_exchange_plan(spark):
    """The lag/row_number window and BOTH hash aggregates must share one
    hash exchange on url_canon — the groupBy reuses the window's
    partitioning (the operator's 10^10-row history claim)."""
    rows = [("u", r, "a") for r in range(1, 4)]
    plan = revisit_schedule(
        _hist(spark, rows), 9
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan, plan
