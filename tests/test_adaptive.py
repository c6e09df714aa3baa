"""Adaptive politeness: exact-p95 delay derivation and robots merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.operators.adaptive import (
    apply_derived_delays,
    derive_crawl_delays,
)


def _metrics(spark, rows):
    return spark.createDataFrame(
        rows, "host STRING, latency_ms INT, fetch_ok BOOLEAN"
    )


def test_golden_delays(spark):
    rows = (
        # fast host: 20 fetches at 100 ms, no errors -> base delay 1
        [("fast.example", 100, True)] * 20
        # slow host: rank ceil(0.95*20)=19 lands on 900 ms
        # -> 1 + floor(900/250) = 4
        + [("slow.example", 100, True)] * 18
        + [("slow.example", 900, True)] * 2
        # flaky host: fast but 10% errors -> 1 + 0 + 2 = 3
        + [("flaky.example", 50, True)] * 18
        + [("flaky.example", 50, False)] * 2
    )
    got = {r.host: r for r in derive_crawl_delays(_metrics(spark, rows)).collect()}
    assert got["fast.example"].crawl_delay == 1
    assert (got["slow.example"].p95_ms, got["slow.example"].crawl_delay) == (900, 4)
    assert (got["flaky.example"].n_errors, got["flaky.example"].crawl_delay) == (2, 3)


def test_p95_rank_is_exact_ceiling(spark):
    # n=20 -> pick row ceil(0.95*20)=19 of the ascending order: with 18
    # fast rows and 2 slow rows the 19th IS slow; with 19 fast rows the
    # 19th is fast — one sample moves the boundary, pinning the rank math
    base = [("h.example", 10, True)] * 18 + [("h.example", 999, True)] * 2
    r = derive_crawl_delays(_metrics(spark, base)).collect()[0]
    assert r.p95_ms == 999
    base = [("h.example", 10, True)] * 19 + [("h.example", 999, True)]
    r = derive_crawl_delays(_metrics(spark, base)).collect()[0]
    assert r.p95_ms == 10


def test_error_rate_boundary_integer_exact(spark):
    # 100*errors >= 5*n: exactly 1 error in 20 trips the penalty,
    # 1 in 21 does not
    rows = [("h.example", 10, True)] * 19 + [("h.example", 10, False)]
    r = derive_crawl_delays(_metrics(spark, rows)).collect()[0]
    assert r.crawl_delay == 3
    rows = [("h.example", 10, True)] * 20 + [("h.example", 10, False)]
    r = derive_crawl_delays(_metrics(spark, rows)).collect()[0]
    assert r.crawl_delay == 1


def test_min_samples_and_clamp(spark):
    # 4 catastrophic samples < min_samples=5 -> base delay, no punishment
    rows = [("new.example", 99999, False)] * 4
    r = derive_crawl_delays(_metrics(spark, rows)).collect()[0]
    assert r.crawl_delay == 1
    # 5th sample crosses the floor; delay clamps at max_delay=30
    rows.append(("new.example", 99999, False))
    r = derive_crawl_delays(_metrics(spark, rows)).collect()[0]
    assert r.crawl_delay == 30


def test_null_latencies_never_invent_values(spark):
    rows = [("h.example", None, True)] * 10
    r = derive_crawl_delays(_metrics(spark, rows)).collect()[0]
    assert r.p95_ms is None and r.crawl_delay == 1


def test_apply_derived_delays_merges_conservatively(spark):
    robots = spark.createDataFrame(
        [
            ("a.example", 2, ["/"], []),
            ("b.example", 10, ["/"], []),
            ("c.example", 1, ["/"], []),
        ],
        "host STRING, crawl_delay INT, allow ARRAY<STRING>, deny ARRAY<STRING>",
    )
    rows = (
        [("a.example", 900, True)] * 20  # derived 4 > declared 2
        + [("b.example", 900, True)] * 20  # derived 4 < declared 10
    )
    merged = apply_derived_delays(
        robots, derive_crawl_delays(_metrics(spark, rows))
    )
    got = {r.host: r.crawl_delay for r in merged.collect()}
    # feedback only slows down; unseen hosts keep their declared delay
    assert got == {"a.example": 4, "b.example": 10, "c.example": 1}
    # rule columns survive for the downstream robots_filter
    assert set(merged.columns) == {"host", "crawl_delay", "allow", "deny"}


def test_single_exchange_plan(spark):
    rows = [("h.example", 10, True)] * 30
    df = derive_crawl_delays(_metrics(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
