"""robots.txt source: group selection, rule semantics, politeness wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.sources.robots import parse_robots


def _docs(spark, rows):
    return spark.createDataFrame(rows, "host STRING, robots_txt STRING")


def _one(spark, txt, **kw):
    return parse_robots(_docs(spark, [("h.example", txt)]), **kw).collect()[0]


def test_star_group_parsed_decoy_groups_ignored(spark):
    txt = (
        "# banner comment\n"
        "User-agent: FancyBot\nDisallow: /\nCrawl-delay: 99\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /jobs\n"
        "Disallow: /admin\n"
        "Crawl-delay: 7\n"
        "\n"
        "User-agent: OtherBot\nDisallow: /other\n"
    )
    r = _one(spark, txt)
    assert r.allow == ["/jobs"]
    assert r.deny == ["/private", "/admin"]  # document order kept
    assert r.crawl_delay == 7


def test_case_insensitive_and_crlf(spark):
    txt = "USER-AGENT: *\r\ndisallow: /X\r\nALLOW: /y\r\nCRAWL-DELAY: 3\r\n"
    r = _one(spark, txt)
    assert r.deny == ["/X"] and r.allow == ["/y"] and r.crawl_delay == 3


def test_empty_disallow_dropped_and_defaults(spark):
    r = _one(spark, "User-agent: *\nDisallow:\nAllow: /\n")
    assert r.deny == [] and r.allow == ["/"]
    assert r.crawl_delay == 1  # scheduler default when absent
    # malformed delay degrades to the default, never raises (ANSI-safe)
    r = _one(spark, "User-agent: *\nCrawl-delay: soon\nDisallow: /a\n")
    assert r.crawl_delay == 1 and r.deny == ["/a"]


def test_no_matching_group_yields_empty_rules(spark):
    r = _one(spark, "User-agent: OtherBot\nDisallow: /\n")
    assert r.allow == [] and r.deny == [] and r.crawl_delay == 1
    # specific-agent parse of the same doc DOES see the rules
    r = _one(spark, "User-agent: OtherBot\nDisallow: /\n", agent="otherbot")
    assert r.deny == ["/"]


def test_consecutive_agent_lines_pin_documented_simplification(spark):
    # rules of a multi-agent group attach to the LAST listed agent only
    # (module docstring) — this pins the deviation so a future fix is loud
    txt = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    r = _one(spark, txt)
    assert r.deny == ["/x"]
    r = _one(spark, txt, agent="a")
    assert r.deny == []


def test_feeds_robots_filter_end_to_end(spark):
    from job_crawler_spark.operators.politeness import robots_filter

    rules = parse_robots(
        _docs(
            spark,
            [
                ("a.example", "User-agent: *\nDisallow: /private\nAllow: /\n"),
                ("b.example", "User-agent: *\nDisallow: /\n"),
            ],
        )
    )
    frontier = spark.createDataFrame(
        [
            ("https://a.example/jobs/1", "a.example"),
            ("https://a.example/private/x", "a.example"),
            ("https://b.example/jobs/2", "b.example"),
        ],
        "url_canon STRING, host STRING",
    )
    kept = {r.url_canon for r in robots_filter(frontier, rules).collect()}
    assert kept == {"https://a.example/jobs/1"}


def test_plan_is_narrow_no_python_no_exchange(spark):
    df = parse_robots(_docs(spark, [("h", "User-agent: *\nAllow: /\n")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
