"""URL canonicalization: golden cases + Spark-vs-oracle equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.functions.urls import (
    canonicalize_url_col,
    host_col,
    py_canonicalize,
    py_host,
)
from job_crawler_spark.sources.synth import raw_url_for

CASES = [
    # (raw, canonical)
    (
        "https://Boards.MegaJobs.example/jobs/1?utm_source=x&q=eng&loc=ldn",
        "https://boards.megajobs.example/jobs/1?loc=ldn&q=eng",
    ),
    (
        "HTTPS://HOST.example/path?b=2&a=1#frag",
        "https://host.example/path?a=1&b=2",
    ),
    ("https://host.example", "https://host.example/"),
    (
        "https://host.example/p?fbclid=abc&gclid=x&utm_campaign=c",
        "https://host.example/p",
    ),
    (
        # tracking key only matches whole key, not prefix of a real key
        "https://host.example/p?reference=1&ref=2",
        "https://host.example/p?reference=1",
    ),
    ("http://a.example/x?z=1&y=2&z=0", "http://a.example/x?y=2&z=0&z=1"),
]


def test_python_oracle_goldens():
    for raw, want in CASES:
        assert py_canonicalize(raw) == want, raw


def test_spark_matches_oracle_on_goldens(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [
        r.c
        for r in df.select(canonicalize_url_col(F.col("url")).alias("c")).collect()
    ]
    assert got == [w for _, w in CASES]


def test_spark_matches_oracle_on_synthetic_frontier(spark):
    urls = [raw_url_for(i) for i in range(500)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonicalize_url_col(F.col("url")).alias("c"),
        host_col(F.col("url")).alias("h"),
    ).collect()
    for r in rows:
        assert r.c == py_canonicalize(r.url)
        assert r.h == py_host(r.url)


def test_duplicates_collapse():
    # synth: every 11th id duplicates id-1's canonical URL
    assert py_canonicalize(raw_url_for(11)) == py_canonicalize(raw_url_for(10))
    assert raw_url_for(11) != raw_url_for(10)
