"""Anchor-text aggregation (operators/anchors.py): host-vote goldens,
tiebreak order, min_hosts/top_k boundaries, tokenization, plan shape.
The sf-fixture parity (vs the DuckDB regexp_split miner) runs in
test_oracle_parity.py via the anchor_profile gate."""

from __future__ import annotations

import pytest

from job_crawler_spark.operators.anchors import anchor_text_profile

# target T: host A says "red widget" twice (footer spam: one vote),
# hosts B and C say "blue widget" once each; target U: one host only
CORPUS = [
    ("A", "T", "red widget"),
    ("A", "T", "red widget"),
    ("B", "T", "blue widget"),
    ("C", "T", "Blue widget!"),
    ("B", "U", "lonely page"),
]


def _links(spark, rows=CORPUS):
    return spark.createDataFrame(
        rows, "src_host string, dst_url string, anchor_text string"
    )


def _profile(spark, rows=CORPUS, **kw):
    out = anchor_text_profile(_links(spark, rows), **kw)
    return [tuple(r) for r in out.orderBy("dst_url", "term_rank").collect()]


def test_host_votes_beat_mentions(spark):
    # widget: 3 hosts; blue: 2 hosts; red: 1 host but 2 mentions --
    # host votes rank first, so blue beats red despite equal mentions
    assert _profile(spark) == [
        ("T", "widget", 3, 4, 1),
        ("T", "blue", 2, 2, 2),
        ("T", "red", 1, 2, 3),
        ("U", "lonely", 1, 1, 1),
        ("U", "page", 1, 1, 2),
    ]


def test_mentions_break_host_ties_then_term(spark):
    rows = [
        ("A", "T", "x x y"),  # x: 1 host 2 mentions; y: 1 host 1 mention
        ("A", "T", "b a"),  # a,b tie everywhere -> term ASC
    ]
    got = _profile(spark, rows, top_k=4)
    assert got == [
        ("T", "x", 1, 2, 1),
        ("T", "a", 1, 1, 2),
        ("T", "b", 1, 1, 3),
        ("T", "y", 1, 1, 4),
    ]


def test_min_hosts_floor(spark):
    got = _profile(spark, min_hosts=2)
    assert got == [
        ("T", "widget", 3, 4, 1),
        ("T", "blue", 2, 2, 2),
    ]


def test_top_k_truncates(spark):
    got = _profile(spark, top_k=1)
    assert got == [("T", "widget", 3, 4, 1), ("U", "lonely", 1, 1, 1)]


def test_tokenization_case_punct_null(spark):
    rows = [
        ("A", "T", "  Ruby-on-Rails 7! "),
        ("B", "T", None),
        ("C", "T", "!!!"),
    ]
    got = _profile(spark, rows, top_k=10)
    assert [(r[1], r[2]) for r in got] == [
        ("7", 1), ("on", 1), ("rails", 1), ("ruby", 1),
    ]


def test_parameter_validation(spark):
    with pytest.raises(ValueError):
        anchor_text_profile(_links(spark), top_k=0)
    with pytest.raises(ValueError):
        anchor_text_profile(_links(spark), min_hosts=0)


def test_plan_shape(spark):
    """The top-k rank filter must push down as WindowGroupLimit, and the
    distinct-host count must come from the two-level aggregate, not a
    multi-distinct Expand."""
    out = anchor_text_profile(_links(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Expand" not in plan
