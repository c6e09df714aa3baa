"""Host-level boilerplate detection/excision (operators/boilerplate.py):
verdict goldens on a hand-built hostile corpus (inclusive pct + min_docs
boundaries, same-doc repeats, single-doc host), excision accounting
(instance counts, line-order rebuild, all-boiler empty string), parameter
validation, plan shape. The sf-fixture parity (vs the DuckDB line miner)
runs in test_oracle_parity.py via the host_boilerplate gate."""

from __future__ import annotations

import pytest

from job_crawler_spark.operators.boilerplate import (
    boilerplate_verdicts,
    excise_boilerplate,
)
from job_crawler_spark.operators.checkpoints import release_checkpoints

# host H (4 docs): "nav" in 3/4 docs (75% -> boiler), "x" in 2/4 docs
# (50% -> inclusive pct boundary), everything else support 1; doc 2
# repeats "nav" twice (one support vote, two excised instances).
# host S (1 doc): "solo" is 100% of the host but support 1 < min_docs.
CORPUS = [
    ("H", 1, 1, "nav"),
    ("H", 1, 2, "y"),
    ("H", 1, 3, "y"),
    ("H", 1, 4, "x"),
    ("H", 1, 5, "z"),
    ("H", 2, 1, "nav"),
    ("H", 2, 2, "nav"),
    ("H", 2, 3, "x"),
    ("H", 3, 1, "nav"),
    ("H", 4, 1, "w"),
    ("S", 9, 1, "solo"),
]


def _lines(spark, rows=CORPUS):
    return spark.createDataFrame(
        rows, "host string, doc_id long, line_no long, line string"
    )


def _verdicts(spark, rows=CORPUS, **kw):
    v = boilerplate_verdicts(_lines(spark, rows), **kw)
    got = sorted(tuple(r) for r in v.collect())
    release_checkpoints(v)
    return got


def test_verdict_goldens(spark):
    assert _verdicts(spark) == [
        ("H", "nav", 3, 4, True),
        ("H", "w", 1, 4, False),
        ("H", "x", 2, 4, True),  # 2*100 >= 50*4: pct bound is inclusive
        ("H", "y", 1, 4, False),  # same-doc repeat = ONE support vote
        ("H", "z", 1, 4, False),
        ("S", "solo", 1, 1, False),  # 100% of host but support < min_docs
    ]


def test_min_docs_floor_boundary(spark):
    got = {(h, l): b for h, l, *_ , b in _verdicts(spark, min_docs=3)}
    assert got[("H", "nav")] is True  # support 3 >= 3: inclusive
    assert got[("H", "x")] is False  # support 2 < 3


def test_min_pct_boundary(spark):
    got = {(h, l): b for h, l, *_, b in _verdicts(spark, min_pct=75)}
    assert got[("H", "nav")] is True  # 300 >= 75*4: inclusive
    assert got[("H", "x")] is False  # 200 < 300
    strict = {
        (h, l): b for h, l, *_, b in _verdicts(spark, min_pct=76)
    }
    assert strict[("H", "nav")] is False  # 300 < 304


def test_excise_accounting(spark):
    lines = _lines(spark)
    v = boilerplate_verdicts(lines)
    out = excise_boilerplate(lines, v)
    got = {
        (r["host"], r["doc_id"]): (
            r["n_lines"],
            r["n_boiler"],
            r["boiler_ratio"],
            r["clean_text"],
        )
        for r in out.collect()
    }
    release_checkpoints(v)
    assert got[("H", 1)] == (5, 2, 0.4, "y y z")  # line_no order kept
    # same-doc repeat: every instance excised, all lines boiler -> ""
    assert got[("H", 2)] == (3, 3, 1.0, "")
    assert got[("H", 3)] == (1, 1, 1.0, "")
    assert got[("H", 4)] == (1, 0, 0.0, "w")
    assert got[("S", 9)] == (1, 0, 0.0, "solo")


def test_parameter_validation(spark):
    with pytest.raises(ValueError):
        boilerplate_verdicts(_lines(spark), min_docs=0)
    with pytest.raises(ValueError):
        boilerplate_verdicts(_lines(spark), min_pct=101)


def test_plan_shape(spark):
    """No Python stages, no cartesian anywhere; the excision join is an
    equi-join on (host, line)."""
    lines = _lines(spark)
    v = boilerplate_verdicts(lines)
    out = excise_boilerplate(lines, v)
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_checkpoints(v)
    assert "Python" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
