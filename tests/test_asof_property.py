"""Property test: the join-free as-of join vs a brute-force Python
reference — both directions, NULL timestamps on both sides, duplicate
right rows at equal (key, ts) resolved by greatest tiebreak. The r04
advice item (NULL right_ts rows being carried as matches) lives exactly
in this input space; hypothesis keeps it pinned from every angle the
hand cases in test_asof.py don't enumerate.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.operators.asof import asof_join

ts_or_null = st.one_of(st.none(), st.integers(0, 5))
left_rows = st.lists(
    st.tuples(st.integers(1, 2), ts_or_null, st.integers(0, 9)),
    min_size=1,
    max_size=8,
)
right_rows = st.lists(
    st.tuples(st.integers(1, 2), ts_or_null, st.integers(0, 9)),
    min_size=0,
    max_size=8,
)


def _py_asof(left, right, direction):
    out = []
    for k, lt, lv in left:
        match = None
        if lt is not None:
            if direction == "backward":
                cands = [
                    (rt, rv)
                    for (rk, rt, rv) in right
                    if rk == k and rt is not None and rt <= lt
                ]
                if cands:
                    best_ts = max(rt for rt, _ in cands)
                    match = max(rv for rt, rv in cands if rt == best_ts)
            else:
                cands = [
                    (rt, rv)
                    for (rk, rt, rv) in right
                    if rk == k and rt is not None and rt >= lt
                ]
                if cands:
                    best_ts = min(rt for rt, _ in cands)
                    match = max(rv for rt, rv in cands if rt == best_ts)
        out.append((k, lt, lv, match))
    return sorted(out, key=lambda r: tuple(-2 if x is None else x for x in r))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows, forward=st.booleans())
def test_asof_matches_bruteforce(spark, left, right, forward):
    direction = "forward" if forward else "backward"
    ldf = spark.createDataFrame(left, "k long, lt long, lv long")
    rdf = spark.createDataFrame(
        right, "k long, rt long, rv long"
    ) if right else spark.createDataFrame([], "k long, rt long, rv long")
    res = asof_join(
        ldf, rdf, on=["k"], left_ts="lt", right_ts="rt",
        right_cols=["rv"], direction=direction,
    )
    got = sorted(
        [(r["k"], r["lt"], r["lv"], r["rv"]) for r in res.collect()],
        key=lambda r: tuple(-2 if x is None else x for x in r),
    )
    assert got == _py_asof(left, right, direction)
