"""Association-rule mining goldens: hand-built baskets with known joint
counts, checked against a pure-Python replica (third engine)."""

from __future__ import annotations

from datetime import datetime

from job_crawler_spark.operators.checkpoints import release_checkpoints
from job_crawler_spark.plans.analytics_plans import q_event_affinity_rules


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, 0, 0, i % 60), u, t, 1.0, "{}")
            for i, (u, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_affinity_rules_golden(spark, tmp_path):
    # baskets: u1={a,b,c}, u2={a,b}, u3={b,c}, u4={a}, u5={d}
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup (1, a) must not count
        (2, "a"), (2, "b"),
        (3, "b"), (3, "c"),
        (4, "a"),
        (5, "d"),
    ]
    _write_events(spark, tmp_path, rows)
    df = q_event_affinity_rules(spark, str(tmp_path))
    got = {(r.a, r.b): r for r in df.collect()}
    release_checkpoints(df)

    # joint counts: ab=2 (u1,u2), ac=1 (u1), bc=2 (u1,u3); d pairs with none
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    n_users = 5
    marg = {"a": 3, "b": 3, "c": 2, "d": 1}
    joint = {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 2}

    def rnd(x: float) -> float:
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    for (a, b), n_ab in joint.items():
        r = got[(a, b)]
        assert (r.n_ab, r.n_a, r.n_b, r.n_users) == (
            n_ab,
            marg[a],
            marg[b],
            n_users,
        )
        assert r.support == rnd(n_ab / n_users)
        assert r.conf_a_b == rnd(n_ab / marg[a])
        assert r.conf_b_a == rnd(n_ab / marg[b])
        assert r.lift == rnd((n_ab / marg[a]) * (n_users / marg[b]))

    # lift semantics: ab co-occurs at independence rate? P(ab)=2/5 vs
    # P(a)P(b)=9/25 -> lift > 1; ac: 1/5 vs 6/25 -> lift < 1
    assert got[("a", "b")].lift > 1
    assert got[("a", "c")].lift < 1


def test_affinity_single_type_and_empty_overlap(spark, tmp_path):
    # every user has exactly one type: no pairs at all, empty result
    _write_events(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    df = q_event_affinity_rules(spark, str(tmp_path))
    assert df.count() == 0
    release_checkpoints(df)
