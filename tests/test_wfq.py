"""Weighted-fair-queueing interleave (operators/wfq.py): integer-exact
vft goldens, the proportional-interleave property, Spark-vs-pure-Python
schedule parity per shard, parallelism-invariance, divisibility
validation, and the no-SinglePartition/no-join/no-Python plan pin. The
sf-fixture oracle parity runs in test_oracle_parity.py via the
``wfq_schedule`` gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_crawler_spark.operators.ring import _md5_pos32, ring_vnodes
from job_crawler_spark.operators.wfq import py_wfq, wfq_schedule


def _batch(spark, rows):
    # (host, item, priority, weight); item doubles as the per-host tiebreak
    return spark.createDataFrame(
        rows, "host string, item string, priority long, weight long"
    )


def _schedule(spark, rows, *, n_shards=1, parallelism=None):
    df = _batch(spark, rows)
    if parallelism:
        df = df.repartition(parallelism)
    out = wfq_schedule(
        df,
        order=[F.col("priority").desc(), F.col("item").asc()],
        weight=F.col("weight"),
        n_shards=n_shards,
    )
    return sorted(
        (
            (r["shard"], r["slot"], r["host"], r["item"], r["host_rank"], r["vft"])
            for r in out.collect()
        ),
    )


def test_vft_golden_and_tie_interleave(spark):
    """A(w=2) x4 and B(w=1) x2, one shard: vft A = 420,840,1260,1680;
    vft B = 840,1680. Ties (840, 1680) break host-ASC, so the issue
    order is A1 A2 B1 A3 A4 B2 — B is spread through the round, not
    clumped at the end, and every prefix honors the 2:1 weight ratio
    to within one fetch."""
    rows = [("a.example.com", f"a{i}", 10 - i, 2) for i in range(1, 5)]
    rows += [("b.example.com", f"b{i}", 10 - i, 1) for i in range(1, 3)]
    got = _schedule(spark, rows)
    issue = [(slot, item, vft) for _, slot, _, item, _, vft in got]
    assert issue == [
        (1, "a1", 420),
        (2, "a2", 840),
        (3, "b1", 840),
        (4, "a3", 1260),
        (5, "a4", 1680),
        (6, "b2", 1680),
    ]


def test_matches_pure_python_replica_per_shard(spark):
    """4-shard schedule == py_wfq run independently on each shard's
    hosts (shard membership derived from the same md5 ring)."""
    hosts = [f"h{i}.example.com" for i in range(12)]
    weights = {h: (i % 4) + 1 for i, h in enumerate(hosts)}
    rows = [
        (h, f"{h}/p{j}", 100 - j, weights[h])
        for h in hosts
        for j in range(3)
    ]
    got = _schedule(spark, rows, n_shards=4)

    vn = ring_vnodes(4, 16)

    def shard_of(h):
        p = _md5_pos32(h)
        for pos, s in vn:
            if pos >= p:
                return s
        return vn[0][1]

    expect = []
    for s in range(4):
        members = sorted(h for h in hosts if shard_of(h) == s)
        per_host = [
            (h, f"{h}/p{j}", weights[h]) for h in members for j in range(3)
        ]
        for h, item, rank, vft, slot in py_wfq(per_host):
            expect.append((s, slot, h, item, rank, vft))
    assert got == sorted(expect)


def test_schedule_is_parallelism_invariant(spark):
    rows = [
        (f"h{i}.example.com", f"h{i}/p{j}", 50 - j, (i % 3) + 1)
        for i in range(8)
        for j in range(4)
    ]
    assert _schedule(spark, rows, n_shards=2, parallelism=1) == _schedule(
        spark, rows, n_shards=2, parallelism=7
    )


def test_py_wfq_rejects_non_divisor_weight():
    with pytest.raises(ValueError):
        py_wfq([("a", "x", 9)])  # 9 does not divide 840


def test_plan_no_global_window_no_join_no_python(spark):
    """Both windows are key-partitioned (host, then shard) — never
    SinglePartition — and the ring lookup is a literal-array projection:
    no joins, no Python anywhere."""
    df = wfq_schedule(
        _batch(spark, [("a.example.com", "x", 1, 1)]),
        order=[F.col("priority").desc(), F.col("item").asc()],
        weight=F.col("weight"),
        n_shards=4,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Join" not in plan
    assert "Python" not in plan
    assert plan.count("Window") >= 2
