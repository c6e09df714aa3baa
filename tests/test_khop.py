"""K-hop BFS goldens against a brute-force breadth-first oracle.

The gated query (plans/graph_plans.py:q_graph_khop_dist) is verified vs an
independent recursive-CTE SQL formulation at both gate scales; these
goldens pin the frontier/anti-join core on hand graphs the dense co-trade
data cannot exercise: a chain long enough to cross the hop cap (nodes at
dist > KHOP_MAX must be absent), an unreachable component, a shortcut edge
that must win the min-distance race against a longer path, a seed-only
isolated node (early-exit on empty frontier), and duplicate trade rows
(edge dedup).
"""

from __future__ import annotations

from collections import deque

from job_crawler_spark.operators.checkpoints import release_checkpoints
from job_crawler_spark.plans.graph_plans import (
    KHOP_MAX,
    KHOP_SEED_MOD,
    q_graph_khop_dist,
)


def _oracle(
    trades: list[tuple[int, int]], suppliers: list[int]
) -> dict[str, int]:
    """Brute-force BFS over the symmetric bipartite P/S graph."""
    adj: dict[str, set[str]] = {}
    for p, s in trades:
        a, b = f"P{p}", f"S{s}"
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {
        f"S{s}": 0 for s in suppliers if s % KHOP_SEED_MOD == 1
    }
    q = deque(dist)
    while q:
        n = q.popleft()
        if dist[n] == KHOP_MAX:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def _run(spark, tmp_path, trades, suppliers):
    spark.createDataFrame(
        trades, "l_partkey LONG, l_suppkey LONG"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(s,) for s in suppliers], "s_suppkey LONG"
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    df = q_graph_khop_dist(spark, str(tmp_path))
    got = {r["node"]: r["dist"] for r in df.collect()}
    release_checkpoints(df)
    return got


def test_hop_cap_and_unreachable_component(spark, tmp_path):
    # chain S1-P101-S2-P102-S3-P103-S4: S3 is at dist 4 > KHOP_MAX, so
    # S3/P103/S4 must be absent; S5-P104 is disconnected from the seed.
    trades = [(101, 1), (101, 2), (102, 2), (102, 3), (103, 3), (103, 4),
              (104, 5)]
    suppliers = [1, 2, 3, 4, 5]
    got = _run(spark, tmp_path, trades, suppliers)
    assert got == _oracle(trades, suppliers)
    assert got == {"S1": 0, "P101": 1, "S2": 2, "P102": 3}


def test_shortcut_wins_min_distance(spark, tmp_path):
    # same chain plus a direct trade (102, 1): P102 drops to dist 1 and
    # S3/P103/S4 come inside the cap through the shortcut.
    trades = [(101, 1), (101, 2), (102, 2), (102, 3), (103, 3), (103, 4),
              (102, 1)]
    suppliers = [1, 2, 3, 4]
    got = _run(spark, tmp_path, trades, suppliers)
    assert got == _oracle(trades, suppliers)
    assert got["P102"] == 1 and got["S3"] == 2 and got["P103"] == 3


def test_isolated_seed_early_exit(spark, tmp_path):
    # supplier 8 is a seed (8 % 7 == 1) with no trades: the first frontier
    # expansion is empty and the loop must exit with just the seed row.
    trades = [(101, 2)]
    suppliers = [2, 8]
    got = _run(spark, tmp_path, trades, suppliers)
    assert got == _oracle(trades, suppliers) == {"S8": 0}


def test_duplicate_trades_dedup_and_two_seeds(spark, tmp_path):
    # duplicate (p, s) rows collapse to one edge; seeds 1 and 8 both
    # label their own components.
    trades = [(101, 1), (101, 1), (101, 1), (201, 8), (201, 9)]
    suppliers = [1, 8, 9]
    got = _run(spark, tmp_path, trades, suppliers)
    assert got == _oracle(trades, suppliers)
    assert got == {"S1": 0, "P101": 1, "S8": 0, "P201": 1, "S9": 2}
