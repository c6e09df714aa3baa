"""Property test: synchronous LPA vs a pure-Python reference.

Random small order baskets over parts 1..6 generate dense/tied
co-purchase graphs — exactly where the (count DESC, label ASC)
tie-break and synchronous-update semantics could silently diverge.
The reference builds the distinct undirected edge set, runs 3
synchronous rounds of neighbors-only mode with the same tie-break,
and must match the engine node-for-node, including community sizes.
"""

from __future__ import annotations

import uuid
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.plans.graph_plans import LP_ROUNDS, q_graph_label_prop


def _py_lp(baskets: list[list[int]], rounds: int):
    edges = set()
    for parts in baskets:
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    lbl = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            votes = Counter(lbl[u] for u in adj[v])
            new[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lbl = new
    sizes = Counter(lbl.values())
    return [(v, lbl[v], sizes[lbl[v]]) for v in nodes]


baskets = st.lists(
    st.lists(st.integers(1, 6), min_size=1, max_size=4),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(bs=baskets)
def test_lpa_matches_python_reference(spark, tmp_path, bs):
    rows = [(i + 1, p) for i, parts in enumerate(bs) for p in parts]
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{sub}/lineitem.parquet")
    got = [
        (r["node"], r["label"], r["community_size"])
        for r in q_graph_label_prop(spark, sub).collect()
    ]
    assert got == _py_lp(bs, LP_ROUNDS)
