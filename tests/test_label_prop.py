"""Synchronous label-propagation goldens on a hand graph.

Graph: a triangle {1,2,3} plus a disjoint edge {4,5}, fed through the
real lineitem->co-purchase path (order 10 buys parts 1,2,3; order 20
buys 4,5). Hand trace with init lbl(v)=v, neighbors-only mode, (count
DESC, label ASC) tie-break, 3 synchronous rounds:

round 1: 1 <- min(2,3)=2 | 2 <- min(1,3)=1 | 3 <- min(1,2)=1 | 4<->5 swap
round 2: 1 <- mode(1,1)=1 | 2 <- tie(2,1)->1 | 3 <- tie(2,1)->1 | swap back
round 3: all of {1,2,3} stay 1; {4,5} swap again -> 4:5, 5:4

The triangle converges to community label 1 (size 3); the bare edge
exhibits the classic synchronous-LP 2-cycle oscillation, landing on the
swapped state after an odd round count — deterministic by contract, and
exactly what the unrolled DuckDB oracle computes.
"""

from __future__ import annotations

from job_crawler_spark.plans.graph_plans import q_graph_label_prop


def test_triangle_converges_bare_edge_oscillates(spark, tmp_path):
    rows = [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    df = q_graph_label_prop(spark, str(tmp_path))
    got = [
        (r["node"], r["label"], r["community_size"]) for r in df.collect()
    ]
    assert got == [
        (1, 1, 3),
        (2, 1, 3),
        (3, 1, 3),
        (4, 5, 1),
        (5, 4, 1),
    ]
