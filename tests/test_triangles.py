"""Triangle-count goldens against a brute-force triple-loop oracle.

The gated query (plans/graph_plans.py:q_graph_triangle_coeff) is verified
vs an independent SQL formulation at both gate scales; these goldens pin
the degree-ordered-orientation core on hand graphs the co-purchase data
cannot guarantee: a K4 (every wedge closes), a star plus one chord (hub
whose unoriented wedge count explodes but oriented count stays tiny),
duplicate basket rows (collect_set dedup), and a triangle-free component
that must be absent from the output.
"""

from __future__ import annotations

import math
from itertools import combinations

from job_crawler_spark.operators.checkpoints import release_checkpoints
from job_crawler_spark.plans.graph_plans import q_graph_triangle_coeff


def _rnd(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _oracle(baskets: dict[int, list[int]]) -> dict[int, tuple[int, int, float]]:
    """Brute-force: undirected edge set from basket pairs, then all
    node triples — O(n^3), fine for hand graphs."""
    edges = set()
    for parts in baskets.values():
        for a, b in combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    nodes = sorted({n for e in edges for n in e})
    deg = {n: 0 for n in nodes}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    tri_count = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in edges and (a, c) in edges and (b, c) in edges:
            for n in (a, b, c):
                tri_count[n] += 1
    return {
        n: (
            tri_count[n],
            deg[n],
            _rnd(2.0 * tri_count[n] / (deg[n] * (deg[n] - 1))),
        )
        for n in nodes
        if tri_count[n] > 0
    }


def _run(spark, tmp_path, baskets: dict[int, list[int]]):
    rows = [(ok, pk) for ok, parts in baskets.items() for pk in parts]
    spark.createDataFrame(
        rows, "l_orderkey LONG, l_partkey LONG"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    df = q_graph_triangle_coeff(spark, str(tmp_path))
    got = {
        r["part"]: (r["n_triangles"], r["deg"], r["clustering_coeff"])
        for r in df.collect()
    }
    release_checkpoints(df)
    return got


def test_k4_plus_triangle_free_component(spark, tmp_path):
    # order 4 forms a K4 (4 triangles, coeff 1.0 everywhere); order 3 is a
    # lone edge that must NOT appear in the output (no triangle membership).
    baskets = {
        1: [1, 2, 3],
        2: [2, 3, 4],
        3: [5, 6],
        4: [1, 2, 3, 4],
    }
    got = _run(spark, tmp_path, baskets)
    assert got == _oracle(baskets)
    assert got[1] == (3, 3, 1.0)
    assert 5 not in got and 6 not in got


def test_hub_star_with_one_chord(spark, tmp_path):
    # Star center 0 with 8 leaves, plus one leaf-leaf chord (1,2): exactly
    # one triangle {0,1,2}. Unoriented wedge count at the hub is C(8,2)=28;
    # the oriented algorithm only opens wedges at the LOW end of the order,
    # so the hub contributes none — the shape that makes it O(m^{3/2}).
    baskets = {10 + k: [0, k] for k in range(1, 9)}
    baskets[99] = [1, 2]
    got = _run(spark, tmp_path, baskets)
    want = _oracle(baskets)
    assert got == want
    assert got[0] == (1, 8, _rnd(2.0 / (8 * 7)))
    assert got[1] == (1, 2, 1.0)


def test_duplicate_basket_rows_do_not_multicount(spark, tmp_path):
    # The same part appearing twice in an order (two lineitems) and the
    # same pair appearing in many orders must yield ONE undirected edge.
    baskets = {
        1: [1, 1, 2, 2, 3],
        2: [1, 2, 3, 3],
        3: [1, 2],
    }
    got = _run(spark, tmp_path, baskets)
    assert got == _oracle(baskets)
    assert got[1] == (1, 2, 1.0)
