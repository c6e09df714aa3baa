"""Graph / link-analysis plans: iterative fixed-point computation as a
gated, DuckDB-oracle-checked operator class.

The reference crawler prioritizes URLs by depth/recency only
(``main.py`` has no link-analysis counterpart); real crawl schedulers
weight the frontier by link authority. ``graph_authority_rank``
demonstrates the operator on a graph derived relationally from the gate
tables — the bipartite co-trade graph (supplier <-> part edges from
``lineitem``) — because the synthetic corpus carries no hyperlinks; the
plan shape is identical for a 10^9-node host graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_crawler_spark.operators.pagerank import pagerank

GRAPH_DAMPING = 0.85
GRAPH_ITERS = 3


def q_graph_authority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the supplier<->part co-trade graph:
    nodes ``P<partkey>`` / ``S<suppkey>``, one symmetric edge pair per
    distinct (part, supplier) trade in ``lineitem``. Output is the
    size-normalized authority ``rank * n_nodes`` (uniform = 1.0) per node.

    Scale shape (see operators/pagerank.py): the corpus-sized edge frame
    is partitioned by src ONCE and checkpointed; each of the 3 power
    steps shuffles only the node-sized rank frame plus one map-side-
    combined contribution aggregate — the Pregel message-combine pattern.
    Symmetric edges mean every node has out-degree >= 1, so this graph
    has no dangling mass (the operator's uniform redistribution is
    exercised by tests/test_pagerank.py on a hand graph instead). The
    oracle unrolls the identical three iterations as CTE stages; the only
    cross-engine divergence is summation order (ulps), absorbed by the
    6-digit stable round."""
    from job_crawler_spark.functions.compat import stable_round

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    pnode = F.concat(F.lit("P"), F.col("p").cast("string"))
    snode = F.concat(F.lit("S"), F.col("s").cast("string"))
    edges = e0.select(pnode.alias("src"), snode.alias("dst")).unionAll(
        e0.select(snode.alias("src"), pnode.alias("dst"))
    )
    ranks = pagerank(edges, iterations=GRAPH_ITERS, damping=GRAPH_DAMPING)
    out = ranks.select(
        "node",
        stable_round(
            F.col("rank") * F.lit(float(ranks._graft_n_nodes)), 6
        ).alias("authority"),
    ).orderBy("node")
    out._graft_checkpoints = ranks._graft_checkpoints
    return out


def _graph_authority_sql() -> str:
    from job_crawler_spark.functions.compat import stable_round_sql

    d = repr(GRAPH_DAMPING)
    omd = repr(1.0 - GRAPH_DAMPING)
    stages = []
    prev = "r0"
    for i in range(1, GRAPH_ITERS + 1):
        stages.append(
            f"""
        c{i} AS (
          SELECT e.dst AS node, SUM(r.rank / e.out_deg) AS m
          FROM ed e JOIN {prev} r ON r.node = e.src GROUP BY e.dst
        ),
        r{i} AS (
          SELECT n.node,
                 {omd} / (SELECT nn FROM cnt)
                 + {d} * COALESCE(c{i}.m, 0.0) AS rank
          FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
        )"""
        )
        prev = f"r{i}"
    chain = ",".join(stages)
    return f"""
        WITH e0 AS (
          SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        edges AS (
          SELECT 'P' || CAST(p AS VARCHAR) AS src,
                 'S' || CAST(s AS VARCHAR) AS dst FROM e0
          UNION ALL
          SELECT 'S' || CAST(s AS VARCHAR), 'P' || CAST(p AS VARCHAR)
          FROM e0
        ),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        deg AS (
          SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
        ),
        ed AS (SELECT e.src, e.dst, d.out_deg
               FROM edges e JOIN deg d ON d.src = e.src),
        cnt AS (SELECT COUNT(*) AS nn FROM nodes),
        r0 AS (
          SELECT node, 1.0 / (SELECT nn FROM cnt) AS rank FROM nodes
        ),{chain}
        SELECT node,
               {stable_round_sql(
                   f"rank * (SELECT nn FROM cnt)", 6)} AS authority
        FROM {prev} ORDER BY node
    """


QUERIES = {
    "graph_authority_rank": q_graph_authority_rank,
}

ORACLES = {
    "graph_authority_rank": _graph_authority_sql(),
}
