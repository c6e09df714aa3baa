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


def part_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-purchase edge set as canonical (a < b) pairs:
    per-order baskets via ONE collect_set aggregate, i<j pair expansion
    as a JVM transform (the affinity-rules pattern; order baskets are
    tiny), one distinct shuffle. Shared by the triangle/clustering and
    label-propagation queries."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    ps = F.col("parts")
    return (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ps,
                        lambda x, i: F.transform(
                            F.slice(
                                ps,
                                i + 2,
                                F.greatest(F.size(ps) - i - 1, F.lit(0)),
                            ),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
    )


def q_graph_triangle_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the part
    co-purchase graph (parts sharing an order) — the subgraph-counting
    operator class (community structure), orthogonal to PageRank (global
    rank) and connected components (reachability).

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    WWW'11 / Cohen's MapReduce triangle counting) — every undirected edge
    points from its lower endpoint to its higher endpoint under the total
    order (degree, node), so each triangle materializes EXACTLY once as a
    wedge at its lowest-order apex plus one closing-edge lookup, and the
    wedge fan-out per node is bounded by the oriented out-degree —
    O(sqrt(m)) even for hub nodes. That bound is the whole scale story:
    the naive wedge count on an unoriented hub is O(d^2) with d unbounded,
    the oriented one cannot exceed O(m^(3/2)) total work on ANY graph.

    Shapes: per-order baskets via ONE collect_set aggregate, i<j pair
    expansion as a JVM transform (the affinity-rules pattern; order
    baskets are tiny), one distinct shuffle for the edge set, one degree
    aggregate, the wedge self-join + closing-edge equi-join on the
    checkpointed oriented frame, then one per-node count. All counts are
    exact integers; the coefficient ``2T / (d (d-1))`` is one division of
    exact operands (nodes in a triangle have d >= 2 — no zero guard
    needed), stable-rounded per the repo contract.

    The DuckDB oracle deliberately uses the INDEPENDENT formulation — a
    direct ``a < b < c`` triple self-join on the undirected edge list —
    so the orientation trick itself is what gets verified.
    """
    from job_crawler_spark.functions.compat import stable_round
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
    )

    edges = tracked_local_checkpoint(part_copurchase_edges(spark, sf_dir))

    # single pass over the edge set: explode both endpoints, not a
    # union of two projections (which would scan edges twice)
    deg = (
        edges.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg = tracked_local_checkpoint(deg)

    # total order (deg, node): orient every edge low -> high. The degree
    # frame is NODE-sized (n << m for any co-purchase graph) — broadcast
    # both tag joins so the edge frame never shuffles on a/b just to pick
    # up a 12-byte degree (guide §3.1; measured 0.65-1.3s -> 0.1-0.25s for
    # the orientation build at sf0.1). The checkpointed deg frame has no
    # stats, so the planner would otherwise default to sort-merge.
    ed = (
        edges.join(
            F.broadcast(
                deg.select(
                    F.col("node").alias("a"), F.col("deg").alias("da")
                )
            ),
            "a",
        )
        .join(
            F.broadcast(
                deg.select(
                    F.col("node").alias("b"), F.col("deg").alias("db")
                )
            ),
            "b",
        )
        .select(
            F.when(
                F.struct(F.col("da"), F.col("a"))
                < F.struct(F.col("db"), F.col("b")),
                F.struct(
                    F.col("a").alias("n"),
                    F.col("da").alias("d"),
                ),
            )
            .otherwise(F.struct(F.col("b").alias("n"), F.col("db").alias("d")))
            .alias("lo"),
            F.when(
                F.struct(F.col("da"), F.col("a"))
                < F.struct(F.col("db"), F.col("b")),
                F.struct(F.col("b").alias("n"), F.col("db").alias("d")),
            )
            .otherwise(F.struct(F.col("a").alias("n"), F.col("da").alias("d")))
            .alias("hi"),
        )
        .select(
            F.col("lo.n").alias("src"),
            F.col("hi.n").alias("dst"),
            F.col("lo.d").alias("sd"),
            F.col("hi.d").alias("dd"),
        )
    )
    ed = tracked_local_checkpoint(ed)

    # wedges at the apex: two out-edges of src, ordered by the same total
    # order so each unordered {u, w} appears once
    e1 = ed.select(
        F.col("src"),
        F.col("dst").alias("u"),
        F.col("dd").alias("ud"),
    )
    e2 = ed.select(
        F.col("src"),
        F.col("dst").alias("w"),
        F.col("dd").alias("wd"),
    )
    wedges = e1.join(e2, "src").filter(
        F.struct(F.col("ud"), F.col("u")) < F.struct(F.col("wd"), F.col("w"))
    )
    closing = ed.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["u", "w"]).select("src", "u", "w")

    # ONE pass over the triangle stream: exploding the 3 corners is
    # narrow; a union of three projections would re-execute the whole
    # wedge-join + closing-join pipeline three times (observed: the
    # union plan carried 12 SortMergeJoins, the explode plan 4)
    per_node = (
        tri.select(
            F.explode(
                F.array(F.col("src"), F.col("u"), F.col("w"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        per_node.join(F.broadcast(deg), "node")
        .select(
            F.col("node").alias("part"),
            "n_triangles",
            "deg",
            stable_round(
                (2 * F.col("n_triangles"))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy("part")
    )
    out._graft_checkpoints = [edges, deg, ed]
    return out


def _graph_triangle_sql() -> str:
    from job_crawler_spark.functions.compat import stable_round_sql

    coeff = stable_round_sql("(2 * n_triangles) * 1.0 / (deg * (deg - 1))", 6)
    return f"""
        WITH e AS (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        ),
        deg AS (
          SELECT node, COUNT(*) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
          ) GROUP BY node
        ),
        tri AS (
          SELECT e1.a, e1.b, e2.b AS c
          FROM e e1
          JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        per_node AS (
          SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
          ) GROUP BY node
        )
        SELECT p.node AS part, n_triangles, deg, {coeff} AS clustering_coeff
        FROM per_node p JOIN deg USING (node)
        ORDER BY part
    """


HITS_ITERS = 3


def q_graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over the
    DIRECTED supplier -> part trade graph (one edge per distinct
    (supplier, part) pair in ``lineitem``): suppliers act as hubs
    ("stocks many authoritative parts"), parts as authorities ("stocked
    by strong hub suppliers") — the mutually-reinforcing decomposition a
    focused crawler runs on the host graph to pick directory-like hub
    pages. A distinct fixed point from PageRank (``graph_authority_rank``
    — random-surfer stationary distribution, damping, dangling mass):
    HITS has two coupled score vectors and per-half-step L1
    normalization, no teleport.

    Output is the size-normalized ``hub_score = hub * n_nodes`` /
    ``auth_score = authority * n_nodes`` per node (uniform = 1.0).

    Scale shape (see operators/hits.py): both edge orientations cached
    once; per iteration only the node-sized score frames move plus one
    map-side-combined aggregate per half-step; L1 normalizers are 1-row
    broadcast aggregates. The oracle unrolls the identical three
    iterations as CTE stages with scalar-subquery normalizers; the only
    cross-engine divergence is summation order (ulps), absorbed by the
    6-digit stable round.
    """
    from job_crawler_spark.functions.compat import stable_round
    from job_crawler_spark.operators.hits import hits

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    edges = e0.select(
        F.concat(F.lit("S"), F.col("s").cast("string")).alias("src"),
        F.concat(F.lit("P"), F.col("p").cast("string")).alias("dst"),
    )
    scores = hits(edges, iterations=HITS_ITERS)
    nn = F.lit(float(scores._graft_n_nodes))
    out = scores.select(
        "node",
        stable_round(F.col("hub") * nn, 6).alias("hub_score"),
        stable_round(F.col("authority") * nn, 6).alias("auth_score"),
    ).orderBy("node")
    out._graft_checkpoints = scores._graft_checkpoints
    return out


def _graph_hits_sql() -> str:
    from job_crawler_spark.functions.compat import stable_round_sql

    stages = []
    prev_h = "h0"
    last_a = None
    for i in range(1, HITS_ITERS + 1):
        stages.append(
            f"""
        a{i}raw AS (
          SELECT e.dst AS node, SUM(h.hub) AS v
          FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst
        ),
        a{i} AS (
          SELECT n.node,
                 COALESCE(r.v, 0.0) / (SELECT SUM(v) FROM a{i}raw)
                   AS authority
          FROM nodes n LEFT JOIN a{i}raw r ON r.node = n.node
        ),
        h{i}raw AS (
          SELECT e.src AS node, SUM(a.authority) AS v
          FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
        ),
        h{i} AS (
          SELECT n.node,
                 COALESCE(r.v, 0.0) / (SELECT SUM(v) FROM h{i}raw) AS hub
          FROM nodes n LEFT JOIN h{i}raw r ON r.node = n.node
        )"""
        )
        prev_h = f"h{i}"
        last_a = f"a{i}"
    chain = ",".join(stages)
    hub = stable_round_sql("h.hub * (SELECT nn FROM cnt)", 6)
    auth = stable_round_sql("a.authority * (SELECT nn FROM cnt)", 6)
    return f"""
        WITH e0 AS (
          SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
        ),
        edges AS (
          SELECT 'S' || CAST(s AS VARCHAR) AS src,
                 'P' || CAST(p AS VARCHAR) AS dst FROM e0
        ),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        cnt AS (SELECT COUNT(*) AS nn FROM nodes),
        h0 AS (
          SELECT node, 1.0 / (SELECT nn FROM cnt) AS hub FROM nodes
        ),{chain}
        SELECT h.node, {hub} AS hub_score, {auth} AS auth_score
        FROM {prev_h} h JOIN {last_a} a ON a.node = h.node
        ORDER BY h.node
    """


KHOP_MAX = 3
KHOP_SEED_MOD = 7


def q_graph_khop_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-hop shortest path (BFS min-distance) from a seed set
    over the supplier<->part co-trade graph — the iterative frontier-
    traversal operator class (reachability WITH distance), orthogonal to
    PageRank (fixed-iteration value propagation), connected components
    (unlabelled fixed point), and triangles (local subgraph counting).
    Crawl counterpart: "every URL within K link-hops of the seed list,
    labelled by depth" — the frontier-depth computation a crawl scheduler
    runs to enforce a depth budget.

    Seeds are the deterministic supplier slice ``s_suppkey % 7 == 1``
    (non-empty at every gate scale); output is every node reachable within
    ``KHOP_MAX`` hops with its minimum hop distance.

    Scale shape: textbook frontier BFS. The corpus-sized edge frame is
    repartitioned on ``src`` ONCE and kept as a persisted frame
    (InMemoryRelation preserves partitioning — see operators/checkpoints
    tracked_persist), so each hop's expansion join shuffles ONLY the
    frontier side; per-hop work is O(frontier-adjacent edges), never
    O(corpus). Each new frontier is distinct-reduced, anti-joined against
    the visited set (at 10^10-frontier scale the anti-join's right side
    would first be pre-pruned by the engine's partitioned Bloom shards —
    operators/bloom.py — exactly the crawl loop's seen-filter shape), and
    localCheckpointed so lineage stays one hop deep instead of compounding
    across iterations. The hop loop is driver-side control flow with an
    early exit on an empty frontier — the per-hop ``isEmpty`` probe runs
    on an already-materialized checkpoint, so it costs no recompute.

    The DuckDB oracle is the INDEPENDENT formulation — a recursive CTE
    (``WITH RECURSIVE walk``) with MIN(dist) over all enumerated
    (node, dist<=K) pairs — so the frontier/anti-join machinery itself is
    what gets verified, not re-stated.
    """
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
        tracked_persist,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    pnode = F.concat(F.lit("P"), F.col("p").cast("string"))
    snode = F.concat(F.lit("S"), F.col("s").cast("string"))
    edges = e0.select(pnode.alias("src"), snode.alias("dst")).unionAll(
        e0.select(snode.alias("src"), pnode.alias("dst"))
    )
    edges = tracked_persist(edges.repartition("src"))

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    seeds = (
        sup.filter(F.col("s_suppkey") % KHOP_SEED_MOD == 1)
        .select(
            F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias(
                "node"
            )
        )
        .distinct()
    )
    frontier = tracked_local_checkpoint(seeds)
    cps = [edges, frontier]
    levels = [frontier.select("node", F.lit(0).cast("int").alias("dist"))]
    seen = frontier
    for hop in range(1, KHOP_MAX + 1):
        nbrs = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = nbrs.join(seen, "node", "left_anti")
        new = tracked_local_checkpoint(new)
        cps.append(new)
        if new.isEmpty():
            break
        levels.append(
            new.select("node", F.lit(hop).cast("int").alias("dist"))
        )
        seen = seen.unionAll(new)
        frontier = new
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    out = out.orderBy("node")
    out._graft_checkpoints = cps
    return out


def _graph_khop_sql() -> str:
    return f"""
        WITH RECURSIVE e0 AS (
          SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        edges AS (
          SELECT 'P' || CAST(p AS VARCHAR) AS src,
                 'S' || CAST(s AS VARCHAR) AS dst FROM e0
          UNION ALL
          SELECT 'S' || CAST(s AS VARCHAR), 'P' || CAST(p AS VARCHAR)
          FROM e0
        ),
        seeds AS (
          SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % {KHOP_SEED_MOD} = 1
        ),
        walk(node, dist) AS (
          SELECT node, 0 FROM seeds
          UNION
          SELECT e.dst, w.dist + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.dist < {KHOP_MAX}
        )
        SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
        FROM walk GROUP BY node ORDER BY node
    """


LP_ROUNDS = 3


def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara, Phys.
    Rev. E 2007) over the part co-purchase graph — the community-
    DETECTION operator class: mode-of-neighbors label updates find
    dense communities, orthogonal to connected components (pure
    reachability: CC fuses two dense clusters across a single bridge
    edge, LP keeps them separate) and to triangle counting (a per-node
    density statistic, not an assignment).
    ``LP_ROUNDS`` synchronous rounds; every node starts as its own
    label; each round every node adopts the most frequent label among
    its NEIGHBORS (self excluded) with the deterministic (count DESC,
    label ASC) tie-break — synchronous + total tie order makes the
    fixed round count exactly reproducible across engines (including
    the classic 2-cycle oscillation on a bare edge, which the golden
    pins). Output: (node, label, community_size).

    Scale shape: the edge set is built once and localCheckpointed; each
    round is the Pregel message pattern — join the node-sized label
    frame to the materialized adjacency on the neighbor key, one
    map-side-combinable (node, lbl) vote count, and a per-node
    WindowGroupLimit argmax (rank-1 filter pushes below the shuffle);
    the label frame is re-checkpointed per round so the iterative
    lineage stays flat (the pagerank/HITS precedent). Zero Python, no
    driver collects; per-round shuffle width is the node/vote frame,
    never the corpus.
    """
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
        tracked_persist,
    )

    edges = tracked_local_checkpoint(part_copurchase_edges(spark, sf_dir))
    ckpts = [edges]
    # the adjacency is joined on v every round — cache it partitioned +
    # sorted on the join key ONCE (InMemoryRelation preserves
    # partitioning/ordering; the pagerank edge-frame pattern), so each
    # round shuffles only the node-sized label frame
    adj = tracked_persist(
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .repartition("v")
        .sortWithinPartitions("v")
    )
    ckpts.append(adj)
    labels = tracked_local_checkpoint(
        adj.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    ckpts.append(labels)
    for _r in range(LP_ROUNDS):
        votes = (
            adj.join(
                labels.select(
                    F.col("node").alias("v"), F.col("lbl")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # argmax as a min_by HASH AGGREGATE over the lexicographic
        # (-n, lbl) struct — identical winner to the (n DESC, lbl ASC)
        # row_number rank-1 filter (lbl is unique per (node, lbl) vote
        # row, so the order is total) but map-side combinable and with
        # no per-partition sort (the first_wins_agg rationale)
        labels = tracked_local_checkpoint(
            votes.groupBy("node").agg(
                F.min_by(
                    "lbl",
                    F.struct(
                        (-F.col("n")).alias("nn"), F.col("lbl").alias("l")
                    ),
                ).alias("lbl")
            )
        )
        ckpts.append(labels)
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    out = (
        labels.join(sizes, "lbl")
        .select("node", F.col("lbl").alias("label"), "community_size")
        .orderBy("node")
    )
    out._graft_checkpoints = ckpts
    return out


def _graph_label_prop_sql(k: int = LP_ROUNDS) -> str:
    rounds = []
    prev = "l0"
    for r in range(1, k + 1):
        rounds.append(
            f"""
        v{r} AS (
          SELECT adj.u AS node, l.lbl, COUNT(*) AS n
          FROM adj JOIN {prev} l ON l.node = adj.v GROUP BY 1, 2
        ),
        l{r} AS (
          SELECT node, lbl FROM (
            SELECT node, lbl, ROW_NUMBER() OVER (
              PARTITION BY node ORDER BY n DESC, lbl ASC) AS rn
            FROM v{r}
          ) WHERE rn = 1
        )"""
        )
        prev = f"l{r}"
    chain = ",".join(rounds)
    return f"""
        WITH e0 AS (
          SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
        ),
        adj AS (
          SELECT a AS u, b AS v FROM e0
          UNION ALL SELECT b, a FROM e0
        ),
        l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj),{chain},
        sizes AS (
          SELECT lbl, COUNT(*) AS community_size FROM {prev} GROUP BY lbl
        )
        SELECT l.node, l.lbl AS label, s.community_size
        FROM {prev} l JOIN sizes s USING (lbl)
        ORDER BY node
    """


QUERIES = {
    "graph_authority_rank": q_graph_authority_rank,
    "graph_hits_scores": q_graph_hits_scores,
    "graph_triangle_coeff": q_graph_triangle_coeff,
    "graph_khop_dist": q_graph_khop_dist,
    "graph_label_prop": q_graph_label_prop,
}

ORACLES = {
    "graph_authority_rank": _graph_authority_sql(),
    "graph_hits_scores": _graph_hits_sql(),
    "graph_triangle_coeff": _graph_triangle_sql(),
    "graph_khop_dist": _graph_khop_sql(),
    "graph_label_prop": _graph_label_prop_sql(),
}
