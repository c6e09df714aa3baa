"""TPC-H-shaped anchor queries over the driver star schema.

These are the bench headliners: classic scan-heavy aggregate, selective
join, and top-k shapes whose plans must show pushed filters, pruned columns,
broadcast dims, and partial aggregation (checked in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round, stable_round_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan, selective date filter, 4-group hash agg.
    Whole plan is one scan + partial/final agg — zero joins, one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(F.sum(disc_price), 2).alias("sum_disc_price"),
            stable_round(F.sum(charge), 2).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q_PRICING_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           {stable_round_sql("SUM(l_quantity)", 2)} AS sum_qty,
           {stable_round_sql("SUM(l_extendedprice)", 2)} AS sum_base_price,
           {stable_round_sql("SUM(l_extendedprice * (1 - l_discount))", 2)}
               AS sum_disc_price,
           {stable_round_sql(
               "SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)}
               AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (broadcast customer dim), filtered on both
    sides, revenue agg, top-10. AQE picks broadcast for customer; lineitem
    never shuffles more than once."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q_TOP_REVENUE_SQL = f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {stable_round_sql("SUM(l_extendedprice * (1 - l_discount))", 2)}
               AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: snowflake join through two broadcast dims + regional agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


Q_NATION_REVENUE_SQL = f"""
    SELECT r_name, n_name,
           {stable_round_sql("SUM(l_extendedprice * (1 - l_discount))", 2)}
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def q_part_supplier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group: 3 cheapest parts per brand by retail price —
    the same two-phase-able rank pattern as the politeness scheduler."""
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rank")
        .orderBy("p_brand", "rank")
    )


Q_PART_TOPK_SQL = """
    WITH ranked AS (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice ASC, p_partkey ASC) AS rank
      FROM part
    )
    SELECT p_brand, p_partkey, p_retailprice, rank FROM ranked
    WHERE rank <= 3 ORDER BY p_brand, rank
"""


def q_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: scan-only forecast — every predicate must reach the parquet
    reader (range filters on date/discount/quantity), zero joins, scalar agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q_REVENUE_DELTA_SQL = f"""
    SELECT {stable_round_sql("SUM(l_extendedprice * l_discount)", 2)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: fact-dim join (broadcast part) + conditional-aggregate
    ratio. The CASE lives inside the agg so it's one pass, map-side combined."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            stable_round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q_PROMO_REVENUE_SQL = f"""
    SELECT {stable_round_sql(
        "100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)"
        " / SUM(l_extendedprice * (1 - l_discount))", 4)}
               AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


BIG_ORDER_QTY = 300


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: aggregate-then-join. The HAVING aggregate runs FIRST so
    only qualifying orderkeys (~0.1%) reach the join — never join-then-
    aggregate, which would shuffle the whole fact table twice."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(stable_round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > BIG_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        .limit(20)
    )


Q_BIG_ORDERS_SQL = f"""
    WITH big AS (
      SELECT l_orderkey, {stable_round_sql("SUM(l_quantity)", 2)} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {stable_round_sql("SUM(l_quantity)", 2)} > {BIG_ORDER_QTY}
    )
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region -> nation -> total): multi-level aggregation in ONE
    pass — Spark's Expand operator fans each row into its grouping sets
    before the hash agg, so the cube costs one shuffle, not three queries."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


Q_ROLLUP_REVENUE_SQL = f"""
    SELECT r_name, n_name,
           {stable_round_sql("SUM(l_extendedprice * (1 - l_discount))", 2)}
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE + GROUPING() — the full-lattice companion to
    tpch_rollup_revenue (ROLLUP covers only the hierarchy's prefixes;
    CUBE adds the cross-slices, here the per-priority totals across
    statuses). One Expand + one hash-agg shuffle, exactly like rollup —
    the 4 grouping sets cost a 4x map-side fan-out, never 4 scans.
    grouping_id() is emitted so NULL-as-subtotal rows are
    distinguishable from NULL data values — both engines use the
    SQL-standard bit encoding (first grouping column = most significant
    bit), which the oracle's native GROUPING() call cross-checks."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid").asc(),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q_STATUS_CUBE_SQL = f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {stable_round_sql("SUM(o_totalprice)", 2)} AS total_price,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST,
             o_orderpriority ASC NULLS FIRST
"""


def q_late_ship_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders with at least one
    lineitem shipped >60 days after the order date. Catalyst plans the
    EXISTS as a LEFT SEMI join (one probe per order, no fan-out), then a
    partial/final count agg."""
    o = _t(spark, sf_dir, "orders").alias("o")
    li = _t(spark, sf_dir, "lineitem").alias("l")
    late = F.col("l.l_shipdate") > (
        F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & late,
               "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q_LATE_SHIP_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated SCALAR subquery — revenue of lineitems
    whose quantity is below 20% of that part's average quantity. The
    correlated AVG decorrelates to a per-part window average (one shuffle
    on l_partkey), never a per-row subquery execution. Exact across
    engines: quantities are integer-valued doubles, so AVG = exact-sum /
    exact-count is bit-identical and the 0.2x filter can't flip."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    from pyspark.sql import Window

    j = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#13")
                    .select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    )
    avg_q = F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        j.withColumn("__avg_q", avg_q)
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_q"))
        .agg(
            stable_round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


Q_SMALL_QTY_SQL = f"""
    SELECT {stable_round_sql("SUM(l_extendedprice) / 7.0", 2)} AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)
"""


def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin with join — for each brand, the
    supplier quoting the lowest observed price, fully tie-broken
    (price, s_name, l_orderkey, l_linenumber) so the winner is unique and
    engine-independent. Window rank over at most |lineitem x part-match|
    rows, supplier dim broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    j = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sup.select("s_suppkey", "s_name")),
              li.l_suppkey == F.col("s_suppkey"))
        .select("p_brand", F.col("l_extendedprice").alias("price"),
                "s_name", "l_orderkey", "l_linenumber")
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("price").asc(), F.col("s_name").asc(),
        F.col("l_orderkey").asc(), F.col("l_linenumber").asc(),
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", "price", "s_name")
        .orderBy("p_brand")
    )


Q_MIN_PRICE_SQL = """
    WITH j AS (
      SELECT p_brand, l_extendedprice AS price, s_name,
             l_orderkey, l_linenumber
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY price ASC, s_name ASC, l_orderkey ASC,
                        l_linenumber ASC) AS rn
      FROM j
    )
    SELECT p_brand, price, s_name FROM r WHERE rn = 1 ORDER BY p_brand
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance similarity self-join over the distinct part
    names: every unordered name pair within levenshtein distance 2, with
    each name's part count — character-level fuzzy matching (typo'd /
    template-drifted names), the class the token-set dedup family
    (MinHash/SimHash/word-shingle Jaccard) cannot express.

    Built on :func:`editdist_join` (q-gram prefix filter, Ed-Join shape —
    see operators/editdist.py for the scale analysis): the only
    corpus-sized shuffles are the signature build, the signature-bucket
    equi-join, and the pair distinct — never a cartesian or nested-loop
    join (plan-pinned). The oracle is the naive quadratic join, fine at
    gate scale, so any pair the prefix filter missed (or invented) is a
    hash mismatch."""
    from job_crawler_spark.operators.editdist import editdist_join

    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    pairs = editdist_join(names, "p_name", max_dist=2)
    out = (
        pairs.join(
            names.select(
                F.col("p_name").alias("p_name_a"),
                F.col("n_parts").alias("n_parts_a"),
            ),
            "p_name_a",
        )
        .join(
            names.select(
                F.col("p_name").alias("p_name_b"),
                F.col("n_parts").alias("n_parts_b"),
            ),
            "p_name_b",
        )
        .select(
            F.col("p_name_a").alias("name_a"),
            F.col("p_name_b").alias("name_b"),
            F.col("dist").cast("long").alias("dist"),
            "n_parts_a",
            "n_parts_b",
        )
        .orderBy("name_a", "name_b")
    )
    out._graft_checkpoints = getattr(pairs, "_graft_checkpoints", [])
    return out


Q_FUZZY_NAME_PAIRS_SQL = """
WITH names AS (
    SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a,
       b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist,
       a.n_parts AS n_parts_a,
       b.n_parts AS n_parts_b
FROM names a
JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY name_a, name_b
"""


QUERIES = {
    "tpch_pricing_summary": q_pricing_summary,
    "tpch_late_ship_exists": q_late_ship_exists,
    "tpch_small_qty_revenue": q_small_qty_revenue,
    "tpch_min_price_supplier": q_min_price_supplier,
    "tpch_top_revenue_orders": q_top_revenue_orders,
    "tpch_nation_revenue": q_nation_revenue,
    "part_brand_topk": q_part_supplier_topk,
    "tpch_revenue_delta": q_revenue_delta,
    "tpch_promo_revenue": q_promo_revenue,
    "tpch_big_orders": q_big_orders,
    "tpch_rollup_revenue": q_rollup_revenue,
    "tpch_status_cube": q_status_cube,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
}

ORACLES = {
    "tpch_pricing_summary": Q_PRICING_SQL,
    "tpch_late_ship_exists": Q_LATE_SHIP_SQL,
    "tpch_small_qty_revenue": Q_SMALL_QTY_SQL,
    "tpch_min_price_supplier": Q_MIN_PRICE_SQL,
    "tpch_top_revenue_orders": Q_TOP_REVENUE_SQL,
    "tpch_nation_revenue": Q_NATION_REVENUE_SQL,
    "part_brand_topk": Q_PART_TOPK_SQL,
    "tpch_revenue_delta": Q_REVENUE_DELTA_SQL,
    "tpch_promo_revenue": Q_PROMO_REVENUE_SQL,
    "tpch_big_orders": Q_BIG_ORDERS_SQL,
    "tpch_rollup_revenue": Q_ROLLUP_REVENUE_SQL,
    "tpch_status_cube": Q_STATUS_CUBE_SQL,
    "fuzzy_name_pairs": Q_FUZZY_NAME_PAIRS_SQL,
}
