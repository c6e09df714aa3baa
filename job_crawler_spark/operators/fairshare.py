"""Max-min fair budget allocation (water-filling) across hosts.

A crawl round has a GLOBAL fetch budget (fetcher-fleet capacity x round
length) and per-host demands (pending frontier URLs). Giving each host
its demand overshoots the budget; giving each host budget/n strands
small hosts' surplus. The classic answer is max-min fairness via
progressive filling (Bertsekas & Gallager, "Data Networks" §6.5.2):
raise one common waterline ``t`` and give every host
``min(demand, t)``, with ``t`` the largest level the budget covers. No
host can get more without taking from a host that already has less —
the politeness-budget analogue of fair link sharing. The reference
crawler never needs this (its single fetch loop drains sequentially,
reference main.py); a 10^10-URL frontier divided over a fetcher fleet
does.

Integer-exact contract: demands, budget, and the waterline are BIGINT;
``alloc = min(demand, t*)`` with

    t* = max { t >= 0 : sum_i min(d_i, t) <= B },

capped at max(d) when the budget covers every demand. The leftover
``B - sum_i min(d_i, t*)`` (strictly fewer units than there are
unsaturated hosts) is NOT +1-distributed — it is reported as ``spare``
and rolls into the next round's budget, which keeps the output a pure
function of the multiset of demands (no global host ordering, no tie
lottery) and therefore bit-reproducible on any engine.

Scale shape: the only host-shaped work is ONE map-side-combinable hash
aggregate (demand value -> host count + demand sum), checkpointed as a
value histogram that is Zipf-collapsed far below host cardinality.
The waterline search — running sums, segment candidates, the final
max — runs entirely over that histogram and reduces to one scalar row
that joins back by BROADCAST: the host frame is never globally sorted,
never single-partition-windowed, and never shuffled by the allocator
(plan-pinned in tests/test_fairshare.py). Derivation per distinct
value v_j (ascending): hosts below the segment are saturated
(``s_prev`` demand units), the ``m_prev`` hosts at or above v_j sit on
the waterline, so the best level inside segment [v_{j-1}, v_j) is
``floor((B - s_prev) / m_prev)`` — valid when it reaches the segment
floor, capped at the segment ceiling; the max over segments (plus the
budget-covers-everything case) is exactly t*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from job_crawler_spark.operators.checkpoints import tracked_local_checkpoint


def waterline(
    demands: DataFrame, *, budget: int, demand: str = "demand"
) -> DataFrame:
    """The 1-row waterline frame: ``t_star``, ``used``, ``spare``.

    ``demands`` carries one row per host with a non-negative BIGINT
    ``demand`` column (demand-0 rows are inert but allowed). The
    returned frame exposes ``_graft_checkpoints`` — release after the
    last action (operators/checkpoints.py contract).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    d = F.col(demand).cast("long")

    hist = tracked_local_checkpoint(
        demands.groupBy(d.alias("v")).agg(
            F.count(F.lit(1)).alias("cnt"), F.sum(d).alias("sumv")
        )
    )
    # Distinct-value frame: running totals BELOW each value v_j give the
    # candidate waterline of segment [v_{j-1}, v_j). SinglePartition is
    # correct HERE — this is the value histogram, not the host frame.
    below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    at_or_above = Window.orderBy("v").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    seg = hist.select(
        "v",
        F.coalesce(F.sum("sumv").over(below), F.lit(0)).alias("s_prev"),
        F.coalesce(F.lag("v").over(Window.orderBy("v")), F.lit(0)).alias(
            "v_prev"
        ),
        F.sum("cnt").over(at_or_above).alias("m_prev"),
    )
    # Valid when the budget reaches the segment floor
    # (floor((B - s_prev)/m_prev) >= v_prev), capped at the segment
    # ceiling v - 1; overfull segments cap low, segments past the
    # answer go NULL, so max() over rows is t* (modulo the full-cover
    # case handled below).
    cand = seg.select(
        F.when(
            F.lit(budget) >= F.col("s_prev") + F.col("v_prev") * F.col("m_prev"),
            F.least(
                # DIV: BIGINT-exact floor division (operands non-negative
                # under the when-guard) — no double rounding at any budget
                F.expr(f"(CAST({budget} AS BIGINT) - s_prev) DIV m_prev"),
                F.col("v") - F.lit(1),
            ),
        ).alias("c")
    )
    totals = hist.agg(
        F.coalesce(F.sum("sumv"), F.lit(0)).alias("s_total"),
        F.coalesce(F.max("v"), F.lit(0)).alias("v_max"),
    )
    t_star = (
        cand.agg(F.max("c").alias("c_max"))
        .crossJoin(F.broadcast(totals))
        .select(
            F.when(F.lit(budget) >= F.col("s_total"), F.col("v_max"))
            .otherwise(F.greatest(F.col("c_max"), F.lit(0)))
            .cast("long")
            .alias("t_star")
        )
    )
    used = hist.crossJoin(F.broadcast(t_star)).agg(
        F.coalesce(
            F.sum(F.least(F.col("v"), F.col("t_star")) * F.col("cnt")),
            F.lit(0),
        ).alias("used")
    )
    out = used.crossJoin(F.broadcast(t_star)).select(
        "t_star", "used", (F.lit(budget) - F.col("used")).alias("spare")
    )
    out._graft_checkpoints = [hist]
    return out


def waterfill_alloc(
    demands: DataFrame, *, budget: int, demand: str = "demand"
) -> DataFrame:
    """Input plus ``alloc`` (= min(demand, waterline)), ``saturated``
    (demand fully granted), and the scalar ``waterline``/``spare``
    columns attached by BROADCAST — the allocator never shuffles the
    host frame. Carries ``_graft_checkpoints``; release after the last
    action."""
    line = waterline(demands, budget=budget, demand=demand)
    d = F.col(demand).cast("long")
    out = (
        demands.crossJoin(F.broadcast(line))
        .withColumn("alloc", F.least(d, F.col("t_star")))
        .withColumn("saturated", d <= F.col("t_star"))
        .withColumnRenamed("t_star", "waterline")
    )
    out._graft_checkpoints = getattr(line, "_graft_checkpoints", [])
    return out


def py_waterfill(demands: list[int], budget: int) -> tuple[int, list[int], int]:
    """Brute-force replica for tests: scan t upward. Returns
    (t_star, allocs, spare)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    t = 0
    vmax = max(demands, default=0)
    while t < vmax and sum(min(x, t + 1) for x in demands) <= budget:
        t += 1
    allocs = [min(x, t) for x in demands]
    return t, allocs, budget - sum(allocs)
