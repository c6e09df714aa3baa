"""Weighted-fair-queueing interleave: the fetch-slot schedule.

``schedule_batch`` (operators/politeness.py) decides WHICH URLs a host
may fetch this round; this operator decides in WHAT ORDER the selected
batch is issued. A naive order (all of host A, then all of host B)
serializes each host's crawl-delay waits and leaves the fetcher idle;
the classic fix is weighted fair queueing (Demers/Keshav/Shenker
SIGCOMM '89): host ``h`` with weight ``w_h`` gets its ``r``-th fetch a
*virtual finish time* ``r / w_h``, and the schedule issues fetches in
vft order — every prefix of the schedule then serves hosts in
proportion to their weights to within one fetch, which is exactly the
"spread one hot host across the round instead of clumping it" property
a politeness-bound fetcher wants. The reference's miniature ancestor
is its sequential per-source loop with `asyncio.sleep` between requests
(reference main.py fetch loop); WFQ is that loop's cluster-scale,
declarative equivalent.

Integer-exact: vft is computed as ``host_rank * (vft_scale // weight)``
in BIGINT, which equals ``r / w`` scaled by ``vft_scale`` EXACTLY when
every weight divides ``vft_scale`` — the documented contract
(``vft_scale`` defaults to 840 = lcm(1..8); weights are small integer
priorities). No float enters the sort key, so the schedule is
bit-reproducible across engines and parallelism levels.

Scale shape: TWO bounded-partition windows and nothing else —
(1) per-host rank in the caller's priority order (partitioned by host;
the input batch is already budget-capped, so a host contributes at most
``budget`` rows); (2) slot numbering per FETCHER SHARD (partitioned by
the md5-ring shard of the host — never a single-partition global
window; a global total order exists in the vft key itself and never
needs materializing). Plan-pinned in tests/test_wfq.py: no
SinglePartition window, no joins, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from job_crawler_spark.operators.ring import (
    _assign_expr,
    host_ring_pos,
    ring_vnodes,
)

DEFAULT_VFT_SCALE = 840  # lcm(1..8): every weight in 1..8 divides it


def wfq_schedule(
    batch: DataFrame,
    *,
    order: Sequence[Column],
    weight: Column,
    n_shards: int,
    n_replicas: int = 16,
    host: str = "host",
    vft_scale: int = DEFAULT_VFT_SCALE,
) -> DataFrame:
    """Interleave a budgeted fetch batch by weighted fair queueing.

    ``order`` is the per-host priority total order (e.g. priority DESC,
    url ASC); ``weight`` is the host's integer weight (every value must
    divide ``vft_scale`` — callers use small priorities 1..8 with the
    default scale). Returns the input plus ``host_rank``, ``vft``
    (scaled virtual finish time), ``shard`` (the host's consistent-hash
    fetcher shard, see operators/ring.py) and ``slot`` (1-based issue
    position within the shard: vft ASC, then host ASC, then host_rank —
    the host tiebreak makes equal-vft interleave deterministic).
    """
    w_host = Window.partitionBy(host).orderBy(*order)
    ranked = batch.withColumn("host_rank", F.row_number().over(w_host))
    # scale // weight: under the divisibility contract the quotient is an
    # exactly-representable integer, so floor() is the identity and the
    # whole key stays integer-valued end to end.
    per_unit = F.floor(F.lit(vft_scale) / weight.cast("long")).cast("long")
    vft = F.col("host_rank") * per_unit
    vnodes = ring_vnodes(n_shards, n_replicas)
    # successor lookup as the codegen CASE chain (see ring._assign_expr —
    # the literal-array + interpreted-filter form was the measured
    # bottleneck of the gated wfq_schedule query)
    shard = _assign_expr(host_ring_pos(F.col(host)), vnodes)
    with_keys = ranked.withColumn("vft", vft).withColumn("shard", shard)
    w_shard = Window.partitionBy("shard").orderBy(
        F.col("vft").asc(), F.col(host).asc(), F.col("host_rank").asc()
    )
    return with_keys.withColumn("slot", F.row_number().over(w_shard))


def py_wfq(
    rows: Sequence[tuple[str, str, int]],
    *,
    vft_scale: int = DEFAULT_VFT_SCALE,
) -> list[tuple[str, str, int, int, int]]:
    """Pure-Python replica for tests: rows are (host, item, weight) in
    per-host priority order; returns (host, item, host_rank, vft, slot)
    for a single shard, sorted by issue order."""
    ranks: dict[str, int] = {}
    keyed = []
    for h, item, w in rows:
        if vft_scale % w:
            raise ValueError(f"weight {w} does not divide vft_scale {vft_scale}")
        r = ranks.get(h, 0) + 1
        ranks[h] = r
        keyed.append((r * (vft_scale // w), h, r, item))
    keyed.sort()
    return [
        (h, item, r, vft, i + 1)
        for i, (vft, h, r, item) in enumerate(keyed)
    ]
