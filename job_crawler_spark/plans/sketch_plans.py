"""Gated sketch-synopsis queries: count-min heavy hitters + HyperLogLog
cardinality, each vs a DuckDB oracle that rebuilds the IDENTICAL sketch.

These gate the mergeable-summary operator class (operators/sketches.py):
the oracle parity is register-for-register, not just estimate-level — both
engines hash with md5, route with the same substring windows, and keep all
counter arithmetic in exact BIGINTs, so a single flipped register anywhere
fails the value hash. No reference counterpart (the reference keeps exact
SQLite counts, main.py:1035-1082).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round, stable_round_sql
from job_crawler_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    cms_cells,
    cms_estimates,
    cms_probes,
    hll_estimate,
    hll_numerator,
    hll_registers,
)

CMS_TOP_K = 20


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch over the documents token stream,
    reported next to exact counts so the CMS guarantee (est >= true,
    overestimate bounded by collisions) is VISIBLE in the gated output.

    Scale shape: the token stream collapses to a term-frequency frame (one
    map-side-combined shuffle — at 100 TB this is the only corpus-sized
    exchange, and a real deployment would skip even that by feeding raw
    occurrences straight into the cell aggregate); the sketch itself is a
    <= depth*width cell grid built by a second tiny hash aggregate and
    BROADCAST back for point queries; top-k is TakeOrderedAndProject
    (bounded per-partition heaps, no global sort). The exact true_count
    column is gate-scale verification, not part of the production shape.
    """
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "token"
        )
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # tf feeds BOTH the cell build and the point queries; without a
    # checkpoint Spark executes the corpus scan + tf shuffle twice (once
    # per consumer). The checkpointed frame is vocab-sized.
    tf = tracked_local_checkpoint(tf)
    probes = cms_probes(tf)
    est = cms_estimates(probes, cms_cells(probes))
    out = (
        est.select(
            "token",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("est_count"), "token")
        .limit(CMS_TOP_K)
    )
    out._graft_checkpoints = [tf]
    return out


def _cms_sql() -> str:
    return f"""
        WITH toks AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                 AS token
          FROM documents
        ),
        tf AS (
          SELECT token, COUNT(*) AS cnt FROM toks
          WHERE token <> '' GROUP BY token
        ),
        probes AS (
          SELECT token, cnt, r,
                 CAST(('0x' || substring(
                     md5('cms' || CAST(r AS VARCHAR) || ':' || token), 1, 8))
                   AS BIGINT) % {CMS_WIDTH} AS col
          FROM tf, (VALUES (0),(1),(2),(3)) d(r)
        ),
        cells AS (
          SELECT r, col, CAST(SUM(cnt) AS BIGINT) AS cell
          FROM probes GROUP BY r, col
        ),
        est AS (
          SELECT p.token,
                 MIN(c.cell) AS est_count,
                 MAX(p.cnt) AS true_count
          FROM probes p JOIN cells c USING (r, col)
          GROUP BY p.token
        )
        SELECT token, est_count, true_count,
               est_count - true_count AS overestimate
        FROM est ORDER BY est_count DESC, token LIMIT {CMS_TOP_K}
    """


assert CMS_DEPTH == 4, "the oracle's VALUES list hard-codes 4 sketch rows"


def q_hll_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality: HyperLogLog estimate next
    to the exact count and the relative error — the gate shows the sketch
    AND how good it is. m=16 registers puts sf0.001 (15 users/type) in the
    linear-counting regime and sf0.01 (150 users/type) in the raw-estimate
    regime, so BOTH branches of the estimator are oracle-checked.

    Scale shape: registers are a map-side max-merged aggregate — the
    shuffle moves <= groups * 16 rows no matter the event count, which is
    the whole point vs an exact distinct exchange at 10^12 events. The
    exact count here is gate-scale verification (it shares the one
    distinct shuffle); production drops it and keeps only the register
    frame."""
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = ev.select(
        "event_type", F.col("user_id").cast("string").alias("k")
    ).distinct()
    # the distinct frame feeds BOTH the exact count (gate verification)
    # and the register build; checkpoint it so the events scan + distinct
    # exchange run once, not once per consumer
    d = tracked_local_checkpoint(d)
    exact = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    est = hll_estimate(
        hll_registers(d, F.col("k"), ["event_type"]), ["event_type"]
    )
    out = (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_exact",
            stable_round(F.col("hll_est"), 2).alias("hll_est"),
            stable_round(
                F.abs(F.col("hll_est") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_err"),
            "zero_registers",
        )
        .orderBy("event_type")
    )
    out._graft_checkpoints = [d]
    return out


def _hll_sql() -> str:
    numer = repr(hll_numerator(HLL_M))
    m = HLL_M
    raw = f"({numer} / CAST(total AS DOUBLE))"
    est = (
        f"CASE WHEN {raw} <= {2.5 * m} AND zeros > 0 "
        f"THEN {float(m)} * ln({float(m)} / zeros) "
        f"ELSE {raw} END"
    )
    return f"""
        WITH d AS (
          SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS k
          FROM events
        ),
        br AS (
          SELECT event_type,
                 CAST(('0x' || substring(md5(k), 1, 8)) AS BIGINT)
                   % {m} AS bucket,
                 CAST(('0x' || substring(md5(k), 9, 8)) AS BIGINT) AS h2
          FROM d
        ),
        r AS (
          SELECT event_type, bucket,
                 MAX(CASE WHEN h2 = 0 THEN 33
                          ELSE 33 - length(bin(h2)) END) AS max_rho
          FROM br GROUP BY event_type, bucket
        ),
        agg AS (
          SELECT event_type, COUNT(*) AS used,
                 CAST(SUM(1::BIGINT << (40 - max_rho)) AS BIGINT)
                   AS sum_scaled
          FROM r GROUP BY event_type
        ),
        e AS (
          SELECT event_type,
                 CAST({m} - used AS BIGINT) AS zeros,
                 sum_scaled
                   + CAST({m} - used AS BIGINT) * (1::BIGINT << 40) AS total
          FROM agg
        ),
        est AS (SELECT event_type, zeros, {est} AS hll_est FROM e),
        exact AS (
          SELECT event_type, COUNT(*) AS n_exact FROM d GROUP BY event_type
        )
        SELECT x.event_type, x.n_exact,
               {stable_round_sql("est.hll_est", 2)} AS hll_est,
               {stable_round_sql(
                   "abs(est.hll_est - x.n_exact) * 1.0 / x.n_exact", 4
               )} AS rel_err,
               est.zeros AS zero_registers
        FROM exact x JOIN est USING (event_type)
        ORDER BY event_type
    """


QUERIES = {
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "hll_user_cardinality": q_hll_user_cardinality,
}

ORACLES = {
    "cms_heavy_hitters": _cms_sql(),
    "hll_user_cardinality": _hll_sql(),
}
