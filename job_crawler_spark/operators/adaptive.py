"""Adaptive (feedback) politeness: per-host crawl delays derived from
observed fetch behavior.

Static robots Crawl-delay is the host's self-declared floor; a production
scheduler ALSO backs off hosts that are observably slow or erroring — the
AIMD idea behind every polite crawler's adaptive rate controller (public
analogs: Heritrix's adaptive politeness ratio, Nutch's exponential
backoff). The reference crawler has a fixed per-source request pattern
(``main.py`` one API host, static pacing); at 10^8 hosts the observed
metrics ARE a table and the controller is one relational pass over it.

Decision math is integer-exact (the traps.py contract — no float
thresholds cross-engine or cross-run):

    delay(host) = clamp(base
                        + floor(p95_latency_ms / latency_step_ms)
                        + (err_penalty if 100*errors >= err_pct*n else 0),
                        base, max_delay)
    hosts with n < min_samples keep base (no evidence, no punishment)

p95 is the EXACT rank statistic (the value at row ceil(0.95 * n) of the
per-host ascending latency order) — not an approximate sketch, because
the controller output feeds budget math that must be reproducible across
engines and retries. The row picked among equal latencies is arbitrary,
but tied rows carry the SAME latency, so the emitted p95 value (and
therefore the delay) is deterministic regardless of tie order.

Scale shape: ONE hash exchange on host — the rank pick and the
error/sample counts are window functions over the same (host) partition,
so Spark chains them after a single shuffle; the output is
host-cardinality-sized and joins the robots rule frame broadcast-side
(``apply_derived_delays``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ADAPT_BASE_DELAY = 1
ADAPT_MAX_DELAY = 30
ADAPT_LATENCY_STEP_MS = 250
ADAPT_ERR_PCT = 5
ADAPT_ERR_PENALTY = 2
ADAPT_MIN_SAMPLES = 5


def derive_crawl_delays(
    metrics: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    ok_col: str = "fetch_ok",
    base_delay: int = ADAPT_BASE_DELAY,
    max_delay: int = ADAPT_MAX_DELAY,
    latency_step_ms: int = ADAPT_LATENCY_STEP_MS,
    err_pct: int = ADAPT_ERR_PCT,
    err_penalty: int = ADAPT_ERR_PENALTY,
    min_samples: int = ADAPT_MIN_SAMPLES,
) -> DataFrame:
    """(host, n_fetches, n_errors, p95_ms, crawl_delay) per observed host.

    NULL-latency rows count as samples (and possibly errors) but are
    ordered last, so they can only raise the p95 pick toward real slow
    fetches, never invent a latency; a host whose every latency is NULL
    gets p95_ms NULL and the latency term contributes 0.
    """
    w = Window.partitionBy("host")
    wo = w.orderBy(
        F.col("_lat").asc_nulls_last(), F.monotonically_increasing_id()
    )
    target = F.floor((95 * F.col("n") + 99) / 100)
    picked = (
        metrics.select(
            F.col(host_col).alias("host"),
            F.col(latency_col).alias("_lat"),
            F.col(ok_col).alias("_ok"),
        )
        .withColumn("_rn", F.row_number().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn(
            "errs", F.sum((~F.col("_ok")).cast("long")).over(w)
        )
        .filter(F.col("_rn") == target)
        .select(
            "host",
            F.col("n").alias("n_fetches"),
            F.col("errs").alias("n_errors"),
            F.col("_lat").alias("p95_ms"),
        )
    )
    lat_term = F.coalesce(
        F.floor(F.col("p95_ms") / latency_step_ms), F.lit(0)
    )
    err_term = F.when(
        100 * F.col("n_errors") >= err_pct * F.col("n_fetches"),
        F.lit(err_penalty),
    ).otherwise(F.lit(0))
    raw = F.lit(base_delay) + lat_term + err_term
    delay = F.when(
        F.col("n_fetches") < min_samples, F.lit(base_delay)
    ).otherwise(F.least(F.lit(max_delay), raw))
    return picked.select(
        "host",
        "n_fetches",
        "n_errors",
        "p95_ms",
        delay.cast("int").alias("crawl_delay"),
    )


def apply_derived_delays(robots: DataFrame, delays: DataFrame) -> DataFrame:
    """Merge derived delays into a ROBOTS_SCHEMA rule frame: the effective
    delay is max(declared, derived) — feedback may only slow a host down,
    never override its self-declared floor. Hosts unseen by metrics keep
    their declared delay; hosts with metrics but no robots row are NOT
    invented here (robots admission is the filter's contract). Broadcast
    join: both frames are host-cardinality-sized, and the rules frame is
    broadcast by every scheduler consumer anyway."""
    d = F.broadcast(
        delays.select("host", F.col("crawl_delay").alias("_derived"))
    )
    return (
        robots.join(d, "host", "left")
        .withColumn(
            "crawl_delay",
            F.greatest(
                F.col("crawl_delay"), F.coalesce(F.col("_derived"), F.lit(0))
            ),
        )
        .drop("_derived")
    )
