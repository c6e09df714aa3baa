"""Product/behavioral-analytics plans: five operator classes a general
analytics engine ships that none of the earlier gated queries exercise —
cohort retention matrices, Markov transition models, time-weighted
averages over irregular series, keyed snapshot diffs (CDC audit), and
distribution-drift scoring (KL divergence).

The reference crawler has no counterpart for any of these (its analytics
stop at the per-table aggregates of ``main.py``); they are part of the
"operations a large-scale training/product pipeline needs" surface this
engine grades on. Each query is DuckDB-oracle-checked under the repo's
determinism contract: integer arithmetic exact, single divisions of
exact integers emitted raw (IEEE division of identical operands is
bit-identical cross-engine), order-dependent double sums absorbed by
``stable_round``.

Scale notes (the 100 TB shape) are on each query's docstring; the common
theme is that every shuffle here is key-uniform (user_id / composite
group keys), every aggregate is map-side combinable, and the only
whole-frame windows run on post-aggregation frames whose size is bounded
by key cardinality (weeks x cohorts, event-type pairs, sources), never by
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round, stable_round_sql

# Snapshot cutoff for the CDC diff: the events table's mid-range. A real
# deployment diffs two Iceberg snapshot timestamps; the gate tables carry
# one fixed 30-day window (TESTDATA.md), so the cutoff is a constant.
SNAPSHOT_CUTOFF = "2024-01-16 00:00:00"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# 1. Cohort retention matrix


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users cohorted by the ISO week of their
    first event; one row per (cohort_week, week_offset) with the distinct
    active-user count and the retention ratio vs the cohort's size.

    Shape: distinct (user, week) -> one user_id window for the cohort min
    (no self-join back to the corpus) -> count per (cohort, offset). The
    distinct frame is at most |users| x |weeks| rows, so after the first
    projection nothing is corpus-sized; all three exchanges hash on
    uniform keys (user/week composites — no skew at 10^10 users). The
    cohort_size backfill is a window over the cohort-by-offset matrix
    (|weeks|^2 rows), not over user data. ``n_active`` is a plain COUNT:
    the frame is already distinct on (user, week) and (cohort_week,
    week_offset) is a function of that pair, so no countDistinct (and no
    distinct-expand) is needed.

    retention = n_active / cohort_size is one IEEE division of two exact
    longs — bit-identical cross-engine, emitted raw.
    """
    ev = _events(spark, sf_dir)
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).distinct()
    uc = uw.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    act = uc.groupBy(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    out = act.withColumn(
        "cohort_size",
        F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(
            Window.partitionBy("cohort_week")
        ),
    )
    return out.select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    ).orderBy("cohort_week", "week_offset")


Q_COHORT_RETENTION_SQL = """
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    uc AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM uw
    ),
    act AS (
      SELECT cohort_week,
             CAST(datediff('day', cohort_week, week) / 7 AS INT)
               AS week_offset,
             COUNT(*) AS n_active
      FROM uc GROUP BY 1, 2
    ),
    m AS (
      SELECT cohort_week, week_offset, n_active,
             MAX(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week) AS cohort_size
      FROM act
    )
    SELECT cohort_week, week_offset, n_active, cohort_size,
           n_active / cohort_size AS retention
    FROM m ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# 2. Markov transition matrix over event sequences


def q_event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (prev_type -> next_type) pair, the transition count and the
    probability conditional on prev_type.

    Shape: ONE corpus shuffle — the per-user sequence window (partition
    user_id, order (ts, event_id); the event_id tie-break makes the lag
    deterministic under duplicate timestamps) — then a map-side-combined
    count into a |types|^2 frame; the conditional normalization is a
    window over that tiny frame, never over events. prob is one division
    of two exact longs, emitted raw.
    """
    ev = _events(spark, sf_dir)
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (F.col("n_transitions") / total).alias("prob"),
    ).orderBy("prev_type", "next_type")


Q_EVENT_TRANSITION_SQL = """
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_transitions,
           n_transitions / SUM(n_transitions)
             OVER (PARTITION BY prev_type) AS prob
    FROM c ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# 3. Time-weighted average over an irregular series


def q_user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean of ``value`` per user (TWAP): each event's
    value is held until the user's next event; the last event of a user
    has no holding interval and is excluded (users with a single event
    drop out — documented semantics, matching how a market TWAP treats an
    unclosed observation).

    Shape: the same single per-user sequence window as the transition
    query (lead instead of lag), then one map-side-combined aggregate.
    Interval lengths are exact integer microseconds; the weighted sum is
    the one order-dependent double sum, so the final ratio goes through
    stable_round; obs_seconds divides an exact long by 1e6 (one IEEE op,
    bit-identical).
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        ev.select(
            "user_id",
            "value",
            # events.ts is TIMESTAMP_NTZ; unix_micros needs an instant.
            # The session timezone is pinned UTC (session.py), so the cast
            # maps naive wall time to epoch the same way DuckDB's epoch_us
            # reads a naive timestamp.
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t0"),
            F.unix_micros(F.lead("ts").over(w).cast("timestamp")).alias("t1"),
        )
        .filter(F.col("t1").isNotNull())
        .withColumn("dt_us", F.col("t1") - F.col("t0"))
    )
    agg = iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").alias("dt_sum"),
        F.sum(F.col("value") * F.col("dt_us")).alias("w_sum"),
    )
    return agg.select(
        "user_id",
        "n_intervals",
        (F.col("dt_sum") / F.lit(1000000.0)).alias("obs_seconds"),
        stable_round(F.col("w_sum") / F.col("dt_sum"), 6).alias("twap"),
    ).orderBy("user_id")


Q_USER_VALUE_TWAP_SQL = f"""
    WITH iv AS (
      SELECT user_id, value,
             epoch_us(ts) AS t0,
             epoch_us(LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS t1
      FROM events
    ),
    d AS (
      SELECT user_id, value, t1 - t0 AS dt_us FROM iv WHERE t1 IS NOT NULL
    ),
    a AS (
      SELECT user_id, COUNT(*) AS n_intervals,
             CAST(SUM(dt_us) AS BIGINT) AS dt_sum,
             SUM(value * dt_us) AS w_sum
      FROM d GROUP BY user_id
    )
    SELECT user_id, n_intervals,
           dt_sum / 1000000.0 AS obs_seconds,
           {stable_round_sql("w_sum / dt_sum", 6)} AS twap
    FROM a ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 4. Keyed snapshot diff (CDC audit)


def q_user_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture audit between two snapshots of per-user state
    (event count + latest event type), snapshot A = events before
    SNAPSHOT_CUTOFF, snapshot B = all events: per user, both states and a
    change verdict ('added' — user absent from A; 'changed'; 'unchanged').

    Shape: the classic two-snapshot FULL OUTER JOIN collapses into ONE
    map-side-combined pass when both snapshots derive from the same
    append-only log (the Kappa formulation): per user, conditional count
    + conditional lexicographic max of (ts, event_id, event_type)
    structs. MAX ignores the NULL structs of after-cutoff rows, and the
    (ts, event_id) prefix makes the carried event_type deterministic
    under duplicate timestamps. One shuffle, no join. The oracle derives
    the same states independently via ROW_NUMBER windows.
    """
    ev = _events(spark, sf_dir)
    before = F.col("ts") < F.lit(SNAPSHOT_CUTOFF).cast("timestamp")
    agg = ev.groupBy("user_id").agg(
        F.sum(before.cast("long")).alias("n_before"),
        F.count(F.lit(1)).alias("n_total"),
        F.max(
            F.when(before, F.struct("ts", "event_id", "event_type"))
        )["event_type"].alias("last_before"),
        F.max(F.struct("ts", "event_id", "event_type"))["event_type"].alias(
            "last_total"
        ),
    )
    verdict = (
        F.when(F.col("n_before") == 0, F.lit("added"))
        .when(
            (F.col("n_before") != F.col("n_total"))
            | (F.col("last_before") != F.col("last_total")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return agg.select(
        "user_id",
        "n_before",
        "n_total",
        "last_before",
        "last_total",
        verdict.alias("change_kind"),
    ).orderBy("user_id")


Q_USER_SNAPSHOT_DIFF_SQL = f"""
    WITH base AS (
      SELECT user_id, ts, event_id, event_type,
             ts < TIMESTAMP '{SNAPSHOT_CUTOFF}' AS bef
      FROM events
    ),
    ranked AS (
      SELECT user_id, event_type, bef,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rt,
             CASE WHEN bef THEN ROW_NUMBER() OVER (
               PARTITION BY user_id, bef ORDER BY ts DESC, event_id DESC)
             END AS rb
      FROM base
    ),
    agg AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN bef THEN 1 ELSE 0 END) AS BIGINT)
               AS n_before,
             COUNT(*) AS n_total,
             MAX(CASE WHEN rb = 1 THEN event_type END) AS last_before,
             MAX(CASE WHEN rt = 1 THEN event_type END) AS last_total
      FROM ranked GROUP BY user_id
    )
    SELECT user_id, n_before, n_total, last_before, last_total,
           CASE WHEN n_before = 0 THEN 'added'
                WHEN n_before <> n_total
                     OR last_before <> last_total THEN 'changed'
                ELSE 'unchanged' END AS change_kind
    FROM agg ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 5. Distribution drift (KL divergence) per corpus slice


def q_source_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence KL(P_source || Q_corpus) of each source's language
    distribution vs the corpus-wide one — the drift score a training-mix
    monitor alarms on when one ingestion source starts skewing the blend.

    Shape: one map-side-combined count into a |sources| x |langs| frame;
    every subsequent window (per-source total, per-lang total, grand
    total) runs on that key-cardinality frame — the corpus is scanned
    and shuffled exactly once regardless of scale. P and Q are single
    divisions of exact longs; the per-source sum of p*ln(p/q) terms is
    order-dependent (and ln may differ by an ulp across libm
    implementations), absorbed by stable_round.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n") / F.sum("n").over(Window.partitionBy("source"))
    q = F.sum("n").over(Window.partitionBy("lang")) / F.sum("n").over(
        Window.partitionBy()
    )
    t = c.select("source", "n", (p * F.log(p / q)).alias("term"))
    return (
        t.groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            stable_round(F.sum("term"), 6).alias("kl_divergence"),
        )
        .orderBy("source")
    )


Q_SOURCE_LANG_DRIFT_SQL = f"""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    t AS (
      SELECT source, n,
             n / SUM(n) OVER (PARTITION BY source) AS p,
             SUM(n) OVER (PARTITION BY lang)
               / SUM(n) OVER () AS q
      FROM c
    )
    SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
           {stable_round_sql("SUM(p * LN(p / q))", 6)} AS kl_divergence
    FROM t GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# 6. Association-rule mining (pairwise co-occurrence lift)


def q_event_affinity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over per-user event-type sets: for every
    unordered type pair (a < b) that co-occurs in at least one user's
    basket, emit co-occurrence support, both directional confidences, and
    lift — the set-co-occurrence operator class (`event_transition_probs`
    covers SEQUENTIAL bigrams; this covers unordered joint incidence, the
    Apriori/market-basket primitive).

    Scale shape: ONE user-keyed hash aggregate builds the basket
    (``collect_set`` dedups in-agg — no pre-distinct shuffle), sorted for
    determinism; the i<j pair expansion is a JVM higher-order transform
    bounded by |event-type vocab|^2 per user (the market-basket regime:
    vocab is small, users are many — never a self-join, never corpus^2);
    pair counts are one map-side-combined hash aggregate on (a, b); the
    per-type marginals and the 1-row user count broadcast back onto the
    |vocab|^2-sized pair frame. The corpus is scanned once and shuffled
    once on the uniform user key.

    Determinism: counts are exact integers; support/confidence are single
    divisions of exact operands (bit-identical cross-engine); lift is the
    two-division product ``(n_ab/n_a) * (n_users/n_b)`` — identical
    expression tree in the oracle — wrapped in ``stable_round`` per the
    repo contract.
    """
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
    )

    baskets = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    # baskets feeds the pair expansion, the per-type marginals, and the
    # user count; checkpoint so the events scan + user shuffle run once.
    baskets = tracked_local_checkpoint(baskets)

    ts_col = F.col("types")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ts_col,
                    lambda x, i: F.transform(
                        F.slice(
                            ts_col, i + 2, F.greatest(F.size(ts_col) - i - 1, F.lit(0))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    n_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))

    marg = (
        baskets.select(F.explode("types").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    # marg broadcasts TWICE (a-side and b-side); checkpoint the vocab-sized
    # frame so the |users|-sized basket frame isn't re-aggregated per use.
    marg = tracked_local_checkpoint(marg)
    n_users = baskets.agg(F.count(F.lit(1)).alias("n_users"))

    out = (
        n_ab.join(
            F.broadcast(marg.select(F.col("t").alias("a"), F.col("n_t").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(marg.select(F.col("t").alias("b"), F.col("n_t").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            "n_users",
            stable_round(F.col("n_ab") / F.col("n_users"), 6).alias("support"),
            stable_round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_b"),
            stable_round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_a"),
            stable_round(
                (F.col("n_ab") / F.col("n_a")) * (F.col("n_users") / F.col("n_b")), 6
            ).alias("lift"),
        )
        .orderBy("a", "b")
    )
    out._graft_checkpoints = [baskets, marg]
    return out


Q_EVENT_AFFINITY_SQL = f"""
    WITH baskets AS (
      SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
      FROM events GROUP BY user_id
    ),
    pairs AS (
      SELECT a.t AS a, b.t AS b
      FROM (SELECT user_id, unnest(types) AS t FROM baskets) a
      JOIN (SELECT user_id, unnest(types) AS t FROM baskets) b
        ON a.user_id = b.user_id AND a.t < b.t
    ),
    n_ab AS (SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY a, b),
    marg AS (SELECT t, COUNT(*) AS n_t
             FROM (SELECT unnest(types) AS t FROM baskets) GROUP BY t),
    n AS (SELECT COUNT(*) AS n_users FROM baskets)
    SELECT a, b, n_ab, ma.n_t AS n_a, mb.n_t AS n_b, n_users,
           {stable_round_sql("n_ab * 1.0 / n_users", 6)} AS support,
           {stable_round_sql("n_ab * 1.0 / ma.n_t", 6)} AS conf_a_b,
           {stable_round_sql("n_ab * 1.0 / mb.n_t", 6)} AS conf_b_a,
           {stable_round_sql(
               "(n_ab * 1.0 / ma.n_t) * (n_users * 1.0 / mb.n_t)", 6
           )} AS lift
    FROM n_ab
    JOIN marg ma ON ma.t = n_ab.a
    JOIN marg mb ON mb.t = n_ab.b
    CROSS JOIN n
    ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# 7. Per-group OLS trend fit (statistical model fitting)


def q_event_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares daily-volume trend per event type: slope, intercept,
    and r^2 of OLS count ~ day over the table's date range — the
    statistical-model-fitting operator class (trend detection, the
    "is this error type growing" question every monitoring pipeline asks;
    the reference's monitoring thresholds in monitoring/config.py:15-17
    are static — this is their data-driven upgrade).

    Determinism is the interesting part: a naive corr()/covar() over
    doubles is an order-dependent float sum — unverifiable cross-engine.
    Instead x = day index and y = daily count are exact BIGINTs, so the
    five moment sums (n, Sx, Sy, Sxx, Sxy, Syy) are EXACT integer
    aggregates in any summation order; slope/intercept/r^2 are then pure
    functions of exact operands, identical expression trees both engines,
    wrapped in stable_round only to absorb final-division ulp composition.

    Scale shape: one map-side-combined (type, day) count — the only
    corpus-keyed shuffle; the moment aggregate runs on the |types| x
    |days| frame; everything after is |types|-sized. At 100 TB the first
    aggregate is the classic pre-aggregation contract (partial counts
    combine before the exchange).
    """
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # all-integer numerators/denominators: exact up to the final divisions.
    # Degenerate groups (single day -> var_x = 0; constant counts ->
    # var_y = 0) yield NULL, not a crash: try_divide here, NULLIF in the
    # oracle (ANSI Spark raises DIVIDE_BY_ZERO on plain `/`).
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.try_divide(cov_n, var_x)
    return m.select(
        "event_type",
        "n",
        stable_round(slope, 6).alias("slope"),
        stable_round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
        stable_round(
            F.try_divide(cov_n * cov_n, var_x * var_y), 6
        ).alias("r2"),
    ).orderBy("event_type")


Q_EVENT_VOLUME_TREND_SQL = f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             COUNT(*) AS y
      FROM events GROUP BY event_type, x
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           {stable_round_sql(
               "(n * sxy - sx * sy) * 1.0 / NULLIF(n * sxx - sx * sx, 0)", 6
           )} AS slope,
           {stable_round_sql(
               "(sy - ((n * sxy - sx * sy) * 1.0"
               " / NULLIF(n * sxx - sx * sx, 0)) * sx) / n",
               6,
           )} AS intercept,
           {stable_round_sql(
               "((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1.0)"
               " / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)",
               6,
           )} AS r2
    FROM m ORDER BY event_type
"""


def q_part_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of ``part`` under (minimize
    p_retailprice, maximize p_size) — the multi-criteria dominance-
    filtering operator class: return every part no other part strictly
    dominates (other.price <= price AND other.size >= size with at least
    one strict). Crawl counterpart: frontier candidates that are
    non-dominated under (freshness, authority) — the scheduler's
    "no reason to ever prefer something else" set. Ties are real data
    here (2000 parts share 1000 prices / 50 sizes): rows with identical
    (price, size) never dominate each other, so ALL of them are skyline
    when their point is.

    Algorithm: the 2-D sort-sweep, expressed relationally. (1) per-price
    best size — ONE map-side-combinable aggregate, the only corpus-sized
    shuffle; (2) prefix-max sweep over the price-distinct frame: a price
    is skyline iff its best size strictly exceeds the running max over
    all strictly lower prices; (3) semi-join rows back on (price, size ==
    best). The global window in (2) runs on the POST-aggregation frame
    (bounded by price cardinality, not corpus size); if even that frame
    were corpus-sized, the sweep is a distributed prefix-scan
    (range-partition by price, per-partition max, broadcast the tiny
    per-partition prefix offsets) — the skyline is distributive, so
    local-skyline-then-merge is always available. Every comparison is on
    raw parquet values (int size, double price read identically by both
    engines) — no float arithmetic is introduced, so no rounding is
    needed.

    The DuckDB oracle is the INDEPENDENT quadratic formulation — the
    textbook NOT EXISTS dominance anti-join — so the sweep's tie and
    strictness semantics are what get verified, not re-stated.
    """
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rows = part.select("p_partkey", "p_size", "p_retailprice")
    best = rows.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_size")
    )
    sweep = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_prices = (
        best.withColumn("prev_max", F.max("best_size").over(sweep))
        .filter(
            F.col("prev_max").isNull()
            | (F.col("best_size") > F.col("prev_max"))
        )
        .select(
            F.col("p_retailprice").alias("sky_price"),
            F.col("best_size").alias("sky_size"),
        )
    )
    return (
        rows.join(
            F.broadcast(sky_prices),
            (F.col("p_retailprice") == F.col("sky_price"))
            & (F.col("p_size") == F.col("sky_size")),
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_partkey")
    )


Q_PART_PARETO_SQL = """
    SELECT p_partkey, p_size, p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY p_partkey
"""


AB_Z_CRIT = 1.96  # two-sided 95%


def q_ab_test_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation-analytics operator — the two-proportion z-test
    every A/B platform ships: users are split by the stated
    deterministic assignment (variant A = even user_id, B = odd — the
    hash-bucket assignment an experiment framework would persist),
    conversion = the user emitted >= 1 purchase event, and the test
    reports per-variant exposure/conversion/rate, the pooled z
    statistic, and the two-sided 95% significance verdict in one row.

    Determinism: rates and the pooled p are single divisions of exact
    integers; the z denominator is sqrt(p*(1-p)*(1/n_a + 1/n_b)) —
    every step a correctly-rounded IEEE op on identical operands in
    both engines, so z differs by at most an ulp and stable_round@6
    absorbs it. Degenerate guards by contract: zero exposures in
    either arm, or pooled p in {0, 1} (zero variance), report z = 0.0
    and not significant.

    Scale shape: one scan -> per-user conversion flag (map-side
    combinable max aggregate on user_id, the only corpus-width
    exchange) -> 1-row variant fold; everything after is scalar
    algebra. Zero Python.
    """
    from job_crawler_spark.functions.compat import stable_round

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = ev.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted")
    )
    folded = users.agg(
        F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("n_a"),
        F.sum(
            ((F.col("user_id") % 2 == 0).cast("int") * F.col("converted"))
            .cast("long")
        ).alias("conv_a"),
        F.sum((F.col("user_id") % 2 != 0).cast("long")).alias("n_b"),
        F.sum(
            ((F.col("user_id") % 2 != 0).cast("int") * F.col("converted"))
            .cast("long")
        ).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
    )
    z = F.when(ok, stable_round((p_a - p_b) / se, 6)).otherwise(
        F.lit(0.0)
    )
    rate_a = F.when(
        F.col("n_a") > 0, stable_round(p_a, 6)
    ).otherwise(F.lit(0.0))
    rate_b = F.when(
        F.col("n_b") > 0, stable_round(p_b, 6)
    ).otherwise(F.lit(0.0))
    return folded.select(
        "n_a",
        "conv_a",
        rate_a.alias("rate_a"),
        "n_b",
        "conv_b",
        rate_b.alias("rate_b"),
        z.alias("z"),
        (F.abs(z) > AB_Z_CRIT).alias("significant"),
    )


def _ab_test_eval_sql() -> str:
    from job_crawler_spark.functions.compat import stable_round_sql

    p_a = "conv_a / CAST(n_a AS DOUBLE)"
    p_b = "conv_b / CAST(n_b AS DOUBLE)"
    pool = "(conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)"
    se = (
        f"sqrt({pool} * (1 - {pool})"
        " * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE)))"
    )
    ok = (
        "n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0"
        " AND conv_a + conv_b < n_a + n_b"
    )
    z = (
        f"CASE WHEN {ok} THEN "
        + stable_round_sql(f"(({p_a}) - ({p_b})) / ({se})", 6)
        + " ELSE 0.0 END"
    )
    return f"""
        WITH u AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'purchase'
                     THEN 1 ELSE 0 END) AS converted
          FROM events GROUP BY user_id
        ),
        f AS (
          SELECT
            CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN user_id % 2 = 0 THEN converted
                     ELSE 0 END) AS BIGINT) AS conv_a,
            CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN converted
                     ELSE 0 END) AS BIGINT) AS conv_b
          FROM u
        )
        SELECT n_a, conv_a,
               CASE WHEN n_a > 0 THEN {stable_round_sql(p_a, 6)}
                    ELSE 0.0 END AS rate_a,
               n_b, conv_b,
               CASE WHEN n_b > 0 THEN {stable_round_sql(p_b, 6)}
                    ELSE 0.0 END AS rate_b,
               {z} AS z,
               abs({z}) > {AB_Z_CRIT} AS significant
        FROM f
    """


ORDER_STATUS_ACCEPTED = ("F", "O", "P")


def q_table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract validation — the dbt-test /
    expectation-suite operator class (dbt's not_null / unique /
    relationships / accepted_values generic tests; Great Expectations'
    column expectations): five checks over orders, one relation of
    (check_name, n_checked, n_violations, passed). The reference's
    health check validates row counts only (health_checker.py:104-162);
    a 100 TB lake gates ingest batches on exactly this suite.

    Checks: not_null(o_orderkey), unique(o_orderkey),
    accepted_values(o_orderstatus in F/O/P), range(o_totalprice > 0),
    and the referential check relationships(o_custkey -> customer) —
    all integer-exact.

    Stated deviation from dbt's unique test (r05 ADVICE): uniqueness is
    computed as n_rows - count_distinct(key), which counts NULL keys as
    uniqueness violations, whereas dbt's unique test ignores NULLs
    (they belong solely to not_null). On a NOT NULL key column the two
    agree; with NULL keys present this suite double-reports them (once
    under not_null, once under unique) — a deliberate strict-superset
    contract, identical in both engines and pinned by the oracle, so it
    cannot silently drift. Changing it now would change the gated
    output; the dbt-exact form is count(key) - count_distinct(key).

    Scale shape: the four orders-local checks fold into ONE pass — a
    single aggregate row (violation counters computed side by side,
    map-side combined; uniqueness as n_rows - n_distinct(key) rides the
    same two-phase distinct aggregate) unpivoted by a 4-row stack; the
    FK check is a second orders scan left-anti-joined to the distinct
    customer keys (broadcast at gate scale — the dimension side; at
    100 TB the anti-join shuffles on the key like any FK validation).
    No per-check driver loop: the suite is two jobs' worth of plan in
    one DataFrame, not five.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    acc = F.array(*[F.lit(v) for v in ORDER_STATUS_ACCEPTED])
    # COALESCE the violation sums: a NULL value yields a NULL addend
    # (NULL is not an accepted_values/range violation — dbt semantics;
    # the not_null check owns NULLs), and SUM over all-NULL addends is
    # NULL in BOTH engines, so the cross-engine gate cannot catch the
    # missing zero — found by the Python-reference property test.
    local = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.col("o_orderkey").isNull().cast("long")), F.lit(0)
        ).alias("v_not_null"),
        F.count_distinct(F.col("o_orderkey")).alias("n_distinct_key"),
        F.coalesce(
            F.sum(
                (~F.array_contains(acc, F.col("o_orderstatus"))).cast(
                    "long"
                )
            ),
            F.lit(0),
        ).alias("v_accepted"),
        F.coalesce(
            F.sum((~(F.col("o_totalprice") > 0)).cast("long")), F.lit(0)
        ).alias("v_range"),
    )
    fk = (
        orders.select("o_custkey")
        .join(
            F.broadcast(
                customer.select(
                    F.col("c_custkey").alias("o_custkey")
                ).distinct()
            ),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk"))
    )
    return (
        local.crossJoin(F.broadcast(fk))
        .select(
            F.col("n_rows").alias("n_checked"),
            F.expr(
                "stack(5,"
                " 'not_null_o_orderkey', v_not_null,"
                " 'unique_o_orderkey', n_rows - n_distinct_key,"
                " 'accepted_values_o_orderstatus', v_accepted,"
                " 'range_o_totalprice_positive', v_range,"
                " 'relationships_o_custkey_customer', v_fk)"
                " AS (check_name, n_violations)"
            ),
        )
        .select(
            "check_name",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


def _table_expectations_sql() -> str:
    accepted = ", ".join(f"'{v}'" for v in ORDER_STATUS_ACCEPTED)
    return f"""
        WITH local AS (
          SELECT COUNT(*) AS n_rows,
                 CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL
                                   THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS v_not_null,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_unique,
                 CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN
                                        ({accepted})
                                   THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS v_accepted,
                 CAST(COALESCE(SUM(CASE WHEN NOT (o_totalprice > 0)
                                   THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS v_range
          FROM orders
        ),
        fk AS (
          SELECT (SELECT COUNT(*) FROM orders) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS v_fk
          FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)
        ),
        checks AS (
          SELECT 'not_null_o_orderkey' AS check_name, n_rows,
                 v_not_null AS n_violations FROM local
          UNION ALL
          SELECT 'unique_o_orderkey', n_rows, v_unique FROM local
          UNION ALL
          SELECT 'accepted_values_o_orderstatus', n_rows, v_accepted
          FROM local
          UNION ALL
          SELECT 'range_o_totalprice_positive', n_rows, v_range FROM local
          UNION ALL
          SELECT 'relationships_o_custkey_customer', n_rows, v_fk FROM fk
        )
        SELECT check_name, n_rows AS n_checked, n_violations,
               n_violations = 0 AS passed
        FROM checks ORDER BY check_name
    """


QUERIES = {
    "table_expectations": q_table_expectations,
    "ab_test_eval": q_ab_test_eval,
    "part_pareto_front": q_part_pareto_front,
    "cohort_retention": q_cohort_retention,
    "event_transition_probs": q_event_transition_probs,
    "user_value_twap": q_user_value_twap,
    "user_snapshot_diff": q_user_snapshot_diff,
    "source_lang_drift": q_source_lang_drift,
    "event_affinity_rules": q_event_affinity_rules,
    "event_volume_trend": q_event_volume_trend,
}

ORACLES = {
    "table_expectations": _table_expectations_sql(),
    "ab_test_eval": _ab_test_eval_sql(),
    "part_pareto_front": Q_PART_PARETO_SQL,
    "cohort_retention": Q_COHORT_RETENTION_SQL,
    "event_transition_probs": Q_EVENT_TRANSITION_SQL,
    "user_value_twap": Q_USER_VALUE_TWAP_SQL,
    "user_snapshot_diff": Q_USER_SNAPSHOT_DIFF_SQL,
    "source_lang_drift": Q_SOURCE_LANG_DRIFT_SQL,
    "event_affinity_rules": Q_EVENT_AFFINITY_SQL,
    "event_volume_trend": Q_EVENT_VOLUME_TREND_SQL,
}
