"""Relational analytics: the reference's job/application queries, Spark-first.

The reference's persisted tables (jobs/applications/job_searches/api_metrics,
main.py:136-173 + health_checker.py:39-48) don't exist in the driver's
testdata, so each query DERIVES them deterministically from the TPC-H-ish
driver tables with SQL-expressible transforms — the same derivation is
written in the DuckDB oracle (oracle_sql) so the driver's side-by-side
comparison exercises the analytics end-to-end with zero synthetic-data
dependence.

Determinism rules: no wall-clock — every "now" is the fixed AS_OF date
(SURVEY.md §7.3); every top-k has a total-order tiebreak; double aggregates
are rounded so value-hashes match across engines.

Operator coverage (SURVEY.md §2): J1 (left join + coalesce), A1-A7
aggregates, O2-O3 sorts/top-k, P4/P6/P7 predicates, F10-F18 scalar funcs,
W3 date diffs, U5 distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round, stable_round_sql

AS_OF = "1998-08-01"  # fixed 'now' inside the TPC-H date range


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- deterministic derivations (Spark side) --------------------------------

def jobs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jobs table derived from orders x customer (reference DDL
    main.py:136-149). Broadcast-joinable dim sizes; url is the natural key."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("o_orderkey").alias("id"),
            F.concat(F.lit("Engineer L"), (F.col("o_orderkey") % 5)).alias("title"),
            F.col("c_name").alias("company"),
            F.col("c_mktsegment").alias("location"),
            F.concat(
                F.lit("https://board"),
                (F.col("o_orderkey") % 7),
                F.lit(".example.com/jobs/"),
                F.col("o_orderkey"),
            ).alias("url"),
            (F.col("o_totalprice") / 10).cast("long").alias("salary_min"),
            (F.col("o_totalprice") / 10 * 1.5).cast("long").alias("salary_max"),
            F.col("o_orderpriority").alias("contract_type"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("posted_date"),
            F.concat(
                F.lit("We use "),
                F.when(F.col("o_orderkey") % 4 == 0, "python and aws")
                .when(F.col("o_orderkey") % 4 == 1, "java spring kubernetes")
                .when(F.col("o_orderkey") % 4 == 2, "react node mongodb")
                .otherwise("rust go docker"),
                F.lit(". "),
                F.when(F.col("o_orderkey") % 3 == 0, "remote work welcome")
                .when(F.col("o_orderkey") % 3 == 1, "hybrid flexible hours")
                .otherwise("in person at the office"),
                F.when(
                    F.col("o_orderkey") % 5 == 0, F.lit(". pension and healthcare")
                ).otherwise(F.lit("")),
            ).alias("description"),
        )
    )


JOBS_SQL = """
    SELECT o_orderkey AS id,
           'Engineer L' || CAST(o_orderkey % 5 AS VARCHAR) AS title,
           c_name AS company,
           c_mktsegment AS location,
           'https://board' || CAST(o_orderkey % 7 AS VARCHAR)
               || '.example.com/jobs/' || CAST(o_orderkey AS VARCHAR) AS url,
           CAST(FLOOR(o_totalprice / 10) AS BIGINT) AS salary_min,
           CAST(FLOOR(o_totalprice / 10 * 1.5) AS BIGINT) AS salary_max,
           o_orderpriority AS contract_type,
           strftime(o_orderdate, '%Y-%m-%d') AS posted_date,
           'We use ' ||
             CASE o_orderkey % 4 WHEN 0 THEN 'python and aws'
                  WHEN 1 THEN 'java spring kubernetes'
                  WHEN 2 THEN 'react node mongodb'
                  ELSE 'rust go docker' END || '. ' ||
             CASE o_orderkey % 3 WHEN 0 THEN 'remote work welcome'
                  WHEN 1 THEN 'hybrid flexible hours'
                  ELSE 'in person at the office' END ||
             CASE WHEN o_orderkey % 5 = 0 THEN '. pension and healthcare'
                  ELSE '' END AS description
    FROM orders JOIN customer ON o_custkey = c_custkey
"""


def applications_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applications derived from every 3rd order (reference DDL
    main.py:151-159); status distribution covers the substring predicate
    'interview' IN status (main.py:959)."""
    orders = _read(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "applied")
        .when(F.col("o_orderstatus") == "O", "interview_scheduled")
        .otherwise("rejected")
    )
    return orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderkey").alias("job_id"),
        status.alias("status"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("applied_date"),
    )


APPLICATIONS_SQL = """
    SELECT o_orderkey AS id,
           o_orderkey AS job_id,
           CASE o_orderstatus WHEN 'F' THEN 'applied'
                WHEN 'O' THEN 'interview_scheduled'
                ELSE 'rejected' END AS status,
           strftime(o_orderdate, '%Y-%m-%d') AS applied_date
    FROM orders WHERE o_orderkey % 3 = 0
"""


def job_searches_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """job_searches (crawl-round lineage, main.py:167-172) from events."""
    events = _read(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("query"),
        F.col("value").cast("long").alias("results_count"),
        F.col("ts").alias("search_date"),
    )


JOB_SEARCHES_SQL = """
    SELECT event_id AS id, event_type AS query,
           CAST(FLOOR(value) AS BIGINT) AS results_count, ts AS search_date
    FROM events
"""


def api_metrics_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """api_metrics (health_checker.py:39-48) from events: 'error' events are
    HTTP 500s, everything else 200."""
    events = _read(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("id"),
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("api_"), (F.col("user_id") % 3)).alias("api_name"),
        F.when(F.col("event_type") == "error", 500).otherwise(200).alias("status_code"),
        (F.col("value") / 100.0).alias("response_time"),
    )


API_METRICS_SQL = """
    SELECT event_id AS id, ts AS timestamp,
           'api_' || CAST(user_id % 3 AS VARCHAR) AS api_name,
           CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS status_code,
           value / 100.0 AS response_time
    FROM events
"""


# --- queries ----------------------------------------------------------------

def q_app_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (main.py:937-945): status histogram over applications."""
    return (
        applications_df(spark, sf_dir)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


def q_app_summary_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + W3 + P6 (main.py:902-932): apps LEFT JOIN jobs, null-coalesced
    display fields, days-since-applied vs fixed AS_OF, needs_follow_up flag,
    newest 50 by (applied_date DESC, id ASC). jobs is the bigger side here
    but Catalyst broadcast-hashes the smaller post-filter side under AQE."""
    apps = applications_df(spark, sf_dir)
    jobs = jobs_df(spark, sf_dir).select(
        F.col("id").alias("jid"), "title", "company"
    )
    return (
        apps.join(jobs, apps.job_id == F.col("jid"), "left")
        .select(
            "id",
            F.coalesce("title", F.lit("Unknown Position")).alias("title"),
            F.coalesce("company", F.lit("Unknown Company")).alias("company"),
            "status",
            "applied_date",
            F.datediff(F.lit(AS_OF).cast("date"), F.to_date("applied_date"))
            .alias("days_since"),
        )
        .withColumn(
            "needs_follow_up",
            (F.col("days_since") >= 7) & (F.col("status") == "applied"),
        )
        .orderBy(F.col("applied_date").desc(), F.col("id").asc())
        .limit(50)
    )


Q_APP_SUMMARY_JOIN_SQL = f"""
    WITH apps AS ({APPLICATIONS_SQL}), jobs AS ({JOBS_SQL})
    SELECT a.id,
           COALESCE(j.title, 'Unknown Position') AS title,
           COALESCE(j.company, 'Unknown Company') AS company,
           a.status, a.applied_date,
           datediff('day', CAST(a.applied_date AS DATE), DATE '{AS_OF}')
               AS days_since,
           (datediff('day', CAST(a.applied_date AS DATE), DATE '{AS_OF}') >= 7
            AND a.status = 'applied') AS needs_follow_up
    FROM apps a LEFT JOIN jobs j ON a.job_id = j.id
    ORDER BY a.applied_date DESC, a.id ASC LIMIT 50
"""


def q_top_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (main.py:1167-1181): top-10 search queries by count with avg
    results, windowed to the last 400 days before AS_OF. TakeOrderedAndProject
    — no full sort at scale."""
    searches = job_searches_df(spark, sf_dir)
    cutoff = F.lit(AS_OF).cast("timestamp") - F.expr("INTERVAL 400 DAYS")
    return (
        searches.filter(F.col("search_date") > cutoff)
        .groupBy("query")
        .agg(
            F.count(F.lit(1)).alias("search_count"),
            F.round(F.avg("results_count"), 4).alias("avg_results"),
        )
        .orderBy(F.col("search_count").desc(), F.col("query").asc())
        .limit(10)
    )


Q_TOP_QUERIES_SQL = f"""
    WITH s AS ({JOB_SEARCHES_SQL})
    SELECT query, COUNT(*) AS search_count,
           ROUND(AVG(results_count), 4) AS avg_results
    FROM s
    WHERE search_date > TIMESTAMP '{AS_OF} 00:00:00' - INTERVAL 400 DAY
    GROUP BY query ORDER BY search_count DESC, query ASC LIMIT 10
"""


def q_top_companies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (main.py:1184-1197): top hiring companies."""
    return (
        jobs_df(spark, sf_dir)
        .groupBy("company")
        .agg(F.count(F.lit(1)).alias("job_count"))
        .orderBy(F.col("job_count").desc(), F.col("company").asc())
        .limit(10)
    )


Q_TOP_COMPANIES_SQL = f"""
    WITH j AS ({JOBS_SQL})
    SELECT company, COUNT(*) AS job_count FROM j
    GROUP BY company ORDER BY job_count DESC, company ASC LIMIT 10
"""


def q_status_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + P4 (main.py:1200-1209): applications in last 180 days by status."""
    apps = applications_df(spark, sf_dir)
    cutoff = F.date_sub(F.lit(AS_OF).cast("date"), 180)
    return (
        apps.filter(F.to_date("applied_date") > cutoff)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


Q_STATUS_WINDOW_SQL = f"""
    WITH a AS ({APPLICATIONS_SQL})
    SELECT status, COUNT(*) AS n FROM a
    WHERE CAST(applied_date AS DATE) > DATE '{AS_OF}' - INTERVAL 180 DAY
    GROUP BY status ORDER BY status
"""


def q_api_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (performance_monitor.py:66-90): per-API conditional aggregates with
    zero-guarded error/success rates."""
    m = api_metrics_df(spark, sf_dir)
    return (
        m.groupBy("api_name")
        .agg(
            stable_round(F.avg("response_time"), 4).alias("avg_response_time"),
            F.count(F.lit(1)).alias("request_count"),
            F.sum(F.when(F.col("status_code") >= 400, 1).otherwise(0)).alias(
                "error_count"
            ),
        )
        .withColumn(
            "error_rate",
            F.when(
                F.col("request_count") > 0,
                stable_round(F.col("error_count") / F.col("request_count"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("success_rate", stable_round(1 - F.col("error_rate"), 6))
        .orderBy("api_name")
    )


Q_API_PERFORMANCE_SQL = f"""
    WITH m AS ({API_METRICS_SQL})
    SELECT api_name,
           {stable_round_sql("AVG(response_time)", 4)} AS avg_response_time,
           COUNT(*) AS request_count,
           CAST(SUM(CASE WHEN status_code >= 400 THEN 1 ELSE 0 END)
                AS BIGINT) AS error_count,
           CASE WHEN COUNT(*) > 0 THEN {stable_round_sql(
               "SUM(CASE WHEN status_code >= 400 THEN 1 ELSE 0 END)"
               " / CAST(COUNT(*) AS DOUBLE)", 6)} ELSE 0.0 END AS error_rate,
           {stable_round_sql(
               "1 - CASE WHEN COUNT(*) > 0 THEN " + stable_round_sql(
                   "SUM(CASE WHEN status_code >= 400 THEN 1 ELSE 0 END)"
                   " / CAST(COUNT(*) AS DOUBLE)", 6) + " ELSE 0.0 END",
               6)} AS success_rate
    FROM m GROUP BY api_name ORDER BY api_name
"""


def q_response_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (main.py:953-973): scalar counts + substring status predicate (P7)
    + zero-guarded average days-to-response."""
    apps = applications_df(spark, sf_dir)
    days = F.datediff(F.lit(AS_OF).cast("date"), F.to_date("applied_date"))
    return apps.agg(
        F.count(F.lit(1)).alias("total_apps"),
        F.sum(F.when(F.col("status") != "applied", 1).otherwise(0)).alias(
            "responded_apps"
        ),
        F.sum(F.when(F.col("status").contains("interview"), 1).otherwise(0)).alias(
            "interview_apps"
        ),
        stable_round(
            F.coalesce(F.avg(F.when(F.col("status") != "applied", days)), F.lit(0.0)),
            4,
        ).alias("avg_response_days"),
    )


Q_RESPONSE_STATS_SQL = f"""
    WITH a AS ({APPLICATIONS_SQL})
    SELECT COUNT(*) AS total_apps,
           CAST(SUM(CASE WHEN status <> 'applied' THEN 1 ELSE 0 END)
                AS BIGINT) AS responded_apps,
           CAST(SUM(CASE WHEN status LIKE '%interview%' THEN 1 ELSE 0 END)
                AS BIGINT) AS interview_apps,
           {stable_round_sql(
               "COALESCE(AVG(CASE WHEN status <> 'applied' THEN "
               f"datediff('day', CAST(applied_date AS DATE), DATE '{AS_OF}') "
               "END), 0.0)", 4)} AS avg_response_days
    FROM a
"""


def q_company_app_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (main.py:980-983): per-company application counts — the reference's
    O(n^2) dict comprehension as one hash aggregate."""
    apps = applications_df(spark, sf_dir)
    jobs = jobs_df(spark, sf_dir).select(F.col("id").alias("jid"), "company")
    return (
        apps.join(jobs, apps.job_id == F.col("jid"))
        .groupBy("company")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("company").asc())
        .limit(25)
    )


Q_COMPANY_APP_COUNTS_SQL = f"""
    WITH a AS ({APPLICATIONS_SQL}), j AS ({JOBS_SQL})
    SELECT j.company, COUNT(*) AS n
    FROM a JOIN j ON a.job_id = j.id
    GROUP BY j.company ORDER BY n DESC, company ASC LIMIT 25
"""


def q_followup_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/F14 (main.py:813-869): follow-up (+7d), reminder (+14d), move-on
    (+30d) dates from applied_date; invalid dates fall back to AS_OF (F10)."""
    apps = applications_df(spark, sf_dir)
    base = F.coalesce(F.to_date("applied_date"), F.lit(AS_OF).cast("date"))
    return apps.select(
        "id",
        F.date_format(F.date_add(base, 7), "yyyy-MM-dd").alias("follow_up_date"),
        F.date_format(F.date_add(base, 14), "yyyy-MM-dd").alias("reminder_date"),
        F.date_format(F.date_add(base, 30), "yyyy-MM-dd").alias("move_on_date"),
    )


Q_FOLLOWUP_DATES_SQL = f"""
    WITH a AS ({APPLICATIONS_SQL})
    SELECT id,
      strftime(COALESCE(TRY_CAST(applied_date AS DATE), DATE '{AS_OF}')
               + INTERVAL 7 DAY, '%Y-%m-%d') AS follow_up_date,
      strftime(COALESCE(TRY_CAST(applied_date AS DATE), DATE '{AS_OF}')
               + INTERVAL 14 DAY, '%Y-%m-%d') AS reminder_date,
      strftime(COALESCE(TRY_CAST(applied_date AS DATE), DATE '{AS_OF}')
               + INTERVAL 30 DAY, '%Y-%m-%d') AS move_on_date
    FROM a
"""


def q_salary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15/F16/F17: salary mid computed only when both bounds present; clamp
    + safe-ratio shapes, grouped by contract type."""
    jobs = jobs_df(spark, sf_dir)
    mid = F.when(
        F.col("salary_min").isNotNull() & F.col("salary_max").isNotNull(),
        (F.col("salary_min") + F.col("salary_max")) / 2.0,
    )
    return (
        jobs.withColumn("salary_mid", mid)
        .groupBy("contract_type")
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.round(F.avg("salary_mid"), 4).alias("avg_salary_mid"),
            F.round(
                F.greatest(
                    F.lit(30000.0), F.least(F.avg("salary_mid"), F.lit(200000.0))
                ),
                4,
            ).alias("clamped_avg"),
        )
        .orderBy("contract_type")
    )


Q_SALARY_STATS_SQL = f"""
    WITH j AS ({JOBS_SQL})
    SELECT contract_type, COUNT(*) AS n_jobs,
           ROUND(AVG((salary_min + salary_max) / 2.0), 4) AS avg_salary_mid,
           ROUND(GREATEST(30000.0, LEAST(AVG((salary_min + salary_max) / 2.0),
                                         200000.0)), 4) AS clamped_avg
    FROM j GROUP BY contract_type ORDER BY contract_type
"""


def q_table_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + A9 + F18 (health_checker.py:104-162, main.py:985-987): per-table
    row counts, a boolean healthy flag per table (non-empty), the all-healthy
    aggregate shape, and a printf-formatted metric string."""
    tables = {
        "jobs": jobs_df(spark, sf_dir),
        "applications": applications_df(spark, sf_dir),
        "job_searches": job_searches_df(spark, sf_dir),
        "api_metrics": api_metrics_df(spark, sf_dir),
    }
    counted = None
    for name, df in tables.items():
        one = df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("tbl"), "n_rows"
        )
        counted = one if counted is None else counted.unionByName(one)
    return (
        counted.withColumn("healthy", F.col("n_rows") > 0)
        .withColumn(
            "summary",
            F.format_string("%s: %d rows", F.col("tbl"), F.col("n_rows")),
        )
        .orderBy("tbl")
    )


Q_TABLE_HEALTH_SQL = f"""
    WITH j AS ({JOBS_SQL}), a AS ({APPLICATIONS_SQL}),
         s AS ({JOB_SEARCHES_SQL}), m AS ({API_METRICS_SQL}),
    counts AS (
      SELECT 'jobs' AS tbl, COUNT(*) AS n_rows FROM j
      UNION ALL SELECT 'applications', COUNT(*) FROM a
      UNION ALL SELECT 'job_searches', COUNT(*) FROM s
      UNION ALL SELECT 'api_metrics', COUNT(*) FROM m
    )
    SELECT tbl, n_rows, n_rows > 0 AS healthy,
           printf('%s: %d rows', tbl, n_rows) AS summary
    FROM counts ORDER BY tbl
"""


def q_app_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 required-param guard (main.py:755-756: ``if not all([job_url,
    company_name, position, application_date])`` -> error dict), Spark-first
    as a ROW-LEVEL admission classifier: a deterministic raw-submissions
    frame (fields knocked out by orderkey residues — NULLs and empty
    strings, both falsy to Python's all()) is split into accepted rows vs
    the reference's exact error message, then counted per outcome."""
    orders = _read(spark, sf_dir, "orders")
    sub = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("https://board.example.com/jobs/"), F.col("o_orderkey")
            )
        )
        .alias("job_url"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Company#"), F.col("o_custkey")))
        .alias("company_name"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Engineer L"), F.col("o_orderkey") % 5))
        .alias("position"),
        F.when(F.col("o_orderkey") % 19 == 0, F.lit(None).cast("string"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("application_date"),
    )

    def present(c: F.Column) -> F.Column:
        # Python truthiness of the reference guard: None AND '' both fail
        return c.isNotNull() & (c != "")

    ok = (
        present(F.col("job_url"))
        & present(F.col("company_name"))
        & present(F.col("position"))
        & present(F.col("application_date"))
    )
    return (
        sub.select(
            F.when(ok, F.lit("accepted"))
            .otherwise(F.lit("error: All required parameters must be provided"))
            .alias("outcome")
        )
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("outcome")
    )


_APP_VALIDATION_SQL = """
    WITH sub AS (
      SELECT
        CASE WHEN o_orderkey % 11 = 0 THEN NULL
             ELSE 'https://board.example.com/jobs/'
                  || CAST(o_orderkey AS VARCHAR) END AS job_url,
        CASE WHEN o_orderkey % 13 = 0 THEN ''
             ELSE 'Company#' || CAST(o_custkey AS VARCHAR) END AS company_name,
        CASE WHEN o_orderkey % 17 = 0 THEN NULL
             ELSE 'Engineer L' || CAST(o_orderkey % 5 AS VARCHAR) END AS position,
        CASE WHEN o_orderkey % 19 = 0 THEN NULL
             ELSE strftime(o_orderdate, '%Y-%m-%d') END AS application_date
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT CASE WHEN job_url IS NOT NULL AND job_url <> ''
                 AND company_name IS NOT NULL AND company_name <> ''
                 AND position IS NOT NULL AND position <> ''
                 AND application_date IS NOT NULL AND application_date <> ''
            THEN 'accepted'
            ELSE 'error: All required parameters must be provided' END AS outcome,
           COUNT(*) AS n
    FROM sub GROUP BY outcome ORDER BY outcome
"""


QUERIES = {
    "app_validation": q_app_validation,
    "app_status_counts": q_app_status_counts,
    "app_summary_join": q_app_summary_join,
    "top_queries": q_top_queries,
    "top_companies": q_top_companies,
    "status_window": q_status_window,
    "api_performance": q_api_performance,
    "response_stats": q_response_stats,
    "company_app_counts": q_company_app_counts,
    "followup_dates": q_followup_dates,
    "salary_stats": q_salary_stats,
    "table_health": q_table_health,
}

ORACLES = {
    "app_validation": _APP_VALIDATION_SQL,
    "app_status_counts": f"WITH a AS ({APPLICATIONS_SQL}) "
    "SELECT status, COUNT(*) AS n FROM a GROUP BY status ORDER BY status",
    "app_summary_join": Q_APP_SUMMARY_JOIN_SQL,
    "top_queries": Q_TOP_QUERIES_SQL,
    "top_companies": Q_TOP_COMPANIES_SQL,
    "status_window": Q_STATUS_WINDOW_SQL,
    "api_performance": Q_API_PERFORMANCE_SQL,
    "response_stats": Q_RESPONSE_STATS_SQL,
    "company_app_counts": Q_COMPANY_APP_COUNTS_SQL,
    "followup_dates": Q_FOLLOWUP_DATES_SQL,
    "salary_stats": Q_SALARY_STATS_SQL,
    "table_health": Q_TABLE_HEALTH_SQL,
}
