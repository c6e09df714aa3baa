"""Framework/template plans (reference D2-D5) with DuckDB oracles.

Runs the deterministic compatibility rubric, benefit categorization, and
career-track classification over the derived jobs table so the driver's
oracle gate checks the D2-D5 column expressions end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round_sql
from job_crawler_spark.functions.frameworks import (
    BENEFIT_CATEGORIES,
    COMPAT_WEIGHTS,
    analysis_framework_col,
    benefit_categories_col,
    career_track_col,
    compatibility_score_col,
    skill_gap_cols,
)
from job_crawler_spark.functions.text import TECH_KEYWORDS
from job_crawler_spark.plans.relational import JOBS_SQL, jobs_df

USER_SKILLS = ("python", "aws", "react", "sql")
SALARY_EXPECTATION = 15000.0


def q_job_compatibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: deterministic 1-10 compatibility score per job (40/25/20/15
    weights, main.py:665-700) over extracted features."""
    from job_crawler_spark.functions.text import (
        features_col,
    )

    jobs = jobs_df(spark, sf_dir)
    feats = features_col(
        F.col("description"),
        F.col("title"),
        F.col("salary_min").cast("double"),
        F.col("salary_max").cast("double"),
    )
    user_lc = F.array(*[F.lit(s) for s in USER_SKILLS])
    scored = jobs.withColumn("f", feats).select(
        "id",
        compatibility_score_col(
            F.col("f.tech_stack"),
            user_lc,
            F.col("f.salary_info.average"),
            F.lit(SALARY_EXPECTATION),
            F.col("f.remote_policy"),
            F.lit("remote"),
            F.lit(0.0),
        ).alias("compatibility"),
    )
    return (
        scored.groupBy("compatibility")
        .agg(F.count(F.lit(1)).alias("n_jobs"))
        .orderBy("compatibility")
    )


def _tech_filter_sql(hay: str) -> str:
    vocab = "[" + ", ".join(f"'{k}'" for k in TECH_KEYWORDS) + "]"
    return f"list_filter({vocab}, t -> contains({hay}, t))"


def _compatibility_sql() -> str:
    user = "[" + ", ".join(f"'{s}'" for s in USER_SKILLS) + "]"
    w = COMPAT_WEIGHTS
    # remote classifier: first-match-wins on description only (F4)
    remote = (
        "CASE WHEN contains(lc,'remote') OR contains(lc,'work from home')"
        " OR contains(lc,'wfh') OR contains(lc,'distributed') THEN 'remote'"
        " WHEN contains(lc,'hybrid') OR contains(lc,'flexible')"
        " OR contains(lc,'2-3 days') OR contains(lc,'part remote') THEN 'hybrid'"
        " WHEN contains(lc,'office') OR contains(lc,'on-site')"
        " OR contains(lc,'in person') OR contains(lc,'london office')"
        " THEN 'onsite' ELSE 'not_specified' END"
    )
    score = stable_round_sql(
        f"""(
          (CASE WHEN len(tech) > 0
                THEN 10.0 * len(list_filter(tech, t -> list_contains({user}, t)))
                     / len(tech)
                ELSE 5.0 END) * {w['technical_skills']}
          + 10.0 * {w['experience_level']}
          + (CASE WHEN mid IS NULL THEN 7.0
                  ELSE GREATEST(1.0, LEAST(10.0,
                       10.0 * mid / {SALARY_EXPECTATION})) END)
            * {w['salary_alignment']}
          + (CASE WHEN remote_policy = 'remote' THEN 10.0
                  WHEN remote_policy = 'hybrid' THEN 6.0
                  WHEN remote_policy = 'not_specified' THEN 5.0
                  ELSE 3.0 END) * {w['work_arrangement']}
        ) / 100.0""",
        2,
    )
    return f"""
        WITH j AS ({JOBS_SQL}),
        feats AS (
          SELECT id,
                 {_tech_filter_sql("lower(description) || ' ' || lower(title)")}
                     AS tech,
                 (salary_min + salary_max) / 2.0 AS mid,
                 {remote} AS remote_policy
          FROM (SELECT *, lower(description) AS lc FROM j)
        ),
        scored AS (SELECT id, {score} AS compatibility FROM feats)
        SELECT compatibility, COUNT(*) AS n_jobs FROM scored
        GROUP BY compatibility ORDER BY compatibility
    """


def q_benefit_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 benefit categorization (main.py:1028-1041) histogram."""
    jobs = jobs_df(spark, sf_dir)
    cats = benefit_categories_col(F.lower(F.col("description")))
    return (
        jobs.select(F.explode_outer(cats).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("category")
    )


def _benefit_counts_sql() -> str:
    arms = ", ".join(
        "CASE WHEN "
        + " OR ".join(f"contains(lc, '{k}')" for k in kws)
        + f" THEN '{name.replace('_', ' ').title()}' END"
        for name, kws in BENEFIT_CATEGORIES.items()
    )
    return f"""
        WITH j AS ({JOBS_SQL}),
        cats AS (
          SELECT unnest(list_filter([{arms}], x -> x IS NOT NULL)) AS category
          FROM (SELECT lower(description) AS lc FROM j)
        ),
        with_empty AS (
          SELECT category FROM cats
          UNION ALL
          SELECT NULL AS category
          FROM (SELECT lower(description) AS lc FROM j) t
          WHERE len(list_filter([{arms}], x -> x IS NOT NULL)) = 0
        )
        SELECT category, COUNT(*) AS n FROM with_empty
        GROUP BY category ORDER BY category NULLS FIRST
    """


def q_analysis_framework(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (main.py:361-437): the nested analysis-framework struct, flattened
    for the driver's value-hash gate — truncated description (P1), the
    interpolated requirements-extraction prompt (F7), and the four
    criteria weights (the 40/25/20/15 map)."""
    jobs = jobs_df(spark, sf_dir)
    fw = analysis_framework_col(
        F.col("title"), F.col("company"), F.col("description")
    )
    weights = F.col("fw.criteria_weights")
    return (
        jobs.withColumn("fw", fw)
        .select(
            "id",
            F.col("fw.job_title").alias("job_title"),
            F.col("fw.job_description").alias("job_description"),
            F.col("fw.analysis_prompts.requirements_extraction").alias(
                "requirements_extraction"
            ),
            F.element_at(weights, F.lit("technical_skills")).alias("w_technical"),
            F.element_at(weights, F.lit("experience_level")).alias("w_experience"),
            F.element_at(weights, F.lit("salary_alignment")).alias("w_salary"),
            F.element_at(weights, F.lit("work_arrangement")).alias("w_work"),
        )
        .orderBy("id")
    )


def _analysis_framework_sql() -> str:
    w = COMPAT_WEIGHTS
    return f"""
        WITH j AS ({JOBS_SQL})
        SELECT id,
               coalesce(title, '') AS job_title,
               substring(coalesce(description, ''), 1, 800) AS job_description,
               'Analyze this job posting and extract: required skills, '
                 || 'nice-to-haves, experience, responsibilities, benefits, '
                 || 'red flags.' || chr(10)
                 || 'Job Title: ' || coalesce(title, '') || chr(10)
                 || 'Company: ' || coalesce(company, '') || chr(10)
                 || 'Description: ' || substring(coalesce(description, ''), 1, 800)
                 AS requirements_extraction,
               {w['technical_skills']} AS w_technical,
               {w['experience_level']} AS w_experience,
               {w['salary_alignment']} AS w_salary,
               {w['work_arrangement']} AS w_work
        FROM j ORDER BY id
    """


def q_skill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 + O5 (main.py:1446-1456): ordered set difference of required
    skills vs the user's, preserving required order, sliced into
    immediate (first 2) and medium-term focus.

    Driver-gate shape: exploded to one scalar row per (id, gap_rank, skill)
    — the external gate's canonicalizer cannot hash array-typed columns
    (r02's one ERR row), so the gated query emits scalars only; library
    users who want the array form call ``skill_gap_cols`` directly.
    """
    jobs = jobs_df(spark, sf_dir)
    vocab = F.array(*[F.lit(k) for k in TECH_KEYWORDS])
    desc = F.lower(F.col("description"))
    title = F.lower(F.col("title"))
    required = F.filter(vocab, lambda t: desc.contains(t) | title.contains(t))
    user_lc = F.array(*[F.lit(s) for s in USER_SKILLS])
    gaps = skill_gap_cols(required, user_lc)
    return (
        jobs.select("id", gaps["missing"].alias("missing"))
        .select("id", F.posexplode("missing").alias("pos", "skill"))
        .select(
            "id",
            (F.col("pos") + 1).cast("long").alias("gap_rank"),
            "skill",
            F.when(F.col("pos") < 2, F.lit("immediate"))
            .otherwise(F.lit("medium_term"))
            .alias("bucket"),
        )
        .orderBy("id", "gap_rank")
    )


def _skill_gaps_sql() -> str:
    user = "[" + ", ".join(f"'{s}'" for s in USER_SKILLS) + "]"
    vocab = "[" + ", ".join(f"'{k}'" for k in TECH_KEYWORDS) + "]"
    return f"""
        WITH j AS ({JOBS_SQL}),
        req AS (
          SELECT id,
                 list_filter({vocab},
                             t -> contains(lower(description), t)
                                  OR contains(lower(title), t)) AS required
          FROM j
        ),
        g AS (
          SELECT id,
                 list_filter(required,
                             s -> NOT list_contains({user}, lower(s))) AS missing
          FROM req
        ),
        e AS (
          SELECT id,
                 unnest(range(1, len(missing) + 1)) AS gap_rank,
                 unnest(missing) AS skill
          FROM g
        )
        SELECT id, gap_rank, skill,
               CASE WHEN gap_rank <= 2 THEN 'immediate'
                    ELSE 'medium_term' END AS bucket
        FROM e ORDER BY id, gap_rank
    """


def q_career_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 role classifier (main.py:1416-1440) over synthesized target roles
    (derived from part names for textual variety)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    role = F.lower(
        F.concat(
            F.when(F.col("p_partkey") % 3 == 0, "senior ").otherwise(""),
            F.when(F.col("p_partkey") % 4 == 0, "data ")
            .when(F.col("p_partkey") % 4 == 1, "product ")
            .otherwise(""),
            F.when(F.col("p_partkey") % 2 == 0, "engineer").otherwise("manager"),
        )
    )
    t = career_track_col(role)
    return (
        part.select(t.getField("track").alias("track"), t.getField("stage").alias("stage"))
        .groupBy("track", "stage")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("track", "stage")
    )


_CAREER_SQL = """
    WITH roles AS (
      SELECT lower(
        (CASE WHEN p_partkey % 3 = 0 THEN 'senior ' ELSE '' END) ||
        (CASE WHEN p_partkey % 4 = 0 THEN 'data '
              WHEN p_partkey % 4 = 1 THEN 'product ' ELSE '' END) ||
        (CASE WHEN p_partkey % 2 = 0 THEN 'engineer' ELSE 'manager' END)
      ) AS r FROM part
    ),
    c AS (
      SELECT
        CASE WHEN (contains(r,'engineer') OR contains(r,'developer'))
                  AND NOT contains(r,'data') AND NOT contains(r,'product')
             THEN 'software_engineer'
             WHEN contains(r,'data') THEN 'data_scientist'
             ELSE 'product_manager' END AS track,
        CASE WHEN contains(r,'senior') OR contains(r,'lead')
             THEN 'mid_to_senior' ELSE 'junior_to_mid' END AS stage
      FROM roles
    )
    SELECT track, stage, COUNT(*) AS n FROM c
    GROUP BY track, stage ORDER BY track, stage
"""


QUERIES = {
    "job_compatibility": q_job_compatibility,
    "benefit_category_counts": q_benefit_category_counts,
    "career_tracks": q_career_tracks,
    "analysis_framework": q_analysis_framework,
    "skill_gaps": q_skill_gaps,
}

ORACLES = {
    "job_compatibility": _compatibility_sql(),
    "benefit_category_counts": _benefit_counts_sql(),
    "career_tracks": _CAREER_SQL,
    "analysis_framework": _analysis_framework_sql(),
    "skill_gaps": _skill_gaps_sql(),
}
