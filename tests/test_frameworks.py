"""D2-D5 framework/template generators: reference-semantics golden tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.functions.frameworks import (
    benefit_categories_col,
    career_track_col,
    classify_skills_col,
    enrich_jobs_with_frameworks,
    skill_gap_cols,
)


def test_skill_buckets_reference_semantics(spark):
    # mirrors main.py:605-655: case-insensitive membership, user-list order
    skills = ["Python", "React", "AWS", "PostgreSQL", "Excel", "go"]
    df = spark.createDataFrame([(skills,)], "skills array<string>")
    row = df.select(classify_skills_col(F.col("skills")).alias("b")).collect()[0].b
    assert row.programming_languages == ["Python", "go"]
    assert row.frameworks == ["React"]
    assert row.tools == ["AWS"]
    assert row.databases == ["PostgreSQL"]  # Excel in no bucket


def test_benefit_categories_order_and_titlecase(spark):
    desc = "we offer health and dental cover, a learning budget and equity"
    df = spark.createDataFrame([(desc,)], "d string")
    got = df.select(
        benefit_categories_col(F.lower(F.col("d"))).alias("b")
    ).collect()[0].b
    # dict insertion order; '_' -> ' ' + Title Case (main.py:1037-1041, F8)
    assert got == ["Health Insurance", "Learning Budget", "Stock Options"]


def test_career_track_classifier_precedence(spark):
    cases = [
        ("Senior Software Engineer", "software_engineer", "mid_to_senior"),
        ("junior developer", "software_engineer", "junior_to_mid"),
        ("Senior Data Engineer", "data_scientist", "mid_to_senior"),  # data beats eng
        ("Product Manager", "product_manager", "junior_to_mid"),
        ("Lead Product Designer", "product_manager", "mid_to_senior"),
        ("data analyst", "data_scientist", "junior_to_mid"),
    ]
    df = spark.createDataFrame([(c[0].lower(),) for c in cases], "r string")
    got = df.select(career_track_col(F.col("r")).alias("t")).collect()
    for (role, track, stage), r in zip(cases, got):
        assert (r.t.track, r.t.stage) == (track, stage), role


def test_skill_gaps_order_and_slicing(spark):
    req = ["system design", "mentoring", "architecture", "python"]
    cur = ["python"]
    df = spark.createDataFrame(
        [(req, [c.lower() for c in cur])],
        "req array<string>, cur array<string>",
    )
    gaps = skill_gap_cols(F.col("req"), F.col("cur"))
    row = df.select(
        gaps["missing"].alias("m"),
        gaps["immediate_focus"].alias("i"),
        gaps["medium_term"].alias("t"),
    ).collect()[0]
    assert row.m == ["system design", "mentoring", "architecture"]
    assert row.i == ["system design", "mentoring"]  # first 2 (main.py:1455)
    assert row.t == ["architecture"]


def test_enrich_jobs_end_to_end(spark):
    jobs = spark.createDataFrame(
        [
            (1, "Senior Python Developer", "TechCorp",
             "python django aws; remote work; pension and equity",
             70000, 90000),
            (2, "Office Clerk", "PaperCo", "filing in person", None, None),
        ],
        "id long, title string, company string, description string,"
        " salary_min long, salary_max long",
    )
    out = enrich_jobs_with_frameworks(
        jobs, ["Python", "AWS"], experience_years=5, salary_expectation=80000
    ).collect()
    by_id = {r.id: r for r in out}
    good, bad = by_id[1], by_id[2]
    assert good.compatibility > bad.compatibility
    assert 1.0 <= bad.compatibility <= 10.0
    assert good.framework.job_title == "Senior Python Developer"
    assert "TechCorp" in good.framework.analysis_prompts.requirements_extraction
    assert good.framework.criteria_weights["technical_skills"] == 40
    assert "Pension" in list(good.benefit_categories)
    # description truncation to 800 (main.py:380)
    assert len(good.framework.job_description) <= 800
