"""Golden tests for the feature-extraction column expressions.

Mirrors the reference's operator golden values
(tests/test_main.py:279-299) plus the determinism traps from SURVEY.md §7.3:
substring (not word-boundary) matching, vocabulary-order output,
first-match-wins classifier order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.functions.text import (
    TECH_KEYWORDS,
    features_col,
    py_extract_features,
)

GOLDEN_JOB = {
    "title": "Senior Python Developer",
    "company": "TechCorp",
    "description": (
        "We need a senior Python developer with Django and AWS experience. "
        "Remote work available. Pension and healthcare benefits. "
        "5+ years required."
    ),
    "salary_min": 70000,
    "salary_max": 90000,
}


def _spark_features(spark, jobs: list[dict]) -> list[dict]:
    rows = [
        (
            j.get("title"),
            j.get("description"),
            float(j["salary_min"]) if j.get("salary_min") is not None else None,
            float(j["salary_max"]) if j.get("salary_max") is not None else None,
        )
        for j in jobs
    ]
    df = spark.createDataFrame(
        rows, "title string, description string, salary_min double, salary_max double"
    )
    out = df.select(
        features_col(
            F.col("description"), F.col("title"), F.col("salary_min"), F.col("salary_max")
        ).alias("f")
    ).collect()
    return [r.f.asDict(recursive=True) for r in out]


def test_reference_golden_values(spark):
    # reference tests/test_main.py:279-299 golden expectations
    f = _spark_features(spark, [GOLDEN_JOB])[0]
    assert "python" in f["tech_stack"]
    assert "django" in f["tech_stack"]
    assert "aws" in f["tech_stack"]
    assert f["experience_level"] == "senior"
    assert f["remote_policy"] == "remote"
    assert f["has_benefits"] is True
    assert f["salary_info"]["average"] == 80000.0
    assert f["description_length"] == len(GOLDEN_JOB["description"])


def test_substring_not_word_boundary(spark):
    # "go" must match inside "Django" (main.py:308-310 semantics)
    f = _spark_features(
        spark, [{"title": "", "description": "We use Django daily."}]
    )[0]
    assert "go" in f["tech_stack"]
    assert "django" in f["tech_stack"]


def test_vocabulary_order(spark):
    desc = "rust and python and java and api and c# here"
    f = _spark_features(spark, [{"title": "", "description": desc}])[0]
    # output order == vocabulary order, not document order
    # ("java" also substring-matches "javascript"? no — other direction;
    #  but "java" matches inside "javascript" is irrelevant: doc has "java")
    expected = [k for k in TECH_KEYWORDS if k in desc]
    assert f["tech_stack"] == expected


def test_first_match_wins_order(spark):
    # doc matches junior AND senior -> junior wins (dict insertion order)
    f = _spark_features(
        spark,
        [{"title": "", "description": "graduate role; senior mentors on team"}],
    )[0]
    assert f["experience_level"] == "junior"


def test_experience_scans_title_remote_does_not(spark):
    f = _spark_features(
        spark, [{"title": "Senior Engineer (Remote)", "description": "plain text"}]
    )[0]
    assert f["experience_level"] == "senior"
    # remote indicators scan description only (main.py:318-322)
    assert f["remote_policy"] == "not_specified"


def test_salary_requires_both_bounds(spark):
    f = _spark_features(
        spark, [{"title": "", "description": "", "salary_min": 50000}]
    )[0]
    assert f["salary_info"] is None


def test_salary_zero_bound_is_falsy(spark):
    """Reference truthiness (main.py:330-334): a 0 bound yields no
    salary_info — engine and python oracle must both agree."""
    jobs = [
        {"title": "", "description": "", "salary_min": 0, "salary_max": 90000},
        {"title": "", "description": "", "salary_min": 50000, "salary_max": 0},
    ]
    for job, got in zip(jobs, _spark_features(spark, jobs)):
        assert got["salary_info"] is None, job
        assert py_extract_features(job)["salary_info"] is None, job


def test_nulls_degrade_gracefully(spark):
    f = _spark_features(spark, [{"title": None, "description": None}])[0]
    assert f["tech_stack"] == []
    assert f["experience_level"] == "not_specified"
    assert f["description_length"] == 0


def test_spark_matches_python_oracle(spark):
    jobs = [
        GOLDEN_JOB,
        {"title": "Go dev", "description": "Django, flexible hybrid, 3-5 years"},
        {"title": None, "description": None},
        {"title": "Manager", "description": "head of platform; office based",
         "salary_min": 100000, "salary_max": 140000},
        {"title": "x", "description": "entry level javascript; wfh; holiday pay"},
    ]
    got = _spark_features(spark, jobs)
    for job, g in zip(jobs, got):
        want = py_extract_features(job)
        if want["salary_info"] is None:
            assert g["salary_info"] is None
        else:
            assert g["salary_info"] == want["salary_info"]
        for k in ("tech_stack", "experience_level", "remote_policy",
                  "description_length", "has_benefits"):
            assert g[k] == want[k], (k, job)


def test_ngram_shingles_width_short_doc_and_dedup(spark):
    """Generalized word-n-gram shingles (decontamination): exact window
    positions, docs shorter than n yield an empty set (not NULL — the
    overlap join must simply drop them), repeats dedup within a doc."""
    from job_crawler_spark.plans.textops import _ngrams_col

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c"), (3, "x y z w x y z w")],
        "doc_id long, text string",
    ).orderBy("doc_id")
    rows = df.select("doc_id", _ngrams_col(4).alias("sh")).collect()
    got = {r.doc_id: r.sh for r in rows}
    assert got[1] == ["a b c d", "b c d e"]
    assert got[2] == []
    assert got[3] == ["x y z w", "y z w x", "z w x y", "w x y z"]


def test_decontaminate_flags_shared_shingles_only(spark):
    """Semantics beyond the oracle: a train doc sharing one 4-gram with an
    eval-bucket doc is flagged (n_overlap counts distinct shared shingles),
    a doc with the same WORDS but no common 4-gram window is not, and the
    val split is labeled. Bucket membership is the md5-prefix hash, computed
    independently here in Python."""
    import hashlib

    from job_crawler_spark.plans.textops import decontaminate

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100

    eval_id = next(i for i in range(1000) if bucket(i) >= 95)
    val_id = next(i for i in range(1000) if 90 <= bucket(i) < 95)
    hit, miss = [i for i in range(1000) if bucket(i) < 90][:2]
    leak = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [
            (eval_id, f"held out text {leak} end"),
            (hit, f"prefix {leak} suffix words"),
            (miss, "beta gamma delta alpha nothing here"),
            (val_id, leak),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.split): r.n_overlap for r in decontaminate(df).collect()
    }
    assert got == {(hit, "train"): 1, (val_id, "val"): 1}


def test_length_quantiles_approx_swapin(spark):
    """The gated doc_length_quantiles is exact (oracle-comparable); its
    docstring names percentile_approx as the 10^10-rows-per-group swap-in.
    Pin that the swap-in is actually close: t-digest estimates at accuracy
    10000 land within 2% of the exact per-language median and 5% at p99
    (approx returns an actual element, no interpolation — on a few-hundred-
    row group the p99 gap is one tail element — so this runs at sf0.01,
    ~2000 docs/language)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    both = docs.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("exact50"),
        F.percentile(F.col("n_chars"), F.lit(0.99)).alias("exact99"),
        F.percentile_approx(F.col("n_chars"), F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx(F.col("n_chars"), F.lit(0.99), F.lit(10000)).alias("a99"),
    )
    for r in both.collect():
        assert abs(r.a50 - r.exact50) <= 0.02 * r.exact50, r
        assert abs(r.a99 - r.exact99) <= 0.05 * r.exact99, r


def test_weighted_sample_matches_python_es(spark):
    """The gated Efraimidis-Spirakis sample must equal a third-engine
    (pure Python hashlib/math) implementation of the same spec: seeded
    md5 -> uniform -> k = -ln(u)/w, K smallest keys win, (key, doc_id)
    order. Also pins the selection-probability direction: the max-weight
    doc is overwhelmingly more likely IN than a min-weight doc across
    seeds (here: checked on the fixed gate seed by construction)."""
    import hashlib
    import math

    import duckdb

    from job_crawler_spark.plans.textops import (
        WSAMPLE_K,
        WSAMPLE_SEED,
        q_doc_weighted_sample,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()

    def es_key(doc_id: int, n_chars: int) -> float:
        h = hashlib.md5(f"{WSAMPLE_SEED}:{doc_id}".encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 4294967296.0
        k = -math.log(u) / max(n_chars, 1)
        return math.floor(k * 1e9 + 0.5) / 1e9

    expect = sorted(
        ((es_key(d, n), d) for d, n in rows)
    )[:WSAMPLE_K]
    got = [
        (r.sample_key, r.doc_id)
        for r in q_doc_weighted_sample(spark, sf).collect()
    ]
    assert got == expect
    # weighting direction: expected key E[k] = 1/w, so the sampled set's
    # mean weight must exceed the corpus mean (weighted draws favor long docs)
    by_doc = dict(rows)
    mean_sampled = sum(by_doc[d] for _, d in got) / len(got)
    mean_corpus = sum(n for _, n in rows) / len(rows)
    assert mean_sampled > mean_corpus
