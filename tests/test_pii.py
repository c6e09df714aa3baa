"""Golden tests for the regex span-extraction / redaction operator
(operators/spans.py) with hand-placed PII, plus oracle parity for the
gated pii_spans query at sf0.001.

The hostile inputs pin exactly what the cumulative-offset math must get
right: a match at offset 0, repeated identical matches, several matches of
one kind in one document, matches of different kinds interleaved, and a
document with no matches at all (must emit nothing). Expected offsets are
derived independently with Python's re.finditer — a third regex engine
agreeing with both Spark and DuckDB."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from job_crawler_spark.operators.spans import PII_KINDS, redact_text, regex_spans

DOCS = [
    # match at offset 0 + two emails (one repeated later verbatim)
    (1, "a@b.cc call +1-555-0100 then a@b.cc again"),
    # interleaved kinds, url mid-text, multiple phones
    (2, "see https://x.example/p first 212-555-0198 or 212-555-0199 end"),
    # no PII at all
    (3, "plain text with no contacts whatsoever"),
    # adjacent-ish matches and a trailing match at end-of-string
    (4, "mail me: u_1%x@sub.domain.example +44-201-30459 https://e.example"),
]


def _expected():
    rows = set()
    for doc_id, text in DOCS:
        for kind, pat in PII_KINDS.items():
            for m in re.finditer(pat, text):
                rows.add((doc_id, kind, m.group(0), m.start()))
    return rows


def test_regex_spans_golden(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.kind, r.text, r.offset)
        for r in regex_spans(df, "text", ["doc_id"]).collect()
    }
    want = _expected()
    assert want, "golden fixture produced no expected spans — vacuous"
    # the fixture must actually exercise the hard cases
    assert any(off == 0 for (_, _, _, off) in want)            # offset 0
    assert len([1 for (d, k, _, _) in want if (d, k) == (2, "phone")]) == 2
    assert got == want


def test_regex_spans_plan_is_narrow(spark):
    """Scale contract: the scan is shuffle-free (no exchange anywhere) —
    it rides along a corpus pass."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = regex_spans(df, "text", ["doc_id"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan, plan


def test_redact_text(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r.doc_id: r.red
        for r in df.select(
            "doc_id", redact_text("text").alias("red")
        ).collect()
    }
    assert out[1] == "[email] call [phone] then [email] again"
    assert out[2] == "see [url] first [phone] or [phone] end"
    assert out[3] == "plain text with no contacts whatsoever"  # untouched
    for red in out.values():
        for pat in PII_KINDS.values():
            assert not re.search(pat, red), (pat, red)


def test_pii_spans_oracle_parity(spark):
    """The gated query vs its DuckDB oracle at sf0.001 (the driver's gate
    runs the same comparison at sf0.01)."""
    from job_crawler_spark.plans.pii_plans import ORACLES, q_pii_spans
    from tests.oracle_harness import duck_conn, compare

    sf = "/root/testdata/sf0.001"
    out = q_pii_spans(spark, sf)
    con = duck_conn(sf)
    try:
        compare(out, con, ORACLES["pii_spans"])
    finally:
        con.close()
    # non-vacuous: every document contributes all three kinds
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    per_kind = {
        r.kind: r.n
        for r in out.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    assert per_kind == {"email": n_docs, "phone": n_docs, "url": n_docs}
