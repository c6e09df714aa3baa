"""Gated PII/contact-span scan (operators/spans.py) over the documents
table.

The synthetic corpus contains no contact strings, so the query would be
vacuously empty over raw ``text``. Instead the query synthesizes a
deterministic contact blurb PER DOCUMENT from existing columns (a
variable-length corpus-text prefix — ``n_chars % 37`` characters — then an
email, a phone number, and a URL derived from ``doc_id``) and runs the
REAL extraction operator over it; the DuckDB oracle builds the identical
string and re-derives every span with its own regex engine and offset
arithmetic, so the operator's match set AND 0-based offsets are
value-checked non-vacuously at the gates (3 spans x n_docs rows, offsets
varying per document). The fixture is in-query, seeded only by table
columns — no external data. The operator itself (kind packs, i-th-match
offset math, redaction) is additionally golden-tested with hand-placed
PII in tests/test_pii.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_crawler_spark.operators.spans import PII_KINDS, regex_spans


def _contact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sid = F.col("doc_id").cast("string")
    ctext = F.concat(
        F.col("text").substr(F.lit(1), (F.col("n_chars") % 37).cast("int")),
        F.lit(" Contact u"),
        sid,
        F.lit("@mail"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" via https://jobs.example/post/"),
        sid,
        F.lit(" bye"),
    )
    return docs.select("doc_id", ctext.alias("ctext"))


def q_pii_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One span row per PII match: (doc_id, kind, text, offset), 0-based
    character offsets, ordered (doc_id, offset, kind). Narrow shuffle-free
    scan — rides along any corpus pass at 100 TB."""
    return regex_spans(
        _contact_docs(spark, sf_dir), "ctext", ["doc_id"], PII_KINDS
    ).orderBy("doc_id", "offset", "kind")


_CTEXT_SQL = """
          SELECT doc_id,
                 substr(text, 1, CAST(n_chars % 37 AS INT))
                 || ' Contact u' || CAST(doc_id AS VARCHAR)
                 || '@mail' || CAST(doc_id % 5 AS VARCHAR)
                 || '.example or +1-555-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' via https://jobs.example/post/'
                 || CAST(doc_id AS VARCHAR) || ' bye' AS ctext
          FROM documents
"""


def _kind_scan_sql(kind: str, pat: str) -> str:
    # i-th match offset = len(gaps before it) + len(matches before it);
    # list_sum of the empty ms[1:0] slice is NULL -> COALESCE 0.
    return f"""
          SELECT doc_id, '{kind}' AS kind, txt AS text,
                 CAST(list_sum(list_transform(gs[1:i], s -> length(s)))
                      + COALESCE(list_sum(list_transform(ms[1:i-1],
                                                         s -> length(s))), 0)
                      AS BIGINT) AS "offset"
          FROM (
            SELECT doc_id, unnest(ms) AS txt,
                   generate_subscripts(ms, 1) AS i, ms, gs
            FROM (
              SELECT doc_id, regexp_extract_all(ctext, '{pat}') AS ms,
                     regexp_split_to_array(ctext, '{pat}') AS gs
              FROM c
            ) WHERE len(ms) > 0
          )
"""


def _pii_spans_sql() -> str:
    scans = "\n          UNION ALL\n".join(
        _kind_scan_sql(kind, pat) for kind, pat in PII_KINDS.items()
    )
    return f"""
        WITH c AS ({_CTEXT_SQL})
        {scans}
        ORDER BY doc_id, "offset", kind
    """


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redaction TRANSFORM gated (operators/spans.redact_text):
    every contact span replaced in place by its per-kind token — the
    pass a training pipeline runs over the corpus before anything else
    sees the text (detection without redaction is only an audit).
    Output: (doc_id, redacted, n_removed_chars) over the same in-query
    contact fixture `pii_spans` scans, so the transform is value-checked
    against DuckDB's regex engine replacing with identical patterns in
    identical kind order (earlier kinds win on overlap — the
    redact_text contract). Narrow shuffle-free projection; rides along
    any corpus pass at 100 TB; zero Python."""
    from job_crawler_spark.operators.spans import redact_text

    c = _contact_docs(spark, sf_dir)
    red = redact_text(F.col("ctext"))
    return c.select(
        "doc_id",
        red.alias("redacted"),
        (F.length("ctext") - F.length(red)).cast("long").alias(
            "n_removed_chars"
        ),
    ).orderBy("doc_id")


def _pii_redact_sql() -> str:
    from job_crawler_spark.operators.spans import PII_KINDS

    expr = "ctext"
    for kind, pat in PII_KINDS.items():
        expr = f"regexp_replace({expr}, '{pat}', '[{kind}]', 'g')"
    return f"""
        WITH c AS ({_CTEXT_SQL})
        SELECT doc_id, {expr} AS redacted,
               CAST(length(ctext) - length({expr}) AS BIGINT)
                 AS n_removed_chars
        FROM c ORDER BY doc_id
    """


QUERIES = {
    "pii_redact": q_pii_redact,
    "pii_spans": q_pii_spans,
}

ORACLES = {
    "pii_redact": _pii_redact_sql(),
    "pii_spans": _pii_spans_sql(),
}
