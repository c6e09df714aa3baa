"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (crawl-parse-enrich over the
sf0.001 documents table). ``queries()`` / ``oracle_sql()`` enumerate every
implemented operator from SURVEY.md §2 with DuckDB-checkable oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse the sf0.001 documents into spans, extract features
    (tech stack / experience / remote / benefits), aggregate per language.

    Exercises the core path end-to-end: parquet scan -> Arrow-batched span
    parse -> JVM feature expressions -> hash aggregate.
    """
    from pyspark.sql import functions as F

    from job_crawler_spark.crawl import parser

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url_canon"),
        F.col("text").alias("page"),
    )
    parsed = parser.parse_pages(pages)
    enriched = parser.enrich_documents(parsed.select("doc_id", "spans"))
    langs = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "lang")
    return (
        enriched.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
            F.sum(F.size("features.tech_stack")).alias("n_tech_hits"),
            F.sum(F.col("features.has_benefits").cast("long")).alias("n_with_benefits"),
        )
        .orderBy("lang")
    )


def _plan_modules():
    from job_crawler_spark.plans import (
        analytics_plans,
        crawlops,
        events_plans,
        frameworks_plans,
        graph_plans,
        pii_plans,
        relational,
        retrieval_plans,
        similarity,
        sketch_plans,
        textops,
        tpch,
    )

    return [
        analytics_plans,
        crawlops,
        events_plans,
        frameworks_plans,
        graph_plans,
        pii_plans,
        relational,
        retrieval_plans,
        similarity,
        sketch_plans,
        textops,
        tpch,
    ]


# The driver samples a subset of queries() per round, so insertion order
# decides which entries get a fresh external-gate row. Order queries
# least-recently-green first, derived from the committed CORRECTNESS_r*.json
# artifacts: a query with no green row ever (e.g. one added this round)
# sorts before everything else, and a query last green in round N-1 sorts
# before one refreshed in round N. This self-rotates every round without a
# hand-maintained list (names in old artifacts that no longer exist in
# queries() are ignored; see tests/test_oracle_parity.py for the pin).


def _last_green_rounds() -> dict[str, int]:
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
            rows = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            # hash_match for full value checks; rows-only checks (no oracle
            # SQL) count as green when the row check passed.
            green = row.get("hash_match")
            if green is None:
                green = row.get("rows_match")
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered(merged: dict) -> dict:
    last = _last_green_rounds()
    pos = {k: i for i, k in enumerate(merged)}
    return {
        k: merged[k]
        for k in sorted(merged, key=lambda k: (last.get(k, 0), pos[k]))
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _plan_modules():
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _plan_modules():
        out.update(mod.ORACLES)
    return _ordered(out)
