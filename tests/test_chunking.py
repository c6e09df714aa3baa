"""Overlapping token-window chunking (plans/textops.chunk_documents).

Golden windows on hand-built docs, the coverage/overlap invariants the
contract promises, edge cases at the size boundary, and the plan pin
(narrow: zero hash exchanges, zero Python). Cross-engine value parity
runs in tests/test_oracle_parity.py via the registry like every gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_crawler_spark.plans.textops import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def rows_of(df):
    return [tuple(r) for r in df.orderBy("doc_id", "chunk_id").collect()]


def test_golden_three_windows(spark):
    # 8 tokens, size 4, stride 3 -> [0,4) [3,7) [6,8)
    docs = _docs(spark, [(1, "a b c d e f g h")])
    got = rows_of(chunk_documents(docs, size=4, overlap=1))
    assert got == [
        (1, 0, 0, 4, 4, "a b c d"),
        (1, 1, 3, 7, 4, "d e f g"),
        (1, 2, 6, 8, 2, "g h"),
    ]


def test_exact_size_single_chunk(spark):
    docs = _docs(spark, [(1, "a b c d")])
    got = rows_of(chunk_documents(docs, size=4, overlap=1))
    assert got == [(1, 0, 0, 4, 4, "a b c d")]


def test_one_past_size_two_chunks_never_pure_suffix(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    got = rows_of(chunk_documents(docs, size=4, overlap=1))
    assert got == [
        (1, 0, 0, 4, 4, "a b c d"),
        (1, 1, 3, 5, 2, "d e"),
    ]


def test_short_and_single_token_docs(spark):
    docs = _docs(spark, [(1, "a b"), (2, "solo")])
    got = rows_of(chunk_documents(docs, size=4, overlap=1))
    assert got == [(1, 0, 0, 2, 2, "a b"), (2, 0, 0, 1, 1, "solo")]


def test_blank_docs_produce_no_chunks(spark):
    # trim strips SPACES only (Spark and DuckDB agree — that equivalence
    # is what keeps the shared tokenizer cross-engine exact)
    docs = _docs(spark, [(1, ""), (2, "    "), (3, "x y")])
    got = rows_of(chunk_documents(docs, size=4, overlap=1))
    assert [r[0] for r in got] == [3]


def test_normalization_matches_shared_tokenizer(spark):
    # lower(trim) + \s+ split: case folds, space runs collapse, edges
    # trimmed; interior tabs split like any whitespace
    docs = _docs(spark, [(1, "  Senior   Data\tEngineer X ")])
    got = rows_of(chunk_documents(docs, size=4, overlap=1))
    assert got == [(1, 0, 0, 4, 4, "senior data engineer x")]


def test_coverage_and_exact_overlap_invariants(spark):
    # every token index covered exactly; consecutive windows share
    # exactly `overlap` tokens (the last one included — the n_chunks
    # rule stops before a pure-suffix window exists)
    n_tok, size, overlap = 23, 5, 2
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(n_tok)))])
    got = rows_of(chunk_documents(docs, size=size, overlap=overlap))
    covered = set()
    for _, _, s, e, n, _ in got:
        assert n == e - s
        covered |= set(range(s, e))
    assert covered == set(range(n_tok))
    for prev, cur in zip(got, got[1:]):
        assert prev[3] - cur[2] == overlap


def test_validation():
    with pytest.raises(ValueError):
        chunk_documents(None, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(None, size=4, overlap=-1)


def test_plan_is_narrow_no_python(spark, queries=None):
    import __spark_entry__ as entry

    df = entry.queries()["doc_chunks"](spark, "/root/testdata/sf0.001")
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("hashpartitioning(") == 0, plan
    assert "Python" not in plan, plan
    # one corpus scan only, and it prunes to (doc_id, text)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "lang" not in plan.split("ReadSchema")[1].splitlines()[0], plan
