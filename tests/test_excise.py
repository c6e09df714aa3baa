"""Golden tests for exact-substring excision (plans/textops.py
q_doc_excise_dups): hand-built corpora where the duplicated passages and
the exact post-removal text are known. The corpus-scale aggregate form is
covered by the oracle-parity suite; these pin the removal semantics —
coverage union of overlapping passages, cross-doc (not within-doc)
duplication triggers, full-excision empty string, and untouched short docs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from job_crawler_spark.plans.textops import EXCISE_NGRAM


def _run(spark, tmp_path, texts):
    # Write a tiny documents.parquet so the query runs against its real
    # source contract (sf_dir/documents.parquet).
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from job_crawler_spark.plans.textops import q_doc_excise_dups

    out = q_doc_excise_dups(spark, str(tmp_path))
    return {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in out.collect()
    }


def test_shared_passage_removed_from_both_docs(spark, tmp_path):
    assert EXCISE_NGRAM == 4
    shared = "alpha beta gamma delta"  # one 4-gram, shared by docs 0 and 1
    texts = [
        f"u0 v0 {shared} w0",
        f"{shared} x1 y1 z1",
        "p2 q2 r2 s2 t2",  # unique 4-grams only: untouched
    ]
    got = _run(spark, tmp_path, texts)
    assert got[0] == (7, 4, "u0 v0 w0")
    assert got[1] == (7, 4, "x1 y1 z1")
    assert got[2] == (5, 0, "p2 q2 r2 s2 t2")


def test_overlapping_passages_merge_coverage(spark, tmp_path):
    # Docs 0 and 1 share a 5-token run => two overlapping duplicated
    # 4-grams; coverage is their union (5 tokens), not 8.
    run = "a1 b1 c1 d1 e1"
    texts = [f"head0 {run} tail0", f"{run} head1 tail1 end1"]
    got = _run(spark, tmp_path, texts)
    assert got[0] == (7, 5, "head0 tail0")
    assert got[1] == (8, 5, "head1 tail1 end1")


def test_full_excision_yields_empty_string(spark, tmp_path):
    t = "one two three four five"
    got = _run(spark, tmp_path, [t, t])
    assert got[0] == (5, 5, "")
    assert got[1] == (5, 5, "")


def test_within_doc_repetition_alone_does_not_trigger(spark, tmp_path):
    # The same 4-gram twice in ONE doc has doc-frequency 1 (per-doc
    # distinct counting): nothing is removed.
    texts = ["r s t u r s t u", "k l m n o p q"]
    got = _run(spark, tmp_path, texts)
    assert got[0] == (8, 0, "r s t u r s t u")
    assert got[1] == (7, 0, "k l m n o p q")


def test_short_docs_never_match(spark, tmp_path):
    texts = ["a b c", "a b c", "longer doc with unique words here"]
    got = _run(spark, tmp_path, texts)
    assert got[0] == (3, 0, "a b c")
    assert got[1] == (3, 0, "a b c")


def test_repeated_duplicated_shingle_positions_all_covered(spark, tmp_path):
    # The shared 4-gram occurs TWICE in doc 0 (positions 1 and 6): both
    # occurrences are excised because positional rows are not per-doc
    # deduped, only the doc-frequency count is.
    shared = "w x y z"
    texts = [f"{shared} mid0 {shared} tail0", f"{shared} other1 words1 here1"]
    got = _run(spark, tmp_path, texts)
    assert got[0] == (10, 8, "mid0 tail0")
    assert got[1] == (7, 4, "other1 words1 here1")
