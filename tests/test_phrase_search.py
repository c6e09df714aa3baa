"""phrase_search goldens: hand-built corpus with known adjacencies.

Docs (phrase 1 = "table hash", 2 = "customer join", 3 = "merge group"):
  d0: "table hash table hash"    -> q1 x2 (positions 0-1 and 2-3)
  d1: "table x hash"             -> no q1 match (not adjacent)
  d2: "customer join customer"   -> q2 x1
  d3: "hash table"               -> no q1 match (wrong order)
  d4: "merge group merge group merge" -> q3 x2
Ranking within q1: only d0 matches; q2: d2; q3: d4.
Case-folding: d5 "Table HASH" counts for q1 (x1), ranked after d0 by
(n_matches DESC, doc_id ASC).
"""

from __future__ import annotations

from job_crawler_spark.plans.retrieval_plans import q_phrase_search


def test_adjacency_order_case_and_counts(spark, tmp_path):
    texts = [
        ("d0", "table hash table hash"),
        ("d1", "table x hash"),
        ("d2", "customer join customer"),
        ("d3", "hash table"),
        ("d4", "merge group merge group merge"),
        ("d5", "Table  HASH"),
    ]
    spark.createDataFrame(texts, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = [
        (r["query_id"], r["doc_id"], r["n_matches"], r["rank"])
        for r in q_phrase_search(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, "d0", 2, 1),
        (1, "d5", 1, 2),
        (2, "d2", 1, 1),
        (3, "d4", 2, 1),
    ]
