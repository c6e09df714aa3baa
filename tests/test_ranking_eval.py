"""ranking_eval goldens: the metric layer recomputed in Python from the
bm25_topk rows (independent of the retrieval math), on a corpus crafted
so the score order DISAGREES with the relevance order — one doc repeats
a single query term many times (high BM25, rel = 1) while others match
two terms once (lower BM25, rel = 2) — driving nDCG strictly below 1.
"""

from __future__ import annotations

import math

from job_crawler_spark.operators.checkpoints import release_checkpoints
from job_crawler_spark.plans.retrieval_plans import (
    RANK_EVAL_K,
    RANK_REL_MIN,
    q_bm25_topk,
    q_ranking_eval,
)


def _sr(x: float, d: int = 6) -> float:
    scale = 10**d
    return math.floor(x * scale + 0.5) / scale


def _py_eval(bm_rows):
    byq = {}
    for r in bm_rows:
        byq.setdefault(r["query_id"], []).append(
            (r["rank"], r["n_terms"])
        )
    out = []
    for qid in sorted(byq):
        rows = sorted(byq[qid])
        dcg = sum(
            (2.0**rel - 1) / math.log2(rank + 1) for rank, rel in rows
        )
        rels = sorted((rel for _rank, rel in rows), reverse=True)
        idcg = sum(
            (2.0**rel - 1) / math.log2(j + 1)
            for j, rel in enumerate(rels, start=1)
        )
        n_rel = sum(1 for _r, rel in rows if rel >= RANK_REL_MIN)
        ndcg = _sr(dcg / idcg) if idcg > 0 else 0.0
        out.append(
            (
                qid,
                len(rows),
                _sr(dcg),
                _sr(idcg),
                ndcg,
                _sr(n_rel / float(RANK_EVAL_K)),
            )
        )
    return out


def test_metrics_match_python_and_ndcg_below_one(spark, tmp_path):
    # query 1 terms: fast, hash, join. d0 matches the RARE term 'fast'
    # (df=1 -> high idf, rel 1, top score); d1..d6 all match the two
    # COMMON terms hash+join (df=6 each -> low idf, rel 2, low score).
    # BM25 puts the rel-1 doc first, so the ideal (rel-desc) order
    # disagrees and nDCG drops below 1.
    texts = [("d0", "fast")] + [
        (f"d{i}", "hash join") for i in range(1, 7)
    ]
    spark.createDataFrame(texts, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")

    bm = q_bm25_topk(spark, str(tmp_path))
    bm_rows = bm.collect()
    release_checkpoints(bm)
    ev = q_ranking_eval(spark, str(tmp_path))
    got = [tuple(r) for r in ev.collect()]
    release_checkpoints(ev)

    assert got == _py_eval(bm_rows)
    q1 = next(r for r in got if r[0] == 1)
    assert q1[4] < 1.0, got  # ideal order disagrees with score order
    assert all(r[2] <= r[3] for r in got)  # dcg <= idcg invariant
