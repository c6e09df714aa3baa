"""BM25 retrieval: golden scores vs a pure-Python replica (third engine,
independent of both Spark and DuckDB) and the rank/tie-break contract."""

from __future__ import annotations

import math

from job_crawler_spark.plans.retrieval_plans import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    q_bm25_topk,
)


def _python_bm25(corpus: dict[int, str]) -> dict[tuple[int, int], float]:
    """Reference scores for every (query_id, doc_id) with >= 1 match."""
    toks = {d: [t for t in text.lower().strip().split() if t] for d, text in corpus.items()}
    tf = {d: {} for d in toks}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len([d for d in toks if dl[d] > 0])
    avgdl = sum(dl.values()) / n
    qterms = {t for terms in BM25_QUERIES.values() for t in terms}
    df = {t: sum(1 for d in toks if t in tf[d]) for t in qterms}
    out: dict[tuple[int, int], float] = {}
    for qid, terms in BM25_QUERIES.items():
        for d in toks:
            s = 0.0
            hit = False
            for t in terms:
                f = tf[d].get(t, 0)
                if not f:
                    continue
                hit = True
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * f * (BM25_K1 + 1) / (
                    f + BM25_K1 * (1 - BM25_B + BM25_B * dl[d] / avgdl)
                )
            if hit:
                out[(qid, d)] = math.floor(s * 1e6 + 0.5) / 1e6
    return out


def test_bm25_matches_python_replica(spark, tmp_path):
    corpus = {
        1: "fast hash join join join window",
        2: "fast fast sort merge stream the a of",
        3: "hash window query sort batch spark",
        4: "merge stream batch spark spark fast hash",
        5: "the quick brown fox",  # matches nothing
        6: "join",  # shortest doc: length normalization must boost it
    }
    rows = [(d, t, "en", "synth", len(t)) for d, t in corpus.items()]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        (r.query_id, r.doc_id): (r.score, r.rank, r.n_terms)
        for r in q_bm25_topk(spark, str(tmp_path)).collect()
    }
    want = _python_bm25(corpus)

    # every expected (query, doc) pair appears (corpus < top-k per query)
    assert set(got) == set(want)
    for key, expect in want.items():
        assert got[key][0] == expect, (key, got[key][0], expect)

    # rank is dense per query, ordered by (score desc, doc_id asc)
    for qid in BM25_QUERIES:
        qrows = sorted(
            ((d, s, r) for (q, d), (s, r, _) in got.items() if q == qid),
            key=lambda x: x[2],
        )
        assert [r for _, _, r in qrows] == list(range(1, len(qrows) + 1))
        keys = [(-s, d) for d, s, _ in qrows]
        assert keys == sorted(keys)

    # doc 5 shares no term with any query: absent everywhere
    assert not any(d == 5 for (_, d) in got)

    # length normalization: doc 6 ("join") outranks doc 1 for query 1's
    # term "join" alone it does not (doc 1 has tf=3), but its single-term
    # score must exceed doc 1's "join" term share thanks to dl=1 << avgdl.
    n_terms_6 = got[(1, 6)][2]
    assert n_terms_6 == 1


def test_postings_df_variants_bit_equal(spark):
    """The stopword-skew production path (df via partial-combined
    aggregate + vocab broadcast) is bit-equal to the gated window form —
    the docstring's scale claim as code, not comment."""
    from job_crawler_spark.operators.checkpoints import release_checkpoints
    from job_crawler_spark.plans.retrieval_plans import q_inverted_postings

    sf = "/root/testdata/sf0.001"
    win = q_inverted_postings(spark, sf).collect()
    agg_df = q_inverted_postings(spark, sf, df_via_window=False)
    agg = agg_df.collect()
    release_checkpoints(agg_df)
    assert [tuple(r) for r in win] == [tuple(r) for r in agg]


def test_postings_agg_variant_plan_window_free(spark):
    """Variant plan pin: no term-partitioned Window anywhere (the hot-term
    single-partition hazard is gone), df joined back by broadcast, zero
    parquet scans in the visible plan (postings materialized once), zero
    Python."""
    from job_crawler_spark.operators.checkpoints import release_checkpoints
    from job_crawler_spark.plans.retrieval_plans import q_inverted_postings

    df = q_inverted_postings(
        spark, "/root/testdata/sf0.001", df_via_window=False
    )
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    release_checkpoints(df)
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Location:") == 0, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
