"""Bigram-LM perplexity goldens (hand-worked model, no Spark oracle).

The corpus model is small enough to enumerate by hand: the bigram and
history counts, the continuation vocabulary V, and every smoothed
probability are derived on paper below; the expected nll/ppl are those
hand fractions pushed through math.log/exp with the same stable-round
convention the engine contracts (floor(x*10^d + 0.5)/10^d). The DuckDB
oracle parity run lives in the standard gate (tests/test_oracle_parity.py
covers `doc_lm_perplexity` automatically).
"""

from __future__ import annotations

import math

from job_crawler_spark.plans.textops import q_doc_lm_perplexity


def _sr(x: float, d: int) -> float:
    scale = 10**d
    return math.floor(x * scale + 0.5) / scale


def _run(spark, tmp_path, texts):
    spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_doc_lm_perplexity(spark, str(tmp_path)).collect()
    return [(r["doc_id"], r["n_bigrams"], r["nll"], r["ppl"]) for r in rows]


def test_hand_worked_model_weighted_counts_and_exclusions(spark, tmp_path):
    # corpus: d0 = "a b a b", d1 = "a b"; d2 (1 token) and d3 (empty)
    # are excluded. Bigram counts: C(a,b)=3, C(b,a)=1; histories
    # C(a->.)=3, C(b->.)=1; continuation vocab V = |{a,b}| = 2.
    # P(b|a) = (3+1)/(3+2) = 4/5, P(a|b) = (1+1)/(1+2) = 2/3.
    got = _run(spark, tmp_path, ["a b a b", "a b", "c", "   "])
    # d0: three bigram positions (a,b)x2 + (b,a)x1
    nll0 = -(2 * math.log(4 / 5) + math.log(2 / 3)) / 3
    # d1: one position, nll = -ln(4/5), ppl = 5/4 exactly
    nll1 = -math.log(4 / 5)
    want = [
        ("d0", 3, _sr(nll0, 6), _sr(math.exp(nll0), 3)),
        ("d1", 1, _sr(nll1, 6), 1.25),
    ]
    assert got == want


def test_continuation_vocab_is_distinct_w2_not_all_tokens(spark, tmp_path):
    # corpus: "x y" and "y z" -> bigrams (x,y), (y,z); continuations
    # {y, z} so V = 2 ('x' never follows anything). Each history has
    # count 1, each bigram count 1 -> P = (1+1)/(1+2) = 2/3 for both,
    # ppl = 3/2 exactly. If V wrongly counted all distinct tokens (3),
    # P would be 2/4 and ppl 2.0 — this pins the stated contract.
    got = _run(spark, tmp_path, ["x y", "y z"])
    assert got == [
        ("d0", 1, _sr(math.log(1.5), 6), 1.5),
        ("d1", 1, _sr(math.log(1.5), 6), 1.5),
    ]


def test_case_folding_and_whitespace_tokenizer_shared(spark, tmp_path):
    # "A  b" tokenizes to [a, b] (case-fold + multi-space split), so it
    # shares the (a,b) bigram with "a b": C(a,b)=2, C(a->.)=2, V=1,
    # P(b|a) = (2+1)/(2+1) = 1 -> nll 0, ppl 1 for both docs.
    got = _run(spark, tmp_path, ["A  b", "a b"])
    assert got == [("d0", 1, 0.0, 1.0), ("d1", 1, 0.0, 1.0)]
