"""Third-engine property tests: phrase search, Bloom positions, LM
perplexity — pure-Python references over hypothesis-generated inputs.

Rounding-sensitive values (nll/ppl) are compared after pushing the
Python reference through the same stable_round definition
(floor(x*10^d + 0.5)/10^d); everything else is exact.
"""

from __future__ import annotations

import hashlib
import math
import uuid
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.plans.crawlops import (
    BLOOM_K,
    BLOOM_M,
    q_bloom_seen_audit,
)
from job_crawler_spark.plans.retrieval_plans import (
    PHRASE_TOP_K,
    PHRASES,
    q_phrase_search,
)
from job_crawler_spark.plans.textops import q_doc_lm_perplexity

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _sr(x: float, d: int) -> float:
    scale = 10**d
    return math.floor(x * scale + 0.5) / scale


def _write_docs(spark, tmp_path, texts):
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(f"{sub}/documents.parquet")
    return sub


# --- phrase search ------------------------------------------------------

phrase_words = st.sampled_from(
    ["table", "hash", "customer", "join", "merge", "group", "x"]
)
phrase_docs = st.lists(
    st.lists(phrase_words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_phrase(texts):
    out = []
    for qid, (t1, t2) in PHRASES.items():
        scored = []
        for i, t in enumerate(texts):
            tk = t.strip().lower().split()
            n = sum(
                1
                for j in range(len(tk) - 1)
                if tk[j] == t1 and tk[j + 1] == t2
            )
            if n > 0:
                scored.append((f"d{i:03d}", n))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for rank, (d, n) in enumerate(scored[:PHRASE_TOP_K], start=1):
            out.append((qid, d, n, rank))
    return out


@_settings
@given(texts=phrase_docs)
def test_phrase_search_matches_python(spark, tmp_path, texts):
    sub = _write_docs(spark, tmp_path, texts)
    got = [
        (r["query_id"], r["doc_id"], r["n_matches"], r["rank"])
        for r in q_phrase_search(spark, sub).collect()
    ]
    assert got == _py_phrase(texts)


# --- bloom audit --------------------------------------------------------


def _canon(i: int) -> str:
    # frontier_df's URL for orderkey i, canonicalized: host lowercased,
    # tracking param stripped, query keys sorted
    return (
        f"https://board{i % 7}.example.com/jobs/{i}"
        f"?a=1&b={i % 3}"
    )


def _pos(u: str, i: int) -> int:
    h = hashlib.md5(f"bloom:{i}:{u}".encode()).hexdigest()[:8]
    return int(h, 16) % BLOOM_M


def _py_bloom(ids):
    seen = {_canon(i) for i in ids if i % 2 == 0}
    probes = sorted({_canon(i) for i in ids if i % 3 == 0})
    bits = {_pos(u, i) for u in seen for i in range(BLOOM_K)}
    n_member = n_hits = n_fp = 0
    for u in probes:
        member = u in seen
        hit = all(_pos(u, i) in bits for i in range(BLOOM_K))
        n_member += member
        n_hits += hit
        n_fp += hit and not member
    fp = _sr(n_fp / max(len(probes) - n_member, 1), 6)
    return (
        len(seen), len(bits), len(probes), n_member, n_hits, n_fp, fp
    )


@_settings
@given(
    ids=st.lists(
        st.integers(1, 500), min_size=1, max_size=40, unique=True
    )
)
def test_bloom_audit_matches_python(spark, tmp_path, ids):
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(i,) for i in ids], "o_orderkey long"
    ).write.mode("overwrite").parquet(f"{sub}/orders.parquet")
    rows = q_bloom_seen_audit(spark, sub).collect()
    if not any(i % 2 == 0 for i in ids) and not any(
        i % 3 == 0 for i in ids
    ):
        # degenerate: no seen and no probes -> single all-zero row
        pass
    got = tuple(rows[0])
    assert got == _py_bloom(ids)


# --- LM perplexity ------------------------------------------------------

lm_docs = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=3),
        min_size=0,
        max_size=6,
    ).map(" ".join),
    min_size=1,
    max_size=4,
)


def _py_ppl(texts):
    docs = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.strip().lower().split() if w]
        if len(ws) >= 2:
            docs[f"d{i:03d}"] = ws
    bg: Counter = Counter()
    for ws in docs.values():
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    hist: Counter = Counter()
    for (a, _b), c in bg.items():
        hist[a] += c
    v = len({b for (_a, b) in bg})
    out = []
    for d in sorted(docs):
        ws = docs[d]
        n = len(ws) - 1
        sl = sum(
            math.log((bg[(a, b)] + 1) / (hist[a] + v))
            for a, b in zip(ws, ws[1:])
        )
        nll = -sl / n
        out.append((d, n, _sr(nll, 6), _sr(math.exp(nll), 3)))
    return out


@_settings
@given(texts=lm_docs)
def test_lm_perplexity_matches_python(spark, tmp_path, texts):
    sub = _write_docs(spark, tmp_path, texts)
    got = [
        (r["doc_id"], r["n_bigrams"], r["nll"], r["ppl"])
        for r in q_doc_lm_perplexity(spark, sub).collect()
    ]
    assert got == _py_ppl(texts)
