"""ssjoin_prefix_pairs: exact set-similarity join via prefix filtering.

Pins EXACTNESS against a pure-Python brute force on hostile shapes the
prefix/length filters could plausibly get wrong:

- completeness: no Jaccard >= tau pair is missed — including a pair whose
  shared shingles are ALL corpus-common (the case the ngram baseline's
  MAX_DF cutoff is blind to by construction), and a subset pair at the
  exact 2x length-filter boundary (|b| = 2|a|, J = 0.5);
- soundness: candidates that share a prefix token but fall below tau
  after exact verification are dropped (J just under 0.5);
- edge rows: docs with < NGRAM tokens have an empty shingle set and never
  pair; duplicate texts pair at J = 1.0.
"""

from __future__ import annotations

import math
import re

from job_crawler_spark.plans.textops import (
    NGRAM,
    SSJOIN_TAU,
    q_ssjoin_prefix_pairs,
)


def _shingles(text: str) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < NGRAM:
        return set()
    return {" ".join(toks[i : i + NGRAM]) for i in range(len(toks) - NGRAM + 1)}


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def _reference(rows: list[tuple[int, str]]) -> set[tuple[int, int, int, float]]:
    out = set()
    sh = {i: _shingles(t) for i, t in rows}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            o = len(sh[a] & sh[b])
            if o == 0:
                continue
            j = _round4(o / len(sh[a] | sh[b]))
            if j >= SSJOIN_TAU:
                out.add((a, b, o, j))
    return out


def _run(spark, tmp_path, rows: list[tuple[int, str]]):
    df = spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "ssjoin_docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = q_ssjoin_prefix_pairs(spark, sf).collect()
    return {(r.a, r.b, r.overlap, r.jaccard) for r in got}


HOSTILE = [
    # 1-2: identical docs -> J = 1.0
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta epsilon"),
    # 3: shares a long run with 1/2 -> high J
    (3, "alpha beta gamma delta zeta"),
    # 4-5: subset at the exact 2x boundary: doc 4 has 4 shingles, doc 5
    # has those 4 plus 4 more (8 total) -> J = 4/8 = 0.5 exactly, and
    # sz_b == 2 * sz_a sits ON the length-filter edge
    (4, "one two three four five six"),
    (5, "one two three four five six seven eight nine ten"),
    # 6: same subset one shingle longer -> J = 4/9 < 0.5, must be dropped
    (6, "one two three four five six seven eight nine ten eleven"),
    # 7: too short for any shingle (2 tokens)
    (7, "tiny doc"),
    # 8: shares exactly one shingle with 1 -> low J, dropped after verify
    (8, "alpha beta gamma completely different tail here"),
]

# every shingle below appears in ALL THREE docs (df = 3 = corpus-common for
# this corpus): the pairs exist only through common tokens, the regime a
# stop-token cutoff silently drops but an exact join must keep
COMMON_ONLY = [
    (10, "the quick brown fox jumps over the lazy dog"),
    (11, "the quick brown fox jumps over the lazy dog"),
    (12, "the quick brown fox jumps over the lazy dog today"),
]


def test_hostile_golden_exact(spark, tmp_path):
    rows = HOSTILE
    assert _run(spark, tmp_path, rows) == _reference(rows)
    ref = _reference(rows)
    # the fixture exercises what it claims to
    assert (1, 2, 3, 1.0) in ref
    assert any(a == 4 and b == 5 and j == 0.5 for a, b, _, j in ref)
    assert not any({a, b} == {4, 6} for a, b, _, _ in ref)
    assert not any(7 in (a, b) for a, b, _, _ in ref)
    assert not any(8 in (a, b) for a, b, _, _ in ref)


def test_common_token_pairs_not_dropped(spark, tmp_path):
    got = _run(spark, tmp_path, COMMON_ONLY)
    assert got == _reference(COMMON_ONLY)
    assert {(a, b) for a, b, _, _ in got} == {(10, 11), (10, 12), (11, 12)}


def test_combined_corpus_exact(spark, tmp_path):
    rows = HOSTILE + COMMON_ONLY
    assert _run(spark, tmp_path, rows) == _reference(rows)


# Positional-filter boundary (PPJoin, Xiao et al. WWW'08): docs 20/21 share
# an 8-shingle suffix run S (df pushed to 4 by the two fillers) and carry 4
# rare unique shingles each (df = 1, so they fill the front of the global
# (df, shingle) order). sz = 12, overlap = 8, J = 8/16 = 0.5 exactly; the
# FIRST collision lands at position 5 on both sides, so the overlap upper
# bound 1 + min(12-5, 12-5) = 8 EQUALS alpha = ceil((12+12)/3) = 8 — a true
# pair sitting exactly on the ubound >= alpha edge. An off-by-one in the
# positional prune (>) would silently drop it; the brute-force reference
# catches that here.
_S = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
POSITIONAL_EDGE = [
    (20, "ua1 ua2 ua3 ua4 " + _S),
    (21, "ub1 ub2 ub3 ub4 " + _S),
    (22, _S),
    (23, _S),
]


def test_positional_filter_boundary_kept(spark, tmp_path):
    got = _run(spark, tmp_path, POSITIONAL_EDGE)
    ref = _reference(POSITIONAL_EDGE)
    assert got == ref
    # the fixture exercises what it claims: 20/21 is a J = 0.5 pair whose
    # shared shingles all sit BEHIND 4 rare uniques in each doc's order
    assert any(a == 20 and b == 21 and j == 0.5 for a, b, _, j in ref)
    sh20, sh21 = _shingles(POSITIONAL_EDGE[0][1]), _shingles(
        POSITIONAL_EDGE[1][1]
    )
    assert len(sh20) == 12 and len(sh20 & sh21) == 8


def test_combined_with_positional_edge_exact(spark, tmp_path):
    rows = HOSTILE + COMMON_ONLY + POSITIONAL_EDGE
    assert _run(spark, tmp_path, rows) == _reference(rows)


# Property test: exactness on random adversarial corpora. A tiny shared
# vocabulary forces heavy shingle collisions, boundary sizes (docs right at
# NGRAM tokens), empty shingle sets, duplicate texts, and subset chains —
# every regime the prefix/length/positional prunes could get wrong. Each
# example is a full Spark run, so max_examples stays small; the shapes the
# prunes depend on (sizes, df order, positions) vary freely within it.
from hypothesis import given, settings
from hypothesis import strategies as st

_VOCAB = ["w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=14).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=10)

_example_n = [0]


@given(_corpus)
@settings(max_examples=5, deadline=None)
def test_random_corpus_exact(spark, tmp_path_factory, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    _example_n[0] += 1
    tmp = tmp_path_factory.mktemp(f"ssjoin_prop_{_example_n[0]}")
    assert _run(spark, tmp, rows) == _reference(rows)
