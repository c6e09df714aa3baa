"""Property tests: the distributed BPE trainer vs a pure-Python
reference implementation (a third engine besides Spark and DuckDB).

The hand goldens in test_bpe.py pin specific corpora; here hypothesis
generates random small corpora over a 2-letter alphabet (maximizing
adjacent-repeat and tie cases — exactly where the double-separator
replace and the deterministic argmax could diverge) and the Spark
trainer must reproduce the reference merge table exactly, including
early exhaustion. The reference implements Sennrich et al.'s algorithm
directly: count every adjacent position weighted by word frequency,
argmax with (count DESC, left ASC, right ASC), apply leftmost-
non-overlapping greedily.
"""

from __future__ import annotations

import uuid
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.plans.textops import (
    BPE_MERGE_STEPS,
    q_bpe_learn_merges,
)


def _py_bpe(texts: list[str], k: int) -> list[tuple[int, str, str, int]]:
    wf: Counter = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wf[w] += 1
    vocab = {w: tuple(w) for w in wf}
    merges = []
    for step in range(1, k + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((step, left, right, cnt))
        merged = left + right

        def apply(syms: tuple) -> tuple:
            out: list = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        vocab = {w: apply(s) for w, s in vocab.items()}
    return merges


words = st.text(alphabet="ab", min_size=1, max_size=5)
docs = st.lists(
    st.lists(words, min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs)
def test_trainer_matches_python_reference(spark, tmp_path, texts):
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(f"{sub}/documents.parquet")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in q_bpe_learn_merges(spark, sub).collect()
    ]
    assert got == _py_bpe(texts, BPE_MERGE_STEPS)
