"""Property test: winnowing fingerprints vs a direct Python reference
(Schleimer/Wilkerson/Aiken algorithm transcribed literally) — random
token streams over a tiny alphabet maximize k-gram hash collisions and
repeated windows, the regime where the min-of-window selection and the
distinct fold could diverge. Short docs (< k tokens, < w k-grams) pin
the boundary branches.
"""

from __future__ import annotations

import hashlib
import re
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.plans.textops import (
    NGRAM,
    ROLL_B,
    ROLL_B2,
    ROLL_M,
    WINNOW_W,
    q_winnow_fingerprints,
)


def _h(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % ROLL_M


def _py_winnow(texts):
    out = []
    for i, text in enumerate(texts):
        toks = re.split(r"\s+", text.strip().lower())
        hs = [_h(t) for t in toks]
        n = len(hs)
        if n >= NGRAM:
            kg = [
                (hs[j] + hs[j + 1] * ROLL_B + hs[j + 2] * ROLL_B2)
                % ROLL_M
                for j in range(n - NGRAM + 1)
            ]
        else:
            kg = []
        m = len(kg)
        if m >= WINNOW_W:
            fps = {
                min(kg[j : j + WINNOW_W])
                for j in range(m - WINNOW_W + 1)
            }
        else:
            fps = set(kg)
        out.extend((f"d{i:03d}", fp) for fp in sorted(fps))
    return sorted(out)


texts_st = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=0, max_size=2),
        min_size=0,
        max_size=10,
    ).map(" ".join),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st)
def test_winnow_matches_python(spark, tmp_path, texts):
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(f"{sub}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["fingerprint"])
        for r in q_winnow_fingerprints(spark, sub).collect()
    )
    assert got == _py_winnow(texts)
