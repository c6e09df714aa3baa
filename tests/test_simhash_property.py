"""Property test: the 32-bit SimHash signature vs a direct Python
reference (Charikar majority-vote per bit over md5 token hashes).
Random token streams over a tiny alphabet maximize repeated tokens —
the regime where the majority threshold (strict: 2*ones > n) sits on
exact ties and an off-by-one (>= vs >) would flip bits.
"""

from __future__ import annotations

import hashlib
import re
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.plans.textops import q_doc_simhash


def _py_simhash(texts):
    out = []
    for i, text in enumerate(texts):
        if not text.strip():
            continue
        toks = re.split(r"\s+", text.strip().lower())
        hs = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for t in toks
        ]
        n = len(hs)
        sig = 0
        for b in range(32):
            ones = sum(1 for h in hs if (h >> b) & 1)
            if 2 * ones > n:
                sig |= 1 << b
        out.append((f"d{i:03d}", sig))
    return sorted(out)


texts_st = st.lists(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=2),
        min_size=0,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st)
def test_simhash_matches_python(spark, tmp_path, texts):
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(f"{sub}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["simhash"])
        for r in q_doc_simhash(spark, sub).collect()
    )
    assert got == _py_simhash(texts)
