"""Third-engine property tests for the two 'apply' operators: BPE
segmentation (doc_bpe_tokens) and the data-contract suite
(table_expectations) — pure-Python references over random inputs.
"""

from __future__ import annotations

import math
import uuid
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_crawler_spark.plans.analytics_plans import (
    ORDER_STATUS_ACCEPTED,
    q_table_expectations,
)
from job_crawler_spark.plans.textops import (
    BPE_MERGE_STEPS,
    q_doc_bpe_tokens,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _sr(x: float, d: int) -> float:
    scale = 10**d
    return math.floor(x * scale + 0.5) / scale


# --- BPE segmentation ---------------------------------------------------


def _py_bpe_vocab(texts, k):
    wf: Counter = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wf[w] += 1
    vocab = {w: tuple(w) for w in wf}
    for _ in range(k):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (left, right), _c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = left + right

        def apply(syms):
            out, i = [], 0
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
    return vocab


def _py_bpe_tokens(texts, k):
    vocab = _py_bpe_vocab(texts, k)
    out = []
    for i, t in enumerate(texts):
        ws = [w for w in t.strip().lower().split() if w]
        if not ws:
            continue
        n_words = len(ws)
        n_chars = sum(len(w) for w in ws)
        n_sub = sum(len(vocab[w]) for w in ws)
        out.append(
            (
                f"d{i:03d}",
                n_words,
                n_chars,
                n_sub,
                _sr(n_chars / n_sub, 6),
            )
        )
    return out


bpe_docs = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5),
        min_size=0,
        max_size=6,
    ).map(" ".join),
    min_size=1,
    max_size=3,
)


@_settings
@given(texts=bpe_docs)
def test_segmentation_matches_python(spark, tmp_path, texts):
    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(f"{sub}/documents.parquet")
    got = [
        (
            r["doc_id"],
            r["n_words"],
            r["n_chars"],
            r["n_subword_tokens"],
            r["chars_per_token"],
        )
        for r in q_doc_bpe_tokens(spark, sub).collect()
    ]
    assert got == _py_bpe_tokens(texts, BPE_MERGE_STEPS)


# --- data-contract suite ------------------------------------------------

order_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(1, 5)),  # o_orderkey
        st.one_of(st.none(), st.integers(1, 4)),  # o_custkey
        st.one_of(st.none(), st.sampled_from(["O", "F", "P", "X"])),
        st.one_of(
            st.none(), st.sampled_from([-5.0, 0.0, 10.0, 99.5])
        ),  # o_totalprice
    ),
    min_size=1,
    max_size=12,
)
cust_keys = st.lists(st.integers(1, 4), min_size=0, max_size=3, unique=True)


def _py_expectations(orders, custs):
    n = len(orders)
    keys = [o[0] for o in orders]
    not_null = sum(1 for k in keys if k is None)
    uniq = n - len({k for k in keys if k is not None})
    acc = sum(
        1
        for o in orders
        if o[2] is not None and o[2] not in ORDER_STATUS_ACCEPTED
    )
    rng = sum(
        1 for o in orders if o[3] is not None and not (o[3] > 0)
    )
    fk = sum(1 for o in orders if o[1] is None or o[1] not in custs)
    checks = [
        ("accepted_values_o_orderstatus", acc),
        ("not_null_o_orderkey", not_null),
        ("range_o_totalprice_positive", rng),
        ("relationships_o_custkey_customer", fk),
        ("unique_o_orderkey", uniq),
    ]
    return [(c, n, v, v == 0) for c, v in checks]


@_settings
@given(orders=order_rows, custs=cust_keys)
def test_expectations_match_python(spark, tmp_path, orders, custs):
    from pyspark.sql import types as T

    sub = f"{tmp_path}/{uuid.uuid4().hex[:8]}"
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    spark.createDataFrame(orders, schema).write.mode(
        "overwrite"
    ).parquet(f"{sub}/orders.parquet")
    spark.createDataFrame(
        [(c,) for c in custs], "c_custkey long"
    ).write.mode("overwrite").parquet(f"{sub}/customer.parquet")
    got = [
        tuple(r) for r in q_table_expectations(spark, sub).collect()
    ]
    assert got == _py_expectations(orders, set(custs))
