"""Distributed dense linear algebra (operators/linalg.py) vs numpy.

The numpy reference is the ground truth the SQL oracle can't express
(eigenvectors); the Gram stage itself is additionally oracle-checked as
the gated query emb_gram_matrix.
"""

from __future__ import annotations

import numpy as np
import pytest

from job_crawler_spark.operators.linalg import (
    covariance_matrix,
    gram_upper,
    project_component,
    top_principal_component,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: a dominant direction the PCA must find
    d = 12
    n = 300
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    coeffs = rng.normal(scale=5.0, size=(n, 1))
    noise = rng.normal(scale=0.5, size=(n, d))
    shift = rng.normal(size=d)  # nonzero mean so centering matters
    mat = coeffs * direction + noise + shift
    mat32 = mat.astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(mat32)],
        "vec_id long, embedding array<float>",
    )
    return df, mat32.astype(np.float64), direction


def test_gram_upper_matches_numpy(spark, corpus):
    df, mat, _ = corpus
    want = mat.T @ mat
    got = np.zeros_like(want)
    for r in gram_upper(df).collect():
        got[r["i"], r["j"]] = r["g"]
        got[r["j"], r["i"]] = r["g"]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_covariance_matches_numpy(spark, corpus):
    df, mat, _ = corpus
    cov, mu, n = covariance_matrix(df)
    assert n == mat.shape[0]
    np.testing.assert_allclose(mu, mat.mean(axis=0), rtol=1e-9, atol=1e-12)
    want = np.cov(mat, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, want, rtol=1e-8, atol=1e-9)


def test_top_component_matches_eigh(spark, corpus):
    df, mat, direction = corpus
    v, lam, mu = top_principal_component(df)
    cov = np.cov(mat, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    # eigenvector up to sign; the planted direction dominates
    assert abs(float(np.dot(v, top))) > 0.9999
    assert abs(float(np.dot(v, direction))) > 0.99
    assert lam == pytest.approx(float(evals[-1]), rel=1e-6)
    # deterministic sign canonicalization: largest-|entry| positive
    assert v[int(np.argmax(np.abs(v)))] > 0


def test_projection_matches_numpy_and_stays_jvm(spark, corpus):
    df, mat, _ = corpus
    v, _, mu = top_principal_component(df)
    out = project_component(df, v, mean=mu)
    got = {r["vec_id"]: r["pc1"] for r in out.collect()}
    want = (mat - mat.mean(axis=0)) @ v
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(float(w), rel=1e-6, abs=1e-9)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning(" not in plan  # narrow projection, no shuffle


def test_gram_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "embedding array<float>")
    assert gram_upper(empty).count() == 0
    one = spark.createDataFrame(
        [([1.0, 2.0, -3.0],)], "embedding array<float>"
    )
    cells = {(r["i"], r["j"]): r["g"] for r in gram_upper(one).collect()}
    assert cells == {
        (0, 0): 1.0, (0, 1): 2.0, (0, 2): -3.0,
        (1, 1): 4.0, (1, 2): -6.0, (2, 2): 9.0,
    }


# Property test: gram_upper == numpy A^T A on random shapes — d down to 1,
# zero rows, constant columns, negatives; float32 inputs, double sums.
from hypothesis import given, settings
from hypothesis import strategies as st

_shape = st.tuples(st.integers(1, 20), st.integers(1, 6))


@given(_shape, st.integers(0, 2**32 - 1))
@settings(max_examples=8, deadline=None)
def test_gram_matches_numpy_random(spark, shape, seed):
    n, d = shape
    rng = np.random.default_rng(seed)
    mat = (rng.normal(scale=3.0, size=(n, d)) * rng.integers(0, 2, size=(n, 1))).astype(np.float32)
    df = spark.createDataFrame(
        [([float(x) for x in row],) for row in mat], "embedding array<float>"
    )
    want = mat.astype(np.float64).T @ mat.astype(np.float64)
    got = np.zeros((d, d))
    for r in gram_upper(df).collect():
        got[r["i"], r["j"]] = r["g"]
        got[r["j"], r["i"]] = r["g"]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


# --- Johnson-Lindenstrauss projection ----------------------------------------


def test_jl_matches_numpy_and_is_deterministic(spark):
    from job_crawler_spark.operators.linalg import jl_project

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(40, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["jl"] for r in jl_project(df, 8, 32, seed=5).collect()}
    # reproduce R exactly: pure function of (seed, dims)
    rr = np.random.default_rng(5).choice(
        (-1.0 / np.sqrt(8), 1.0 / np.sqrt(8)), size=(8, 32)
    )
    want = mat.astype(np.float64) @ rr.T
    for i in range(40):
        np.testing.assert_allclose(out[i], want[i], rtol=1e-9, atol=1e-12)
    # second run identical (determinism across invocations)
    again = {r["vec_id"]: r["jl"] for r in jl_project(df, 8, 32, seed=5).collect()}
    assert out == again


def test_jl_preserves_pairwise_distances(spark):
    from job_crawler_spark.operators.linalg import jl_project

    rng = np.random.default_rng(11)
    n, d, k = 60, 256, 64
    mat = rng.normal(size=(n, d)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    proj = {r["vec_id"]: np.array(r["jl"]) for r in jl_project(df, k, d, seed=1).collect()}
    ratios = []
    for i in range(n):
        for j in range(i + 1, n):
            orig = np.linalg.norm(mat[i].astype(np.float64) - mat[j])
            new = np.linalg.norm(proj[i] - proj[j])
            ratios.append(new / orig)
    ratios = np.array(ratios)
    # JL with k=64: distances preserved within ~35% for every pair of
    # this deterministic corpus, and tightly on average
    assert ratios.min() > 0.65 and ratios.max() < 1.35, (ratios.min(), ratios.max())
    assert abs(float(ratios.mean()) - 1.0) < 0.05


def test_jl_plan_is_narrow(spark):
    from job_crawler_spark.operators.linalg import jl_project

    df = spark.createDataFrame(
        [([1.0] * 16,)], "embedding array<float>"
    )
    out = jl_project(df, 4, 16, seed=0)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "hashpartitioning(" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
