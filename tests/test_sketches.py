"""Sketch synopses (operators/sketches.py): determinism pinned against a
pure-Python hashlib replica (a THIRD engine beside Spark and the DuckDB
oracle), plus the classic guarantees — CMS never undercounts, HLL lands
within its standard-error envelope, registers merge losslessly."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from job_crawler_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    HLL_P,
    HLL_SCALE_BITS,
    cms_cells,
    cms_estimates,
    cms_probes,
    hll_estimate,
    hll_numerator,
    hll_registers,
)

# deterministic token stream with a skewed (Zipf-ish) frequency profile
TOKENS = [f"tok{i % (i // 37 + 1)}" for i in range(3000)]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_cms(counts: dict[str, int]) -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = {}
    for tok, c in counts.items():
        for r in range(CMS_DEPTH):
            col = int(_md5(f"cms{r}:{tok}")[:8], 16) % CMS_WIDTH
            cells[(r, col)] = cells.get((r, col), 0) + c
    return cells


def _py_hll_registers(keys: set[str]) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in keys:
        h = _md5(k)
        bucket = int(h[:8], 16) % HLL_M
        h2 = int(h[8:16], 16)
        rho = 33 if h2 == 0 else 33 - h2.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_hll_estimate(regs: dict[int, int]) -> float:
    zeros = HLL_M - len(regs)
    total = sum(1 << (HLL_SCALE_BITS - r) for r in regs.values())
    total += zeros * (1 << HLL_SCALE_BITS)
    raw = hll_numerator(HLL_M) / float(total)
    if raw <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return raw


def _tf(spark):
    toks = spark.createDataFrame(
        [(t,) for t in TOKENS], "token string"
    )
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


def test_cms_cells_match_python_replica(spark):
    tf = _tf(spark)
    counts = {r["token"]: r["cnt"] for r in tf.collect()}
    expect = _py_cms(counts)
    got = {
        (r["r"], r["col"]): r["cell"]
        for r in cms_cells(cms_probes(tf)).collect()
    }
    assert got == expect


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    tf = _tf(spark)
    probes = cms_probes(tf)
    est = cms_estimates(probes, cms_cells(probes)).collect()
    assert est, "empty estimate frame"
    for r in est:
        assert r["est_count"] >= r["true_count"], r
    # depth-4 independent hashes over a vocab far below width: the chance
    # every one of a token's 4 cells collides is (vocab/width)^4 — with
    # this fixture's ~90-token vocab the expected overcount count is ~0,
    # and any overcount that does appear must come from a genuine shared
    # cell in the python replica too (same md5), so equality of the cell
    # grids (test above) already pins it. Here: the MAJORITY is exact.
    exact = sum(1 for r in est if r["est_count"] == r["true_count"])
    assert exact >= len(est) * 0.9


def test_hll_registers_and_estimate_match_python_replica(spark):
    keys = {f"user-{i}" for i in range(1000)}
    df = spark.createDataFrame(
        [("g", k) for k in keys], "grp string, k string"
    )
    regs = hll_registers(df, F.col("k"), ["grp"])
    got = {r["bucket"]: r["max_rho"] for r in regs.collect()}
    assert got == _py_hll_registers(keys)
    est = hll_estimate(regs, ["grp"]).collect()[0]
    assert est["hll_est"] == _py_hll_estimate(got)
    # accuracy: m=16 -> standard error 1.04/sqrt(16) = 26%; allow 3 sigma
    assert abs(est["hll_est"] - 1000) / 1000 < 0.78


def test_hll_small_range_uses_linear_counting(spark):
    keys = {f"u{i}" for i in range(8)}  # n << 2.5*m -> linear counting
    df = spark.createDataFrame(
        [("g", k) for k in keys], "grp string, k string"
    )
    est = hll_estimate(
        hll_registers(df, F.col("k"), ["grp"]), ["grp"]
    ).collect()[0]
    assert est["zero_registers"] > 0
    regs = _py_hll_registers(keys)
    zeros = HLL_M - len(regs)
    assert est["hll_est"] == HLL_M * math.log(HLL_M / zeros)


def test_hll_registers_merge_losslessly(spark):
    """The mergeable-summary property the 100 TB claim rests on: registers
    built from two halves of the data, max-merged, equal registers built
    from the whole — so map-side partial aggregation (and cross-day sketch
    unions) lose nothing."""
    keys = [f"k{i}" for i in range(500)]
    half_a = spark.createDataFrame(
        [("g", k) for k in keys[:250]], "grp string, k string"
    )
    half_b = spark.createDataFrame(
        [("g", k) for k in keys[250:]], "grp string, k string"
    )
    whole = spark.createDataFrame(
        [("g", k) for k in keys], "grp string, k string"
    )
    merged = (
        hll_registers(half_a, F.col("k"), ["grp"])
        .unionByName(hll_registers(half_b, F.col("k"), ["grp"]))
        .groupBy("grp", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    a = {r["bucket"]: r["max_rho"] for r in merged.collect()}
    b = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(whole, F.col("k"), ["grp"]).collect()
    }
    assert a == b
