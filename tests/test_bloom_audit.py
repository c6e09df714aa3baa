"""bloom_seen_audit structural goldens on a 30-order frontier.

Exact bit positions are md5-dependent (not hand-computable), so the
goldens pin the STRUCTURAL contract instead: the id-partition counts,
the Bloom filter's zero-false-NEGATIVE guarantee (every true member
must hit), and the internal consistency of the false-positive
accounting. Cross-engine value equality is the DuckDB oracle's job
(tests/test_oracle_parity.py covers `bloom_seen_audit`)."""

from __future__ import annotations

import math

from job_crawler_spark.plans.crawlops import (
    BLOOM_K,
    BLOOM_M,
    q_bloom_seen_audit,
)


def test_no_false_negatives_and_exact_partition_counts(spark, tmp_path):
    spark.createDataFrame(
        [(i,) for i in range(1, 31)], "o_orderkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_bloom_seen_audit(spark, str(tmp_path)).collect()[0]
    # ids 1..30: seen = 15 even ids; probes = 10 ids divisible by 3;
    # true members = 5 ids divisible by 6
    assert r["n_seen"] == 15
    assert r["n_probes"] == 10
    assert r["n_true_member"] == 5
    # a Bloom filter NEVER misses a member
    assert r["n_bloom_hits"] >= r["n_true_member"]
    # every non-member hit is a false positive, and vice versa
    assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_true_member"]
    # fp_rate is n_false_pos over the 5 non-members, stable-rounded
    want = math.floor(r["n_false_pos"] / 5 * 1e6 + 0.5) / 1e6
    assert r["fp_rate"] == want
    # the filter can't set more bits than k per seen element or m total
    assert 0 < r["n_bits_set"] <= min(BLOOM_K * 15, BLOOM_M)
