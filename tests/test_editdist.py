"""editdist_join: exactness vs a driver-side Levenshtein reference.

The prefix filter (Ed-Join) is an EXACT candidate generator — the tests
here pin completeness (no pair within the threshold is ever missed, the
property the count-filter/prefix-filter math guarantees) and soundness
(no pair outside it survives verification), including the short-string
regime where the count filter gives no guarantee and the catch-all
bucket must take over.
"""

from __future__ import annotations

import random

from job_crawler_spark.operators.checkpoints import release_checkpoints
from job_crawler_spark.operators.editdist import editdist_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _reference(vals: list[str], max_dist: int) -> set[tuple[str, str, int]]:
    out = set()
    uniq = sorted(set(vals))
    for i, x in enumerate(uniq):
        for y in uniq[i + 1 :]:
            d = _lev(x, y)
            if 0 < d <= max_dist:
                out.add((x, y, d))
    return out


def _run(spark, vals: list[str], max_dist: int) -> set[tuple[str, str, int]]:
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    pairs = editdist_join(df, "s", max_dist)
    got = {(r.s_a, r.s_b, r.dist) for r in pairs.collect()}
    release_checkpoints(pairs)
    return got


GOLDEN = [
    "cold bolt", "old bolt", "cold rod", "old rod", "a", "b", "ab", "",
    "kitten", "sitting", "xy", "yx", "zzz", "red rod", "red ring", "old ring",
]


def test_golden_set_exact_both_thresholds(spark):
    for d in (1, 2):
        assert _run(spark, GOLDEN, d) == _reference(GOLDEN, d)


def test_short_strings_meet_in_catchall_bucket(spark):
    # Every string here has <= max_dist*q distinct grams (len <= 5 at
    # q=2, D=2): the count filter guarantees nothing, so any missed pair
    # means the SHORT bucket regressed.
    vals = ["", "a", "b", "ab", "ba", "abc", "xyz", "ax", "axb"]
    assert _run(spark, vals, 2) == _reference(vals, 2)


def test_seeded_random_corpus_exact(spark):
    rng = random.Random(42)
    alphabet = "abc "
    vals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        for _ in range(80)
    ]
    assert _run(spark, vals, 2) == _reference(vals, 2)


def test_duplicates_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("abc",), ("abc",), (None,), ("abd",)], "s string"
    )
    pairs = editdist_join(df, "s", 1)
    assert {(r.s_a, r.s_b, r.dist) for r in pairs.collect()} == {
        ("abc", "abd", 1)
    }
    release_checkpoints(pairs)
