"""Pareto-frontier goldens against a brute-force dominance oracle.

The gated query (plans/analytics_plans.py:q_part_pareto_front) is verified
vs an independent NOT-EXISTS SQL formulation at both gate scales; these
goldens pin the sort-sweep's tie and strictness semantics on hand tables:
duplicate (price, size) points (none dominates the other — ALL stay),
same-price smaller-size rows (dominated by the per-price best), an
equal-running-max point (dominated by a strictly cheaper part of the SAME
size — strict > required), a strictly monotone chain (everything stays),
and a single row.
"""

from __future__ import annotations

from job_crawler_spark.plans.analytics_plans import q_part_pareto_front


def _oracle(rows: list[tuple[int, int, float]]) -> set[int]:
    """Brute force O(n^2): minimize price, maximize size."""
    sky = set()
    for k, sz, pr in rows:
        if not any(
            (qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz))
            for _, qsz, qpr in rows
        ):
            sky.add(k)
    return sky


def _run(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "p_partkey LONG, p_size INT, p_retailprice DOUBLE"
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    df = q_part_pareto_front(spark, str(tmp_path))
    return {r["p_partkey"] for r in df.collect()}


def test_ties_and_same_price_domination(spark, tmp_path):
    # parts 1 and 2 are the identical point (both skyline); part 3 shares
    # their price with a smaller size (dominated by them); part 4 is
    # cheaper but smaller (skyline); part 5 is pricier and no bigger
    # (dominated).
    rows = [
        (1, 20, 10.0),
        (2, 20, 10.0),
        (3, 15, 10.0),
        (4, 10, 5.0),
        (5, 20, 12.0),
    ]
    got = _run(spark, tmp_path, rows)
    assert got == _oracle(rows) == {1, 2, 4}


def test_equal_running_max_is_dominated(spark, tmp_path):
    # part 2 matches the best size of the strictly cheaper part 1, so the
    # sweep must require STRICT improvement: part 2 is dominated.
    rows = [(1, 30, 5.0), (2, 30, 7.0), (3, 31, 9.0)]
    got = _run(spark, tmp_path, rows)
    assert got == _oracle(rows) == {1, 3}


def test_monotone_chain_all_skyline(spark, tmp_path):
    # size strictly rises with price: no part dominates any other.
    rows = [(k, 10 + k, 100.0 + k) for k in range(1, 6)]
    got = _run(spark, tmp_path, rows)
    assert got == _oracle(rows) == {1, 2, 3, 4, 5}


def test_single_row_and_total_domination(spark, tmp_path):
    rows = [(1, 5, 50.0)]
    assert _run(spark, tmp_path, rows) == {1}
    # one part cheaper AND bigger than everything: lone survivor.
    rows = [(1, 50, 1.0), (2, 10, 2.0), (3, 49, 3.0)]
    got = _run(spark, tmp_path, rows)
    assert got == _oracle(rows) == {1}
