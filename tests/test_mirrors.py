"""Mirror-host detection (operators/mirrors.py): Jaccard goldens,
threshold boundary, common-fingerprint cap, ordering/dedup contracts.
The sf-fixture parity (vs the DuckDB set-overlap SQL) runs in
test_oracle_parity.py via the host_mirrors gate."""

from __future__ import annotations

from job_crawler_spark.operators.mirrors import mirror_pairs


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, content_hash string")


def test_half_overlap_pair(spark):
    # A serves h1..h4; B mirrors h1, h2 -> jaccard 2/4 = 0.5
    rows = [("A", f"h{i}") for i in range(1, 5)] + [("B", "h1"), ("B", "h2")]
    out = mirror_pairs(_pages(spark, rows), threshold=0.4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b, r.shared, r.n_a, r.n_b, r.jaccard) == (
        "A", "B", 2, 4, 2, 0.5,
    )


def test_threshold_is_inclusive(spark):
    rows = [("A", f"h{i}") for i in range(1, 5)] + [("B", "h1"), ("B", "h2")]
    assert mirror_pairs(_pages(spark, rows), threshold=0.5).count() == 1
    assert mirror_pairs(_pages(spark, rows), threshold=0.51).count() == 0


def test_duplicate_page_rows_are_set_semantics(spark):
    rows = [("A", "h1"), ("A", "h1"), ("B", "h1")]
    r = mirror_pairs(_pages(spark, rows), threshold=0.1).collect()[0]
    assert (r.shared, r.n_a, r.n_b, r.jaccard) == (1, 1, 1, 1.0)


def test_common_fingerprint_cap_drops_boilerplate(spark):
    # h0 is on 3 hosts: with the cap at 2 it identifies nothing, and the
    # hosts' set sizes shrink accordingly (A,B keep only h1)
    rows = [("A", "h0"), ("B", "h0"), ("C", "h0"), ("A", "h1"), ("B", "h1")]
    out = mirror_pairs(
        _pages(spark, rows), threshold=0.1, max_hosts_per_hash=2
    ).collect()
    assert [(r.host_a, r.host_b, r.shared, r.jaccard) for r in out] == [
        ("A", "B", 1, 1.0)
    ]


def test_pairs_are_canonically_ordered(spark):
    rows = [("zeta", "h1"), ("alpha", "h1")]
    r = mirror_pairs(_pages(spark, rows), threshold=0.1).collect()[0]
    assert (r.host_a, r.host_b) == ("alpha", "zeta")
