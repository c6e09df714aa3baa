"""North-rule gates: Spark crawl loop vs single-process oracle.

- crawl ordering bit-identical per round (schedule_log vs oracle order)
- final URL-seen set identical
- span sequences per doc identical (kind, text, media_ref, order)
- kill-and-resume: replaying a round after a simulated crash converges to
  the same state (BASELINE.json resumability criterion)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_crawler_spark.catalog import Catalog
from job_crawler_spark.crawl import oracle
from job_crawler_spark.crawl.round import CrawlEngine
from job_crawler_spark.sources import synth

N_SEEDS = 400
ROUNDS = 3
ROUND_SECONDS = 30


def _engine(spark, tmp_path, name="wh") -> CrawlEngine:
    return CrawlEngine(
        spark=spark,
        catalog=Catalog(str(tmp_path / name)),
        robots=synth.robots_df(spark),
        round_seconds=ROUND_SECONDS,
        bloom_shards=16,
        bloom_bits=1 << 16,
        bloom_k=5,
    )


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("crawl")
    eng = _engine(spark, tmp)
    eng.bootstrap(synth.seed_frontier(spark, N_SEEDS))
    eng.run(ROUNDS)
    want = oracle.crawl(
        N_SEEDS, synth.robots_rows(), ROUNDS, round_seconds=ROUND_SECONDS
    )
    return eng, want


def test_crawl_order_bit_identical(spark, crawled):
    eng, want = crawled
    sched = eng.catalog.read(spark, eng.T_SCHED).collect()
    got_rounds: dict[int, list] = {}
    for r in sched:
        got_rounds.setdefault(r.round, []).append((r.host, r.host_rank, r.url_canon))
    assert len(got_rounds) == len(want["crawl_order"])
    for rnd, order in enumerate(want["crawl_order"]):
        assert sorted(got_rounds[rnd]) == order, f"round {rnd}"


def test_url_seen_set_identical(spark, crawled):
    eng, want = crawled
    seen = eng.catalog.read(spark, eng.T_SEEN).collect()
    got = {r.url_canon: r.first_round for r in seen}
    assert got == want["seen"]


def test_span_sequences_identical(spark, crawled):
    eng, want = crawled
    docs = eng.catalog.read(spark, eng.T_DOCS).select("doc_id", "spans").collect()
    got = {
        r.doc_id: [
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        ]
        for r in docs
    }
    want_docs = {
        u: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for u, spans in want["docs"].items()
    }
    assert got == want_docs


def test_frontier_state_identical(spark, crawled):
    eng, want = crawled
    rows = eng.catalog.read(spark, eng.T_FRONTIER).collect()
    got = {
        r.url_canon: (r.host, r.depth, round(r.priority, 9)) for r in rows
    }
    wf = {
        u: (r["host"], r["depth"], round(r["priority"], 9))
        for u, r in want["frontier"].items()
    }
    assert got == wf


def test_per_round_stats_match(crawled):
    eng, want = crawled
    for got, exp in zip(eng.stats, want["stats"]):
        for k in ("round", "scheduled", "fetched", "failed",
                  "seen_total", "frontier_pending"):
            assert got[k] == exp[k], (k, got, exp)


def test_resume_after_kill_converges(spark, tmp_path):
    """Run 1 round, simulate a crash AFTER data commits but BEFORE the
    checkpoint marker (the worst replay case), resume, and compare the full
    final state against an uninterrupted run."""
    full = _engine(spark, tmp_path, "full")
    full.bootstrap(synth.seed_frontier(spark, N_SEEDS))
    full.run(2)

    crashed = _engine(spark, tmp_path, "crashed")
    crashed.bootstrap(synth.seed_frontier(spark, N_SEEDS))
    crashed.run_round(0)
    crashed.run_round(1)
    # simulate the crash: round 1's checkpoint marker never landed
    ck = crashed.catalog.read(spark, crashed.T_CKPT).filter(F.col("round") != 1)
    crashed.catalog.overwrite(ck, crashed.T_CKPT)

    resumed = _engine(spark, tmp_path, "crashed")  # fresh engine, same warehouse
    assert resumed.next_round() == 1  # resumes mid-frontier
    resumed.run(1)  # replays round 1

    for table in (full.T_SEEN, full.T_FRONTIER, full.T_SCHED):
        a = {tuple(r) for r in full.catalog.read(spark, table).collect()}
        b = {tuple(r) for r in resumed.catalog.read(spark, table).collect()}
        assert a == b, table
    da = {
        r.doc_id: [tuple(s) for s in r.spans]
        for r in full.catalog.read(spark, full.T_DOCS).select("doc_id", "spans").collect()
    }
    db = {
        r.doc_id: [tuple(s) for s in r.spans]
        for r in resumed.catalog.read(spark, resumed.T_DOCS).select("doc_id", "spans").collect()
    }
    assert da == db


def test_resume_with_wrong_bloom_params_refuses(spark, tmp_path):
    """Persisted shard bitmaps are only meaningful under the exact
    (n_shards, m_bits, k) that built them: a resume with different
    parameters must fail loudly, not silently mis-probe."""
    eng = _engine(spark, tmp_path, "bp")
    eng.bootstrap(synth.seed_frontier(spark, 50))
    eng.run_round(0)

    bad = _engine(spark, tmp_path, "bp")
    bad.bloom_bits = 1 << 18  # differs from the 1<<16 the catalog was built with
    with pytest.raises(ValueError, match="bloom parameter mismatch"):
        bad.run_round(bad.next_round())

    # same-params resume still works
    ok = _engine(spark, tmp_path, "bp")
    res = ok.run_round(ok.next_round())
    assert res["round"] == 1


def test_cuckoo_backend_matches_oracle(spark, tmp_path):
    """The seen-filter backend is correctness-neutral: a cuckoo-backed crawl
    produces the identical seen set and crawl order as the oracle (and hence
    as the Bloom-backed engine)."""
    eng = CrawlEngine(
        spark=spark,
        catalog=Catalog(str(tmp_path / "ck")),
        robots=synth.robots_df(spark),
        round_seconds=ROUND_SECONDS,
        seen_filter="cuckoo",
        bloom_shards=8,
        cuckoo_buckets=1 << 10,
    )
    eng.bootstrap(synth.seed_frontier(spark, 200))
    eng.run(2)
    want = oracle.crawl(200, synth.robots_rows(), 2, round_seconds=ROUND_SECONDS)

    got_seen = {
        r.url_canon for r in eng.catalog.read(spark, eng.T_SEEN).collect()
    }
    assert got_seen == set(want["seen"])
    got_order = [
        (r.round, r.host, r.host_rank, r.url_canon)
        for r in eng.catalog.read(spark, eng.T_SCHED)
        .orderBy("round", "host", "host_rank")
        .collect()
    ]
    want_order = [
        (rnd, h, rank, u)
        for rnd, batch in enumerate(want["crawl_order"])
        for (h, rank, u) in batch
    ]
    assert got_order == want_order


def test_cuckoo_replay_rewrites_delta_not_double_inserts(spark, tmp_path):
    """Cuckoo insertion is not idempotent, so the shards table stores
    round-keyed DELTAS: replaying a crashed round must leave the shard
    table bit-identical to an uninterrupted run (no duplicate fps)."""
    def mk(name):
        return CrawlEngine(
            spark=spark,
            catalog=Catalog(str(tmp_path / name)),
            robots=synth.robots_df(spark),
            round_seconds=ROUND_SECONDS,
            seen_filter="cuckoo",
            bloom_shards=8,
            cuckoo_buckets=1 << 10,
        )

    full = mk("full")
    full.bootstrap(synth.seed_frontier(spark, 200))
    full.run(2)

    crashed = mk("crashed")
    crashed.bootstrap(synth.seed_frontier(spark, 200))
    crashed.run_round(0)
    crashed.run_round(1)
    ck = crashed.catalog.read(spark, crashed.T_CKPT).filter(F.col("round") != 1)
    crashed.catalog.overwrite(ck, crashed.T_CKPT)
    resumed = mk("crashed")
    assert resumed.next_round() == 1
    resumed.run(1)

    def shard_rows(eng):
        return sorted(
            (r.round, r.shard, bytes(r.table).hex(), tuple(r.overflow))
            for r in eng.catalog.read(spark, eng.T_SHARDS).collect()
        )

    assert shard_rows(full) == shard_rows(resumed)
    a = {r.url_canon for r in full.catalog.read(spark, full.T_SEEN).collect()}
    b = {r.url_canon for r in resumed.catalog.read(spark, resumed.T_SEEN).collect()}
    assert a == b
