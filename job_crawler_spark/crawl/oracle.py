"""Single-process crawl oracle.

Runs the identical crawl semantics as crawl/round.py in plain Python over
the same deterministic synthetic world (sources/synth.py). Used by tests to
pin the north-rule equality gates (BASELINE.json): crawl ordering and final
URL-seen set bit-identical under the same seed list + politeness budget.

Shares the per-URL/per-page formulas with the Spark stages; the loop logic
(scheduling, dedup, frontier update) is REIMPLEMENTED independently here so
the tests compare two implementations, not one implementation with itself.
"""

from __future__ import annotations

from job_crawler_spark.crawl.fetcher import fetch_failure, outlink_priority
from job_crawler_spark.crawl.parser import py_parse_outlinks, py_parse_page
from job_crawler_spark.functions.urls import py_canonicalize, py_host
from job_crawler_spark.operators.politeness import py_schedule
from job_crawler_spark.sources.synth import page_for_url, raw_url_for


def seed_frontier_rows(n: int) -> list[dict]:
    """Canonicalized, deduped seed frontier (first-wins by priority desc,
    raw url asc — mirrors CrawlEngine.bootstrap)."""
    from job_crawler_spark.sources.synth import priority_for

    best: dict[str, dict] = {}
    for i in range(n):
        raw = raw_url_for(i)
        canon = py_canonicalize(raw)
        host = py_host(raw)
        if not host:
            continue
        row = {
            "url_canon": canon,
            "host": host,
            "depth": 0,
            "priority": priority_for(i),
            "round": 0,
            "_raw": raw,
        }
        cur = best.get(canon)
        if cur is None or (-row["priority"], row["_raw"]) < (
            -cur["priority"], cur["_raw"],
        ):
            best[canon] = row
    return [
        {k: v for k, v in row.items() if k != "_raw"} for row in best.values()
    ]


def crawl(
    n_seeds: int,
    robots_rows: list[dict],
    max_rounds: int,
    round_seconds: int = 60,
) -> dict:
    """Run the full loop; returns crawl order, seen set, docs, per-round stats.

    crawl_order: list per round of (host, host_rank, url_canon) sorted by
    (host, host_rank) — the deterministic total order the Spark engine must
    reproduce exactly.
    """
    frontier = {r["url_canon"]: r for r in seed_frontier_rows(n_seeds)}
    seen: dict[str, int] = {}
    docs: dict[str, list[dict]] = {}
    crawl_order: list[list[tuple[str, int, str]]] = []
    stats: list[dict] = []

    for round_no in range(max_rounds):
        batch = py_schedule(
            list(frontier.values()), robots_rows, round_seconds=round_seconds
        )
        if not batch:
            break
        crawl_order.append(
            sorted((b["host"], b["host_rank"], b["url_canon"]) for b in batch)
        )

        discovered: dict[str, dict] = {}
        n_fetched = 0
        for b in batch:
            u = b["url_canon"]
            del frontier[u]
            seen.setdefault(u, round_no)
            if fetch_failure(u):
                continue
            n_fetched += 1
            page = page_for_url(u)
            docs[u] = py_parse_page(page)
            for raw_link in py_parse_outlinks(page):
                canon = py_canonicalize(raw_link)
                if not py_host(canon):  # same admission guard as the engine
                    continue
                cand = {
                    "url_canon": canon,
                    "host": py_host(canon),
                    "depth": b["depth"] + 1,
                    "priority": outlink_priority(canon),
                    "round": round_no + 1,
                }
                cur = discovered.get(canon)
                if cur is None:
                    discovered[canon] = cand
                else:  # max priority, min depth (engine's groupBy agg)
                    cur["priority"] = max(cur["priority"], cand["priority"])
                    cur["depth"] = min(cur["depth"], cand["depth"])
        for canon, cand in discovered.items():
            if canon not in seen and canon not in frontier:
                frontier[canon] = cand
        stats.append(
            {
                "round": round_no,
                "scheduled": len(batch),
                "fetched": n_fetched,
                "failed": len(batch) - n_fetched,
                "seen_total": len(seen),
                "frontier_pending": len(frontier),
            }
        )
    return {
        "crawl_order": crawl_order,
        "seen": seen,
        "docs": docs,
        "stats": stats,
        "frontier": frontier,
    }
