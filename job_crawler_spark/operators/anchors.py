"""Anchor-text aggregation: link-evidence term profiles per target URL.

The text other pages use to LINK to a URL describes it better than the
URL's own content describes itself — the classic web-search ranking
signal (Brin & Page '98 §2.2 used it for unfetched targets; Craswell,
Hawking & Robertson SIGIR'01 measured anchor text beating content for
site finding). A crawler aggregates it per target as pages are parsed:
it ranks UNFETCHED frontier URLs (the only textual evidence that exists
before the fetch) and feeds the indexer afterwards.

The anti-spam invariant: evidence is counted in DISTINCT SOURCE HOSTS,
not raw mentions — one host repeating an anchor in a 10,000-page
footer is one vote, the nofollow-era consensus weighting. Raw mention
counts are kept alongside as the tiebreaker.

Scale shape: tokenize + explode (fan-out bounded by anchor length —
anchors are a few words, never corpus-shaped), then a PRE-AGGREGATE on
``(dst, term, src_host)`` — map-side combinable, and it collapses the
footer-spam mass BEFORE anything wide — then the ``(dst, term)``
roll-up, then one window for per-target top-k (rank filter pushes down
as WindowGroupLimit). No multi-distinct Expand: the distinct-host count
falls out of the pre-aggregate's row count, the same shape as
url_trap_signals (plans/crawlops.py). The reference crawler keeps no
link evidence at all (its seeds are curated boards); this is scale
layer, like mirrors and DUST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_terms(text) -> F.Column:
    """Lowercased alphanumeric terms of an anchor string (empty tokens
    from punctuation runs dropped). Deterministic and reproducible in
    ANSI SQL (regexp split + filter) for the oracle."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def anchor_text_profile(
    links: DataFrame,
    *,
    dst_col: str = "dst_url",
    src_host_col: str = "src_host",
    text_col: str = "anchor_text",
    top_k: int = 3,
    min_hosts: int = 1,
) -> DataFrame:
    """Per-target top-k anchor terms, host-deduplicated.

    ``links``: one row per hyperlink ``(src_host, dst_url,
    anchor_text)``. Returns ``(dst_url, term, n_hosts, n_mentions,
    term_rank)`` — at most ``top_k`` rows per target, ranked by
    (distinct linking hosts DESC, raw mentions DESC, term ASC); terms
    below ``min_hosts`` distinct hosts never rank. NULL/empty anchors
    contribute nothing.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_hosts < 1:
        raise ValueError(f"min_hosts must be >= 1, got {min_hosts}")
    exploded = links.select(
        F.col(dst_col).alias("dst_url"),
        F.col(src_host_col).alias("src_host"),
        F.explode(anchor_terms(F.col(text_col))).alias("term"),
    )
    # footer-spam collapse: per (dst, term, host) BEFORE the wide agg
    per_host = exploded.groupBy("dst_url", "term", "src_host").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_term = per_host.groupBy("dst_url", "term").agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("n").alias("n_mentions"),
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("n_hosts").desc(),
        F.col("n_mentions").desc(),
        F.col("term").asc(),
    )
    return (
        per_term.filter(F.col("n_hosts") >= min_hosts)
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_k)
        .select("dst_url", "term", "n_hosts", "n_mentions", "term_rank")
    )
