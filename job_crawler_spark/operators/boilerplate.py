"""Host-level boilerplate-line detection and excision.

Template fragments — navigation bars, footers, cookie banners, legal
blurbs — repeat across most pages of a host while carrying no document
content. Every production web-corpus pipeline strips them before
training: C4 drops boilerplate lines by rule (Raffel et al. 2020), CCNet
deduplicates at the paragraph level per shard (Wenzek et al. 2020), and
template detection by cross-page frequency goes back to Gibson, Punera &
Tomkins (WWW '05, "The volume and evolution of web page templates"). The
reference crawler parses curated job boards and has no template pass; at
10^10-URL scale boilerplate dominates raw page text, so this is a core
pass of the training-data layer. It complements the corpus-level
exact-substring excision (plans/textops.py q_doc_excise_dups, Lee et al.
2021): that keys on GLOBAL n-gram document frequency; this keys on
PER-HOST line frequency — the signal that catches a small host's site
template long before it clears a global df threshold.

Semantics: a line is boilerplate on its host when it appears in at least
``min_docs`` distinct documents of that host AND in at least ``min_pct``
percent of the host's documents (both bounds inclusive, integer-exact:
``n_docs * 100 >= min_pct * host_docs`` — no float threshold anywhere).
A line repeated inside ONE document counts once toward support, but
excision removes every instance.

Scale shape: (1) the per-(host, doc, line) DISTINCT evidence frame is
built once and persisted for its two consumers (line support and host
doc totals) — one corpus-shaped shuffle; (2) line support is a
map-side-combinable count on (host, line); host totals aggregate the
same evidence down to one row per host; (3) the verdict joins support to
host totals on host — a hosts-shaped frame, tiny next to the corpus;
(4) excision joins the flagged-line set back to the line stream on
(host, line): a hot template line fans out to at most its host's page
count, and AQE's skew-join split absorbs pathological hosts — the same
rule as the mirror hash cap (operators/mirrors.py). No Python anywhere;
the clean-text rebuild is a JVM higher-order sort/transform over
bounded-length per-doc arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round
from job_crawler_spark.operators.checkpoints import tracked_persist


def boilerplate_verdicts(
    lines: DataFrame,
    *,
    min_docs: int = 2,
    min_pct: int = 50,
) -> DataFrame:
    """Per-(host, line) boilerplate verdicts from a line stream.

    ``lines`` carries one row per line instance:
    ``(host, doc_id, line_no, line)`` (extra columns ignored; same-doc
    repeats fine — support is distinct-doc). Returns
    ``(host, line, n_docs, host_docs, is_boilerplate)`` where
    ``is_boilerplate = n_docs >= min_docs AND
    n_docs * 100 >= min_pct * host_docs`` (integer-exact, inclusive).

    The result carries ``._graft_checkpoints`` (the persisted evidence
    frame); callers release via
    ``operators.checkpoints.release_checkpoints`` after the last action.
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    if not 0 <= min_pct <= 100:
        raise ValueError("min_pct must be in [0, 100]")
    ev = tracked_persist(lines.select("host", "doc_id", "line").distinct())
    support = ev.groupBy("host", "line").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    hosts = (
        ev.select("host", "doc_id")
        .distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("host_docs"))
    )
    out = support.join(hosts, "host").select(
        "host",
        "line",
        "n_docs",
        "host_docs",
        (
            (F.col("n_docs") >= min_docs)
            & (F.col("n_docs") * 100 >= min_pct * F.col("host_docs"))
        ).alias("is_boilerplate"),
    )
    out._graft_checkpoints = [ev]
    return out


def excise_boilerplate(lines: DataFrame, verdicts: DataFrame) -> DataFrame:
    """Per-document excision accounting against a verdict frame.

    ``lines`` as in :func:`boilerplate_verdicts` (``line_no`` required:
    it orders the clean-text rebuild); ``verdicts`` is that function's
    output (or any frame with ``host, line, is_boilerplate``). Returns
    one row per document:
    ``(host, doc_id, n_lines, n_boiler, boiler_ratio, clean_text)`` —
    ``n_boiler`` counts excised INSTANCES, ``clean_text`` is the kept
    lines joined with a single space in ``line_no`` order (empty string
    when everything was boilerplate), ``boiler_ratio`` is
    ``n_boiler / n_lines`` stable-rounded to 6 dp.
    """
    flagged = (
        verdicts.filter(F.col("is_boilerplate"))
        .select("host", "line")
        .withColumn("_boiler", F.lit(True))
    )
    j = lines.join(flagged, ["host", "line"], "left")
    kept = F.array_sort(
        F.collect_list(
            F.when(
                F.col("_boiler").isNull(),
                F.struct(F.col("line_no"), F.col("line")),
            )
        )
    )
    return (
        j.groupBy("host", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.coalesce(
                F.sum(F.when(F.col("_boiler"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_boiler"),
            F.array_join(
                F.transform(kept, lambda s: s["line"]), " "
            ).alias("clean_text"),
        )
        .select(
            "host",
            "doc_id",
            "n_lines",
            "n_boiler",
            stable_round(F.col("n_boiler") / F.col("n_lines"), 6).alias(
                "boiler_ratio"
            ),
            "clean_text",
        )
    )
