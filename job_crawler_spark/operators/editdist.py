"""Exact edit-distance similarity self-join via q-gram prefix filtering.

Character-level fuzzy matching — the dedup/entity-resolution class the
token-set family (MinHash/SimHash/n-gram Jaccard over *word* shingles)
cannot express: "cold bolt" vs "old bolt" share almost no word shingles
but are one edit apart. The reference crawler normalizes titles/params
by exact string ops only (``main.py`` lowercase/substring matching); a
crawl pipeline at 10^10 URLs needs the fuzzy join for near-identical
titles, typo'd hosts, and template-drifted job names.

Naive form is the quadratic self-join ``O(n^2)`` ``levenshtein`` cross
product. This implementation is the Ed-Join / prefix-filter strategy
(Chaudhuri, Ganti & Kaushik, ICDE'06; Xiao, Wang & Lin, VLDB'08 — public
papers), which is EXACT, not approximate:

1. Each string s yields its distinct character q-grams (JVM
   higher-order functions, no Python). An edit operation destroys at
   most q positional windows, so ``ed(x, y) <= D`` forces
   ``|G(x) ∩ G(y)| >= max(|G(x)|, |G(y)|) - D*q`` (count filter).
2. Global gram order = (corpus frequency ASC, gram) — rarest first,
   computed by one bounded aggregate (``<= |alphabet|^q`` distinct
   grams) and broadcast back. Each string's SIGNATURE is the first
   ``D*q + 1`` grams of its set in that order (all grams when it has
   fewer). By the prefix-filter lemma any pair within distance D shares
   at least one signature gram — rare-first ordering minimizes how many
   strings share each signature bucket, which is what bounds per-bucket
   fan-out at scale.
3. Strings with ``|G| <= D*q`` get no count-filter guarantee against
   each other; they additionally carry one catch-all SHORT bucket, so
   short×short pairs always meet. (Short×long pairs are covered by the
   lemma: the long side's requirement ``|G(long)| - D*q >= 1`` forces a
   shared gram inside both signatures.)
4. Candidates = equi-join on the signature bucket (plain hash shuffle,
   never a cartesian), pre-filtered by the length band
   ``|len(x) - len(y)| <= D`` (edit distance is bounded below by length
   difference), deduplicated, then VERIFIED with Spark's banded
   ``levenshtein(x, y, D)`` (O(D*min(m,n)) early-exit DP, -1 past the
   threshold).

Scale shape: the gram-frequency frame is bounded by the alphabet and
broadcast; the only corpus-sized shuffles are the signature build
(groupBy string), the bucket equi-join, and the pair distinct. Hot
grams (skewed buckets) are exactly what the rare-first prefix ordering
suppresses; residual skew is AQE's skew-join territory. Every
qualifying pair is emitted exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from job_crawler_spark.operators.checkpoints import tracked_local_checkpoint

_SHORT_BUCKET = "S"


def _gram_array(col: F.Column, q: int) -> F.Column:
    """Distinct character q-grams of ``col``; a string shorter than q
    contributes itself as its only gram (sequence end is clamped to 1 so
    Spark's descending-sequence semantics can't fire)."""
    n = F.greatest(F.length(col) - q + 1, F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(q))
        )
    )


def editdist_join(
    strings: DataFrame,
    col: str,
    max_dist: int,
    *,
    q: int = 2,
) -> DataFrame:
    """Exact similarity self-join: all unordered pairs of DISTINCT values
    of ``strings[col]`` with ``levenshtein <= max_dist``.

    Returns columns ``(<col>_a, <col>_b, dist)`` with ``<col>_a <
    <col>_b`` (each unordered pair exactly once) and ``dist`` the exact
    edit distance (``1 <= dist <= max_dist``; 0 is impossible between
    distinct values). NULL and duplicate input values are ignored.
    ``strings`` may carry other columns; they are dropped — join payload
    back on the key columns.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1: {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1: {q}")
    prefix_len = max_dist * q + 1

    s = F.col("__s")
    base = (
        strings.select(F.col(col).alias("__s"))
        .filter(s.isNotNull())
        .distinct()
        .select("__s", F.explode(_gram_array(s, q)).alias("__gram"))
    )
    # Bounded by |alphabet|^q -> broadcast; ties broken on the gram so the
    # global order is total.
    freq = F.broadcast(base.groupBy("__gram").agg(F.count("*").alias("__f")))
    sigs = (
        base.join(freq, "__gram")
        .groupBy("__s")
        .agg(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__f", "__gram"))
                    ),
                    lambda x: x["__gram"],
                ),
                1,
                prefix_len,
            ).alias("__prefix"),
            F.count("*").alias("__ng"),
        )
        .select(
            "__s",
            F.length("__s").alias("__len"),
            F.explode(
                F.when(
                    F.col("__ng") <= max_dist * q,
                    F.concat(
                        _prefixed("__prefix"),
                        F.array(F.lit(_SHORT_BUCKET)),
                    ),
                ).otherwise(_prefixed("__prefix"))
            ).alias("__bkt"),
        )
    )
    # Checkpoint: the signature frame feeds both sides of the self-join;
    # live lineage would rebuild the gram pipeline twice.
    sigs = tracked_local_checkpoint(sigs)

    a = sigs.select(
        F.col("__s").alias("__sa"), F.col("__len").alias("__la"), "__bkt"
    )
    b = sigs.select(
        F.col("__s").alias("__sb"), F.col("__len").alias("__lb"), "__bkt"
    )
    pairs = (
        a.join(b, "__bkt")
        .filter(
            (F.col("__sa") < F.col("__sb"))
            & (
                F.abs(F.col("__la") - F.col("__lb")) <= max_dist
            )
        )
        .select("__sa", "__sb")
        .distinct()
        .withColumn(
            "dist", F.levenshtein(F.col("__sa"), F.col("__sb"), max_dist)
        )
        .filter(F.col("dist") >= 0)
        .select(
            F.col("__sa").alias(f"{col}_a"),
            F.col("__sb").alias(f"{col}_b"),
            "dist",
        )
    )
    pairs._graft_checkpoints = [sigs]
    return pairs


def _prefixed(prefix_col: str) -> F.Column:
    # Real-gram buckets are namespaced so a 1-char alphabet can never
    # collide with the SHORT catch-all bucket.
    return F.transform(F.col(prefix_col), lambda g: F.concat(F.lit("g:"), g))
