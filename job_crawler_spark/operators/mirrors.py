"""Mirror-host detection: hosts serving near-identical content sets.

Large crawls waste budget re-fetching mirrors — hosts that serve the
same pages under different names (CDN vanity domains, www/apex splits,
wholesale site copies). Bharat & Broder (WWW '99, "Mirror, mirror on
the web") detect them by comparing per-host CONTENT-FINGERPRINT SETS;
a crawler then keeps one representative per mirror group and demotes
the rest, exactly like trap demotion (operators/traps.py) but keyed on
content overlap instead of URL-space shape. The reference crawler has
no mirror pass (its seed lists are curated job boards); this operator
is part of the scale layer a 10^10-URL frontier needs.

Scale shape: ONE self-join on the content hash. Per-host fingerprint
sets are deduped first (``(host, hash)`` distinct — map-side combined),
then hosts sharing a hash are paired by an equi-join ON THE HASH, so
the shuffle key is the fingerprint — uniformly distributed by
construction. Fan-out per hash equals the number of hosts serving that
page, which for real mirrors is the mirror-group size (single digits);
a page served by THOUSANDS of hosts (a boilerplate 404, a parked-domain
template) would quadratically explode its bucket, so hashes above
``max_hosts_per_hash`` are dropped — the standard LSH-bucket cap, same
rule as the MinHash banding plan (plans/textops.py MAX_DF): content
that common identifies nothing anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round


def mirror_pairs(
    pages: DataFrame,
    *,
    host_col: str = "host",
    hash_col: str = "content_hash",
    threshold: float = 0.4,
    max_hosts_per_hash: int = 64,
) -> DataFrame:
    """Host pairs whose content-fingerprint Jaccard >= ``threshold``.

    ``pages`` carries one row per fetched page: ``(host, content_hash)``
    (duplicates fine — sets are deduped). Returns
    ``(host_a, host_b, shared, n_a, n_b, jaccard)`` with
    ``host_a < host_b``, Jaccard computed over distinct fingerprints and
    rounded to 6 dp (hash-stable across engines: the inputs to the
    division are exact int64 counts).
    """
    sets = pages.select(
        F.col(host_col).alias("host"), F.col(hash_col).alias("h")
    ).distinct()
    # per-hash host fan-out cap (see module docstring)
    capped = (
        sets.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("_df") <= max_hosts_per_hash)
        .drop("_df")
    )
    sizes = capped.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    a = capped.select(F.col("host").alias("host_a"), "h")
    b = capped.select(F.col("host").alias("host_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")),
            "host_b",
        )
        .withColumn(
            "jaccard",
            stable_round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard")
    )
    return out
