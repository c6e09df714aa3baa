"""Bucketed-table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of the frontier/seen anti-join and the
orders/lineitem-shaped fact joins is the shuffle. Bucketing both sides by
the join key at WRITE time moves that shuffle out of every query and into
the (one-time) layout: Spark's scan reports the bucket distribution, the
join planner sees both sides pre-partitioned on the key, and SortMergeJoin
runs with ZERO Exchange nodes.

Engine use: the ``seen`` table and each round's frontier candidates are
both keyed by url_canon — bucketing ``seen`` by url_canon makes the
authoritative anti-join co-located with a one-sided shuffle (candidates
only), and at steady state candidates can be written bucket-aligned too.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog); this module wraps that so callers don't hand-manage
table names vs paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.

    Sorting within buckets lets SortMergeJoin skip its per-task sort as
    well — the join becomes a pure streaming merge over co-located, ordered
    partitions."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_columns) of a saved table, or None if unbucketed.
    Parsed from DESCRIBE EXTENDED — the sanity gate before relying on a
    shuffle-free co-located join."""
    rows = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    }
    if "Num Buckets" not in rows:
        return None
    n = int(rows["Num Buckets"])
    cols = [c.strip(" `") for c in rows.get("Bucket Columns", "").strip("[]").split(",")]
    return n, [c for c in cols if c]
