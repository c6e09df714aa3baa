"""Shared shard-routed probe scaffold for the seen-filter backends.

Both Bloom and cuckoo route the same way — candidates shuffle to their
shard's reducer and cogroup with that shard's delta rows; only the
"merge this shard's blobs and probe keys" step differs. One scaffold here,
one probe callback per backend (bloom.split_by_bloom_routed /
cuckoo.split_by_cuckoo_routed), so routing fixes land once.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# probe(shard_rows_pdf, keys) -> list[bool] (maybe-seen flags); shard_rows
# is never empty when called — the scaffold short-circuits missing shards
ProbeFn = Callable[[pd.DataFrame, "pd.Series"], list]


def split_by_routed(
    batch: DataFrame,
    shards_df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_of_fn: Callable[[str, int], int],
    probe: ProbeFn,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(provably_new, maybe_seen, flagged) via shard-routed cogroup probe.

    Peak task memory is ONE shard's rows regardless of total filter size;
    nothing is broadcast. Costs one extra shuffle of the candidate batch —
    the right trade once the filter outgrows a broadcast.
    """
    in_fields = list(batch.schema.fields)
    keyed_schema = T.StructType(
        in_fields + [T.StructField("__shard", T.IntegerType(), False)]
    )
    flag_schema = T.StructType(
        in_fields + [T.StructField("__maybe_seen", T.BooleanType(), False)]
    )

    def add_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__shard"] = [shard_of_fn(u, n_shards) for u in pdf[key_col]]
            yield pdf

    keyed = batch.mapInPandas(add_shard, schema=keyed_schema)
    out_cols = [f.name for f in flag_schema.fields]

    def probe_group(cand: pd.DataFrame, shard_rows: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=out_cols)
        cand = cand.drop(columns=["__shard"]).copy()
        if shard_rows.empty:
            cand["__maybe_seen"] = False
            return cand
        cand["__maybe_seen"] = probe(shard_rows, cand[key_col])
        return cand

    flagged = (
        keyed.groupBy("__shard")
        .cogroup(shards_df.groupBy("shard"))
        .applyInPandas(probe_group, schema=flag_schema)
    )
    if persist:
        flagged = flagged.persist()
    return (
        flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen"),
        flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen"),
        flagged,
    )
