"""Snapshot catalog: atomic commits, append, merge, time travel, retention."""

from __future__ import annotations

import pytest

from job_crawler_spark.catalog import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "warehouse"))


def test_overwrite_and_read(spark, cat):
    df = spark.range(10).withColumnRenamed("id", "x")
    v = cat.overwrite(df, "t")
    assert v == 0
    assert cat.read(spark, "t").count() == 10


def test_append_accumulates(spark, cat):
    cat.overwrite(spark.range(5), "t")
    cat.append(spark.range(3), "t")
    assert cat.read(spark, "t").count() == 8
    assert cat.snapshot_id("t") == 1


def test_time_travel(spark, cat):
    cat.overwrite(spark.range(5), "t")
    cat.append(spark.range(5), "t")
    assert cat.read(spark, "t", version=0).count() == 5
    assert cat.read(spark, "t", version=1).count() == 10


def test_merge_upsert_by_key(spark, cat):
    t = spark.createDataFrame(
        [("u1", "old"), ("u2", "old")], "url string, v string"
    )
    cat.overwrite(t, "jobs")
    src = spark.createDataFrame(
        [("u2", "new"), ("u3", "new")], "url string, v string"
    )
    cat.merge_upsert(spark, "jobs", src, key="url")
    rows = {r.url: r.v for r in cat.read(spark, "jobs").collect()}
    # matched row replaced, unmatched inserted, untouched kept (S6 semantics)
    assert rows == {"u1": "old", "u2": "new", "u3": "new"}


def test_missing_table_with_schema_is_empty(spark, cat):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())])
    assert cat.read(spark, "nope", schema=schema).count() == 0
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "nope")


def test_expire_snapshots_keeps_recent(spark, cat):
    for i in range(6):
        cat.overwrite(spark.range(i + 1), "t")
    cat.expire_snapshots("t", keep_last=2)
    assert cat.read(spark, "t").count() == 6
    assert cat.read(spark, "t", version=4).count() == 5
    with pytest.raises(FileNotFoundError):
        cat._read_manifest("t", 0)
