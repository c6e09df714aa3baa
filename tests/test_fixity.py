"""Shard fixity-digest semantics: the anti-entropy properties the query
exists for (see plans/crawlops.py q_shard_fixity_digest) — localization
(one changed doc perturbs exactly one shard digest + the root) and the
two-XOR incremental-update identity that makes the digest maintainable
without shard rescans.
"""

from __future__ import annotations

import pytest


def _write_docs(spark, tmp_path, rows, name):
    path = str(tmp_path / name)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def _digests(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.queries()["shard_fixity_digest"](spark, sf_dir)
    rows = {r["shard_id"]: r for r in df.collect()}
    roots = {r["root_digest"] for r in rows.values()}
    assert len(roots) == 1, "root digest must be identical on every row"
    return rows, roots.pop()


def _leaf(doc_id, text):
    import hashlib

    h = hashlib.md5(f"{doc_id}:{text}".encode()).hexdigest()
    return int(h[:15], 16)


@pytest.fixture(scope="module")
def base_rows():
    return [
        (i, f"document body {i} with words", "en", "synth", 25)
        for i in range(40)
    ]


def test_single_doc_change_localizes_to_one_shard(spark, tmp_path, base_rows):
    a = _write_docs(spark, tmp_path, base_rows, "a")
    changed = [
        (i, t if i != 7 else t + " EDITED", lg, s, n)
        for i, t, lg, s, n in base_rows
    ]
    b = _write_docs(spark, tmp_path, changed, "b")
    da, ra = _digests(spark, a)
    db, rb = _digests(spark, b)
    assert ra != rb
    diff = [
        sid
        for sid in da
        if da[sid]["shard_digest"] != db[sid]["shard_digest"]
    ]
    assert len(diff) == 1, f"expected one divergent shard, got {diff}"
    # counts unchanged: same docs, different content
    assert all(da[s]["n_docs"] == db[s]["n_docs"] for s in da)


def test_incremental_update_is_two_xors(spark, tmp_path, base_rows):
    """new_shard_digest == old ^ leaf(old_doc) ^ leaf(new_doc): the
    maintenance path never rescans the shard."""
    a = _write_docs(spark, tmp_path, base_rows, "ia")
    old_text = base_rows[7][1]
    new_text = old_text + " EDITED"
    changed = [
        (i, t if i != 7 else new_text, lg, s, n)
        for i, t, lg, s, n in base_rows
    ]
    b = _write_docs(spark, tmp_path, changed, "ib")
    da, ra = _digests(spark, a)
    db, rb = _digests(spark, b)
    sid = [
        s for s in da if da[s]["shard_digest"] != db[s]["shard_digest"]
    ][0]
    expect = da[sid]["shard_digest"] ^ _leaf(7, old_text) ^ _leaf(7, new_text)
    assert db[sid]["shard_digest"] == expect
    assert rb == ra ^ _leaf(7, old_text) ^ _leaf(7, new_text)


def test_root_is_fold_of_shards_and_order_free(spark, tmp_path, base_rows):
    a = _write_docs(spark, tmp_path, base_rows, "ra")
    da, ra = _digests(spark, a)
    fold = 0
    for r in da.values():
        fold ^= r["shard_digest"]
    assert fold == ra
    # permuting input rows cannot change any digest (XOR is order-free)
    b = _write_docs(spark, tmp_path, list(reversed(base_rows)), "rb")
    db, rb = _digests(spark, b)
    assert rb == ra
    assert {s: r["shard_digest"] for s, r in db.items()} == {
        s: r["shard_digest"] for s, r in da.items()
    }
