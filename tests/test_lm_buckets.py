"""lm_quality_buckets structural goldens.

Exact ppl values are pinned elsewhere (test_lm_perplexity.py); here the
quartile bucketing contract is pinned: with 4 docs of distinct
perplexities the linear-interpolated p25/p75 cutoffs fall strictly
inside the 1st and last gaps, so the split must be exactly 1/2/1 with
ordered, non-overlapping ppl ranges. The single-doc corpus pins the
boundary-inclusive rule (ppl == c1 == c2 -> head, share 1.0).
"""

from __future__ import annotations

from job_crawler_spark.plans.textops import (
    q_doc_lm_perplexity,
    q_lm_quality_buckets,
)


def _write(spark, tmp_path, texts):
    spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_quartile_split_1_2_1(spark, tmp_path):
    # four docs spanning very different predictabilities on the shared
    # corpus model: pure repetition scores low ppl, mixed rare bigrams
    # score high
    texts = [
        "aa bb aa bb aa bb aa bb aa bb",
        "aa bb cc aa bb cc aa bb",
        "aa cc ee bb dd ff aa",
        "ff ee dd cc bb aa gg hh",
    ]
    _write(spark, tmp_path, texts)
    ppls = [
        r["ppl"] for r in q_doc_lm_perplexity(spark, str(tmp_path)).collect()
    ]
    assert len(set(ppls)) == 4, ppls  # precondition: all distinct
    rows = [tuple(r) for r in q_lm_quality_buckets(spark, str(tmp_path)).collect()]
    by = {r[0]: r for r in rows}
    assert [by[b][1] for b in ("head", "middle", "tail")] == [1, 2, 1]
    assert [by[b][4] for b in ("head", "middle", "tail")] == [0.25, 0.5, 0.25]
    # ranges ordered and non-overlapping: head.max <= middle.min, etc.
    assert by["head"][3] <= by["middle"][2]
    assert by["middle"][3] <= by["tail"][2]
    srt = sorted(ppls)
    assert by["head"][2] == by["head"][3] == srt[0]
    assert (by["middle"][2], by["middle"][3]) == (srt[1], srt[2])
    assert by["tail"][2] == by["tail"][3] == srt[3]


def test_single_doc_is_head(spark, tmp_path):
    _write(spark, tmp_path, ["aa bb aa bb"])
    rows = [tuple(r) for r in q_lm_quality_buckets(spark, str(tmp_path)).collect()]
    assert len(rows) == 1
    bucket, n_docs, _mn, _mx, share = rows[0]
    assert (bucket, n_docs, share) == ("head", 1, 1.0)
