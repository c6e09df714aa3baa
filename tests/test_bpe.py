"""BPE merge-pair statistics goldens (hand-computed, no Spark oracle).

The classic Sennrich et al. worked example (low/lower/newest/widest) is
computed by hand below — including the tie at the top (es == st) that
pins the deterministic (count DESC, pair ASC) ordering — plus the
repeated-pair-within-word case ("aaa" contributes its 'aa' twice per
occurrence) and the short-word/empty-text exclusions. The DuckDB oracle
parity run at sf0.001/sf0.01 lives in the standard gate
(tests/test_oracle_parity.py covers `bpe_pair_stats` automatically).
"""

from __future__ import annotations

import pytest

from job_crawler_spark.plans.textops import q_bpe_pair_stats


def _run(spark, tmp_path, texts):
    spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_bpe_pair_stats(spark, str(tmp_path)).collect()
    return [(r["rank"], r["pair"], r["pair_count"], r["n_word_types"]) for r in rows]


def test_sennrich_worked_example(spark, tmp_path):
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    got = _run(spark, tmp_path, [corpus])
    # hand totals: es 9 (newest+widest), st 9, we 8 (lower+newest),
    # lo 7, ow 7, ew 6, ne 6, de 3, id 3, wi 3, er 2
    want = [
        (1, "es", 9, 2),
        (2, "st", 9, 2),
        (3, "we", 8, 2),
        (4, "lo", 7, 2),
        (5, "ow", 7, 2),
        (6, "ew", 6, 1),
        (7, "ne", 6, 1),
        (8, "de", 3, 1),
        (9, "id", 3, 1),
        (10, "wi", 3, 1),
        (11, "er", 2, 1),
    ]
    assert got == want


def test_repeated_pair_counts_every_position(spark, tmp_path):
    # "aaa" x2: the pair 'aa' occurs at 2 positions in each of the 2
    # word occurrences -> count 4, but only ONE word type contains it
    got = _run(spark, tmp_path, ["aaa aaa"])
    assert got == [(1, "aa", 4, 1)]


def test_short_words_and_empty_docs_excluded(spark, tmp_path):
    # 1-char words contribute no pairs; empty/whitespace docs nothing;
    # case-folding merges AB and ab
    got = _run(spark, tmp_path, ["a b c AB", "   ", "ab"])
    assert got == [(1, "ab", 2, 1)]


def test_spans_multiple_documents(spark, tmp_path):
    got = _run(spark, tmp_path, ["ab ab", "ab xy"])
    assert got == [(1, "ab", 3, 1), (2, "xy", 1, 1)]


# --- bpe_learn_merges: the iterative trainer -----------------------------

from job_crawler_spark.plans.textops import q_bpe_learn_merges


def _run_merges(spark, tmp_path, texts):
    spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_bpe_learn_merges(spark, str(tmp_path)).collect()
    return [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in rows
    ]


def test_sennrich_merge_sequence(spark, tmp_path):
    """The canonical worked example, 6 merges derived by hand:
    step1 (e,s) 9 [tie with (s,t), left ASC wins]; step2 (es,t) 9;
    step3 (l,o) 7 [tie with (o,w)]; step4 (lo,w) 7; step5 (e,w) 6
    [3-way tie (e,w)/(n,e)/(w,est)]; step6 (ew,est) 6 [tie (ew,est)/
    (n,ew), 'ew' < 'n']. Matches Sennrich et al.'s published es/est/
    lo/low trajectory and pins the deterministic tie-break."""
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    got = _run_merges(spark, tmp_path, [corpus])
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
        (6, "ew", "est", 6),
    ]


def test_run_merging_and_exhaustion(spark, tmp_path):
    """'aaaa' x3: step1 merges (a,a) count 9 (3 positions x 3 occs) and
    the double-separator rewrite must turn all four 'a's into TWO 'aa'
    symbols in one pass (a shared-separator encoding would leave
    'aa a a'); step2 merges (aa,aa) count 3; then no pairs remain and
    steps 3-6 emit no rows in both engines."""
    got = _run_merges(spark, tmp_path, ["aaaa aaaa aaaa"])
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


# --- doc_bpe_tokens: tokenizer application ------------------------------

from job_crawler_spark.plans.textops import q_doc_bpe_tokens


def _run_apply(spark, tmp_path, texts):
    spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_doc_bpe_tokens(spark, str(tmp_path)).collect()
    return [
        (
            r["doc_id"],
            r["n_words"],
            r["n_chars"],
            r["n_subword_tokens"],
            r["chars_per_token"],
        )
        for r in rows
    ]


def test_sennrich_corpus_segmentation(spark, tmp_path):
    """After the 6 hand-derived merges (es, est, lo, low, ew, ewest):
    low -> [low] (1 sym), lower -> [low, e, r] (3), newest ->
    [n, ewest] (2), widest -> [w, i, d, est] (4). One doc of 16 word
    occurrences: chars 5*3 + 2*5 + 6*6 + 3*6 = 79, subwords
    5*1 + 2*3 + 6*2 + 3*4 = 35, ratio 79/35 -> 2.257143."""
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    got = _run_apply(spark, tmp_path, [corpus])
    assert got == [("d0", 16, 79, 35, 2.257143)]


def test_exhausted_merges_still_tokenize(spark, tmp_path):
    """Merges exhaust at step 2 ('aaaa' -> one symbol); the LEFT-join
    apply must pass the vocab through the dead steps unchanged so the
    tokenizer still segments — a cross-join apply would annihilate the
    vocab and emit zero rows. 3 occurrences x 4 chars -> 12 chars,
    3 subword tokens, ratio 4.0."""
    got = _run_apply(spark, tmp_path, ["aaaa aaaa aaaa"])
    assert got == [("d0", 3, 12, 3, 4.0)]
