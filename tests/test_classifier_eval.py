"""classifier_eval goldens: hand-built confusion with every metric arm.

Corpus (marker words: en = the/and/is/fast/small, de = der/die/und/
schnell/klein, es = el/la/y/rapido/pequeno; all-zero scores tie to en):
  d0 en "the fast"        -> en  (correct)
  d1 de "der schnell und" -> de  (correct)
  d2 de "hello world"     -> en  (miss: zero scores tie to en)
  d3 es "el rapido"       -> es  (correct)
  d4 fr "the small"       -> en  (fr is unpredictable)
Hand metrics: de P=1 R=0.5 F1=2/3; en P=1/3 R=1 F1=0.5; es perfect;
fr all-zero (guarded divisions); overall accuracy 3/5.
"""

from __future__ import annotations

from job_crawler_spark.plans.textops import q_classifier_eval


def test_hand_confusion_metrics(spark, tmp_path):
    rows = [
        ("d0", "en", "the fast"),
        ("d1", "de", "der schnell und"),
        ("d2", "de", "hello world"),
        ("d3", "es", "el rapido"),
        ("d4", "fr", "the small"),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "lang", "text"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = [tuple(r) for r in q_classifier_eval(spark, str(tmp_path)).collect()]
    assert got == [
        ("__overall__", 5, 5, 3, 0.6, 0.6, 0.6),
        ("de", 2, 1, 1, 1.0, 0.5, 0.666667),
        ("en", 1, 3, 1, 0.333333, 1.0, 0.5),
        ("es", 1, 1, 1, 1.0, 1.0, 1.0),
        ("fr", 1, 0, 0, 0.0, 0.0, 0.0),
    ]
