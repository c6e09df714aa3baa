"""Span parser: golden decomposition + Spark-vs-oracle span-sequence
equality on synthetic pages (the per-row invariant from BASELINE.json:
same (kind, text, media_ref, order) per doc)."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_crawler_spark.crawl.parser import (
    enrich_documents,
    parse_pages,
    py_parse_outlinks,
    py_parse_page,
)
from job_crawler_spark.functions.urls import py_canonicalize
from job_crawler_spark.sources.synth import page_for_url, raw_url_for

PAGE = (
    "Senior Python Engineer at BigCorp. We use Python and AWS. "
    "<img:logo_7.png> Salary: 50000 - 70000. Benefits: pension, healthcare. "
    "Closing soon. <a:https://x.example/jobs/9?q=a>"
)


def test_golden_span_sequence():
    spans = py_parse_page(PAGE)
    kinds = [s["kind"] for s in spans]
    assert kinds == [
        "listing_text", "logo_media", "salary_snippet", "benefit_snippet",
        "listing_text",
    ]
    assert spans[1]["media_ref"] == "logo_7.png"
    assert spans[2]["text"] == "Salary: 50000 - 70000."
    assert spans[3]["text"].startswith("Benefits: pension")
    # offsets strictly increasing = interleave order preserved
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    assert py_parse_outlinks(PAGE) == ["https://x.example/jobs/9?q=a"]


def test_empty_and_markerless_pages():
    assert py_parse_page("") == []
    spans = py_parse_page("plain text only")
    assert [s["kind"] for s in spans] == ["listing_text"]
    assert spans[0]["offset"] == 0


def test_spark_parse_matches_oracle(spark):
    urls = sorted({py_canonicalize(raw_url_for(i)) for i in range(300)})
    pages = [(u, page_for_url(u)) for u in urls]
    df = spark.createDataFrame(pages, "url_canon string, page string")
    parsed = parse_pages(df).collect()
    got = {r.doc_id: r for r in parsed}
    assert set(got) == set(urls)
    for u, page in pages:
        r = got[u]
        spark_spans = [s.asDict() for s in r.spans]
        assert spark_spans == py_parse_page(page), u
        assert list(r.outlinks) == py_parse_outlinks(page), u


def test_enrich_documents_features(spark):
    url = py_canonicalize(raw_url_for(3))
    page = page_for_url(url)
    df = spark.createDataFrame([(url, page)], "url_canon string, page string")
    enriched = enrich_documents(parse_pages(df)).collect()[0]
    spans = py_parse_page(page)
    listing = " ".join(s["text"] for s in spans if s["kind"] == "listing_text")
    assert enriched.description.startswith(listing.split(" ")[0])
    sal = [s for s in spans if s["kind"] == "salary_snippet"]
    if sal:
        assert enriched.salary_min is not None
        assert enriched.features.salary_info.average == (
            (enriched.salary_min + enriched.salary_max) / 2
        )
    assert enriched.features is not None
