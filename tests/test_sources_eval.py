"""Tests for sources/web.py (S1/S2/P1/P2/J2) and operators/evaluation.py
(A5/A6) — reference parity per SURVEY §2.1/§2.2/§2.4."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from statschat_ke_spark.operators.evaluation import (
    evaluate_retrieval,
    keyword_recall,
    mean_metrics,
    reciprocal_rank,
)
from statschat_ke_spark.sources.web import (
    crawl_frontier,
    extract_links_udf,
    first_pdf_link,
    report_links,
)

HTML_A = b"""<html><body>
<a href="https://x.or.ke/reports/economic-survey/">Economic Survey</a>
<a href='https://x.or.ke/reports/mci-2024/'>MCI</a>
<a href="https://www.knbs.or.ke/census/volume-1/">census</a>
<a href="https://x.or.ke/reports/economic-survey/">dup</a>
<a href="/about">about</a>
<a href="https://x.or.ke/files/report-2024.pdf">pdf</a>
<a href="https://x.or.ke/files/annex.pdf">pdf2</a>
</body></html>"""

HTML_B = b"""<html><a href="https://x.or.ke/reports/labour-force/">LF</a>
<a href="https://x.or.ke/reports/mci-2024/">dup-across-pages</a></html>"""


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [Row(url="https://x.or.ke/all-reports/page/1/", html=bytearray(HTML_A)),
         Row(url="https://x.or.ke/all-reports/page/2/", html=bytearray(HTML_B))]
    )


def test_extract_links(spark, pages):
    rows = pages.select("url", extract_links_udf("html").alias("links")).collect()
    by_url = {r.url: r.links for r in rows}
    assert by_url["https://x.or.ke/all-reports/page/1/"] == [
        "https://x.or.ke/reports/economic-survey/",
        "https://x.or.ke/reports/mci-2024/",
        "https://www.knbs.or.ke/census/volume-1/",
        "https://x.or.ke/reports/economic-survey/",
        "/about",
        "https://x.or.ke/files/report-2024.pdf",
        "https://x.or.ke/files/annex.pdf",
    ]


def test_report_links_predicate_and_dedup(spark, pages):
    links = report_links(pages).collect()
    hrefs = sorted(r.href for r in links)
    # census filtered (P1), /about + .pdf rejected by the rlike, dups
    # collapsed to first occurrence (P2)
    assert hrefs == [
        "https://x.or.ke/reports/economic-survey/",
        "https://x.or.ke/reports/labour-force/",
        "https://x.or.ke/reports/mci-2024/",
    ]
    first = {r.href: (r.page_url, r.pos) for r in links}
    assert first["https://x.or.ke/reports/mci-2024/"][0].endswith("page/1/")


def test_first_pdf_link(spark, pages):
    r = (
        pages.select(first_pdf_link(extract_links_udf("html")).alias("pdf"))
        .collect()
    )
    assert r[0].pdf == "https://x.or.ke/files/report-2024.pdf"
    assert r[1].pdf is None


def test_crawl_frontier_anti_join(spark, pages):
    cand = report_links(pages)
    seen = spark.createDataFrame(
        [Row(href="https://x.or.ke/reports/mci-2024/")]
    )
    fresh = sorted(r.href for r in crawl_frontier(cand, seen).collect())
    assert fresh == [
        "https://x.or.ke/reports/economic-survey/",
        "https://x.or.ke/reports/labour-force/",
    ]


def test_keyword_recall_and_rr(spark):
    df = spark.createDataFrame(
        [Row(i=1, text="Inflation rose in December 2023", kws=["inflation", "december", "gdp"]),
         Row(i=2, text="nothing here", kws=["inflation"]),
         Row(i=3, text="empty expectations", kws=[])]
    )
    got = df.select(
        "i", F.round(keyword_recall("text", F.col("kws")), 6).alias("r")
    ).orderBy("i").collect()
    assert [r.r for r in got] == [pytest.approx(2 / 3, abs=1e-6), 0.0, 1.0]

    df2 = spark.createDataFrame(
        [Row(i=1, ranked=["a", "b", "c"], exp="b"),
         Row(i=2, ranked=["a"], exp="z")]
    )
    rr = df2.select("i", reciprocal_rank("ranked", "exp").alias("rr")).orderBy("i").collect()
    assert [r.rr for r in rr] == [0.5, 0.0]


def test_evaluate_retrieval_pipeline(spark):
    questions = spark.createDataFrame(
        [Row(query_id=1, expected_url="u1", expected_keywords=["alpha"]),
         Row(query_id=2, expected_url="u9", expected_keywords=["beta", "gamma"]),
         Row(query_id=3, expected_url="u5", expected_keywords=[])]
    )
    results = spark.createDataFrame(
        [Row(query_id=1, rank=1, url="u1", text="alpha text"),
         Row(query_id=1, rank=2, url="u2", text="other"),
         Row(query_id=2, rank=1, url="u3", text="beta only here"),
         Row(query_id=2, rank=2, url="u9", text="x")]
    )
    per_q = evaluate_retrieval(questions, results).orderBy("query_id").collect()
    assert per_q[0].reciprocal_rank == 1.0 and per_q[0].top1_correct
    assert per_q[0].keyword_recall == 1.0
    assert per_q[1].reciprocal_rank == 0.5 and not per_q[1].top1_correct
    assert per_q[1].keyword_recall == 0.5  # 'beta' in top_text, 'gamma' not
    assert per_q[2].reciprocal_rank == 0.0  # no results at all
    m = mean_metrics(spark.createDataFrame(per_q)).collect()[0]
    assert m.mean_reciprocal_rank == pytest.approx(0.5, abs=1e-6)
    assert m.top1_accuracy == pytest.approx(1 / 3, abs=1e-6)


def test_reciprocal_rank_mmr_url_parity(spark):
    """Full mmr_url parity (reference evaluation.py:202-232): substring
    containment matching + the empty-expected 1.0/0.0 branch."""
    rows = [
        Row(i=1, ranked=["x/page/u1#p2", "y"], exp="u1"),      # containment @1
        Row(i=2, ranked=["y", "x/page/u1#p2"], exp="u1"),      # containment @2
        Row(i=3, ranked=["a", "b"], exp=""),                   # no expectation, results -> 0
        Row(i=4, ranked=[], exp=""),                           # no expectation, none -> 1
        Row(i=5, ranked=[], exp=None),                         # null expectation, none -> 1
        Row(i=6, ranked=["a"], exp="zzz"),                     # absent -> 0
    ]
    df = spark.createDataFrame(rows, "i int, ranked array<string>, exp string")
    got = [
        r.rr
        for r in df.select(
            "i", reciprocal_rank("ranked", "exp").alias("rr")
        ).orderBy("i").collect()
    ]
    assert got == [1.0, 0.5, 0.0, 1.0, 1.0, 0.0]

    # reference-emulation cross-check on the same cases
    def mmr_url(expected, returned):
        if not expected:
            return 0.0 if len(returned) > 0 else 1.0
        for i, url in enumerate(returned):
            if expected in url:
                return 1.0 / (i + 1.0)
        return 0.0

    assert got == [mmr_url(r.exp, r.ranked) for r in rows]


def test_evaluate_retrieval_order_across_partitions(spark):
    """Ranked lists must be rank-ordered even when one query's result rows
    span many partitions (collect_list gives no shuffle-order guarantee)."""
    n = 200
    results = spark.createDataFrame(
        [Row(query_id=1, rank=r, url=f"u{r}", text=f"t{r}") for r in range(1, n + 1)]
    ).repartition(16)  # scatter rows of the single query across partitions
    questions = spark.createDataFrame(
        [Row(query_id=1, expected_url=f"u{n}", expected_keywords=["t1"])]
    )
    per_q = evaluate_retrieval(questions, results).collect()[0]
    # expected url sits at rank n -> rr must be exactly 1/n
    assert per_q.reciprocal_rank == pytest.approx(1.0 / n, abs=1e-12)
    # top_text comes from the rank-1 row
    assert per_q.keyword_recall == 1.0
