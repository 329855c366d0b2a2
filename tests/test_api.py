"""End-to-end search() API — the reference make_query surface (SURVEY §3.1)
composed from retrieval + metadata join + postproc + highlight."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from statschat_ke_spark.api import search


@pytest.fixture(scope="module")
def metadata(spark, corpus_df):
    # deterministic metadata: title from url, date from warc_ts, carry text
    return corpus_df.select(
        F.xxhash64("url").alias("doc_id"),
        F.regexp_replace("url", r"^https?://[^/]+/", "").alias("title"),
        F.to_date("warc_ts").alias("date"),
        "text",
    )


def test_search_end_to_end(spark, index_dir, metadata):
    out = search(
        spark,
        index_dir,
        "what was inflation in december 2023",
        k=10,
        k_contexts=5,
        now="2024-01-01",
        metadata=metadata,
    )
    refs = out["references"]
    assert 1 <= len(refs) <= 5
    # ranked 1..n, scores rounded to 2 decimals, descending
    assert [r["doc_num"] for r in refs] == list(range(1, len(refs) + 1))
    scores = [r["score"] for r in refs]
    assert scores == sorted(scores, reverse=True)
    assert all(round(s, 2) == s for s in scores)
    # query terms highlighted in the top context
    assert "<b>" in refs[0]["text"].lower()
    # recency weight: question has no recent/latest keyword -> half weight
    assert out["latest_weight"] == 1.0


def test_search_latest_weight_and_escape(spark, index_dir, metadata):
    out = search(
        spark, index_dir, "latest <b>inflation</b> figures", metadata=metadata
    )
    assert out["latest_weight"] == 2.0  # 'latest' triggers full weight (F7)
    assert "&lt;b&gt;" in out["question"]  # F15 escape on the echo


def test_search_empty_question(spark, index_dir):
    out = search(spark, index_dir, "   ")
    assert out == {"question": "", "latest_weight": None, "references": []}


def test_search_degraded_without_metadata(spark, index_dir):
    out = search(spark, index_dir, "county inflation report", k_contexts=3)
    refs = out["references"]
    assert 1 <= len(refs) <= 3
    assert [r["doc_num"] for r in refs] == list(range(1, len(refs) + 1))
