"""Reference-operator ports: scalar functions (§2.7), post-processing
pipeline (§2.2/2.4/2.5), latest-version maintenance (§2.3)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row, functions as F

from statschat_ke_spark.functions.refops import (
    convert_to_date,
    extract_creation_date,
    extract_modification_date,
    fuzz_ratio_udf,
    highlight_udf,
    latest_weight,
    normalize_quotes,
    page_url,
    time_decay,
    title_from_filename,
    trim_context,
    url_keywords,
)
from statschat_ke_spark.operators.latest import apply_update, flag_latest, match_superseded
from statschat_ke_spark.operators.postproc import (
    dedup_first_wins,
    rank_and_head,
    relative_score_filter,
    score_threshold,
    search_pipeline,
)


def one(spark, col, _schema: str | None = None, **cols):
    if _schema:
        df = spark.createDataFrame([tuple(cols.values())], _schema)
    else:
        df = spark.createDataFrame([Row(**cols)])
    return df.select(col.alias("out")).first().out


def test_url_keywords(spark):
    # pdf_to_json.py:98-121: split '-', strip ext, order-preserving unique
    out = one(spark, url_keywords(F.col("f")), f="cpi-index-2023-cpi.pdf")
    assert out == ["cpi", "index", "2023"]


def test_title_from_filename(spark):
    assert one(spark, title_from_filename(F.col("f")), f="gdp-report-q3.pdf") == "gdp report q3"


def test_creation_date_chain(spark):
    c = extract_creation_date(F.col("m"), F.col("f"), F.lit("2026-01-01").cast("date"))
    assert one(spark, c, m="D:20230515120000Z", f="x.pdf") == dt.date(2023, 5, 15)
    # fallback: max year in filename → Jan 1 (pdf_to_json.py:151-166)
    assert one(spark, c, "m string, f string", m=None, f="report-2019-to-2021.pdf") == dt.date(2021, 1, 1)
    assert one(spark, c, "m string, f string", m=None, f="no-year.pdf") == dt.date(2026, 1, 1)


def test_modification_date_cap(spark):
    m = extract_modification_date(F.col("m").cast("date"), F.col("c").cast("date"))
    # >1825 days later → creation wins (pdf_to_json.py:181-216)
    assert one(spark, m, m="2023-01-01", c="2015-01-01") == dt.date(2015, 1, 1)
    assert one(spark, m, m="2016-06-01", c="2015-01-01") == dt.date(2016, 6, 1)


def test_convert_to_date(spark):
    c = convert_to_date(F.col("s"))
    assert one(spark, c, s="March 2022") == dt.date(2022, 3, 1)
    assert one(spark, c, s="2022") == dt.date(2022, 1, 1)
    assert one(spark, c, s="not a date") is None


def test_time_decay_logistic(spark):
    # latest_flag_helpers.py:6-14 with injected now
    lat = 2.0
    days = 100
    expected = (1.5 - 1 / (1 + math.exp(-days / (400 / lat)))) ** lat
    got = one(
        spark,
        time_decay(F.col("d").cast("date"), F.lit(lat), F.lit("2023-04-11").cast("date")),
        d="2023-01-01",
    )
    assert abs(got - expected) < 1e-12


def test_latest_weight(spark):
    w = latest_weight(F.col("q"))
    assert one(spark, w, q="most recent inflation") == 2.0
    assert one(spark, w, q="latest GDP") == 2.0
    assert one(spark, w, q="inflation in 2009") == 1.0


def test_trim_context(spark):
    assert one(spark, trim_context(F.col("t")), t="a b c d") == "b c"
    assert one(spark, trim_context(F.col("t")), t="a b") == ""


def test_page_url(spark):
    assert (
        one(spark, page_url(F.col("u"), F.col("p")), u="http://x/y.pdf", p=3)
        == "http://x/y.pdf#page=3"
    )


def test_normalize_quotes(spark):
    assert one(spark, normalize_quotes(F.col("s")), s="‘a’ “b”") == "'a' \"b\""


def test_highlighter(spark):
    # generative/utils.py:24-77: case-insensitive first occurrence only
    out = one(
        spark,
        highlight_udf(F.col("t"), F.col("p")),
        t="Inflation rose. inflation fell.",
        p=["inflation"],
    )
    assert out == "<b>Inflation</b> rose. inflation fell."


def test_fuzz_ratio(spark):
    r = fuzz_ratio_udf(F.col("a"), F.col("b"))
    assert one(spark, r, a="abc", b="abc") == 100.0
    assert one(spark, r, a="abcd", b="abce") == 75.0  # 2*3/(4+4)
    assert one(spark, r, a="", b="x") == 0.0


# ---- post-processing pipeline ----


@pytest.fixture()
def results_df(spark):
    rows = [
        Row(doc_id=1, score=10.0, title="cpi", date=dt.date(2023, 12, 1)),
        Row(doc_id=2, score=9.0, title="cpi", date=dt.date(2023, 12, 1)),  # dup key
        Row(doc_id=3, score=8.0, title="gdp", date=dt.date(2020, 1, 1)),
        Row(doc_id=4, score=2.0, title="old", date=dt.date(2015, 1, 1)),
        Row(doc_id=5, score=0.5, title="tiny", date=dt.date(2023, 1, 1)),
    ]
    return spark.createDataFrame(rows)


def test_score_threshold(results_df):
    assert score_threshold(results_df, 1.0).count() == 4


def test_dedup_first_wins(results_df):
    out = dedup_first_wins(
        results_df, ["title", "date"], [F.desc("score"), F.asc("doc_id")]
    )
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # doc 2 deduped (same title+date, lower score)


def test_relative_score_filter(results_df):
    out = relative_score_filter(results_df, ratio=1.5)
    # best=10 → keep >= 6.667
    assert {r.doc_id for r in out.collect()} == {1, 2, 3}


def test_rank_and_head(results_df):
    out = rank_and_head(results_df, 3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert [r.doc_num for r in out] == [1, 2, 3]


def test_search_pipeline_shape(results_df):
    out = search_pipeline(
        results_df,
        min_score=1.0,
        latest_weight=2.0,
        now=F.lit("2024-01-01").cast("date"),
        k_contexts=3,
    ).collect()
    assert len(out) <= 3
    assert out[0].doc_num == 1
    # recency boost: doc 1 (Dec 2023) must stay on top vs doc 3 (2020)
    assert out[0].doc_id == 1


# ---- latest-version maintenance ----


def test_flag_latest(spark):
    rows = [
        Row(url="u1", title="cpi bulletin", release_date=dt.date(2023, 1, 1)),
        Row(url="u2", title="cpi bulletin", release_date=dt.date(2023, 2, 1)),
        Row(url="u3", title="gdp report", release_date=dt.date(2022, 1, 1)),
    ]
    out = {r.url: r.latest for r in flag_latest(spark.createDataFrame(rows)).collect()}
    assert out == {"u1": False, "u2": True, "u3": True}


def test_match_superseded(spark):
    new = spark.createDataFrame([Row(title="consumer price index november 2023")])
    old = spark.createDataFrame(
        [
            Row(title="consumer price index october 2023"),
            Row(title="gross domestic product q3"),
        ]
    )
    got = match_superseded(new, old).collect()
    assert len(got) == 1
    assert got[0].old_name == "consumer price index october 2023"
    assert got[0].similarity > 75


def test_apply_update_equals_full_rebuild(spark):
    base = spark.createDataFrame(
        [
            Row(url="a", title="t1", release_date=dt.date(2023, 1, 1), text="x"),
            Row(url="b", title="t1", release_date=dt.date(2023, 2, 1), text="y"),
        ]
    )
    delta = spark.createDataFrame(
        [
            Row(url="b", title="t1", release_date=dt.date(2023, 2, 1), text="y2"),
            Row(url="c", title="t1", release_date=dt.date(2023, 3, 1), text="z"),
        ]
    )
    merged = apply_update(base, delta).orderBy("url").collect()
    assert [r.url for r in merged] == ["a", "b", "c"]
    assert [r.latest for r in merged] == [False, False, True]
    assert merged[1].text == "y2"  # delta replaced base row
