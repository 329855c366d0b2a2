"""Golden-question evaluation operators (SURVEY.md §2.4 A4-A6, §3.3).

Ports of the reference's retrieval-quality metrics
(/root/reference/statschat/model_evaluation/evaluation.py):

- keyword recall  (:176-194): fraction of expected keywords present in the
  answer/context text — here a JVM-side array expression, no UDF
- reciprocal rank (:202-232): 1/rank of the expected url in the ranked
  result list, 0 when absent
- mean metrics    (:277-283): plain aggregations

All expressed as DataFrame ops so the evaluation of 10^5 golden questions is
itself a distributed job (the reference loops questions one by one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _c(col: Column | str) -> Column:
    """Coerce name → Column; several pyspark builtins (array_position)
    otherwise treat a str second argument as a LITERAL, not a column."""
    return F.col(col) if isinstance(col, str) else col


def keyword_recall(text: Column, keywords: Column) -> Column:
    """Fraction of ``keywords`` (array<string>) found case-insensitively in
    ``text``. Empty keyword list → 1.0 (the reference treats no-expectation
    as trivially satisfied)."""
    text, keywords = _c(text), _c(keywords)
    lowered = F.lower(text)
    hits = F.size(
        F.filter(keywords, lambda k: lowered.contains(F.lower(k)))
    )
    return F.when(F.size(keywords) == 0, F.lit(1.0)).otherwise(
        hits.cast("double") / F.size(keywords)
    )


def reciprocal_rank(ranked: Column, expected: Column) -> Column:
    """1/position of ``expected`` in the ``ranked`` array (1-based), 0.0 when
    absent — evaluation.py:202-232 semantics."""
    pos = F.array_position(_c(ranked), _c(expected))
    return F.when(pos > 0, F.lit(1.0) / pos).otherwise(F.lit(0.0))


def evaluate_retrieval(
    questions: DataFrame,
    results: DataFrame,
    *,
    question_key: str = "query_id",
    url_col: str = "url",
    rank_col: str = "rank",
) -> DataFrame:
    """Join golden questions (expected_url, expected_keywords) against ranked
    results and emit per-question metrics; aggregate with mean_metrics()."""
    ranked_lists = results.orderBy(question_key, rank_col).groupBy(question_key).agg(
        F.collect_list(url_col).alias("ranked_urls"),
        F.first("text", ignorenulls=True).alias("top_text"),
    )
    joined = questions.join(ranked_lists, question_key, "left")
    return joined.select(
        question_key,
        reciprocal_rank(
            F.coalesce(F.col("ranked_urls"), F.array()), F.col("expected_url")
        ).alias("reciprocal_rank"),
        keyword_recall(
            F.coalesce(F.col("top_text"), F.lit("")), F.col("expected_keywords")
        ).alias("keyword_recall"),
        (
            F.coalesce(
                F.element_at("ranked_urls", 1) == F.col("expected_url"), F.lit(False)
            )
        ).alias("top1_correct"),
    )


def mean_metrics(per_question: DataFrame) -> DataFrame:
    """evaluation.py:277-283 — mean over the question set."""
    return per_question.agg(
        F.round(F.avg("reciprocal_rank"), 6).alias("mean_reciprocal_rank"),
        F.round(F.avg("keyword_recall"), 6).alias("mean_keyword_recall"),
        F.round(F.avg(F.col("top1_correct").cast("double")), 6).alias("top1_accuracy"),
    )
