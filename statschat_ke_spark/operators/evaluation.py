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


def reciprocal_rank(ranked: Column, expected: Column, *, match: str = "contains") -> Column:
    """1/rank of ``expected`` in the ``ranked`` array (1-based), 0.0 when
    absent — full mmr_url parity (evaluation.py:202-232):

    - ``match="contains"`` (default, reference semantics): the expected url
      matches a result by SUBSTRING containment (``expected_url in url``),
      and an empty/null expectation scores 1.0 when no results came back,
      0.0 when any did.
    - ``match="exact"``: strict element equality (used by the driver
      contract entry over integer doc ids, where containment on stringified
      ids would be meaningless).
    """
    ranked, expected = _c(ranked), _c(expected)
    if match == "exact":
        pos = F.array_position(ranked, expected)
        return F.when(pos > 0, F.lit(1.0) / pos).otherwise(F.lit(0.0))
    if match != "contains":
        raise ValueError(f"unknown match {match!r}")
    no_expectation = expected.isNull() | (expected.cast("string") == "")
    pos = F.array_position(
        F.transform(ranked, lambda u: u.cast("string").contains(expected.cast("string"))),
        F.lit(True),
    )
    found = F.when(pos > 0, F.lit(1.0) / pos).otherwise(F.lit(0.0))
    return F.when(
        no_expectation,
        F.when(F.size(ranked) > 0, F.lit(0.0)).otherwise(F.lit(1.0)),
    ).otherwise(found)


def evaluate_retrieval(
    questions: DataFrame,
    results: DataFrame,
    *,
    question_key: str = "query_id",
    url_col: str = "url",
    rank_col: str = "rank",
    text_col: str = "text",
) -> DataFrame:
    """Join golden questions (expected_url, expected_keywords) against ranked
    results and emit per-question metrics; aggregate with mean_metrics().

    Ordering is enforced INSIDE the aggregation: collect_list gives no
    cross-partition order guarantee after the groupBy shuffle, so the rank
    is carried in a struct and array_sort restores it (struct comparison is
    field-ordered, rank first). A pre-groupBy orderBy would silently break
    exactly at the distributed 10^5-question scale this module targets.
    """
    sorted_structs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(rank_col).alias("r"),
                F.col(url_col).alias("u"),
                F.col(text_col).alias("t"),
            )
        )
    )
    ranked_lists = results.groupBy(question_key).agg(
        F.transform(sorted_structs, lambda s: s["u"]).alias("ranked_urls"),
        F.element_at(
            F.filter(sorted_structs, lambda s: s["t"].isNotNull()), 1
        )["t"].alias("top_text"),
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
            # reference parity: correct_doc = check_url(expected, actual) is
            # SUBSTRING containment (evaluation.py:197-198, 241-243), not
            # equality — page_url appends #page fragments to the base url
            F.coalesce(
                F.element_at("ranked_urls", 1)
                .cast("string")
                .contains(F.col("expected_url").cast("string")),
                F.lit(False),
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
