"""Ports of the reference's scalar/date/string operators (SURVEY.md §2.7).

Each function is a Spark Column expression (JVM-side, codegen-friendly) or a
vectorized pandas UDF where first-match semantics genuinely need Python.
Citations point into /root/reference/ for parity checking.

Determinism divergences from the reference (documented, §5.2-6):
- ``time_decay`` takes an injected ``now`` date instead of datetime.now()
  (latest_flag_helpers.py:12)
- doc ids are xxhash64(url), not random ints (pdf_to_json.py:452)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T


def url_keywords(filename: Column) -> Column:
    """F1 — extract_url_keywords_from_filename (pdf_to_json.py:98-121):
    strip .pdf/.html suffix, split on '-', order-preserving unique."""
    stem = F.regexp_replace(filename, r"\.(pdf|html?)$", "")
    return F.array_distinct(F.filter(F.split(stem, "-"), lambda x: x != ""))


def title_from_filename(filename: Column) -> Column:
    """F11 — strip extension, hyphens→spaces (pdf_to_json.py:453-454)."""
    return F.regexp_replace(
        F.regexp_replace(filename, r"\.(pdf|html?)$", ""), "-", " "
    )


def extract_creation_date(meta_date: Column, filename: Column, default: Column) -> Column:
    """F2 — extract_pdf_creation_date (pdf_to_json.py:124-178): parse
    'D:YYYYMMDD...' metadata, else max 19xx/20xx year in the filename
    (year-01-01), else the injected default date."""
    from_meta = F.try_to_date(F.regexp_extract(meta_date, r"^D:(\d{8})", 1), "yyyyMMdd")
    # the reference takes max(re.findall(...)); array_max over all matches
    years = F.regexp_extract_all(filename, F.lit(r"\b(19\d{2}|20\d{2})\b"), 1)
    from_name = F.try_to_date(
        F.when(F.size(years) > 0, F.concat(F.array_max(years), F.lit("-01-01")))
    )
    return F.coalesce(from_meta, from_name, default)


def extract_modification_date(mod: Column, creation: Column) -> Column:
    """F3 — mod date unless >1825 days after creation → creation
    (pdf_to_json.py:181-216)."""
    return F.when(F.datediff(mod, creation) > 1825, creation).otherwise(
        F.coalesce(mod, creation)
    )


def convert_to_date(s: Column) -> Column:
    """F4 — convert_to_date (pdf_to_json.py:388-413): '%B %Y' → first of
    month, '%Y' → Jan 1; null if neither (reference raises)."""
    return F.coalesce(
        F.try_to_date(s, "MMMM yyyy"),
        F.try_to_date(F.when(s.rlike(r"^\d{4}$"), F.concat(s, F.lit("-01-01")))),
    )


def time_decay(date: Column, latest: Column, now: Column) -> Column:
    """F5 — logistic time decay (latest_flag_helpers.py:6-14), the variant
    actually used by the reference (imported at cloud_llm.py:19):

        coef = (1.5 - 1/(1 + exp(-days/(400/latest))))^latest

    ``now`` is injected for determinism. latest is a float weight (F7).
    The reference's dead linear duplicate (generative/utils.py:95-113) is
    intentionally not ported (SURVEY §2.7 F6).
    """
    days = F.datediff(now, date).cast("double")
    return F.pow(
        F.lit(1.5) - F.lit(1.0) / (F.lit(1.0) + F.exp(-days / (F.lit(400.0) / latest))),
        latest,
    )


def latest_weight(question: Column, latest_max: float = 2.0) -> Column:
    """F7 — get_latest_flag (latest_flag_helpers.py:17-28): full weight if
    the query asks for recency, else half."""
    return F.when(
        F.lower(question).rlike("(recent)|(latest)"), F.lit(latest_max)
    ).otherwise(F.lit(latest_max / 2.0))


def trim_context(text: Column) -> Column:
    """F9 — drop first and last whitespace token (generative/utils.py:80-92)."""
    toks = F.split(text, " ")
    return F.when(F.size(toks) <= 2, F.lit("")).otherwise(
        F.array_join(F.slice(toks, 2, F.size(toks) - 2), " ")
    )


def page_url(url: Column, page_number: Column) -> Column:
    """F10 — f"{url}#page={n}" (pdf_to_json.py:258-260)."""
    return F.concat(url, F.lit("#page="), page_number.cast("string"))


def normalize_quotes(s: Column) -> Column:
    """F16 — smart quotes → ASCII (local_llm.py:105-129)."""
    return F.translate(s, "‘’“”", "''\"\"")


@F.pandas_udf(T.StringType())
def highlight_udf(text: pd.Series, phrases: pd.Series) -> pd.Series:
    """F8 — highlighter (generative/utils.py:24-77): case-insensitive FIRST
    occurrence of each phrase wrapped in <b></b>. First-match-only semantics
    need Python; vectorized over Arrow batches.

    phrases: array<string> column, longest-first application mirrors the
    reference's sort-by-length (generative/utils.py:38-52, W5).
    """

    def mark(args):
        t, ph = args
        if t is None:
            return None
        if ph is None:
            return t
        for p in sorted((x for x in ph if x), key=len, reverse=True):
            low, lp = t.lower(), p.lower()
            i = low.find(lp)
            if i >= 0:
                t = t[:i] + "<b>" + t[i : i + len(p)] + "</b>" + t[i + len(p) :]
        return t

    return pd.Series(map(mark, zip(text, phrases)))


@F.pandas_udf(T.DoubleType())
def fuzz_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """F14 — rapidfuzz.fuzz.ratio parity (latest_updates.py:46,
    evaluation.py:155-173): indel similarity = 100 * 2*LCS / (|a|+|b|).

    Pure-Python DP (no rapidfuzz in this environment); strings here are
    short titles/answers, and the fuzzy join that uses it blocks on a
    60-char prefix first (J3), so the O(nm) core stays small.
    """

    def lcs_len(x: str, y: str) -> int:
        if not x or not y:
            return 0
        prev = [0] * (len(y) + 1)
        for cx in x:
            cur = [0]
            append = cur.append
            for j, cy in enumerate(y, 1):
                if cx == cy:
                    append(prev[j - 1] + 1)
                else:
                    p, c = prev[j], cur[j - 1]
                    append(p if p >= c else c)
            prev = cur
        return prev[-1]

    def ratio(args):
        x, y = args
        if x is None or y is None:
            return 0.0
        if not x and not y:
            return 100.0
        m = lcs_len(x.lower(), y.lower())
        return 200.0 * m / (len(x) + len(y))

    return pd.Series(map(ratio, zip(a, b)), dtype="float64")
