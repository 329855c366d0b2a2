"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything except the rolling-hash fingerprint is a pure JVM-side column
expression (whole-stage codegen); the fingerprint is numpy inside an Arrow
UDF. All deterministic, no external models.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# tiny deterministic stopword profiles for the n-gram/stopword language
# heuristic; order = tie-break preference
LANG_PROFILES: dict[str, list[str]] = {
    "en": "the of and to in is that for it was with be on not he as you at this have".split(),
    "sw": "ya na wa kwa ni za katika la kuwa hii cha kama hiyo yake pia ile hizo ndani".split(),
    "fr": "le la de et les des en un une du est que pour dans qui sur pas au ce il".split(),
    "de": "der die und das in den von mit ist des nicht ein eine auf für sie im dem".split(),
    "es": "el la de que en los del las un por con una es para su al lo como mas".split(),
}


def tokens_expr(text: Column) -> Column:
    """Frozen-tokenizer equivalent as a JVM expression (matches
    functions/tokenize.py on ASCII; used by JVM-side stats)."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    """Whitespace/regex token count — the doclen statistic (A9)."""
    return F.size(tokens_expr(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: alnum runs + standalone punctuation marks, the classic
    pre-tokenizer regex shape. JVM-side via two regexp_count terms."""
    return (
        F.regexp_count(F.lower(text), F.lit("[a-z0-9]+"))
        + F.regexp_count(text, F.lit(r"[^\sA-Za-z0-9]"))
    ).cast("long")


def quality_features(text: Column) -> Column:
    """Quality-scoring features as a struct: length, token count, mean word
    length, punctuation ratio, stopword(en) ratio, digit ratio."""
    toks = tokens_expr(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(text, F.lit(r"[0-9]"))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return F.struct(
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(safe(F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)), n_tok), 6).alias("mean_word_len"),
        F.round(safe(F.lit(1) * n_punct, n_chars), 6).alias("punct_ratio"),
        F.round(safe(F.lit(1) * n_stop, n_tok), 6).alias("stopword_ratio"),
        F.round(safe(F.lit(1) * n_digit, n_chars), 6).alias("digit_ratio"),
    )


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0,1]: stopword presence up, extreme
    punctuation/digit density down, degenerate length down. Deterministic
    heuristic (the reference has no trained scorer either)."""
    f = quality_features(text)
    score = (
        F.lit(0.5)
        + F.least(f["stopword_ratio"] * 2.0, F.lit(0.3))
        - F.least(f["punct_ratio"] * 2.0, F.lit(0.3))
        - F.least(f["digit_ratio"], F.lit(0.2))
        + F.when((f["n_tokens"] >= 20) & (f["n_tokens"] <= 5000), 0.2).otherwise(-0.2)
    )
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)), 6)


def lang_id(text: Column) -> Column:
    """Stopword-profile language ID over {en,sw,fr,de,es}: argmax of
    per-language stopword hit counts; 'und' when nothing matches.
    Pure JVM expression — greatest/when chain, no UDF."""
    toks = tokens_expr(text)
    # distinct stopword types present per language (array_intersect dedups —
    # type-presence is the robust signal for short texts)
    counts = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed so earlier profiles win ties via later .when precedence
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_PROFILES:  # first match wins ties
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(out)


FINGERPRINT_SCHEMA = T.ArrayType(T.LongType())


def winnowing_fingerprint(window: int = 8):
    """Rolling-hash (winnowing) document fingerprint: token xxhash stream →
    per-window minimum, deduplicated — the standard plagiarism/near-dup
    sketch. Returns a pandas UDF: text → array<long>."""

    @F.pandas_udf(FINGERPRINT_SCHEMA)
    def fp(text: pd.Series) -> pd.Series:
        import re

        from statschat_ke_spark.functions.hashing import xxh64

        token_re = re.compile(r"[a-z0-9]+")
        out = []
        # batch-lifetime memo: token streams are Zipf-heavy, so hashing each
        # DISTINCT token once cuts the pure-Python xxh64 calls by roughly
        # the type/token ratio (identical output)
        memo: dict[str, int] = {}
        for s in text.fillna(""):
            toks = token_re.findall(s.lower())
            if not toks:
                out.append([])
                continue
            hs = np.empty(len(toks), dtype=np.uint64)
            for j, t in enumerate(toks):
                h = memo.get(t)
                if h is None:
                    h = xxh64(t.encode())
                    memo[t] = h
                hs[j] = h
            if len(hs) <= window:
                mins = np.array([hs.min()], dtype=np.uint64)
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hs, window)
                mins = sw.min(axis=1)
            uniq = np.unique(mins)
            out.append(uniq.view(np.int64).tolist())
        return pd.Series(out)

    return fp


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach lang_guess, quality struct, token counts."""
    t = F.col(text_col)
    return docs.withColumns(
        {
            "lang_guess": lang_id(t),
            "quality": quality_features(t),
            "quality_score": quality_score(t),
            "n_tokens": token_count(t),
            "n_tokens_bpe": bpe_ish_token_count(t),
        }
    )
