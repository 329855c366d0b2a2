"""Single-node numpy BM25 oracle — the rank-identity ground truth.

Plays the role of the reference's golden-question evaluation harness
(/root/reference/statschat/model_evaluation/evaluation.py:250-326 over
config/questions.toml), but with exact top-k assertions instead of fuzzy
means (SURVEY.md §5.2-2): the Spark engine must reproduce this oracle's
doc_id sequence exactly and its scores to 1e-9.

Frozen BM25 spec (BASELINE.json north_star; k1=1.2, b=0.75):

    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)          # Lucene-style
    tf_norm     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = Σ_{t ∈ distinct(q), t ∈ d} idf(t) * tf_norm(t, d)

- corpus = rows with lang == 'en' (SURVEY §2.2 P12); N, avgdl over that corpus
- duplicate query terms count once (distinct terms)
- tie-break: score desc, then doc_id ascending in UNSIGNED uint64 order
- doc_id = xxhash64(url) unless the table carries its own doc_id
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from statschat_ke_spark.functions.hashing import to_unsigned, xxhash64_str
from statschat_ke_spark.functions.tokenize import tokenize

K1 = 1.2
B = 0.75


class OracleIndex:
    """Exhaustive in-memory inverted index over a pandas documents frame."""

    def __init__(self, docs: pd.DataFrame, *, text_col: str = "text", lang_col: str = "lang",
                 id_col: str | None = None, url_col: str = "url", lang: str | None = "en"):
        if lang is not None and lang_col in docs.columns:
            docs = docs[docs[lang_col] == lang]
        if id_col is not None:
            doc_ids = docs[id_col].astype("int64").to_numpy()
        else:
            doc_ids = np.array([xxhash64_str(u) for u in docs[url_col]], dtype=np.int64)
        self.doc_ids = doc_ids
        self.doc_ids_u = doc_ids.astype(np.uint64)
        self.postings: dict[str, dict[int, int]] = {}  # term -> {row_idx: tf}
        self.doclen = np.zeros(len(docs), dtype=np.int64)
        for row_idx, text in enumerate(docs[text_col].fillna("")):
            counts = Counter(tokenize(text))
            self.doclen[row_idx] = sum(counts.values())
            for term, tf in counts.items():
                self.postings.setdefault(term, {})[row_idx] = tf
        self.n_docs = len(docs)
        self.avgdl = float(self.doclen.mean()) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def topk(self, query: str, k: int = 10) -> pd.DataFrame:
        """(rank, doc_id, score) — score desc, unsigned doc_id asc ties."""
        terms = list(dict.fromkeys(tokenize(query)))
        scores = np.zeros(self.n_docs, dtype=np.float64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            idx = np.fromiter(plist.keys(), dtype=np.int64, count=len(plist))
            tf = np.fromiter(plist.values(), dtype=np.float64, count=len(plist))
            dl = self.doclen[idx].astype(np.float64)
            scores[idx] += w * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            touched[idx] = True
        hit = np.flatnonzero(touched)
        if hit.size == 0:
            return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        order = np.lexsort((self.doc_ids_u[hit], -scores[hit]))
        top = hit[order[:k]]
        return pd.DataFrame({
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": self.doc_ids[top],
            "score": scores[top],
        })


def golden_topk(docs: pd.DataFrame, queries: pd.DataFrame, **kw) -> pd.DataFrame:
    """FIXTURES.md §4 golden table: (query_id, rank, doc_id, bm25_score)."""
    oracle = OracleIndex(docs, **kw)
    frames = []
    for _, q in queries.iterrows():
        t = oracle.topk(q.query_text, int(q.k))
        t.insert(0, "query_id", int(q.query_id))
        frames.append(t)
    out = pd.concat(frames, ignore_index=True)
    return out.rename(columns={"score": "bm25_score"})
