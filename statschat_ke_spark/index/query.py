"""BM25 top-k query evaluation over the partitioned inverted index.

Replaces the reference's FAISS ``similarity_search_with_score``
(/root/reference/statschat/generative/cloud_llm.py:126-160) with the
inverted-index analog of an index-nested-loop join (SURVEY.md §2.3 J5):

1. tokenize the query driver-side (tiny) → distinct term_ids
2. lexicon lookup (parquet scan filtered by term_id — pushed down) → idf +
   per-term impact upper bounds, collected to the driver (≤ |q| rows)
3. postings scan filtered by term_id (predicate pushdown + row-group
   pruning: postings are written term_id-sorted within range partitions)
4. scoring:
   - ``exhaustive``: decode every block, emit per-doc partials, hash-agg
     sum, global top-k (TakeOrderedAndProject)
   - ``wand``: group blocks by doc-range slice; per slice a vectorized
     block-max WAND skips blocks whose upper bound can't enter the top-k;
     per-slice top-k then global top-k. Exact because a doc's postings for
     every term share its slice (slice = f(doc_id)).
5. tie-break: score desc, doc_id ascending in unsigned order — identical to
   the numpy oracle (index/oracle.py).

Thresholding (reference P5, cloud_llm.py:153) and the post-retrieval ports
(dedup/decay/highlight) operate on the ≤k collected rows (operators/postproc).
"""

from __future__ import annotations

import heapq
import json
import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from statschat_ke_spark.functions.hashing import xxhash64_str
from statschat_ke_spark.functions.tokenize import tokenize
from statschat_ke_spark.index.codec import decode_doc_ids, decode_tfs, vbyte_decode

K1 = 1.2
B = 0.75
LONG_MIN = -(2**63)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def _query_terms(spark: SparkSession, index_dir: str, query_text: str) -> dict[int, dict]:
    """Driver-side lexicon probe: term_id → {idf, max_tfn, df}."""
    terms = list(dict.fromkeys(tokenize(query_text)))
    if not terms:
        return {}
    ids = [xxhash64_str(t) for t in terms]
    stats = load_stats(index_dir)
    n = stats["n_docs"]
    lex = (
        spark.read.parquet(os.path.join(index_dir, "lexicon"))
        .filter(F.col("term_id").isin(ids))
        .select("term_id", "df", "max_tfn")
        .collect()
    )
    out = {}
    for r in lex:
        idf = math.log((n - r.df + 0.5) / (r.df + 0.5) + 1.0)
        out[r.term_id] = {"idf": idf, "max_tfn": float(r.max_tfn), "df": int(r.df)}
    return out


def _empty_result(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


def topk(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int = 10,
    *,
    mode: str = "wand",
    with_url: bool = False,
) -> DataFrame:
    """Top-k (doc_id, score[, url, rank]) for a free-text query."""
    terminfo = _query_terms(spark, index_dir, query_text)
    if not terminfo:
        res = _empty_result(spark)
    else:
        ids = list(terminfo.keys())
        stats = load_stats(index_dir)
        avgdl = float(stats["avgdl"])
        pst = (
            spark.read.parquet(os.path.join(index_dir, "postings"))
            .filter(F.col("term_id").isin(ids))
            .select("term_id", "slice", "block_id", "n", "doc_ids", "tfs", "dls",
                    "block_max_tfn")
        )
        idf_map = {t: v["idf"] for t, v in terminfo.items()}
        ub_map = {t: v["idf"] * v["max_tfn"] for t, v in terminfo.items()}
        if mode == "exhaustive":
            scored = pst.mapInPandas(_exhaustive_scorer(idf_map, avgdl), RESULT_SCHEMA)
            res = scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
        elif mode == "wand":
            res = pst.groupBy("slice").applyInPandas(
                _wand_slice(idf_map, ub_map, avgdl, k), RESULT_SCHEMA
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")

    ranked = (
        res.orderBy(
            F.desc("score"), F.col("doc_id").bitwiseXOR(F.lit(LONG_MIN)).asc()
        )
        .limit(k)
    )
    if with_url:
        docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("doc_id", "url")
        # ≤k result rows: broadcast them as the build side of an inner join
        # against the big docs table (every result id exists in docs)
        ranked = (
            docs.join(F.broadcast(ranked), "doc_id", "inner")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.col("doc_id").bitwiseXOR(F.lit(LONG_MIN)).asc())
        )
    return ranked


def topk_batch(
    spark: SparkSession,
    index_dir: str,
    queries: dict[int, str],
    k: int = 10,
) -> DataFrame:
    """Top-k for MANY queries in ONE job: (query_id, rank, doc_id, score).

    The distributed analog of the reference's sequential eval loop
    (evaluation.py:13-39 runs make_query per question): postings are scanned
    once with the UNION of all query term_ids pushed down; each (slice)
    group runs WAND once per query that has a term there; a ranked window
    per query yields the global top-k. Latency amortizes to ~one query's
    cost for a whole golden set; at 10^5 golden questions this is the only
    workable shape.
    """
    # ONE lexicon probe for the union of every query's terms
    terms_by_q = {
        qid: list(dict.fromkeys(tokenize(qtext))) for qid, qtext in queries.items()
    }
    ids_by_q = {
        qid: [xxhash64_str(t) for t in ts] for qid, ts in terms_by_q.items()
    }
    union_ids = sorted({t for ids in ids_by_q.values() for t in ids})
    stats = load_stats(index_dir)
    avgdl = float(stats["avgdl"])
    n = stats["n_docs"]
    lex = {}
    if union_ids:
        for r in (
            spark.read.parquet(os.path.join(index_dir, "lexicon"))
            .filter(F.col("term_id").isin(union_ids))
            .select("term_id", "df", "max_tfn")
            .collect()
        ):
            idf = math.log((n - r.df + 0.5) / (r.df + 0.5) + 1.0)
            lex[r.term_id] = {"idf": idf, "max_tfn": float(r.max_tfn)}
    per_q: dict[int, dict[int, dict]] = {
        qid: {t: lex[t] for t in ids if t in lex} for qid, ids in ids_by_q.items()
    }
    all_ids = sorted({t for ti in per_q.values() for t in ti})
    if not all_ids:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    idf_by_q = {q: {t: v["idf"] for t, v in ti.items()} for q, ti in per_q.items()}
    ub_by_q = {
        q: {t: v["idf"] * v["max_tfn"] for t, v in ti.items()} for q, ti in per_q.items()
    }
    pst = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .filter(F.col("term_id").isin(all_ids))
        .select("term_id", "slice", "block_id", "n", "doc_ids", "tfs", "dls",
                "block_max_tfn")
    )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )

    def run_slice(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        present = set(pdf["term_id"].unique().tolist())
        for qid, idf_map in idf_by_q.items():
            q_terms = [t for t in idf_map if t in present]
            if not q_terms:
                continue
            sub = pdf[pdf["term_id"].isin(q_terms)]
            res = _wand_slice(idf_map, ub_by_q[qid], avgdl, k)(sub)
            if len(res):
                res.insert(0, "query_id", np.int64(qid))
                outs.append(res)
        if not outs:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.concat(outs, ignore_index=True)

    from pyspark.sql import Window as W

    scored = pst.groupBy("slice").applyInPandas(run_slice, schema)
    w = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id").bitwiseXOR(F.lit(LONG_MIN)).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _exhaustive_scorer(idf_map: dict[int, float], avgdl: float):
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            outs_ids, outs_scores = [], []
            for row in pdf.itertuples(index=False):
                ids = decode_doc_ids(row.doc_ids).view(np.int64)
                tfs = decode_tfs(row.tfs).astype(np.float64)
                dls = vbyte_decode(row.dls).astype(np.float64)
                w = idf_map[row.term_id]
                partial = w * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
                outs_ids.append(ids)
                outs_scores.append(partial)
            if outs_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(outs_ids),
                        "score": np.concatenate(outs_scores),
                    }
                )

    return score


def _wand_slice(idf_map: dict[int, float], ub_map: dict[int, float], avgdl: float, k: int):
    """Per-slice block-max WAND: exact local top-k with block skipping."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        cursors = []
        for term_id, g in pdf.groupby("term_id", sort=False):
            g = g.sort_values("block_id")
            cur = _TermCursor(
                idf=idf_map[int(term_id)],
                ub=ub_map[int(term_id)],
                blocks=list(
                    zip(
                        g["doc_ids"].tolist(),
                        g["tfs"].tolist(),
                        g["dls"].tolist(),
                        g["block_max_tfn"].tolist(),
                    )
                ),
                avgdl=avgdl,
            )
            if cur.doc is not None:
                cursors.append(cur)

        heap: list[tuple[float, int]] = []  # (score, -doc_u) min-heap

        def threshold() -> float:
            return heap[0][0] if len(heap) >= k else -math.inf

        while cursors:
            cursors.sort(key=lambda c: c.doc)
            # pivot: smallest doc where Σ term UBs could beat threshold
            acc = 0.0
            pivot_i = -1
            th = threshold()
            for i, c in enumerate(cursors):
                acc += c.ub
                # >= not >: a candidate scoring exactly the threshold can
                # still enter the heap by winning the doc_id tie-break
                if acc >= th:
                    pivot_i = i
                    break
            if pivot_i < 0:
                break  # even all UBs together can't beat the threshold
            pivot_doc = cursors[pivot_i].doc
            if cursors[0].doc == pivot_doc:
                # block-max refinement: sum block maxima at the pivot
                bm = 0.0
                for c in cursors:
                    if c.doc != pivot_doc:
                        break
                    bm += c.block_max_score()
                if bm >= th:
                    s = 0.0
                    doc = pivot_doc
                    for c in [c for c in cursors if c.doc == doc]:
                        s += c.score_current()
                        c.advance()
                    if len(heap) < k:
                        heapq.heappush(heap, (s, -doc))
                    elif (s, -doc) > heap[0]:
                        heapq.heapreplace(heap, (s, -doc))
                else:
                    for c in cursors:
                        if c.doc != pivot_doc:
                            break
                        c.advance()
                cursors = [c for c in cursors if c.doc is not None]
            else:
                # advance the laggard cursor(s) up to the pivot
                for c in cursors[:pivot_i]:
                    c.seek(pivot_doc)
                cursors = [c for c in cursors if c.doc is not None]

        rows = sorted(heap, key=lambda t: (-t[0], -t[1]))
        return pd.DataFrame(
            {
                "doc_id": np.array([np.uint64(-d) for _, d in rows], dtype=np.uint64).view(np.int64)
                if rows
                else np.empty(0, dtype=np.int64),
                "score": np.array([s for s, _ in rows], dtype=np.float64),
            }
        )

    return run


class _TermCursor:
    """Cursor over one term's blocks within a slice (doc-u-sorted)."""

    __slots__ = ("idf", "ub", "blocks", "avgdl", "bi", "pos", "docs_u", "tfs", "dls")

    def __init__(self, idf: float, ub: float, blocks: list, avgdl: float):
        self.idf = idf
        self.ub = ub
        self.blocks = blocks
        self.avgdl = avgdl
        self.bi = -1
        self.docs_u: np.ndarray | None = None
        self._next_block()

    def _next_block(self) -> None:
        self.bi += 1
        if self.bi >= len(self.blocks):
            self.docs_u = None
            return
        raw_ids, raw_tfs, raw_dls, _bm = self.blocks[self.bi]
        self.docs_u = decode_doc_ids(raw_ids)
        self.tfs = decode_tfs(raw_tfs).astype(np.float64)
        self.dls = vbyte_decode(raw_dls).astype(np.float64)
        self.pos = 0

    @property
    def doc(self) -> int | None:
        """Current doc id in UNSIGNED space (int), or None if exhausted."""
        if self.docs_u is None:
            return None
        return int(self.docs_u[self.pos])

    def block_max_score(self) -> float:
        return self.idf * float(self.blocks[self.bi][3])

    def score_current(self) -> float:
        tf = self.tfs[self.pos]
        dl = self.dls[self.pos]
        return self.idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs_u):
            self._next_block()

    def seek(self, target_u: int) -> None:
        """Advance to the first doc ≥ target (block-skipping)."""
        while self.docs_u is not None:
            if int(self.docs_u[-1]) >= target_u:
                self.pos = max(self.pos, int(np.searchsorted(self.docs_u, np.uint64(target_u))))
                return
            self._next_block()
