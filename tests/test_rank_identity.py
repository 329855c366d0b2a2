"""Rank-identity golden suite (north_rule): Spark engine == numpy oracle.

Mirrors the reference's golden-question evaluation
(/root/reference/statschat/model_evaluation/evaluation.py:250-326) with
exact assertions: identical doc_id sequences, scores to 1e-9, both for the
exhaustive scorer and for block-max WAND.
"""

from __future__ import annotations

import numpy as np
import pytest

from statschat_ke_spark.index.oracle import OracleIndex
from statschat_ke_spark.index.query import topk


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    return OracleIndex(corpus_pdf)


@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_rank_identity_all_queries(spark, index_dir, oracle, queries, mode):
    for q in queries.itertuples(index=False):
        golden = oracle.topk(q.query_text, int(q.k))
        got = topk(spark, index_dir, q.query_text, int(q.k), mode=mode).toPandas()
        assert len(got) == len(golden), (q.query_id, mode)
        assert (got.doc_id.to_numpy() == golden.doc_id.to_numpy()).all(), (
            q.query_id,
            mode,
        )
        assert np.allclose(got.score.to_numpy(), golden.score.to_numpy(), atol=1e-9)


def test_negative_query_empty(spark, index_dir):
    got = topk(spark, index_dir, "xqzvk nonexistenttermxyz", 10).toPandas()
    assert len(got) == 0


def test_with_url(spark, index_dir, oracle):
    got = topk(
        spark, index_dir, "what was inflation in december 2023", 5, with_url=True
    ).toPandas()
    assert set(got.columns) == {"doc_id", "score", "url"}
    assert len(got) == 5
    assert got.url.notna().all()


def test_topk_batch_matches_per_query(spark, index_dir, queries):
    """topk_batch (one job, union pushdown, per-slice multi-query WAND) is
    row-identical to per-query topk for the whole golden set."""
    from statschat_ke_spark.index.query import topk_batch

    qmap = {int(q.query_id): q.query_text for q in queries.itertuples(index=False)}
    k = 10
    batch = topk_batch(spark, index_dir, qmap, k=k).toPandas()
    for qid, qtext in qmap.items():
        single = topk(spark, index_dir, qtext, k).toPandas()
        got = batch[batch.query_id == qid].sort_values("rank")
        assert list(got.doc_id) == list(single.doc_id), qid
        assert np.allclose(got.score.to_numpy(), single.score.to_numpy(), atol=1e-9)
        if len(got):
            assert list(got["rank"]) == list(range(1, len(got) + 1))
