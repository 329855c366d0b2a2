"""Document deletion (tombstone) tests — the Iceberg delete-file analog.

Exactness contract: after delete_docs, every query mode must return results
rank-identical AND score-identical (1e-9) to an index built from scratch
WITHOUT the deleted docs — i.e. the tombstone mask, the negative-df lexicon
delta, and the decremented n_docs/avgdl together reproduce exact BM25 over
the surviving corpus. Lifecycle: idempotent re-delete, physical reclaim at
compaction, survival of the delete set across later appends and compactions,
terminal-delete semantics for re-sent urls.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from statschat_ke_spark.corpus import DOCUMENTS_SPARK_SCHEMA, generate_documents
from statschat_ke_spark.index.build import (
    DELETE_SEG_BASE,
    build_index,
    delete_docs,
    merge_index,
    update_index,
)
from statschat_ke_spark.index.query import topk, topk_batch

P = 4
QUERIES = [
    "county report statistics survey",
    "what was inflation in december 2023",
    "maize production",
]


def _docs(spark, pdf):
    return spark.createDataFrame(pdf, schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_documents(400, seed=5)


@pytest.fixture(scope="module")
def deleted_pair(spark, corpus, tmp_path_factory):
    """(index with 60 docs tombstone-deleted, fresh index built without them,
    victim urls)."""
    docs = _docs(spark, corpus)
    d1 = str(tmp_path_factory.mktemp("del") / "idx")
    d2 = str(tmp_path_factory.mktemp("ref") / "idx")
    build_index(spark, docs, d1, num_partitions=P)
    victims = sorted(
        r.url
        for r in spark.read.parquet(os.path.join(d1, "docs")).select("url").collect()
    )[:60]
    res = delete_docs(spark, d1, victims)
    assert res.n_deleted == 60
    build_index(spark, docs.filter(~docs.url.isin(victims)), d2, num_partitions=P)
    return d1, d2, victims


def _assert_same_topk(spark, d1, d2, mode):
    for q in QUERIES:
        a = topk(spark, d1, q, 10, mode=mode).toPandas()
        b = topk(spark, d2, q, 10, mode=mode).toPandas()
        assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all(), (mode, q)
        assert np.allclose(a.score.to_numpy(), b.score.to_numpy(), atol=1e-9), (mode, q)


def test_delete_equals_fresh_build_both_modes(spark, deleted_pair):
    d1, d2, _ = deleted_pair
    _assert_same_topk(spark, d1, d2, "wand")
    _assert_same_topk(spark, d1, d2, "exhaustive")


def test_delete_equals_fresh_build_batch(spark, deleted_pair):
    d1, d2, _ = deleted_pair
    qs = dict(enumerate(QUERIES))
    a = topk_batch(spark, d1, qs, 10, n_qb=2).toPandas()
    b = topk_batch(spark, d2, qs, 10, n_qb=2).toPandas()
    assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
    assert (a[["query_id", "rank"]].to_numpy() == b[["query_id", "rank"]].to_numpy()).all()
    assert np.allclose(a.score.to_numpy(), b.score.to_numpy(), atol=1e-9)


def test_deleted_docs_never_returned(spark, deleted_pair, corpus):
    """Even a query tailor-made for a deleted doc must not return it."""
    d1, _, victims = deleted_pair
    dead_ids = {
        int(r.doc_id)
        for r in spark.read.parquet(os.path.join(d1, "staged"))
        .filter("url in ({})".format(",".join(f"'{u}'" for u in victims)))
        .select("doc_id")
        .collect()
    }
    # big k over several queries: no tombstoned id may surface
    for q in QUERIES:
        got = {int(r.doc_id) for r in topk(spark, d1, q, 200).collect()}
        assert not (got & dead_ids)


def test_redelete_and_unknown_urls_are_noops(spark, deleted_pair):
    d1, _, victims = deleted_pair
    before = topk(spark, d1, QUERIES[0], 10).toPandas()
    r1 = delete_docs(spark, d1, victims[:10])  # already tombstoned
    r2 = delete_docs(spark, d1, ["no-such-url-1", "no-such-url-2"])
    assert r1.n_deleted == 0 and r1.tombstone_file is None
    assert r2.n_deleted == 0 and r2.tombstone_file is None
    after = topk(spark, d1, QUERIES[0], 10).toPandas()
    assert after.equals(before)


def test_compaction_reclaims_and_stays_identical(spark, corpus, tmp_path_factory):
    docs = _docs(spark, corpus)
    d1 = str(tmp_path_factory.mktemp("cmp") / "idx")
    d2 = str(tmp_path_factory.mktemp("cmpref") / "idx")
    build_index(spark, docs, d1, num_partitions=P)
    victims = sorted(
        r.url
        for r in spark.read.parquet(os.path.join(d1, "docs")).select("url").collect()
    )[::5]  # every 5th doc
    delete_docs(spark, d1, victims)
    build_index(spark, docs.filter(~docs.url.isin(victims)), d2, num_partitions=P)

    rows_before = spark.read.parquet(os.path.join(d1, "postings")).count()
    merge_index(spark, d1, num_partitions=P)
    rows_after = spark.read.parquet(os.path.join(d1, "postings")).count()
    assert rows_after < rows_before  # physical reclaim
    _assert_same_topk(spark, d1, d2, "wand")
    # tombstone files survive the compaction (staged still holds the rows,
    # so a future rebuild must keep filtering)
    import json

    with open(os.path.join(d1, "_SUCCESS.json")) as f:
        assert json.load(f)["tombstone_files"]
    # ... and a SECOND compaction still excludes the deleted docs
    merge_index(spark, d1, num_partitions=P)
    _assert_same_topk(spark, d1, d2, "wand")


def test_delete_then_segment_append(spark, corpus, tmp_path_factory):
    """Delete followed by an incremental segment append: the negative-df
    lexicon delta must survive in the marker's segment list (reserved
    DELETE_SEG_BASE ids can't be overwritten by chunk-numbered segments),
    and results must equal a fresh build of (base - deleted + delta)."""
    import json

    docs = _docs(spark, corpus)
    pdf2 = generate_documents(80, seed=99)
    extra = _docs(spark, pdf2)
    d1 = str(tmp_path_factory.mktemp("da") / "idx")
    d2 = str(tmp_path_factory.mktemp("daref") / "idx")
    build_index(spark, docs, d1, num_partitions=P)
    victims = sorted(
        r.url
        for r in spark.read.parquet(os.path.join(d1, "docs")).select("url").collect()
    )[:40]
    delete_docs(spark, d1, victims)
    update_index(spark, extra, d1, num_partitions=P, strategy="segment")

    with open(os.path.join(d1, "_SUCCESS.json")) as f:
        marker = json.load(f)
    assert any(int(s) >= DELETE_SEG_BASE for s in marker["segments"]), (
        "lexicon-delta segment dropped from the committed segment list"
    )

    ref = docs.filter(~docs.url.isin(victims)).unionByName(extra)
    build_index(spark, ref, d2, num_partitions=P)
    _assert_same_topk(spark, d1, d2, "wand")
    _assert_same_topk(spark, d1, d2, "exhaustive")

    # terminal-delete semantics: re-sending a deleted url is a no-op
    resend = docs.filter(docs.url.isin(victims[:5]))
    update_index(spark, resend, d1, num_partitions=P, strategy="segment")
    _assert_same_topk(spark, d1, d2, "wand")


def test_delete_everything(spark, tmp_path_factory):
    pdf = generate_documents(60, seed=3)
    docs = _docs(spark, pdf)
    d = str(tmp_path_factory.mktemp("all") / "idx")
    build_index(spark, docs, d, num_partitions=P)
    urls = [r.url for r in spark.read.parquet(os.path.join(d, "docs")).collect()]
    res = delete_docs(spark, d, urls)
    assert res.n_docs == 0 and res.avgdl == 0.0
    for mode in ("wand", "exhaustive"):
        assert topk(spark, d, QUERIES[0], 10, mode=mode).count() == 0
