"""Structured-Streaming ingest tests (SURVEY §2.8 mapping): AvailableNow
drain of a parquet landing zone == batch build over the same docs; a second
drop is picked up incrementally via the stream checkpoint."""

from __future__ import annotations

import os

import pytest

from statschat_ke_spark.corpus import DOCUMENTS_SPARK_SCHEMA, generate_documents
from statschat_ke_spark.index.build import build_index
from statschat_ke_spark.streaming.ingest import ingest_stream

P = 4


def _lexicon(spark, d):
    rows = (
        spark.read.parquet(os.path.join(d, "lexicon"))
        .select("term_id", "term", "df", "cf")
        .collect()
    )
    return sorted((r.term_id, r.term, r.df, r.cf) for r in rows)


def _postings(spark, d):
    rows = (
        spark.read.parquet(os.path.join(d, "postings"))
        .select("term_id", "slice", "block_id", "n", "first_doc", "last_doc",
                "doc_ids", "tfs", "dls")
        .collect()
    )
    return sorted(
        (r.term_id, r.slice, r.block_id, r.n, r.first_doc, r.last_doc,
         bytes(r.doc_ids), bytes(r.tfs), bytes(r.dls))
        for r in rows
    )


@pytest.fixture(scope="module")
def parts(spark):
    pdf = generate_documents(400)
    df = spark.createDataFrame(pdf, schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    a = df.filter("warc_ts < timestamp'2023-01-01 07:00:00'")
    b = df.filter("warc_ts >= timestamp'2023-01-01 07:00:00'")
    assert a.count() > 0 and b.count() > 0
    return df, a, b


def test_stream_ingest_incremental(spark, parts, tmp_path):
    full, a, b = parts
    landing = str(tmp_path / "landing")
    idx_stream = str(tmp_path / "idx_stream")
    idx_batch_a = str(tmp_path / "idx_a")
    idx_batch_full = str(tmp_path / "idx_full")

    # drop 1 → drain → index == batch build over drop 1
    a.write.mode("append").parquet(landing)
    res1 = ingest_stream(spark, landing, idx_stream, num_partitions=P)
    build_index(spark, a, idx_batch_a, num_partitions=P)
    assert res1.n_docs == a.filter("lang = 'en'").count()
    assert _lexicon(spark, idx_stream) == _lexicon(spark, idx_batch_a)
    assert _postings(spark, idx_stream) == _postings(spark, idx_batch_a)

    # drop 2, compact strategy → drain picks up ONLY the new files and the
    # full re-merge is byte-identical to a batch build over everything
    b.write.mode("append").parquet(landing)
    res2 = ingest_stream(
        spark, landing, idx_stream, num_partitions=P, strategy="compact"
    )
    build_index(spark, full, idx_batch_full, num_partitions=P)
    assert res2.n_docs == full.filter("lang = 'en'").count()
    assert _lexicon(spark, idx_stream) == _lexicon(spark, idx_batch_full)
    assert _postings(spark, idx_stream) == _postings(spark, idx_batch_full)


def test_stream_segment_append(spark, parts, tmp_path):
    """Default drain strategy appends each drained chunk as its own index
    segment (delta-proportional): query results match the full batch build
    exactly, and the first drain's segment files are never rewritten."""
    import numpy as np

    from statschat_ke_spark.index.query import topk

    full, a, b = parts
    landing = str(tmp_path / "landing_seg")
    idx = str(tmp_path / "idx_seg")
    idx_full = str(tmp_path / "idx_seg_full")

    a.write.mode("append").parquet(landing)
    ingest_stream(spark, landing, idx, num_partitions=P)
    seg0 = os.path.join(idx, "postings", "seg=0")
    before = {f: os.path.getmtime(os.path.join(seg0, f)) for f in os.listdir(seg0)}

    b.write.mode("append").parquet(landing)
    res = ingest_stream(spark, landing, idx, num_partitions=P)
    assert res.n_docs == full.filter("lang = 'en'").count()
    assert {f: os.path.getmtime(os.path.join(seg0, f)) for f in os.listdir(seg0)} == before
    segs = [d for d in os.listdir(os.path.join(idx, "postings")) if d.startswith("seg=")]
    assert len(segs) == 2

    build_index(spark, full, idx_full, num_partitions=P)
    for q in ["inflation county report", "maize production county report"]:
        x = topk(spark, idx, q, 10).toPandas()
        y = topk(spark, idx_full, q, 10).toPandas()
        assert (x.doc_id.to_numpy() == y.doc_id.to_numpy()).all()
        assert np.allclose(x.score.to_numpy(), y.score.to_numpy(), atol=1e-9)

    # replayed drain with nothing new: unchanged
    res2 = ingest_stream(spark, landing, idx, num_partitions=P)
    assert res2.n_docs == res.n_docs and res2.chunks_processed == 0


def test_stream_rerun_noop(spark, parts, tmp_path):
    _, a, _ = parts
    landing = str(tmp_path / "landing2")
    idx = str(tmp_path / "idx2")
    a.write.mode("append").parquet(landing)
    r1 = ingest_stream(spark, landing, idx, num_partitions=P)
    lex1 = _lexicon(spark, idx)
    # no new files: drain is a no-op merge over identical staged chunks
    r2 = ingest_stream(spark, landing, idx, num_partitions=P)
    assert r2.n_docs == r1.n_docs
    assert _lexicon(spark, idx) == lex1


def test_stream_drain_auto_compaction(spark, parts, tmp_path):
    """A drain that pushes the segment count past max_segments triggers the
    lifecycle compaction: the index folds back to a single seg=0 and still
    answers identically to a batch build over the same corpus."""
    import numpy as np

    from statschat_ke_spark.index.build import _existing_segments
    from statschat_ke_spark.index.query import topk

    full, a, b = parts
    landing = str(tmp_path / "landing_lc")
    idx = str(tmp_path / "idx_lc")
    idx_full = str(tmp_path / "idx_lc_full")

    a.write.mode("append").parquet(landing)
    ingest_stream(spark, landing, idx, num_partitions=P)
    assert _existing_segments(idx) == [0]

    # second drain appends ≥1 segment → count ≥ 2 > max_segments=1 → compact
    b.write.mode("append").parquet(landing)
    res = ingest_stream(spark, landing, idx, num_partitions=P, max_segments=1)
    assert res.compacted
    assert _existing_segments(idx) == [0]
    assert res.n_docs == full.filter("lang = 'en'").count()

    build_index(spark, full, idx_full, num_partitions=P)
    for q in ["inflation county report", "maize production county report"]:
        x = topk(spark, idx, q, 10).toPandas()
        y = topk(spark, idx_full, q, 10).toPandas()
        assert (x.doc_id.to_numpy() == y.doc_id.to_numpy()).all()
        assert np.allclose(x.score.to_numpy(), y.score.to_numpy(), atol=1e-9)
