"""Checkpoint-resume + incremental UPDATE tests (north_rule; SURVEY §5.2-4/5).

- chunked build == single-shot build (identical lexicon + postings bytes)
- interrupted build (stop_after_chunks) resumes from lineage without
  recomputing completed chunks, final index identical
- update_index(A, then B) == build_index(A ∪ B); re-sending a delta is a
  no-op (J2 anti-join semantics of pdf_downloader.py:133-152)
"""

from __future__ import annotations

import os

import pytest

from statschat_ke_spark.corpus import DOCUMENTS_SPARK_SCHEMA, generate_documents
from statschat_ke_spark.index.build import build_index, staged_chunks, update_index
from statschat_ke_spark.index.query import topk

P = 4  # fixed partitioning so posting bytes are comparable across builds


@pytest.fixture(scope="module")
def docs500(spark):
    pdf = generate_documents(500)
    return spark.createDataFrame(pdf, schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )


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
def single_shot(spark, docs500, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ss") / "idx")
    res = build_index(spark, docs500, d, num_partitions=P)
    return d, res


def test_chunked_equals_single_shot(spark, docs500, single_shot, tmp_path_factory):
    d_ss, res_ss = single_shot
    d = str(tmp_path_factory.mktemp("ch") / "idx")
    res = build_index(spark, docs500, d, num_partitions=P, n_chunks=4)
    assert res.complete and res.chunks_processed == 4
    assert res.n_docs == res_ss.n_docs
    assert _lexicon(spark, d) == _lexicon(spark, d_ss)
    assert _postings(spark, d) == _postings(spark, d_ss)


def test_stop_and_resume(spark, docs500, single_shot, tmp_path_factory):
    d_ss, _ = single_shot
    d = str(tmp_path_factory.mktemp("rs") / "idx")
    partial = build_index(
        spark, docs500, d, num_partitions=P, n_chunks=4, stop_after_chunks=2
    )
    assert not partial.complete
    assert partial.chunks_processed == 2
    assert staged_chunks(spark, d) == {0, 1}
    assert not os.path.exists(os.path.join(d, "_SUCCESS.json"))

    resumed = build_index(
        spark, docs500, d, num_partitions=P, n_chunks=4, resume=True
    )
    assert resumed.complete
    assert resumed.chunks_skipped == 2  # lineage prevented recomputation
    assert resumed.chunks_processed == 2
    assert _lexicon(spark, d) == _lexicon(spark, d_ss)
    assert _postings(spark, d) == _postings(spark, d_ss)


def test_update_equals_full_rebuild(spark, docs500, single_shot, tmp_path_factory):
    d_ss, _ = single_shot
    pdf = generate_documents(500)
    base = spark.createDataFrame(pdf.iloc[:300], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    # overlapping delta: rows 200..500 (100 already indexed)
    delta = spark.createDataFrame(pdf.iloc[200:], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    d = str(tmp_path_factory.mktemp("up") / "idx")
    build_index(spark, base, d, num_partitions=P)
    res = update_index(spark, delta, d, num_partitions=P, strategy="compact")
    assert res.complete
    assert res.n_docs == spark.read.parquet(os.path.join(d_ss, "docs")).count()
    assert _lexicon(spark, d) == _lexicon(spark, d_ss)
    assert _postings(spark, d) == _postings(spark, d_ss)

    # queries over the updated index match the single-shot index exactly
    for q in ["what was inflation in december 2023", "maize production county report"]:
        a = topk(spark, d, q, 10).toPandas()
        b = topk(spark, d_ss, q, 10).toPandas()
        assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()

    # idempotency: re-sending the same delta stages 0 new docs
    res2 = update_index(spark, delta, d, num_partitions=P, strategy="compact")
    assert res2.n_docs == res.n_docs
    assert _lexicon(spark, d) == _lexicon(spark, d_ss)


def _seg_files(d, table, seg):
    p = os.path.join(d, table, f"seg={seg}")
    return {
        f: os.path.getmtime(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    }


def test_update_segment_strategy(spark, docs500, single_shot, tmp_path_factory):
    """segment strategy: delta-proportional phase B — existing segment files
    are untouched (same set, same mtimes), a new doc-disjoint segment is
    appended, and query results are IDENTICAL (ranks and scores) to the
    full single-shot rebuild because idf/avgdl are merged globals and the
    block bounds are avgdl-free."""
    import numpy as np

    d_ss, _ = single_shot
    pdf = generate_documents(500)
    base = spark.createDataFrame(pdf.iloc[:300], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    delta = spark.createDataFrame(pdf.iloc[200:], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    d = str(tmp_path_factory.mktemp("seg") / "idx")
    build_index(spark, base, d, num_partitions=P)
    before = _seg_files(d, "postings", 0)

    res = update_index(spark, delta, d, num_partitions=P, strategy="segment")
    assert res.complete
    assert res.n_docs == spark.read.parquet(os.path.join(d_ss, "docs")).count()
    # segment 0 untouched: same files, same mtimes (nothing rewritten)
    assert _seg_files(d, "postings", 0) == before
    # a new segment exists
    assert os.path.isdir(os.path.join(d, "postings", "seg=1"))

    # merged lexicon (sum over segments) equals the single-shot lexicon
    def agg_lex(path):
        rows = (
            spark.read.parquet(os.path.join(path, "lexicon"))
            .groupBy("term_id", "term")
            .agg({"df": "sum", "cf": "sum"})
            .withColumnRenamed("sum(df)", "df")
            .withColumnRenamed("sum(cf)", "cf")
            .collect()
        )
        return sorted((r.term_id, r.term, r.df, r.cf) for r in rows)

    assert agg_lex(d) == agg_lex(d_ss)

    # rank AND score identity vs the compacted single-shot index
    for q in ["what was inflation in december 2023", "maize production county report"]:
        a = topk(spark, d, q, 10).toPandas()
        b = topk(spark, d_ss, q, 10).toPandas()
        assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
        assert np.allclose(a.score.to_numpy(), b.score.to_numpy(), atol=1e-9)

    # idempotency: re-sending the delta appends nothing
    res2 = update_index(spark, delta, d, num_partitions=P, strategy="segment")
    assert res2.n_docs == res.n_docs
    assert not os.path.isdir(os.path.join(d, "postings", "seg=2"))


def test_file_listing_chunked_build(spark, docs500, single_shot, tmp_path_factory):
    """Path input + n_chunks: chunks are cut at the file listing (each pass
    reads only its slice — lineage records per-chunk file counts that sum to
    the total part-file count), and the result is identical to the
    DataFrame-input single-shot build."""
    d_ss, _ = single_shot
    src = str(tmp_path_factory.mktemp("src") / "docs_parquet")
    docs500.repartition(8).write.parquet(src)
    n_parts = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_parts >= 4

    d = str(tmp_path_factory.mktemp("fc") / "idx")
    res = build_index(spark, src, d, num_partitions=P, n_chunks=4)
    assert res.complete and res.chunks_processed == 4
    lineage = spark.read.parquet(os.path.join(d, "_lineage")).collect()
    per_chunk_files = {r.chunk: r.n_files for r in lineage}
    assert sum(per_chunk_files.values()) == n_parts  # one total input scan
    assert all(v > 0 for v in per_chunk_files.values())
    assert _lexicon(spark, d) == _lexicon(spark, d_ss)
    assert _postings(spark, d) == _postings(spark, d_ss)


def test_segment_lifecycle_auto_compaction(spark, docs500, single_shot, tmp_path_factory):
    """Lifecycle policy: successive segment appends trigger EXACTLY ONE
    auto-compaction when the segment count crosses max_segments, the index
    folds back to seg=0, and queries stay rank-identical to the single-shot
    build over the same corpus afterwards (including one further append on
    top of the compacted state)."""
    import numpy as np

    from statschat_ke_spark.index.build import _existing_segments

    d_ss, _ = single_shot
    pdf = generate_documents(500)

    def df_of(a, b):
        return spark.createDataFrame(
            pdf.iloc[a:b], schema=DOCUMENTS_SPARK_SCHEMA
        ).select("url", "warc_ts", "html", "text", "lang")

    d = str(tmp_path_factory.mktemp("lc") / "idx")
    build_index(spark, df_of(0, 200), d, num_partitions=P)
    assert _existing_segments(d) == [0]

    compactions = []
    # appends → segment counts 2, 3, 4(>3: compact to 1), 2
    for a, b in [(200, 280), (280, 360), (360, 430), (430, 500)]:
        res = update_index(
            spark, df_of(a, b), d, num_partitions=P,
            strategy="segment", max_segments=3,
        )
        assert res.complete
        compactions.append(bool(res.compacted))
    assert compactions == [False, False, True, False]
    # post-compaction state: seg=0 plus exactly the one post-compaction
    # append (segments are named by chunk id; the 5th slice staged chunk 4)
    assert _existing_segments(d) == [0, 4]

    # the compacted+appended index answers identically to the single-shot
    # build over the same 500 docs (ranks AND scores); n_docs matches the
    # single-shot docs table (lang filter drops the non-en rows in both)
    assert res.n_docs == spark.read.parquet(os.path.join(d_ss, "docs")).count()
    for q in ["what was inflation in december 2023", "maize production county report"]:
        a = topk(spark, d, q, 10).toPandas()
        b = topk(spark, d_ss, q, 10).toPandas()
        assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
        assert np.allclose(a.score.to_numpy(), b.score.to_numpy(), atol=1e-9)

    # max_segments=None disables the policy entirely
    d2 = str(tmp_path_factory.mktemp("lc2") / "idx")
    build_index(spark, df_of(0, 200), d2, num_partitions=P)
    for i, (a, b) in enumerate([(200, 280), (280, 360), (360, 430)]):
        res = update_index(
            spark, df_of(a, b), d2, num_partitions=P,
            strategy="segment", max_segments=None,
        )
        assert not res.compacted
    assert _existing_segments(d2) == [0, 1, 2, 3]


def test_update_segment_chunk_accounting(spark, tmp_path_factory):
    """chunks_processed counts append_segment calls that actually packed a
    segment; chunks_skipped counts previously-staged chunks NOT repacked —
    disjoint, no double-counting (ADVICE r3)."""
    pdf = generate_documents(300)
    base = spark.createDataFrame(pdf.iloc[:150], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    delta = spark.createDataFrame(pdf.iloc[150:], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    d = str(tmp_path_factory.mktemp("acct") / "idx")
    build_index(spark, base, d, num_partitions=P)

    # normal delta append: exactly one chunk processed, the base chunk(s)
    # skipped, never both counted for the same chunk
    res = update_index(spark, delta, d, num_partitions=P, strategy="segment")
    assert res.chunks_processed == 1
    done_total = len(staged_chunks(spark, d))
    assert res.chunks_processed + res.chunks_skipped == done_total

    # pure replay (same delta again): the empty replay chunk is packed via
    # the fallback path and MUST count as processed=1, not 0
    res2 = update_index(spark, delta, d, num_partitions=P, strategy="segment")
    assert res2.chunks_processed == 1
    assert res2.chunks_skipped == done_total  # all prior chunks skipped


def test_query_rejects_uncommitted_and_foreign_format(spark, single_shot, tmp_path_factory):
    """check_index_format: querying an uncommitted or format-mismatched index
    fails loudly with an actionable message instead of decoding garbage."""
    import json
    import shutil

    from statschat_ke_spark.index.query import topk_batch

    d, _ = single_shot
    d2 = str(tmp_path_factory.mktemp("fmt") / "idx")
    shutil.copytree(d, d2)

    marker = os.path.join(d2, "_SUCCESS.json")
    with open(marker) as f:
        m = json.load(f)

    # absent marker = never committed
    os.remove(marker)
    with pytest.raises(RuntimeError, match="no _SUCCESS.json"):
        topk(spark, d2, "anything", 5)
    with pytest.raises(RuntimeError, match="no _SUCCESS.json"):
        topk_batch(spark, d2, {0: "anything"}, 5)

    # foreign format version
    with open(marker, "w") as f:
        json.dump({**m, "format": 1}, f)
    with pytest.raises(RuntimeError, match="format 1"):
        topk(spark, d2, "anything", 5)

    # the committed index still queries fine
    topk(spark, d, "anything", 5)


def test_reader_ignores_uncommitted_segment(spark, single_shot, tmp_path_factory):
    """Snapshot isolation for readers: a fully-written seg=N whose commit
    (_SUCCESS segments list) hasn't landed — the mid-append window a query
    racing ingest_stream sees — must be invisible to topk/probe. Without the
    marker-pruned scans, the directory listing would pick it up and score
    every doc twice under doubled df."""
    import shutil

    from statschat_ke_spark.index.query import _PROBE_CACHE, topk

    d, _ = single_shot
    d2 = str(tmp_path_factory.mktemp("snap") / "idx")
    shutil.copytree(d, d2)

    q = "report statistics county"
    before = topk(spark, d2, q, 10).toPandas()
    assert len(before) > 0

    # simulate the mid-append window: duplicate seg=0 as an uncommitted seg=99
    for sub in ("postings", "lexicon", "docs"):
        shutil.copytree(os.path.join(d2, sub, "seg=0"), os.path.join(d2, sub, "seg=99"))
    _PROBE_CACHE.clear()  # same commit uuid — force a re-probe of the lexicon

    after = topk(spark, d2, q, 10).toPandas()
    assert after.equals(before), "uncommitted segment leaked into query results"


def test_writer_lock_conflict_and_stale_recovery(spark, docs500, tmp_path_factory):
    """Phase-B commits are single-writer: a live foreign lock raises
    WriterConflict; a dead owner's lock is broken and the build proceeds."""
    from statschat_ke_spark.index.build import WriterConflict

    d = str(tmp_path_factory.mktemp("lock") / "idx")
    os.makedirs(d, exist_ok=True)

    # live foreign writer (pid 1 is always alive and never ours)
    with open(os.path.join(d, "_WRITER_LOCK"), "w") as f:
        f.write("1")
    with pytest.raises(WriterConflict, match="live writer"):
        build_index(spark, docs500, d, num_partitions=P)

    # dead owner: stale lock is broken, build succeeds, lock released
    with open(os.path.join(d, "_WRITER_LOCK"), "w") as f:
        f.write("999999999")
    res = build_index(spark, docs500, d, num_partitions=P)
    assert res.n_docs > 0
    assert not os.path.exists(os.path.join(d, "_WRITER_LOCK"))
    topk(spark, d, "report", 5)


def test_append_window_keeps_serving_old_snapshot(
    spark, docs500, single_shot, tmp_path_factory
):
    """The whole phase-A window of a segment append — staging the delta
    chunk — must leave the committed snapshot queryable: readers prune to
    the marker's segment list, so the in-flight chunk is invisible and
    topk keeps serving the OLD results (the Iceberg reader story; a marker
    invalidation here was a serving-outage regression)."""
    import shutil

    from statschat_ke_spark.index.build import _prepare_base, _stage_chunk
    from statschat_ke_spark.index.query import _PROBE_CACHE

    d, _ = single_shot
    d2 = str(tmp_path_factory.mktemp("window") / "idx")
    shutil.copytree(d, d2)
    _PROBE_CACHE.clear()

    q = "report statistics county"
    before = topk(spark, d2, q, 10).toPandas()
    assert len(before) > 0
    marker_path = os.path.join(d2, "_SUCCESS.json")

    # simulate update_index's phase A racing a reader: stage a delta chunk
    pdf = generate_documents(80, seed=77)
    delta = spark.createDataFrame(pdf, schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    done = staged_chunks(spark, d2)
    _stage_chunk(spark, _prepare_base(delta, "en"), d2, max(done) + 1 if done else 0)

    assert os.path.exists(marker_path), "staging must not invalidate the commit"
    mid = topk(spark, d2, q, 10).toPandas()
    assert mid.equals(before), "reader mid-append must see the old snapshot"


def test_update_index_serves_throughout_segment_append(
    spark, docs500, tmp_path_factory
):
    """End-to-end: after update_index(strategy='segment') the marker exists
    and was NEVER removed along the way (monitored via a marker-deleting
    tripwire is impossible without threads, so assert the post-state and
    that the old version string changed only by commit)."""
    import json

    d = str(tmp_path_factory.mktemp("serve") / "idx")
    pdf = generate_documents(300)
    base = spark.createDataFrame(pdf.iloc[:200], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    delta = spark.createDataFrame(pdf.iloc[200:], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    res0 = build_index(spark, base, d, num_partitions=P)
    res = update_index(spark, delta, d, num_partitions=P, strategy="segment")
    assert res.n_docs > res0.n_docs  # delta landed (lang filter may drop some)
    with open(os.path.join(d, "_SUCCESS.json")) as f:
        marker = json.load(f)
    # the commit marker embeds the scoring globals of ITS snapshot
    assert marker["stats"]["n_docs"] == res.n_docs
    assert marker["stats"]["avgdl"] == pytest.approx(res.avgdl)
    topk(spark, d, "report", 5)


def test_writer_lock_second_thread_conflicts(spark, tmp_path_factory):
    """An in-process second writer THREAD is a WriterConflict, not a silent
    reentry — the pid-file can't arbitrate threads, the _held map must."""
    import threading

    from statschat_ke_spark.index.build import WriterConflict, _writer_lock

    d = str(tmp_path_factory.mktemp("tlock") / "idx")
    os.makedirs(d, exist_ok=True)
    entered = threading.Event()
    release = threading.Event()
    errs: list[BaseException] = []

    def hold():
        try:
            with _writer_lock(d):
                entered.set()
                release.wait(10)
        except BaseException as e:  # pragma: no cover - diagnostic
            errs.append(e)
            entered.set()

    t = threading.Thread(target=hold)
    t.start()
    assert entered.wait(10) and not errs
    try:
        with pytest.raises(WriterConflict, match="this process"):
            with _writer_lock(d):
                pass
    finally:
        release.set()
        t.join(10)
    # released: reacquire works and is reentrant within one thread
    with _writer_lock(d):
        with _writer_lock(d):
            pass
    assert not os.path.exists(os.path.join(d, "_WRITER_LOCK"))


def test_writer_lock_never_observably_empty(tmp_path_factory):
    """The lock file is published with its pid content atomically (tmp +
    os.link): at no point can a contender read an empty lock file — the
    empty-read → pid=0 → 'stale' → break-a-live-writer race is structurally
    gone. Verified by acquiring and checking content immediately, plus the
    retake-race path raising WriterConflict instead of corrupting."""
    from statschat_ke_spark.index.build import WriterConflict, _writer_lock

    d = str(tmp_path_factory.mktemp("alock") / "idx")
    os.makedirs(d, exist_ok=True)
    lk = _writer_lock(d)
    lk.__enter__()
    try:
        with open(os.path.join(d, "_WRITER_LOCK")) as f:
            assert f.read().strip() == str(os.getpid())
    finally:
        lk.__exit__(None, None, None)

    # losing the stale-break retake race → WriterConflict (not a bare
    # FileExistsError and not a second acquisition)
    with open(os.path.join(d, "_WRITER_LOCK"), "w") as f:
        f.write("999999999")  # dead pid → break path
    orig = _writer_lock._try_link
    calls = {"n": 0}

    def lose_retake(self):
        calls["n"] += 1
        if calls["n"] == 1:
            return False  # initial acquire: lock held (by the dead pid)
        # retake after the stale break: another writer wins the race
        with open(self.path, "w") as f:
            f.write("1")
        return False

    _writer_lock._try_link = lose_retake
    try:
        with pytest.raises(WriterConflict, match="retake race"):
            with _writer_lock(d):
                pass
    finally:
        _writer_lock._try_link = orig
        os.remove(os.path.join(d, "_WRITER_LOCK"))
    # the failed acquire must not leave an in-process reservation behind
    with _writer_lock(d):
        pass


def test_concurrent_reader_during_segment_update(spark, tmp_path_factory):
    """End-to-end snapshot isolation: queries hammered from one thread while
    update_index(strategy='segment') runs in another must (a) never error
    and (b) always return a result equal to either the pre-update or the
    post-update snapshot — never a mix. This is the ingest+serve topology
    the engine documents as supported."""
    import threading

    from statschat_ke_spark.index.query import _PROBE_CACHE

    d = str(tmp_path_factory.mktemp("rw") / "idx")
    pdf = generate_documents(400, seed=11)
    base = spark.createDataFrame(pdf.iloc[:250], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    delta = spark.createDataFrame(pdf.iloc[250:], schema=DOCUMENTS_SPARK_SCHEMA).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    build_index(spark, base, d, num_partitions=P)
    q = "county report statistics survey"

    def snap(df):
        return tuple(sorted((int(r.doc_id), round(float(r.score), 9)) for r in df.collect()))

    before = snap(topk(spark, d, q, 10))
    errors: list[BaseException] = []
    observed: list[tuple] = []
    done = threading.Event()

    def reader():
        try:
            while not done.is_set():
                _PROBE_CACHE.clear()  # defeat the probe cache: re-read every time
                observed.append(snap(topk(spark, d, q, 10)))
        except BaseException as e:
            errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        update_index(spark, delta, d, num_partitions=P, strategy="segment")
    finally:
        done.set()
        t.join(60)
    after = snap(topk(spark, d, q, 10))
    assert not errors, f"reader failed mid-update: {errors[0]!r}"
    assert observed, "reader thread never completed a query"
    bad = [o for o in observed if o not in (before, after)]
    assert not bad, f"reader saw a torn snapshot: {bad[0]}"
    assert after != before  # the delta actually changed the result set
