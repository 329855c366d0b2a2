"""Distributed inverted-index build — sort-based, term-range-merged, resumable.

Replaces the reference's vector-store construction
(/root/reference/statschat/preprocess.py:90-288: json split → load → chunk →
embed → FAISS.from_documents → merge) with the Spark-first design of
SURVEY.md §2.9/§7:

Phase A (stage per input chunk, checkpoint-resumable):
    documents --filter lang--> extract text (pandas UDF, byte-identical
    contract) --tokenize+tf (single Arrow UDF pass)--> staged table
    (doc_id, url, doclen, tfs), one parquet subdir per chunk, a lineage row
    appended after each chunk commits. Resume = anti-join chunks against the
    lineage table (the Spark analog of the reference's UPDATE anti-joins,
    pdf_downloader.py:133-152).

Phase B (global merge) — ONE heavy pass over the (doc, term) pairs:
    staged --explode--> pairs
          --repartition(P, term_id, slice)  [bucketed term shuffle]-->
          --sortWithinPartitions(term_id, slice, doc_sort_key)-->
          --mapInPandas pack--> postings blocks (delta-gap + vbyte, ≤128
            docs, per-block max impact, per-block term/tf_sum/bytes)
    postings --groupBy(term_id) [2-3 orders smaller]--> lexicon
    postings --column-pruned agg--> per-partition metrics.

Partitioning note: the term shuffle is a STATIC bucket partition
(hash of (term_id, slice)) rather than ``repartitionByRange`` — Spark's range
partitioner samples its child, which would execute the full explode twice per
build. term_id is already a uniform hash of the term, so hash buckets are
balance-equivalent to ranges; within each partition rows are sorted by
(term_id, slice, doc), giving parquet row-group min/max stats that prune
query-time term lookups just like a range layout. This is the Iceberg
``bucket(term_id)`` layout. The skew story is unchanged (slices, below).

Skew handling: every posting row is keyed by (term_id, slice) where
slice = top SLICE_BITS bits of the unsigned doc_id. A hot term ("the" at web
scale) therefore fans out over up to 2^SLICE_BITS ranges that the range
partitioner can place on different reducers — doc-range salting whose
sub-lists are *disjoint and ordered*, so merged posting lists stay globally
doc_id-sorted and block-max WAND can operate per slice (every doc's postings
for all terms share a slice, making per-slice top-k exact).

Impact upper bounds are stored idf-free (max of the tf/doclen factor);
idf multiplies in at query time, so posting blocks never need rebuilding
when N/df drift — only the lexicon does.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from statschat_ke_spark.functions.extract import extract_text_udf
from statschat_ke_spark.index.codec import BLOCK, vbyte_encode_chunks

K1 = 1.2
B = 0.75
# FLOOR for the per-segment doc-range slice count (2^SLICE_BITS slices).
# The actual slice_bits of a segment is derived from its own doc count at
# build time (derive_slice_bits below) so a web-scale build never ships the
# sandbox default: slices bound a hot term's per-slice sub-list — the unit
# one pack reducer sorts and one WAND task scans — so the count must grow
# with the corpus. Queries treat `slice` as opaque data (grouped by pmod),
# so segments with different slice_bits coexist exactly; the value used is
# recorded in stats.json per build.
SLICE_BITS = 6
# Target upper bound on docs per slice: a term occurring in EVERY doc still
# packs/scans at most this many postings per (term_id, slice) shuffle key.
# Refit from BENCH_SKEW.json (9.0M docs / 1.1B postings, same corpus + P_pack,
# only slice_bits varied): the old 2^20 target derived 6 bits there, the worst
# measured level (skew 1.468, build 1116 s); 8 bits was the sweep's optimum
# (skew 1.321, build 829 s, fastest query) and 10 bits cut skew to 1.122 with
# no further build gain. 2^16 derives exactly 8 bits at 9M docs, keeps every
# corpus <= 4.2M docs at the floor of 6 (all prior rank-identity/cluster
# evidence unchanged), and yields 24 bits / 16.7M slices at 10^12 docs
# (hottest term <= ~60k postings per slice). Result shas were byte-identical
# across all three levels, so the knob is pure layout, never semantics.
DOCS_PER_SLICE_TARGET = 1 << 16


def derive_slice_bits(n_docs: int, *, target: int = DOCS_PER_SLICE_TARGET) -> int:
    """ceil(log2(n_docs / target)), floored at SLICE_BITS, capped at 24
    (`slice` is int32). At the 10^12-doc design point this yields 24 bits /
    ~16.7M slices: the hottest possible term fans out over ~16.7M reducers at
    <= ~60k postings (~470 blocks) each, where the old compile-time 6 left
    ~10^10-posting sub-lists. The target itself is fit to measurement, not
    chosen: see the BENCH_SKEW.json note on DOCS_PER_SLICE_TARGET above."""
    n_slices = -(-max(1, n_docs) // max(1, target))  # ceil division
    return min(24, max(SLICE_BITS, (n_slices - 1).bit_length()))
# Bump when the on-disk postings/lexicon layout changes; recorded in
# _SUCCESS.json so stale caches rebuild instead of misreading.
INDEX_FORMAT = 2
LONG_MIN = -(2**63)
# Arrow batch rows for the pack stage. Pack input rows are 28 fixed-width
# bytes, so 128k rows ≈ 3.6 MB per batch; the 10k default caused a
# batch-ping-pong collapse under high task concurrency (measured 12× slower
# at 32 threads). Set per-stage, restored after.
PACK_ARROW_BATCH = 131072
# Segment-lifecycle policy threshold. Each appended segment adds one more
# per-segment lexicon partition to every query-time df probe and one more
# (segment, slice) local top-k to the WAND merge, so probe latency and
# query fan-out grow linearly with segment count while per-append cost
# stays delta-proportional — the classic LSM trade. Compacting when the
# count exceeds this bound keeps query-side overhead O(1) amortized:
# with delta ≈ d docs per append, compaction (∝ corpus) runs every
# MAX_SEGMENTS appends, so amortized update cost stays ∝ corpus/MAX + d.
# The reference re-merges its whole FAISS store on EVERY update
# (/root/reference/statschat/preprocess.py:250-288) — this policy is that
# behavior with the rebuild amortized 8× and bounded probe fan-out.
DEFAULT_MAX_SEGMENTS = 8
# Lexicon-delta segments written by delete_docs live in a reserved id range
# so they can never collide with chunk-numbered data segments (batch chunks
# start at 0, streaming chunks at STREAM_CHUNK_BASE=1_000_000).
DELETE_SEG_BASE = 1_500_000_000

TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField("doclen", T.IntegerType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
    ]
)


@F.pandas_udf(TOKENIZED_SCHEMA)
def tokenize_doc_udf(text: pd.Series) -> pd.DataFrame:
    """One Arrow pass producing doclen + per-doc term frequencies as two
    PARALLEL PRIMITIVE ARRAYS (terms, tfs) — an array<struct> here would cost
    one Python dict per (doc, term) pair, which measurably dominated phase A.

    Map-side tf aggregation: downstream row count is bounded by Σ df
    (distinct terms per doc), not token positions — the sort-based analog of
    a map-side combine.

    The per-doc loop is deliberate, not an oversight — MEASURED (20k docs /
    4.5M Zipf tokens, interleaved best-of-3): this loop's work is C code
    (sre findall ~70%, Counter's _count_elements ~30%); a fully-vectorized
    rewrite (flat token stream → pd.factorize → composite-key stable
    argsort → reduceat counts → lexsort back to first-occurrence order,
    byte-identical output) ran 10× SLOWER end-to-end — the global sort over
    token instances plus object-array gathers cost multiple memory passes
    that the per-doc C loop never pays. A single batch-wide findall over
    sentinel-joined text was 1.5× slower (flat-list re-splitting), and
    len/total micro-variants were within noise. ~13k docs/s/core here;
    linear, Arrow-batched, embarrassingly parallel across executors.
    """
    import re
    from collections import Counter

    token_re = re.compile(r"[a-z0-9]+")
    lowered = text.fillna("").str.lower()
    doclens: list[int] = []
    term_lists: list[list[str]] = []
    tf_lists: list[list[int]] = []
    for s in lowered:
        c = Counter(token_re.findall(s))
        doclens.append(sum(c.values()))
        term_lists.append(list(c.keys()))
        tf_lists.append(list(c.values()))
    return pd.DataFrame(
        {
            "doclen": pd.Series(doclens, dtype="int32"),
            "terms": term_lists,
            "tfs": tf_lists,
        }
    )


POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("slice", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("tf_sum", T.LongType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        # avgdl-FREE block bounds: tfn(tf, dl; avgdl) is increasing in tf and
        # decreasing in dl, so tfn(max_tf, min_dl; avgdl) upper-bounds every
        # doc in the block for WHATEVER avgdl holds at query time. Baking
        # avgdl-dependent tfn into blocks (v1) would make WAND pruning unsafe
        # the moment an incremental segment shifts avgdl.
        T.StructField("block_max_tf", T.LongType(), False),
        T.StructField("block_min_dl", T.LongType(), False),
        T.StructField("bytes", T.IntegerType(), False),
        T.StructField("pid", T.IntegerType(), False),
    ]
)


_PACK_COLS = ("term_id", "doc_id", "tf", "doclen")


def _pack_body(cols: dict, pid: int, slice_bits: int):
    """Fully-vectorized block packer: sorted (term_id, doc_sort) rows
    → posting-block arrays. One numpy pass — group/block boundaries via
    flatnonzero/reduceat, codec via a single chunked vbyte encode per column.
    ``cols`` holds plain numpy arrays; returns a pyarrow RecordBatch. No
    pandas and no per-row Python objects anywhere (the pandas per-group
    version was ~50× slower; even batchwise pandas cost an Arrow→object
    conversion that throttled concurrent workers).

    ``slice`` never travels through the shuffle: it is the top SLICE_BITS of
    the unsigned doc id, so it is recomputed here (4 fewer bytes per pair
    row), and sorting by unsigned doc within a term already IS slice-sorted
    order (slices are doc-range prefixes)."""
    import pyarrow as pa

    term = cols["term_id"]
    doc = cols["doc_id"]
    doc_u = doc.view(np.uint64)
    slc = (doc_u >> np.uint64(64 - slice_bits)).astype(np.int64)
    tf = cols["tf"].astype(np.int64)
    dl = cols["doclen"].astype(np.int64)
    n = len(term)

    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (term[1:] != term[:-1]) | (slc[1:] != slc[:-1])
    gidx = np.cumsum(new_group) - 1
    gstart = np.flatnonzero(new_group)
    pos_in_group = np.arange(n, dtype=np.int64) - gstart[gidx]
    is_block_start = new_group | (pos_in_group % BLOCK == 0)
    bstart = np.flatnonzero(is_block_start)
    bend = np.append(bstart[1:], n)

    block_max_tf = np.maximum.reduceat(tf, bstart)
    block_min_dl = np.minimum.reduceat(dl, bstart)
    tf_sum = np.add.reduceat(tf, bstart)

    # delta-gap doc ids: absolute at each block start, gap within a block
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = doc_u[0]
    gaps[1:] = doc_u[1:] - doc_u[:-1]
    gaps[bstart] = doc_u[bstart]

    enc_ids = vbyte_encode_chunks(gaps, bstart)
    enc_tfs = vbyte_encode_chunks(tf.astype(np.uint64) - np.uint64(1), bstart)
    enc_dls = vbyte_encode_chunks(dl.astype(np.uint64), bstart)

    nb = len(bstart)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(term[bstart], type=pa.int64()),
            pa.array(slc[bstart].astype(np.int32), type=pa.int32()),
            pa.array((pos_in_group[bstart] // BLOCK).astype(np.int32), type=pa.int32()),
            pa.array((bend - bstart).astype(np.int32), type=pa.int32()),
            pa.array(tf_sum.astype(np.int64), type=pa.int64()),
            pa.array(doc[bstart], type=pa.int64()),
            pa.array(doc[bend - 1], type=pa.int64()),
            pa.array(enc_ids, type=pa.binary()),
            pa.array(enc_tfs, type=pa.binary()),
            pa.array(enc_dls, type=pa.binary()),
            pa.array(block_max_tf.astype(np.int64), type=pa.int64()),
            pa.array(block_min_dl.astype(np.int64), type=pa.int64()),
            pa.array(
                np.array(
                    [len(a) + len(b) + len(c) for a, b, c in zip(enc_ids, enc_tfs, enc_dls)],
                    dtype=np.int32,
                ),
                type=pa.int32(),
            ),
            pa.array(np.full(nb, pid, dtype=np.int32), type=pa.int32()),
        ],
        names=[
            "term_id", "slice", "block_id", "n", "tf_sum", "first_doc",
            "last_doc", "doc_ids", "tfs", "dls", "block_max_tf", "block_min_dl",
            "bytes", "pid",
        ],
    )


def _pack_groups(slice_bits: int = SLICE_BITS):
    """mapInArrow packer: sorted (term_id, slice, doc_sort) rows → blocks.

    Arrow-native: input RecordBatch columns view as numpy zero-copy (all
    fixed-width numerics — the term string never travels through this path).
    Handles Arrow batch boundaries splitting a (term_id, slice) group by
    carrying the trailing group's arrays between batches.
    """

    def pack(batches):
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        leftover: dict | None = None

        for rb in batches:
            if rb.num_rows == 0:
                continue
            cols = {
                name: rb.column(i).to_numpy(zero_copy_only=False)
                for i, name in enumerate(rb.schema.names)
            }
            if leftover is not None:
                cols = {
                    k: np.concatenate([leftover[k], cols[k]]) for k in _PACK_COLS
                }
            # split off the trailing (possibly incomplete) group — groups are
            # contiguous because input is sorted by (term_id, unsigned doc),
            # and slice boundaries are doc-order prefixes
            keys = cols["term_id"]
            slcs = cols["doc_id"].view(np.uint64) >> np.uint64(64 - slice_bits)
            mask_tail = (keys == keys[-1]) & (slcs == slcs[-1])
            first_tail = int(np.argmax(mask_tail)) if mask_tail.any() else len(keys)
            if first_tail > 0:
                body = {k: cols[k][:first_tail] for k in _PACK_COLS}
                yield _pack_body(body, pid, slice_bits)
            leftover = {k: cols[k][first_tail:] for k in _PACK_COLS}
        if leftover is not None and len(leftover["term_id"]):
            yield _pack_body(leftover, pid, slice_bits)

    return pack


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    avgdl: float
    n_terms: int
    n_posting_rows: int
    wall_s: float
    chunks_processed: int
    chunks_skipped: int
    complete: bool = True
    # set when the segment-lifecycle policy folded all segments back into
    # seg=0 during this call (see maybe_compact)
    compacted: bool = False


def _prepare_base(docs: DataFrame, lang: str | None) -> DataFrame:
    """Normalize the input to (doc_id, url, text): language filter, HTML
    extraction when no text column, deterministic doc ids."""
    cols = set(docs.columns)
    out = docs
    if lang is not None and "lang" in cols:
        out = out.filter(F.col("lang") == lang)  # SURVEY §2.2 P12
    if "text" not in cols:
        out = out.withColumn("text", extract_text_udf(F.col("html")))
    if "doc_id" not in cols:
        # deterministic id replacing the reference's random id (F12)
        out = out.withColumn("doc_id", F.xxhash64(F.col("url")))
    if "url" not in cols:
        out = out.withColumn("url", F.col("doc_id").cast("string"))
    return out.select("doc_id", "url", "text")


def _stage_chunk(
    spark: SparkSession, cdf: DataFrame, index_dir: str, chunk: int, n_files: int = -1
) -> int:
    """Phase-A unit of work: tokenize one chunk into ONE staged table
    (doc_id, url, doclen, tfs) — a single action, no persist — and append the
    lineage row only after the write commits (crash before the lineage append
    ⇒ the chunk is simply redone on resume; writes are per-chunk subdirs so a
    partial rewrite is idempotent). The pair explosion is deferred to phase B
    where it streams out of columnar parquet instead of costing a second
    materialization here."""
    from pyspark.sql import Observation

    ts = time.time()
    tok = cdf.withColumn("tok", tokenize_doc_udf(F.col("text"))).select(
        "doc_id",
        "url",
        F.col("tok.doclen").alias("doclen"),
        F.col("tok.terms").alias("terms"),
        F.col("tok.tfs").alias("tfs"),
    )
    path = os.path.join(index_dir, "staged", f"chunk={chunk}")
    # row count observed DURING the write — no read-back job, and at scale no
    # second listing+footer pass over the chunk just staged
    obs = Observation()
    tok.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).parquet(path)
    n_rows = int(obs.get["rows"])
    # n_files records the listing-level slice size (bytes-read evidence that
    # file-chunked builds scan the input once total); -1 = not file-chunked
    _append_lineage_row(
        os.path.join(index_dir, "_lineage"),
        chunk=chunk,
        rows_in=int(n_rows),
        wall_s=float(time.time() - ts),
        committed_at=time.time(),
        n_files=int(n_files),
    )
    return int(n_rows)


def _append_lineage_row(
    lineage_dir: str, *, chunk: int, rows_in: int, wall_s: float,
    committed_at: float, n_files: int
) -> None:
    """Driver-side lineage commit: one parquet file per chunk commit, written
    with pyarrow under a unique name (append semantics without a Spark job —
    a one-row cluster job per chunk is pure scheduler overhead; lineage is
    commit METADATA, written driver-side exactly as Iceberg writes its commit
    metadata). Types mirror the Spark schema ``chunk int, rows_in long,
    wall_s double, committed_at double, n_files int`` so files from either
    writer read back as one table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(lineage_dir, exist_ok=True)
    table = pa.table(
        {
            "chunk": pa.array([chunk], type=pa.int32()),
            "rows_in": pa.array([rows_in], type=pa.int64()),
            "wall_s": pa.array([wall_s], type=pa.float64()),
            "committed_at": pa.array([committed_at], type=pa.float64()),
            "n_files": pa.array([n_files], type=pa.int32()),
        }
    )
    tmp = os.path.join(lineage_dir, f"_tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp)
    # rename is atomic on posix; readers never see a partial lineage file
    os.replace(tmp, os.path.join(lineage_dir, f"commit-{uuid.uuid4().hex}.parquet"))


class WriterConflict(RuntimeError):
    """A second phase-B writer targeted the same index concurrently."""


class _writer_lock:
    """Advisory single-writer lock for phase-B commits (merge / append /
    compact). Two concurrent writers would interleave table rewrites and
    stats commits silently; Iceberg rejects the second committer via
    optimistic concurrency — this is the explicit-lock analog for the
    filesystem layout.

    Acquisition is ``os.link`` of a fully-written temp file onto
    ``_WRITER_LOCK`` — atomic create-WITH-content, so a contender can never
    observe an empty lock file (an O_EXCL-create-then-write would have a
    window where a racing reader parses pid 0, "breaks" a live writer's
    lock, and two phase-B writers proceed). A lock whose pid is dead
    (crashed writer) is broken and retaken; losing the retake race to
    another breaker raises WriterConflict rather than corrupting.
    Reentrant per (thread, index_dir) so update_index → append_segment →
    maybe_compact nest under one hold; a SECOND THREAD of the same process
    is a conflict, not a reentry (the pid file can't arbitrate in-process
    writers — the threaded WSGI server + background-ingest topology needs
    the map-based check)."""

    _guard = threading.Lock()
    _held: dict = {}  # index_dir -> owning thread ident, THIS process

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "_WRITER_LOCK")
        self.owner = False

    def _try_link(self) -> bool:
        """Atomically publish a pid-bearing lock file; False if held."""
        tmp = f"{self.path}.tmp-{os.getpid()}-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(os.getpid()))
        try:
            os.link(tmp, self.path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def __enter__(self):
        me = threading.get_ident()
        with _writer_lock._guard:
            holder = _writer_lock._held.get(self.index_dir)
            if holder == me:
                return self  # reentrant: outermost holder owns the file
            if holder is not None:
                raise WriterConflict(
                    f"index at {self.index_dir!r} has a live writer in this "
                    f"process (thread {holder}); concurrent phase-B commits "
                    "would interleave — serialize writers onto one thread"
                )
            # reserve in-process BEFORE touching the filesystem so a second
            # thread can't race between our link and the _held insert
            _writer_lock._held[self.index_dir] = me
        try:
            if not self._try_link():
                try:
                    with open(self.path) as f:
                        pid = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    pid = 0
                if pid and _pid_alive(pid):
                    raise WriterConflict(
                        f"index at {self.index_dir!r} has a live writer "
                        f"(pid {pid}, {self.path}); concurrent phase-B "
                        "commits would interleave — wait for it or remove "
                        "the lock if it is stale"
                    ) from None
                # dead owner: break the stale lock and retake it; losing
                # the retake race to another breaker is a conflict
                try:
                    os.remove(self.path)
                except OSError:
                    pass
                if not self._try_link():
                    raise WriterConflict(
                        f"index at {self.index_dir!r}: lost the stale-lock "
                        f"retake race to another writer ({self.path})"
                    )
        except BaseException:
            with _writer_lock._guard:
                _writer_lock._held.pop(self.index_dir, None)
            raise
        self.owner = True
        return self

    def __exit__(self, *exc):
        if self.owner:
            with _writer_lock._guard:
                _writer_lock._held.pop(self.index_dir, None)
            try:
                os.remove(self.path)
            except OSError:
                pass
        return False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _single_writer(fn):
    """Decorator: run the phase-B unit under the index's writer lock.
    Expects ``(spark, index_dir, ...)`` signatures."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark, index_dir, *a, **kw):
        os.makedirs(index_dir, exist_ok=True)
        with _writer_lock(index_dir):
            return fn(spark, index_dir, *a, **kw)

    return wrapper


def staged_chunks(spark: SparkSession, index_dir: str) -> set[int]:
    """Chunks whose lineage row committed (completed phase-A units).

    Lineage is driver-written commit metadata (one tiny file per chunk), so
    it is read back driver-side with pyarrow — no Spark job on the resume /
    append path. pyarrow's dataset discovery skips ``_``/``.``-prefixed
    files, so legacy Spark-written ``_SUCCESS`` markers are ignored, and
    legacy Spark-written lineage part-files read back identically."""
    import pyarrow.parquet as pq

    lineage_path = os.path.join(index_dir, "_lineage")
    if not os.path.exists(lineage_path):
        return set()
    table = pq.read_table(lineage_path, columns=["chunk"])
    return {int(c) for c in table.column("chunk").to_pylist()}


def _chunk_files(path: str) -> list[str]:
    """Parquet part-files under a dataset dir (deterministic order)."""
    import glob as _glob

    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    )
    return files or [path]


def build_index(
    spark: SparkSession,
    docs: DataFrame | str,
    index_dir: str,
    *,
    lang: str | None = "en",
    num_partitions: int | None = None,
    n_chunks: int = 1,
    resume: bool = False,
    stop_after_chunks: int | None = None,
    slice_bits: int | None = None,
) -> BuildResult:
    """Build the full index under ``index_dir``.

    ``slice_bits``: doc-range slice granularity; None (default) derives it
    from the corpus size (derive_slice_bits) so hot-term per-slice sub-lists
    stay bounded at any scale. Rank/score results are invariant to it.

    Layout: staged/ (phase A, per-chunk), docs/, lexicon/, postings/,
    _lineage/, _metrics/, stats.json, _SUCCESS.json.

    ``docs`` is a DataFrame or a parquet dataset PATH. With a path and
    ``n_chunks > 1``, chunks are cut at the FILE LISTING (round-robin over
    the sorted part-files), so each phase-A pass reads ONLY its slice of the
    input — n_chunks staged passes cost one total scan. With a DataFrame the
    fallback is a pmod(url-hash) filter, which re-scans the input per chunk
    (documented; fine for n_chunks=1, the default).

    ``stop_after_chunks`` caps phase-A work done in this invocation (an
    operational budget knob); when the cap fires before all chunks are staged
    the merge is skipped and the result has ``complete=False`` — rerun with
    ``resume=True`` to finish. Combined with lineage this is the north-rule
    checkpoint-resume path.
    """
    t0 = time.time()
    sc = spark.sparkContext
    P = num_partitions or sc.defaultParallelism
    os.makedirs(index_dir, exist_ok=True)

    by_files = isinstance(docs, str) and n_chunks > 1
    if by_files:
        files = _chunk_files(docs)
        base = None
    else:
        if isinstance(docs, str):
            docs = spark.read.parquet(docs)
        base = _prepare_base(docs, lang)

    done_chunks: set[int] = set()
    if resume:
        done_chunks = staged_chunks(spark, index_dir)

    # A pre-existing _SUCCESS.json from an earlier completed build stays in
    # place while chunks are (re)staged: it describes the COMMITTED tables,
    # which staging never touches, so concurrent queries keep serving the old
    # snapshot for the whole phase-A window (the Iceberg reader story).
    # merge_index invalidates it immediately before rewriting the tables and
    # recommits after — the only genuinely reader-unsafe window. Resume
    # correctness never consults the marker (staged_chunks reads lineage).

    processed = 0
    for chunk in range(n_chunks):
        if chunk in done_chunks:
            continue
        if stop_after_chunks is not None and processed >= stop_after_chunks:
            return BuildResult(
                index_dir=index_dir,
                n_docs=0,
                avgdl=0.0,
                n_terms=0,
                n_posting_rows=0,
                wall_s=time.time() - t0,
                chunks_processed=processed,
                chunks_skipped=len(done_chunks),
                complete=False,
            )
        if by_files:
            # listing-level slice: this pass reads ONLY these files
            chunk_paths = files[chunk::n_chunks] or [files[0]]
            cdf = _prepare_base(spark.read.parquet(*chunk_paths), lang)
            if not files[chunk::n_chunks]:
                cdf = cdf.limit(0)  # more chunks than files: empty slice
            n_files = len(files[chunk::n_chunks])
        elif n_chunks == 1:
            cdf, n_files = base, -1
        else:
            cdf = base.filter(
                F.pmod(F.xxhash64(F.col("url")), F.lit(n_chunks)) == chunk
            )
            n_files = -1
        _stage_chunk(spark, cdf, index_dir, chunk, n_files=n_files)
        processed += 1

    result = merge_index(
        spark, index_dir, num_partitions=P, n_chunks=n_chunks,
        slice_bits=slice_bits,
    )
    result.chunks_processed = processed
    result.chunks_skipped = len(done_chunks)
    result.wall_s = time.time() - t0
    _finalize_stats(index_dir, result.wall_s)
    return result


def update_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    *,
    lang: str | None = "en",
    num_partitions: int | None = None,
    strategy: str = "segment",
    max_segments: int | None = DEFAULT_MAX_SEGMENTS,
    slice_bits: int | None = None,
) -> BuildResult:
    """Incremental UPDATE: stage only genuinely-new documents as a fresh
    chunk, then merge. The Spark analog of the reference's UPDATE mode
    (pdf_downloader.py:133-152 anti-join + preprocess.py:250-288 FAISS
    merge_from): new-vs-existing is a left anti join on url against the
    already-staged doc table, so re-sending the same batch is a no-op.

    ``strategy``:
    - ``segment`` (default) — pack ONLY the delta into a new doc-disjoint
      segment (postings/docs/lexicon/_metrics under ``seg=N``); existing
      segment files are never read or rewritten, so phase-B wall time is
      proportional to the DELTA, not the corpus. This is the plain-parquet
      realization of an Iceberg snapshot append / ``MERGE INTO`` over
      term-keyed partitions. Query-time exactness: segments are doc-
      disjoint, per-(segment, slice) WAND local top-k composes exactly, and
      idf/avgdl are merged globals (never baked into posting bytes — the
      block bounds are avgdl-free, see POSTINGS_SCHEMA).
    - ``compact`` — full phase-B re-merge of all staged chunks into one
      segment; byte-identical to a from-scratch build (the compaction /
      rewrite path).

    Lifecycle: after a segment append, if the segment count exceeds
    ``max_segments`` (default DEFAULT_MAX_SEGMENTS; None disables), the
    index is auto-compacted back to one segment — bounding query-time probe
    fan-out while keeping per-update cost delta-proportional amortized
    (see maybe_compact). The result's ``compacted`` flag reports it.
    """
    if strategy not in ("segment", "compact"):
        # same up-front validation as ingest_stream: a typo'd strategy must
        # not silently take the fresh-dir compaction path
        raise ValueError(f"unknown strategy {strategy!r}")
    t0 = time.time()
    P = num_partitions or spark.sparkContext.defaultParallelism
    base = _prepare_base(new_docs, lang)
    # NOTE: the committed _SUCCESS.json stays valid throughout staging and
    # segment append — readers prune scans to the marker's segment list, so
    # the in-flight chunk/segment is invisible and queries keep serving the
    # old snapshot (same reader story as ingest_stream). Only table-rewriting
    # paths (merge_index, reached via strategy='compact' or maybe_compact)
    # invalidate the marker, immediately before clearing the table dirs.
    existing_path = os.path.join(index_dir, "staged")
    if os.path.exists(existing_path):
        existing = spark.read.parquet(existing_path).select("url")
        base = base.join(existing, "url", "left_anti")
    done = staged_chunks(spark, index_dir)
    next_chunk = (max(done) + 1) if done else 0
    _stage_chunk(spark, base, index_dir, next_chunk)

    # no prior completed merge (fresh dir) → the delta IS the whole index;
    # compaction and segment-append coincide, take the compaction path
    has_base = os.path.exists(os.path.join(index_dir, "stats.json"))
    if strategy == "compact" or not has_base:
        result = merge_index(
            spark, index_dir, num_partitions=P, n_chunks=next_chunk + 1,
            slice_bits=slice_bits,
        )
        result.chunks_processed = 1
        result.chunks_skipped = len(done)
        result.wall_s = time.time() - t0
        _finalize_stats(index_dir, result.wall_s)
        return result

    # Reconcile ALL pending chunks (staged minus covered), not only the one
    # just staged: if a prior update crashed between _stage_chunk committing
    # lineage and append_segment finishing, a retry of the same batch
    # anti-joins everything away and stages an EMPTY next chunk — appending
    # only next_chunk would then mark the index complete with the earlier
    # orphan chunk silently unpacked. Same reconciliation as ingest_stream.
    pending = sorted(
        staged_chunks(spark, index_dir) - covered_chunks(index_dir)
    )
    appended = list(pending)
    result = None
    for c in pending:
        result = append_segment(
            spark, index_dir, c, num_partitions=P, slice_bits=slice_bits
        )
    if result is None:  # fully covered already (pure replay)
        result = append_segment(
            spark, index_dir, next_chunk, num_partitions=P,
            slice_bits=slice_bits,
        )
        appended = [next_chunk]
    compacted = maybe_compact(
        spark, index_dir, max_segments=max_segments, num_partitions=P
    )
    if compacted is not None:
        result = compacted
    # processed = chunks this call actually packed into a segment;
    # skipped = previously-staged chunks NOT (re)packed now — disjoint by
    # construction, so a reconciled orphan counts once, as processed.
    result.chunks_processed = len(appended)
    result.chunks_skipped = len(set(done) - set(appended))
    result.wall_s = time.time() - t0
    return result


def _existing_segments(index_dir: str) -> list[int]:
    """On-disk DATA segment numbers (postings/ dir listing)."""
    p = os.path.join(index_dir, "postings")
    if not os.path.isdir(p):
        return []
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(p) if d.startswith("seg=")
    )


def _listed_delta_segments(index_dir: str) -> list[int]:
    """Lexicon-only delete-delta segment dirs present ON DISK (committed or
    not) — used only to pick collision-free new ids; never published."""
    p = os.path.join(index_dir, "lexicon")
    if not os.path.isdir(p):
        return []
    return sorted(
        s
        for s in (
            int(d.split("=", 1)[1])
            for d in os.listdir(p)
            if d.startswith("seg=")
        )
        if s >= DELETE_SEG_BASE
    )


def _committed_segments(index_dir: str, stats: dict) -> list[int]:
    """The segment list a commit marker should publish: data segments from
    the postings listing, plus the delete-delta segments stats.json records
    as COMMITTED. Delta dirs are deliberately NOT taken from the directory
    listing — a delete that crashed between its lexicon-delta write and its
    stats/marker commit leaves an orphan dir, and publishing it through a
    later append's marker would subtract df without the matching tombstone
    or n_docs decrement (silently wrong idf). Orphan dirs are inert garbage
    until the next compaction clears the lexicon table."""
    return sorted(
        set(_existing_segments(index_dir))
        | {int(s) for s in stats.get("delete_segments", [])}
    )


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    *,
    max_segments: int | None = DEFAULT_MAX_SEGMENTS,
    num_partitions: int | None = None,
) -> BuildResult | None:
    """Fold all segments back into seg=0 when the count exceeds
    ``max_segments`` (None = never). Returns the compaction result, or None
    when no compaction was needed. Safe mid-lifecycle: merge_index
    invalidates _SUCCESS before touching tables and rebuilds from the staged
    chunks, so a crash here degrades to a resumable rebuild, never a
    corrupt-but-complete index.

    Reader concurrency: segment APPENDS are reader-safe (queries prune to
    the committed segment list and never see the in-flight segment), but
    compaction REWRITES table dirs in place — a query started mid-compaction
    fails fast on the invalidated marker (check_index_format) rather than
    reading half-cleared tables. True read-while-compact needs old-file
    retention (what Iceberg snapshots provide; documented divergence in
    COVERAGE.md) — in this layout, schedule compaction off the serving
    path."""
    if max_segments is None:
        return None
    if len(_existing_segments(index_dir)) <= max_segments:
        return None
    out = merge_index(spark, index_dir, num_partitions=num_partitions)
    out.compacted = True
    return out


@dataclass
class DeleteResult:
    index_dir: str
    n_deleted: int  # docs actually tombstoned by THIS call
    n_docs: int  # live docs after the delete
    avgdl: float
    wall_s: float
    tombstone_file: str | None  # None when the call was a no-op


def _tombstone_paths(index_dir: str, stats: dict) -> list[str]:
    return [
        os.path.join(index_dir, "tombstones", f)
        for f in stats.get("tombstone_files", [])
    ]


def _tombstone_df(spark: SparkSession, index_dir: str, stats: dict):
    """Tombstoned doc_ids as a (tiny) DataFrame, or None when there are none.
    Read from the delete files directly so writer-side joins see exactly the
    committed delete set."""
    paths = _tombstone_paths(index_dir, stats)
    if not paths:
        return None
    return spark.read.parquet(*paths).select("doc_id").distinct()


@_single_writer
def delete_docs(
    spark: SparkSession,
    index_dir: str,
    urls,
) -> DeleteResult:
    """DELETE documents from a committed index by url — the Iceberg
    delete-file analog (takedown/GDPR shape) with EXACT BM25 semantics over
    the remaining corpus, at delta-proportional cost:

    - a **tombstone file** (parquet of doc_ids, written driver-side like the
      lineage commits) masks the docs out of query-time scoring — posting
      bytes are never rewritten (Iceberg positional deletes);
    - a **negative lexicon delta segment** (df/cf of the deleted docs' terms,
      negated) keeps the query-time df probe — and with it idf — exact: the
      probe SUMS df over the marker's segments, so subtraction is just one
      more segment. All lifetime deletes FOLD into a single delta segment
      (the previous delta is re-aggregated with the new one), so probe
      fan-out stays O(1) no matter how many takedown calls accumulate;
    - **stats** (n_docs, avgdl) are decremented exactly from the deleted
      docs' doclens, keeping the BM25 length normalization exact.

    The result is bit-identical to an index built without the deleted docs
    (rank AND score — property-tested), while the delete itself costs one
    pushed-down scan of the staged table plus a |deleted|-sized aggregation.

    Scope: only docs in the COMMITTED snapshot (staged chunks listed in
    stats.json's covered_chunks) are deletable — a url sitting in a
    staged-but-unmerged chunk (``ingest_stream(merge=False)``, or the window
    between _stage_chunk and append_segment) was never added to the
    committed stats, so subtracting it would corrupt n_docs/idf for the live
    corpus. Delete it after its chunk commits.

    Crash safety: the stats/_SUCCESS rename is the commit point. The delta
    segment is written to a fresh reserved id first (never in any marker
    until committed — marker segment lists come from _committed_segments,
    not directory listing), the tombstone file second, stats+marker last. A
    crash anywhere before the marker rename leaves the committed snapshot
    untouched plus inert orphan files; a retry re-finds the victims (their
    tombstone never committed) and performs the delete exactly once.

    Physical reclaim happens at the next compaction (merge_index excludes
    tombstoned docs when it rebuilds, so posting bytes shrink), but the
    tombstone files are retained forever: the staged chunks still hold the
    deleted rows (they are the resume/lineage anchor and are immutable), so
    the filter must survive every future rebuild. Deletion is therefore
    TERMINAL for a url in this index — update_index's new-vs-existing
    anti-join treats a re-send as already ingested, and append_segment
    anti-joins every chunk it packs against the tombstones, so even a
    streaming drain that re-lands a deleted url cannot re-admit it.
    Re-admitting a deleted url requires a fresh build. Tombstone volume is
    ∝ lifetime deletes (8 bytes/doc), broadcast to executors once per
    snapshot version at query time.

    Idempotent: re-deleting already-tombstoned or unknown urls is a no-op
    (no double-subtraction of df/avgdl).
    """
    t0 = time.time()
    stats_path = os.path.join(index_dir, "stats.json")
    if not os.path.exists(stats_path):
        raise RuntimeError(
            f"index at {index_dir!r} has no completed build (stats.json "
            "missing) — delete_docs needs a committed index"
        )
    with open(stats_path) as f:
        old = json.load(f)
    try:
        with open(os.path.join(index_dir, "_SUCCESS.json")) as f:
            old_marker = json.load(f)
    except (OSError, ValueError):
        raise RuntimeError(
            f"index at {index_dir!r} has no committed _SUCCESS.json — "
            "delete_docs mutates only committed snapshots"
        ) from None
    if isinstance(urls, DataFrame):
        url_df = urls.select("url").distinct()
    else:
        url_df = spark.createDataFrame(
            [(str(u),) for u in urls], "url string"
        ).distinct()

    staged = spark.read.parquet(os.path.join(index_dir, "staged"))
    covered = old.get("covered_chunks")
    if covered is not None:
        # committed corpus only — see "Scope" in the docstring
        staged = staged.filter(F.col("chunk").isin([int(c) for c in covered]))
    victims = staged.join(F.broadcast(url_df), "url", "semi")
    tomb = _tombstone_df(spark, index_dir, old)
    if tomb is not None:
        # idempotence: docs already tombstoned must not subtract twice
        victims = victims.join(F.broadcast(tomb), "doc_id", "left_anti")
    # one row per doc even if a url was ever staged twice
    victims = (
        victims.select("doc_id", "doclen", "terms", "tfs")
        .dropDuplicates(["doc_id"])
        .persist()
    )
    old_delta_segs = [int(s) for s in old.get("delete_segments", [])]
    try:
        hit = victims.select("doc_id", "doclen").collect()  # ≤ |urls| rows
        if not hit:
            return DeleteResult(
                index_dir=index_dir,
                n_deleted=0,
                n_docs=int(old["n_docs"]),
                avgdl=float(old["avgdl"]),
                wall_s=time.time() - t0,
                tombstone_file=None,
            )
        n_del = len(hit)
        dl_del = float(sum(int(r.doclen) for r in hit))
        doc_ids = sorted(int(r.doc_id) for r in hit)

        # negative lexicon delta, FOLDED with the previously committed delta
        # so exactly one delta segment is live at a time. Fresh reserved seg
        # id (> every on-disk delta dir, committed or orphaned, and disjoint
        # from chunk-numbered data segments): the superseded/orphan dirs
        # stay on disk — concurrent readers of older snapshots may still
        # scan them — and are reclaimed when compaction clears the lexicon.
        seg = max(
            _listed_delta_segments(index_dir) + old_delta_segs,
            default=DELETE_SEG_BASE - 1,
        ) + 1
        lex_delta = (
            victims.select(F.explode(F.arrays_zip("terms", "tfs")).alias("e"))
            .select(F.col("e.terms").alias("term"), F.col("e.tfs").alias("tf"))
            .groupBy("term")
            .agg(
                (-F.count("*")).alias("df"),
                (-F.sum("tf")).alias("cf"),
            )
            .select(F.xxhash64("term").alias("term_id"), "term", "df", "cf")
        )
        if old_delta_segs:
            prev = spark.read.parquet(
                *(
                    os.path.join(index_dir, "lexicon", f"seg={s}")
                    for s in old_delta_segs
                )
            ).select("term_id", "term", "df", "cf")
            lex_delta = (
                lex_delta.unionByName(prev)
                .groupBy("term_id", "term")
                .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            )
        lex_delta.repartition(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "lexicon", f"seg={seg}")
        )
    finally:
        victims.unpersist()

    # tombstone file: driver-written commit metadata, exactly like lineage
    import pyarrow as pa
    import pyarrow.parquet as pq

    tomb_dir = os.path.join(index_dir, "tombstones")
    os.makedirs(tomb_dir, exist_ok=True)
    fname = f"tomb-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(tomb_dir, f"_tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, type=pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(tomb_dir, fname))

    n_docs = int(old["n_docs"]) - n_del
    avgdl = (
        (int(old["n_docs"]) * float(old["avgdl"]) - dl_del) / n_docs
        if n_docs
        else 0.0
    )
    stats = {
        **old,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "tombstone_files": list(old.get("tombstone_files", [])) + [fname],
        "delete_segments": [seg],  # the folded delta supersedes prior ones
        "n_deleted_total": int(old.get("n_deleted_total", 0)) + n_del,
        "last_delete": {"n_docs": n_del, "segment": seg},
    }
    _write_stats_and_success(
        index_dir,
        stats,
        old_marker.get("chunks", 0),
        _committed_segments(index_dir, stats),
        old.get("covered_chunks", []),
    )
    return DeleteResult(
        index_dir=index_dir,
        n_deleted=n_del,
        n_docs=n_docs,
        avgdl=avgdl,
        wall_s=time.time() - t0,
        tombstone_file=fname,
    )


@_single_writer
def append_segment(
    spark: SparkSession,
    index_dir: str,
    chunk: int,
    *,
    num_partitions: int | None = None,
    slice_bits: int | None = None,
) -> BuildResult:
    """Pack ALREADY-STAGED chunk N into index segment N and merge the global
    stats incrementally — the delta-proportional phase-B unit shared by
    ``update_index(strategy='segment')`` and the streaming drain. Requires a
    completed prior merge (stats.json); idempotent: an already-appended or
    empty chunk just refreshes the success marker."""
    t0 = time.time()
    P = num_partitions or spark.sparkContext.defaultParallelism
    timings: dict[str, float] = {}
    with open(os.path.join(index_dir, "stats.json")) as f:
        old = json.load(f)
    n_chunks = len(staged_chunks(spark, index_dir))

    def _unchanged() -> BuildResult:
        _write_stats_and_success(
            index_dir, old, n_chunks, _committed_segments(index_dir, old),
            old.get("covered_chunks", []),
        )
        return BuildResult(
            index_dir=index_dir,
            n_docs=int(old["n_docs"]),
            avgdl=float(old["avgdl"]),
            n_terms=int(old["n_terms"]),
            n_posting_rows=int(old.get("n_posting_rows", 0)),
            wall_s=time.time() - t0,
            chunks_processed=0,
            chunks_skipped=0,
        )

    if chunk in set(old.get("covered_chunks", [])):
        return _unchanged()  # replayed drain / already-compacted chunk
    staged_k = spark.read.parquet(
        os.path.join(index_dir, "staged", f"chunk={chunk}")
    )
    tomb = _tombstone_df(spark, index_dir, old)
    if tomb is not None:
        # terminal-delete enforcement at the phase-B choke point: a chunk
        # that re-lands a tombstoned url (streaming drains have no url
        # anti-join) must not re-admit the doc — it would re-increment
        # n_docs/df for a doc_id every scorer masks forever
        staged_k = staged_k.join(F.broadcast(tomb), "doc_id", "left_anti")
    srow = staged_k.agg(
        F.count("*").alias("n"), F.sum("doclen").alias("dl_sum")
    ).collect()[0]
    n_delta, dl_delta = int(srow.n), float(srow.dl_sum or 0.0)
    if n_delta == 0:
        # idempotent re-send (everything anti-joined away): nothing to pack
        return _unchanged()
    est_pairs = max(1.0, dl_delta * 0.7)
    # data-proportional, NOT thread-capped — see merge_index's sizing note
    P_pack = max(4, min(4096, int(est_pairs // 1_500_000) + 1))
    P_docs = max(1, min(2048, n_delta // 2_000_000 + 1))
    # slice_bits derives from THIS segment's doc count: per-slice WAND and
    # the pack shuffle only ever see one segment's sub-lists, so a small
    # delta appended to a huge base correctly gets a small slice count
    sb = slice_bits if slice_bits is not None else derive_slice_bits(n_delta)
    seg_stats = _build_segment(
        spark, staged_k, index_dir, chunk, P_pack=P_pack, P_docs=P_docs,
        timings=timings, slice_bits=sb,
    )

    # merge global stats incrementally (exact: avgdl is a weighted mean)
    n_docs = int(old["n_docs"]) + n_delta
    avgdl = (
        (old["n_docs"] * old["avgdl"] + dl_delta) / n_docs if n_docs else 0.0
    )
    n_terms = (
        spark.read.parquet(os.path.join(index_dir, "lexicon"))
        .select("term_id")
        .distinct()
        .count()
    )
    wall = time.time() - t0
    stats = {
        **old,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": int(n_terms),
        "n_posting_rows": int(old.get("n_posting_rows", 0)) + seg_stats["rows"],
        "n_postings": int(old.get("n_postings", 0)) + seg_stats["postings"],
        "postings_per_sec": (seg_stats["postings"] / wall) if wall > 0 else 0.0,
        "build_wall_s": wall,
        "phase_timings_s": {k: round(v, 3) for k, v in timings.items()},
        "last_delta": {"segment": chunk, "n_docs": n_delta},
        "covered_chunks": sorted(set(old.get("covered_chunks", [])) | {chunk}),
    }
    _write_stats_and_success(
        index_dir, stats, n_chunks, _committed_segments(index_dir, stats),
        stats["covered_chunks"],
    )
    return BuildResult(
        index_dir=index_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_terms=int(n_terms),
        n_posting_rows=stats["n_posting_rows"],
        wall_s=wall,
        chunks_processed=1,
        chunks_skipped=0,
    )


def _invalidate_success(index_dir: str) -> None:
    p = os.path.join(index_dir, "_SUCCESS.json")
    if os.path.exists(p):
        os.remove(p)


def _finalize_stats(index_dir: str, wall_s: float) -> None:
    """Rewrite wall-clock-derived metrics to cover phase A + phase B."""
    p = os.path.join(index_dir, "stats.json")
    with open(p) as f:
        stats = json.load(f)
    stats["build_wall_s"] = wall_s
    stats["postings_per_sec"] = (
        stats["n_postings"] / wall_s if wall_s > 0 else 0.0
    )
    _atomic_json(p, stats, indent=2)


def _check_term_collisions(term_dict: DataFrame) -> None:
    """xxhash64 collision between two distinct terms would silently merge
    their df/cf into BOTH lexicon rows (ranking corruption) — detect on the
    small |vocab| relation and fail loudly; P(collision) ≈ |V|²/2⁶⁵
    (~10⁻⁹ even at 10⁸ terms)."""
    dup = (
        term_dict.groupBy("term_id")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise RuntimeError(
            f"xxhash64 term_id collision (term_id={dup[0]['term_id']}); "
            "two distinct terms share an id — the lexicon would merge "
            "their stats. Re-key with a wider/salted id."
        )


def _build_segment(
    spark: SparkSession,
    staged: DataFrame,
    index_dir: str,
    seg: int,
    *,
    P_pack: int,
    P_docs: int,
    timings: dict,
    slice_bits: int = SLICE_BITS,
) -> dict:
    """Pack one doc-disjoint SEGMENT: postings/seg=N, docs/seg=N,
    lexicon/seg=N, _metrics/seg=N. Segments are the incremental-update unit
    (the Iceberg-snapshot analog): per-slice WAND stays exact because docs
    are disjoint across segments, and BM25 globals (idf, avgdl) are merged
    at query/probe time, never baked into posting bytes.

    Returns {n_posting_rows, n_postings, max_p, avg_p} for stats.
    """
    seg_sub = f"seg={seg}"
    staged_docs = staged.select("doc_id", "url", "doclen")

    def _write_docs() -> None:
        tpd = time.time()
        staged_docs.repartition(P_docs, "doc_id").write.mode("overwrite").parquet(
            os.path.join(index_dir, "docs", seg_sub)
        )
        timings["docs_write"] = time.time() - tpd

    # ---- postings: the ONE heavy pass over the segment's (doc, term) pairs
    # pairs stream out of the columnar staged table (explode of parallel
    # primitive arrays — never materialized to storage); one hash shuffle on
    # (term_id, slice) co-locates each term's doc-range slices WITHOUT the
    # extra range-sampling scan repartitionByRange would cost; the
    # within-partition sort restores (term_id, slice, unsigned-doc) order, so
    # posting bytes are identical to a range-partitioned layout and parquet
    # row-group min/max stats on the sorted term_id still prune query scans.
    tp = time.time()
    pairs = staged.select(
        "doc_id", "doclen", F.explode(F.arrays_zip("terms", "tfs")).alias("e")
    ).select(
        "doc_id", "doclen", F.col("e.terms").alias("term"), F.col("e.tfs").alias("tf")
    )
    doc_sort = F.col("doc_id").bitwiseXOR(F.lit(LONG_MIN))  # unsigned order
    # slice participates as a shuffle-key EXPRESSION only — it never
    # materializes as a column (4 fewer bytes per pair row; the packer
    # recomputes it from doc_id). Sorting (term_id, unsigned doc) already
    # yields (term_id, slice, doc) order because slices are doc prefixes.
    slice_key = F.shiftrightunsigned(F.col("doc_id"), 64 - slice_bits)
    # numeric-only columns cross the Arrow boundary: zero-copy into numpy,
    # no Python string materialization in the packer workers
    postings = (
        pairs.select(
            F.xxhash64("term").alias("term_id"),
            "doc_id",
            "tf",
            "doclen",
        )
        .repartition(P_pack, F.col("term_id"), slice_key)
        .sortWithinPartitions("term_id", doc_sort)
        .mapInArrow(_pack_groups(slice_bits), schema=POSTINGS_SCHEMA)
    )
    # docs table write and postings build are independent DAGs — submit them
    # concurrently so the small docs job fills scheduler slots the big
    # shuffle leaves idle (matters most at low parallelism; on a cluster this
    # is plain multi-job scheduling)
    _BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old_batch = spark.conf.get(_BATCH_KEY, None)
    spark.conf.set(_BATCH_KEY, str(PACK_ARROW_BATCH))
    try:
        with ThreadPoolExecutor(2) as ex:
            f_docs = ex.submit(_write_docs)
            f_post = ex.submit(
                lambda: postings.write.mode("overwrite").parquet(
                    os.path.join(index_dir, "postings", seg_sub)
                )
            )
            f_post.result()
            f_docs.result()
    finally:
        if old_batch is not None:
            spark.conf.set(_BATCH_KEY, old_batch)
        else:
            spark.conf.unset(_BATCH_KEY)
    timings["postings"] = time.time() - tp

    # ---- lexicon: per-term stats from this segment's packed postings (2-3
    # orders of magnitude fewer rows than pairs) joined to the term
    # dictionary — a JVM-only distinct whose map-side partial agg collapses
    # to |vocab|. Global df/cf are the SUM over segments, aggregated at the
    # (tiny, term_id-pruned) query-time probe.
    tp = time.time()
    pst = spark.read.parquet(os.path.join(index_dir, "postings", seg_sub))
    lex_box: list = []

    def _write_lexicon() -> None:
        from pyspark.sql import Observation

        tpl = time.time()
        term_dict = (
            staged.select(F.explode("terms").alias("term"))
            .distinct()
            .select(F.xxhash64("term").alias("term_id"), "term")
        ).persist()
        try:
            _check_term_collisions(term_dict)
            lex_stats = pst.groupBy("term_id").agg(
                F.sum("n").alias("df"),
                F.sum("tf_sum").alias("cf"),
            )
            lexicon = lex_stats.join(term_dict, "term_id").select(
                "term_id", "term", "df", "cf"
            )
            # segment term count observed during the write (no read-back job)
            obs = Observation()
            lexicon.observe(obs, F.count(F.lit(1)).alias("rows")).repartition(
                max(1, P_pack // 4), "term_id"
            ).sortWithinPartitions("term_id").write.mode("overwrite").parquet(
                os.path.join(index_dir, "lexicon", seg_sub)
            )
            lex_box.append(int(obs.get["rows"]))
        finally:
            term_dict.unpersist()
        timings["lexicon"] = time.time() - tpl

    # metrics read only (pid, n, bytes) — parquet column pruning skips the
    # binaries; runs concurrently with the lexicon job (independent DAGs)
    agg_box: list = []

    def _write_metrics() -> None:
        tpm = time.time()
        per_pid = pst.groupBy("pid").agg(
            F.count("*").alias("posting_rows"),
            F.sum("n").alias("postings"),
            F.sum("bytes").alias("bytes"),
        )
        per_pid.write.mode("overwrite").parquet(
            os.path.join(index_dir, "_metrics", seg_sub)
        )
        agg_box.append(
            per_pid.agg(
                F.sum("posting_rows").alias("rows"),
                F.sum("postings").alias("postings"),
                F.max("postings").alias("max_p"),
                F.avg("postings").alias("avg_p"),
            ).collect()[0]
        )
        timings["metrics"] = time.time() - tpm

    with ThreadPoolExecutor(2) as ex:
        f_lex = ex.submit(_write_lexicon)
        f_met = ex.submit(_write_metrics)
        f_lex.result()
        f_met.result()
    agg = agg_box[0]
    timings["finalize"] = time.time() - tp
    return {
        "rows": int(agg.rows or 0),
        "postings": int(agg.postings or 0),
        "max_p": float(agg.max_p or 0.0),
        "avg_p": float(agg.avg_p or 0.0),
        "n_terms": int(lex_box[0]) if lex_box else 0,
    }


def _clear_dir(path: str) -> None:
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)


def _write_stats_and_success(
    index_dir: str, stats: dict, n_chunks, segments, covered_chunks
) -> None:
    """``covered_chunks`` records which staged chunks the current segments
    contain — a compaction folds MANY chunks into seg=0, so `staged minus
    segments` alone would wrongly re-append compacted chunks.

    Both files are written via tmp + atomic rename: a query racing the
    commit (ingest_stream + serving in one driver) must see either the old
    or the new JSON, never a torn write."""
    _atomic_json(os.path.join(index_dir, "stats.json"), stats, indent=2)
    _atomic_json(
        os.path.join(index_dir, "_SUCCESS.json"),
        {
            "complete": True,
            "chunks": n_chunks,
            "segments": segments,
            "covered_chunks": sorted(covered_chunks),
            "format": INDEX_FORMAT,
            # Scoring globals embedded IN the snapshot marker: a query that
            # reads the marker once gets (segment list, n_docs, avgdl) from
            # the same commit, so a concurrent append can never pair one
            # snapshot's postings with another's idf/avgdl (stats.json and
            # _SUCCESS.json are two separate renames — readers that consult
            # both can interleave a commit between them).
            "stats": {
                "n_docs": int(stats["n_docs"]),
                "avgdl": float(stats["avgdl"]),
            },
            # Delete files of this snapshot (Iceberg positional-delete
            # analog): parquet files of tombstoned doc_ids under
            # tombstones/. Readers mask these ids out of scoring; merges
            # exclude them from rebuilt segments (see delete_docs).
            "tombstone_files": list(stats.get("tombstone_files", [])),
            # Unique per commit: the query probe cache keys on this, not
            # on mtime — back-to-back segment appends (ingest_stream) can
            # land within one mtime granule on coarse-timestamp
            # filesystems and would otherwise leave stale df cached.
            "version": uuid.uuid4().hex,
        },
    )


def _atomic_json(path: str, obj, *, indent=None) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=indent)
    os.replace(tmp, path)


def covered_chunks(index_dir: str) -> set[int]:
    """Staged chunks already folded into index segments. Read from
    stats.json (read by writers; independent of the _SUCCESS marker,
    which only describes the committed reader snapshot)."""
    p = os.path.join(index_dir, "stats.json")
    if not os.path.exists(p):
        return set()
    try:
        with open(p) as f:
            return set(json.load(f).get("covered_chunks", []))
    except Exception:
        return set()


@_single_writer
def merge_index(
    spark: SparkSession,
    index_dir: str,
    *,
    num_partitions: int | None = None,
    n_chunks: int | None = None,
    slice_bits: int | None = None,
) -> BuildResult:
    """Phase B COMPACTION: global stats, lexicon, postings from ALL staged
    chunks into a single segment (seg=0). Incremental updates can instead
    append a delta segment (``update_index(strategy='segment')``)."""
    t0 = time.time()
    timings: dict[str, float] = {}
    tp = time.time()
    P = num_partitions or spark.sparkContext.defaultParallelism
    staged = spark.read.parquet(os.path.join(index_dir, "staged"))
    # physical reclaim of deletes: tombstoned docs are excluded from the
    # rebuilt segment (posting bytes shrink), but the tombstone files carry
    # forward — the immutable staged chunks still hold the deleted rows, so
    # every future rebuild must keep filtering (see delete_docs)
    tomb_files: list[str] = []
    old_stats_path = os.path.join(index_dir, "stats.json")
    if os.path.exists(old_stats_path):
        try:
            with open(old_stats_path) as f:
                tomb_files = list(json.load(f).get("tombstone_files", []))
        except (OSError, ValueError):
            tomb_files = []
    if tomb_files:
        tomb = _tombstone_df(spark, index_dir, {"tombstone_files": tomb_files})
        staged = staged.join(F.broadcast(tomb), "doc_id", "left_anti")
    all_chunks = staged_chunks(spark, index_dir)
    if n_chunks is None:
        # keep the _SUCCESS marker truthful when invoked standalone (e.g.
        # after a streaming drain): count the actually-staged chunks
        n_chunks = len(all_chunks)

    stats_row = staged.agg(
        F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row.n_docs), float(stats_row.avgdl or 0.0)
    timings["stats"] = time.time() - tp

    # Right-size explicit shuffles from the just-measured stats — an
    # explicit repartition() is exempt from AQE coalescing. Partition count
    # scales with DATA (~1.5M pair rows ≈ 42 MB per pack partition), NOT
    # with the thread count: capping at P made each sort task hold
    # corpus/P rows, which went spill/GC-superlinear at 1M docs (measured:
    # postings phase 27 s at 270k docs → 358 s at 900k under a min(P, ...)
    # cap). Tiny corpora still floor at 4 partitions so a big session
    # doesn't pay P near-empty tasks per stage; excess partitions beyond
    # the thread count just queue as waves of right-sized tasks.
    est_pairs = max(1.0, n_docs * avgdl * 0.7)  # ≈ Σ distinct terms per doc
    P_pack = max(4, min(4096, int(est_pairs // 1_500_000) + 1))
    P_docs = max(1, min(2048, n_docs // 2_000_000 + 1))
    sb = slice_bits if slice_bits is not None else derive_slice_bits(n_docs)

    # compaction owns the whole table dirs: invalidate the completion marker
    # BEFORE gutting them — a crash mid-compaction must not leave a
    # complete=True _SUCCESS over cleared/partial tables. This is the ONLY
    # invalidation in the lifecycle: staging and segment append leave the
    # marker (and with it the old reader snapshot) intact.
    _invalidate_success(index_dir)
    for sub in ("postings", "docs", "lexicon", "_metrics"):
        _clear_dir(os.path.join(index_dir, sub))

    seg_stats = _build_segment(
        spark, staged, index_dir, 0, P_pack=P_pack, P_docs=P_docs,
        timings=timings, slice_bits=sb,
    )
    # a full compaction leaves exactly one segment, so the segment's observed
    # lexicon row count IS the global term count — no read-back job
    n_terms = seg_stats["n_terms"]
    wall = time.time() - t0

    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "k1": K1,
        "b": B,
        "slice_bits": sb,
        "block": BLOCK,
        "n_terms": int(n_terms),
        "n_posting_rows": seg_stats["rows"],
        "n_postings": seg_stats["postings"],
        "postings_per_sec": (seg_stats["postings"] / wall) if wall > 0 else 0.0,
        "skew_ratio": (
            seg_stats["max_p"] / seg_stats["avg_p"] if seg_stats["avg_p"] else 1.0
        ),
        "build_wall_s": wall,
        "phase_timings_s": {k: round(v, 3) for k, v in timings.items()},
        "covered_chunks": sorted(all_chunks),
        "tombstone_files": tomb_files,
        # compaction folds the deletes physically: the rebuilt lexicon is
        # computed over the survivors, so no delta segment remains live
        # (the cleared lexicon/ dir also reclaimed any orphan/superseded
        # delta dirs)
        "delete_segments": [],
    }
    _write_stats_and_success(
        index_dir, stats, n_chunks, segments=[0], covered_chunks=all_chunks
    )

    return BuildResult(
        index_dir=index_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_terms=int(n_terms),
        n_posting_rows=seg_stats["rows"],
        wall_s=wall,
        chunks_processed=0,
        chunks_skipped=0,
    )
