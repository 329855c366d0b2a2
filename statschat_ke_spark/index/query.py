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

import json
import math
import os
import threading
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from statschat_ke_spark.functions.hashing import xxhash64_str
from statschat_ke_spark.functions.tokenize import tokenize
from statschat_ke_spark.index.codec import BLOCK, decode_doc_ids, decode_tfs, vbyte_decode

K1 = 1.2
B = 0.75
LONG_MIN = -(2**63)

# Per-task cap on the batch path's shared decoded-block memo (docs_u +
# scores ≈ 16 B/posting). Sized so n_concurrent_tasks × cap fits a typical
# executor: 32 tasks × 256 MB = 8 GB. Past the cap blocks decode per use.
BATCH_DECODE_CACHE_BYTES = int(
    os.environ.get("STATSCHAT_BATCH_DECODE_CACHE_BYTES", 256 * 2**20)
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# exhaustive-scorer partial rows carry the term's query position so the
# per-doc fold can sum in canonical (query appearance) order
EXHAUSTIVE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("qpos", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def check_index_format(index_dir: str, marker: dict | None = None) -> dict:
    """Fail fast, with a clear message, before querying an index that is not
    a committed snapshot of the format this engine reads. Returns the parsed
    commit marker so callers get their whole snapshot (format, segment list,
    scoring globals) from ONE read.

    Three distinct failure shapes, all otherwise confusing at query time:
    an ABSENT ``_SUCCESS.json`` means the last build/append never committed
    (crash mid-build, or an ``ingest_stream(merge=False)`` drain awaiting its
    merge) — tables may be partially written; a TORN/CORRUPT marker (invalid
    JSON — e.g. written by a pre-atomic-rename engine on a crash) is reported
    the same way rather than escaping as a raw JSONDecodeError; a
    format-version MISMATCH means the posting/block layout on disk is not
    what this decoder assumes (e.g. a v1 index's baked tf-normalized block
    bounds would make v2's avgdl-free WAND pruning silently unsafe rather
    than loudly wrong)."""
    from statschat_ke_spark.index.build import INDEX_FORMAT

    if marker is None:
        p = os.path.join(index_dir, "_SUCCESS.json")
        try:
            with open(p) as f:
                marker = json.load(f)
        except (OSError, ValueError):
            marker = {}
    if not marker:
        raise RuntimeError(
            f"index at {index_dir!r} has no _SUCCESS.json commit marker "
            "(absent or torn) — the build was interrupted before commit or "
            "a streaming drain ran with merge=False; finish the build "
            "(merge_index / append_segment) before querying"
        )
    fmt = marker.get("format")
    if fmt != INDEX_FORMAT:
        raise RuntimeError(
            f"index at {index_dir!r} is format {fmt!r} but this engine reads "
            f"format {INDEX_FORMAT} — rebuild the index (build_index) or "
            "query with the matching engine version"
        )
    return marker


# Driver-side probe cache — the engine analog of the reference's
# ``lru_cache`` on make_query (cloud_llm.py:235, SURVEY §2.8 "query-result
# cache dict in the query driver"). Keyed by the index's commit version
# (the uuid in _SUCCESS.json — unique per _write_stats_and_success commit),
# NOT mtime: back-to-back segment appends can land within one mtime granule
# on coarse-timestamp filesystems and would leave stale df cached. Values:
# term_id → df (0 = probed and absent). Bounded by the number of distinct
# QUERIED terms, not the lexicon.
_PROBE_CACHE: dict[tuple[str, str], dict[int, int]] = {}


def _read_marker(index_dir: str) -> dict:
    """The _SUCCESS.json snapshot commit record ({} when absent/unreadable).
    One read serves both the version (probe-cache key) and the committed
    segment list (reader-side snapshot pruning) so the two can't disagree
    across a concurrent commit."""
    try:
        with open(os.path.join(index_dir, "_SUCCESS.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _index_version(index_dir: str, marker: dict | None = None) -> str:
    if marker is None:
        marker = _read_marker(index_dir)
    if not marker:
        return "<absent>"
    try:
        # per-commit uuid (format ≥ r3); fall back to mtime for older markers
        return str(
            marker.get("version")
            or os.path.getmtime(os.path.join(index_dir, "_SUCCESS.json"))
        )
    except OSError:
        return "<absent>"


def _prune_to_snapshot(df: DataFrame, marker: dict) -> DataFrame:
    """Restrict a segmented table scan (postings/lexicon/docs, partitioned by
    ``seg``) to the segments the commit marker lists.

    The table dirs are enumerated by file listing, so WITHOUT this filter a
    reader racing a concurrent ``append_segment`` would pick up a fully
    written ``seg=N`` whose commit (stats.json + _SUCCESS) hasn't landed —
    scoring uncommitted docs under the old global stats. ``seg`` is a
    partition column, so the isin() prunes at planning time (no extra job,
    no data read from uncommitted dirs) — the Iceberg snapshot-read analog."""
    segs = marker.get("segments")
    if segs is None:
        return df  # pre-segments marker: directory contents ARE the snapshot
    return df.filter(F.col("seg").isin([int(s) for s in segs]))


def _probe_dfs(
    spark: SparkSession, index_dir: str, ids: list[int], marker: dict | None = None
) -> dict[int, int]:
    """df per term_id (summed over the COMMITTED lexicon segments),
    probe-cached. The snapshot prune and the cache key come from one marker
    read — the CALLER's when provided (topk/topk_batch pass the marker their
    whole query runs against, so probed df can never describe a different
    commit than the postings scan) — so cached df always describes the keyed
    version."""
    if marker is None:
        marker = _read_marker(index_dir)
    key = (index_dir, _index_version(index_dir, marker))
    if key not in _PROBE_CACHE:
        # Evict superseded versions of THIS index_dir (a long-lived driver
        # running ingest_stream gets a fresh commit uuid per append, so
        # without eviction the cache grows one dead dict per append); keep
        # other dirs' live entries, with a global cap as a backstop.
        for stale in [k for k in _PROBE_CACHE if k[0] == index_dir]:
            del _PROBE_CACHE[stale]
        if len(_PROBE_CACHE) > 8:  # many distinct dirs — backstop
            _PROBE_CACHE.clear()
        _PROBE_CACHE[key] = {}
    cache = _PROBE_CACHE[key]
    missing = [i for i in ids if i not in cache]
    if missing:
        # Collect FIRST, commit to the cache only on success: pre-seeding
        # zeros before the Spark action would, on a transient probe failure,
        # leave df=0 cached for this index version and silently drop those
        # terms from every subsequent query's scoring.
        probed = {
            int(r.term_id): int(r.df)
            for r in (
                _prune_to_snapshot(
                    spark.read.parquet(os.path.join(index_dir, "lexicon")), marker
                )
                .filter(F.col("term_id").isin(missing))
                .groupBy("term_id")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
        }
        for i in missing:
            cache[i] = probed.get(i, 0)
    return {i: cache[i] for i in ids}


# Tombstone broadcast cache, keyed like the probe cache by (index_dir,
# commit version): the delete set is immutable per snapshot, so one driver
# read + one executor broadcast serves every query against that version.
# Values: (id(SparkContext), Broadcast[np.ndarray uint64 sorted] | None).
_TOMB_CACHE: dict = {}


def _load_tombstones_bc(spark: SparkSession, index_dir: str, marker: dict):
    """Broadcast of the snapshot's tombstoned doc_ids (sorted uint64), or
    None when the snapshot has no deletes. Files are driver-read with
    pyarrow (commit metadata, like lineage) — 8 bytes per lifetime-deleted
    doc — and shipped to executors once per (index version, SparkContext)."""
    files = marker.get("tombstone_files") or []
    if not files:
        return None
    key = (index_dir, _index_version(index_dir, marker))
    sc = spark.sparkContext
    hit = _TOMB_CACHE.get(key)
    if hit is not None and hit[0] == id(sc):
        return hit[1]
    import pyarrow.parquet as pq

    arrs = [
        pq.read_table(
            os.path.join(index_dir, "tombstones", f), columns=["doc_id"]
        )
        .column("doc_id")
        .to_numpy()
        .astype(np.int64)
        for f in files
    ]
    dead = np.unique(np.concatenate(arrs).view(np.uint64))  # sorted unsigned
    bc = sc.broadcast(dead)
    for stale in [k for k in _TOMB_CACHE if k[0] == index_dir and k != key]:
        sc_id, old_bc = _TOMB_CACHE.pop(stale)
        if old_bc is not None and sc_id == id(sc):
            try:
                # release executor/driver block-manager storage NOW — a
                # long-lived ingest+serve driver re-broadcasts per commit
                # version, and unreferenced broadcasts otherwise linger
                # until context teardown (non-blocking; in-flight tasks
                # holding .value are unaffected)
                old_bc.unpersist(blocking=False)
            except Exception:
                pass  # stopped context / already destroyed
    _TOMB_CACHE[key] = (id(sc), bc)
    return bc


def _mask_alive(docs_u: np.ndarray, dead: np.ndarray | None):
    """Boolean keep-mask over unsigned doc ids vs the sorted tombstone set,
    or None when nothing is masked (fast path)."""
    if dead is None or not len(docs_u):
        return None
    pos = np.searchsorted(dead, docs_u)
    hit = (pos < len(dead)) & (dead[np.minimum(pos, len(dead) - 1)] == docs_u)
    if not hit.any():
        return None
    return ~hit


def _snapshot_stats(index_dir: str, marker: dict) -> dict:
    """Scoring globals (n_docs, avgdl) for the snapshot ``marker`` commits.

    Read from the marker itself when present (format ≥ r4 embeds them at
    commit, so one marker read yields a CONSISTENT (segments, n_docs, avgdl)
    triple); fall back to stats.json for older markers — there the two files
    are separate renames and a racing commit can tear them, which is exactly
    why the embed exists."""
    s = marker.get("stats")
    if s and "n_docs" in s and "avgdl" in s:
        return s
    return load_stats(index_dir)


def _query_terms(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    marker: dict,
    n_docs: int,
) -> dict[int, dict]:
    """Driver-side lexicon probe: term_id → {idf, df}.

    The lexicon is segmented (one subdir per incremental segment); global df
    is the SUM over segments, aggregated on the term_id-pruned probe
    (≤ |q| × n_segments rows — trivial) and probe-cached across queries.
    ``marker``/``n_docs`` come from the caller's single snapshot read so idf
    is computed against the same commit the postings scan is pruned to."""
    terms = list(dict.fromkeys(tokenize(query_text)))
    if not terms:
        return {}
    ids = [xxhash64_str(t) for t in terms]
    out = {}
    for tid, df in _probe_dfs(spark, index_dir, ids, marker).items():
        if df > 0:
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            out[tid] = {"idf": idf, "df": df}
    return out


def _empty_result(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


# Observability for the auto-mode decision (the result schema is contract-
# fixed, so the chosen mode can't ride in the DataFrame): updated on every
# topk() call with the resolved mode, the query's Σdf and the threshold used.
# THREAD-LOCAL under the hood: the threaded WSGI server runs queries
# concurrently, and a plain module dict would report another request's
# mode/Σdf to whichever thread read it next.
class _QueryInfo(threading.local):
    def __init__(self):
        self.data: dict = {}

    def update(self, **kw) -> None:
        self.data.update(kw)

    def __getitem__(self, k):
        return self.data[k]

    def get(self, k, default=None):
        return self.data.get(k, default)

    def __contains__(self, k) -> bool:
        return k in self.data

    def __repr__(self) -> str:
        return repr(self.data)


LAST_QUERY_INFO = _QueryInfo()


def wand_group_count(total_df: int, parallelism: int) -> int:
    """Adaptive slice-coarsening group count (see topk's wand branch).
    Single source of truth — topk, topk_batch, and the decoded-fraction
    instrumentation (scripts/bench_large.py) must group identically, or the
    instrumentation measures a grouping production never runs."""
    return int(max(1, min(4 * parallelism, (total_df // BLOCK) // 512 + 1)))


# Corpus size at which per-query cost stops being dominated by fixed Spark
# stage overhead and starts being dominated by posting decode volume —
# the boundary between the two auto_mode_threshold regimes below. Sits
# between the 270k corpus (exhaustive measured faster on every query shape)
# and the 900k corpus (WAND measured faster on every query shape); the
# measured curves are monotone on each side, so any cut between them is
# behavior-identical at the measured points.
STAGE_OVERHEAD_DOCS = 512_000


def auto_mode_threshold(n_docs: int) -> int:
    """Σdf crossover between exhaustive and WAND, re-derived (round 5) from
    the three-point BENCH_LARGE curve at 270k / 900k / 3.24M docs.

    Two measured regimes, not one ratio:

    - Small corpus (stage-overhead regime, n_docs < STAGE_OVERHEAD_DOCS):
      per-query wall is ~1 s of fixed Spark stage overhead; WAND's metadata
      machinery (interval sweep + per-group θ warm-up of ~k decoded blocks)
      is a visible fraction of that, so exhaustive's single streaming decode
      wins unless posting volume is huge. Measured crossover on the
      270k-doc corpus: Σdf ≈ 2M ≈ 8×n_docs (BENCH_LARGE, round 2) — the
      8×n_docs rule, kept verbatim for this regime.

    - Large corpus (decode-volume regime): at 900k and 3.24M docs WAND
      measured faster on EVERY query shape — standard 4-term 1.12 vs
      1.22 s/q and 1.00 vs 1.11, selective 0.91 vs 1.23 and 1.09 vs 1.79,
      and even all-common queries (99.7% blocks decoded) — because its
      per-slice local top-k avoids the exhaustive scorer's global doc-id
      shuffle, whose cost grows with candidate count (BENCH_LARGE_1M/3M6,
      round 4). The round-2 8×n_docs rule, derived at 270k, mis-routed
      those shapes to exhaustive; here only the tiny-volume floor remains.

    The 64×BLOCK floor keeps single-block queries (and tiny test corpora)
    out of WAND's group machinery in both regimes. The resolved decision is
    recorded per query in LAST_QUERY_INFO; ``auto_threshold`` overrides.
    """
    if n_docs < STAGE_OVERHEAD_DOCS:
        return max(64 * BLOCK, 8 * n_docs)
    return 64 * BLOCK


def topk(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int = 10,
    *,
    mode: str = "auto",
    auto_threshold: int | None = None,
    with_url: bool = False,
) -> DataFrame:
    """Top-k (doc_id, score[, url, rank]) for a free-text query.

    ``mode``: ``wand`` (block-max skipping), ``exhaustive`` (decode
    everything), or ``auto`` — picks exhaustive when the query's Σdf (known
    from the lexicon probe, no extra job) is below ``auto_threshold``
    (default: derived from the corpus size — see ``auto_mode_threshold``),
    wand when posting volume is what dominates. Both modes are
    rank-identical (property-tested). The resolved mode is recorded in
    ``LAST_QUERY_INFO`` for observability.
    """
    # ONE snapshot read serves the whole query: format check, segment
    # pruning, n_docs (idf + auto threshold) and avgdl all come from the
    # same commit marker, so an append landing mid-query can't mix one
    # snapshot's postings with another's scoring globals.
    marker = check_index_format(index_dir)
    stats = _snapshot_stats(index_dir, marker)
    n_docs = int(stats["n_docs"])
    terminfo = _query_terms(spark, index_dir, query_text, marker, n_docs)
    if not terminfo:
        res = _empty_result(spark)
        LAST_QUERY_INFO.update(mode="empty", total_df=0, threshold=None)
    else:
        total_df = sum(v["df"] for v in terminfo.values())
        if mode == "auto":
            if auto_threshold is None:
                auto_threshold = auto_mode_threshold(n_docs)
            mode = "exhaustive" if total_df < auto_threshold else "wand"
        LAST_QUERY_INFO.update(mode=mode, total_df=total_df, threshold=auto_threshold)
        ids = list(terminfo.keys())
        avgdl = float(stats["avgdl"])
        pst = (
            _prune_to_snapshot(
                spark.read.parquet(os.path.join(index_dir, "postings")), marker
            )
            .filter(F.col("term_id").isin(ids))
            .select("seg", "term_id", "slice", "block_id", "n", "doc_ids", "tfs",
                    "dls", "block_max_tf", "block_min_dl", "first_doc", "last_doc")
        )
        idf_map = {t: v["idf"] for t, v in terminfo.items()}
        dead_bc = _load_tombstones_bc(spark, index_dir, marker)
        if mode == "exhaustive":
            scored = pst.mapInPandas(
                _exhaustive_scorer(idf_map, avgdl, dead_bc), EXHAUSTIVE_SCHEMA
            )
            # canonical-order per-doc sum (see _wand_slice bit-reproducibility
            # note): a doc has ≤|q| partial rows, one per query term; fold
            # them sorted by query position so the float summation order is a
            # pure function of (index, query) — F.sum's accumulation order
            # follows shuffle arrival and varies with parallelism, which can
            # swap exact-tie ranks across cluster sizes.
            res = scored.groupBy("doc_id").agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("qpos", "score"))),
                    F.lit(0.0),
                    lambda a, x: a + x["score"],
                ).alias("score")
            )
        elif mode == "wand":
            # Adaptive slice coarsening: every WAND group pays ~k decoded
            # blocks before its local θ converges, so 64 fine slices × k
            # forfeit most pruning when posting volume is modest. Estimated
            # block count (Σdf from the lexicon probe — no extra job) sizes
            # the group count: few groups (global-ish θ, max pruning) for
            # small volume, up to 4×parallelism for big scans. Doc ranges of
            # distinct slices are disjoint, so ANY slice partition keeps
            # per-group local top-k + global TakeOrdered exact.
            par = spark.sparkContext.defaultParallelism
            n_groups = wand_group_count(total_df, par)
            grouped = pst.withColumn("wg", F.pmod(F.col("slice"), F.lit(n_groups)))
            res = grouped.groupBy("seg", "wg").applyInPandas(
                _wand_slice(idf_map, avgdl, k, dead_bc), RESULT_SCHEMA
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
        docs = _prune_to_snapshot(
            spark.read.parquet(os.path.join(index_dir, "docs")), marker
        ).select("doc_id", "url")
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
    *,
    n_qb: int | None = None,
    n_groups: int | None = None,
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
    # ONE snapshot read for the whole batch (see topk): format check,
    # segment pruning and scoring globals from the same commit marker.
    marker = check_index_format(index_dir)
    # ONE lexicon probe for the union of every query's terms
    terms_by_q = {
        qid: list(dict.fromkeys(tokenize(qtext))) for qid, qtext in queries.items()
    }
    ids_by_q = {
        qid: [xxhash64_str(t) for t in ts] for qid, ts in terms_by_q.items()
    }
    union_ids = sorted({t for ids in ids_by_q.values() for t in ids})
    stats = _snapshot_stats(index_dir, marker)
    avgdl = float(stats["avgdl"])
    n = int(stats["n_docs"])
    lex = {}
    if union_ids:
        for tid, df in _probe_dfs(spark, index_dir, union_ids, marker).items():
            if df > 0:
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                lex[tid] = {"idf": idf, "df": df}
    per_q: dict[int, dict[int, dict]] = {
        qid: {t: lex[t] for t in ids if t in lex} for qid, ids in ids_by_q.items()
    }
    all_ids = sorted({t for ti in per_q.values() for t in ti})
    if not all_ids:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    idf_by_q = {q: {t: v["idf"] for t, v in ti.items()} for q, ti in per_q.items()}
    pst = (
        _prune_to_snapshot(
            spark.read.parquet(os.path.join(index_dir, "postings")), marker
        )
        .filter(F.col("term_id").isin(all_ids))
        .select("seg", "term_id", "slice", "block_id", "n", "doc_ids", "tfs",
                "dls", "block_max_tf", "block_min_dl", "first_doc", "last_doc")
    )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )

    from pyspark.sql import Window as W

    # same adaptive coarsening as topk (see there): group count sized from
    # the union Σdf so per-group θ converges with little decode overhead.
    # ``n_groups`` pins the count explicitly — the adaptive default couples
    # the JOB SHAPE to defaultParallelism (more groups = more per-group θ
    # warm-up decode), so an N-vs-4N scaling measurement must pin it to run
    # the identical job at both levels and vary only concurrency
    # (scripts/bench_query_scaling.py does; same rule as the build bench's
    # identical partition counts).
    total_df = sum(lex[t]["df"] for t in all_ids)
    par = spark.sparkContext.defaultParallelism
    if n_groups is None:
        n_groups = wand_group_count(total_df, par)
    else:
        n_groups = int(max(1, n_groups))
    # Query-dimension parallelism: slice groups alone bound the task count
    # at n_seg * n_groups, so a 10^4-question golden set would run its WAND
    # invocations sequentially inside each group (the tail the verdict
    # flagged). Split queries into n_qb buckets and replicate each postings
    # row ONLY to buckets whose queries reference its term (broadcast join
    # on a (term_id, qb) relation of Σ|q| rows): per-term duplication is
    # min(n_qb, #queries containing it), and hot shared terms — the
    # expensive rows — are exactly the ones worth replicating. n_qb is
    # sized so seg*wg*qb tasks roughly fill the cluster and stays 1 for
    # single-query-scale batches (no plan change, no extra shuffle bytes).
    # ``n_qb`` may be forced by the caller (rank-identity tests exercise
    # bucket counts > 1 regardless of parallelism).
    if n_qb is None:
        n_qb = int(max(1, min(len(idf_by_q), -(-par // n_groups))))
    else:
        n_qb = int(max(1, min(len(idf_by_q), n_qb)))

    idf_all = {t: v["idf"] for t, v in lex.items()}
    dead_bc = _load_tombstones_bc(spark, index_dir, marker)

    def run_slice(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qb = int(key[2])
        dead = dead_bc.value if dead_bc is not None else None
        outs = []
        # Build each term's block structure ONCE per group and share it —
        # including its memoized decoded blocks — across every query in the
        # bucket (idf is per-term global, so the structure is query-
        # independent). Batch queries overlap heavily in vocabulary; the
        # per-query rebuild this replaces re-sliced the metadata frame and
        # re-decoded the same hot blocks B times per group and was ~6x of
        # the batch stage's wall at 64 queries. Per query, terms are picked
        # from the cache in the query's canonical term order.
        #
        # The shared decode memo is budget-capped: structures live for the
        # WHOLE group, so an uncapped memo's peak would be the union of
        # every query's decoded blocks (vs one query's before sharing) —
        # an executor-OOM risk on large slice groups. Hot cross-query
        # blocks fill the cap first; past it, blocks decode per use.
        budget = {"left": BATCH_DECODE_CACHE_BYTES}
        tb_cache = {
            int(t): _TermBlocks(idf_all[int(t)], g, avgdl, budget)
            for t, g in pdf.groupby("term_id", sort=False)
        }
        for qid, idf_map in idf_by_q.items():
            if qid % n_qb != qb:
                continue
            terms = [tb_cache[t] for t in idf_map if t in tb_cache]
            if not terms:
                continue
            res = _wand_terms_topk(terms, k, dead)
            if len(res):
                res.insert(0, "query_id", np.int64(qid))
                outs.append(res)
        if not outs:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.concat(outs, ignore_index=True)

    grouped = pst.withColumn("wg", F.pmod(F.col("slice"), F.lit(n_groups)))
    if n_qb > 1:
        tb_rows = sorted(
            {
                (t, qid % n_qb)
                for qid, ids in ids_by_q.items()
                for t in ids
                if t in lex
            }
        )
        term_buckets = spark.createDataFrame(tb_rows, "term_id long, qb int")
        grouped = grouped.join(F.broadcast(term_buckets), "term_id")
    else:
        grouped = grouped.withColumn("qb", F.lit(0))
    scored = grouped.groupBy("seg", "wg", "qb").applyInPandas(run_slice, schema)
    w = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id").bitwiseXOR(F.lit(LONG_MIN)).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _exhaustive_scorer(idf_map: dict[int, float], avgdl: float, dead_bc=None):
    qpos_map = {t: i for i, t in enumerate(idf_map)}  # query appearance order

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dead = dead_bc.value if dead_bc is not None else None
        for pdf in batches:
            if not len(pdf):
                continue
            # Whole-batch concatenated decode — no per-block Python loop.
            # Each column's buffers are byte-concatenable: vbyte values are
            # self-terminating, so one decode over the joined buffer yields
            # the flat value stream; `n` (docs per block) segments it.
            n = pdf["n"].to_numpy().astype(np.int64)
            gaps = vbyte_decode(b"".join(pdf["doc_ids"]))
            tfs = (vbyte_decode(b"".join(pdf["tfs"])) + np.uint64(1)).astype(
                np.float64
            )
            dls = vbyte_decode(b"".join(pdf["dls"])).astype(np.float64)
            # segmented cumsum restores absolute doc ids: each block's gap
            # stream starts with an absolute id, so subtract the running
            # total carried in from the previous blocks of the batch
            g = np.cumsum(gaps, dtype=np.uint64)
            ends = np.cumsum(n)
            prev = np.zeros(len(pdf), dtype=np.uint64)
            prev[1:] = g[ends[:-1] - 1]
            ids = g - np.repeat(prev, n)
            w = np.repeat(
                pdf["term_id"].map(idf_map).to_numpy(dtype=np.float64), n
            )
            qpos = np.repeat(
                pdf["term_id"].map(qpos_map).to_numpy(dtype=np.int32), n
            )
            partial = w * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
            keep = _mask_alive(ids, dead)  # tombstoned docs never emit rows
            if keep is not None:
                ids, qpos, partial = ids[keep], qpos[keep], partial[keep]
            yield pd.DataFrame(
                {"doc_id": ids.view(np.int64), "qpos": qpos, "score": partial}
            )

    return score


class _TermBlocks:
    """One query term's blocks within a slice: block-range metadata as numpy
    arrays (first/last doc in unsigned order, block-max score) plus lazy
    memoized decode+score of whole blocks — never per-doc Python.

    ``budget`` (optional, SHARED across all of a group's terms): a mutable
    ``{"left": bytes}`` cap on total memoized decode output. The batch path
    keeps every term's structure alive for the whole group, so without a cap
    peak task memory is the union of every query's decoded blocks (~16
    B/posting) instead of one query's. Once the budget is spent, further
    blocks are decoded per use but NOT retained — the hot blocks (touched
    first, by the highest-upper-bound intervals, and shared across queries)
    occupy the cache; cold-tail blocks cost a re-decode, never memory."""

    __slots__ = (
        "idf", "firsts_u", "lasts_u", "bms", "_raw", "_avgdl", "_cache", "_budget"
    )

    def __init__(
        self, idf: float, g: pd.DataFrame, avgdl: float, budget: dict | None = None
    ):
        self.idf = idf
        # a group may span several slices; slices are doc-range-contiguous
        # (slice = top bits of doc_u), so (slice, block_id) order IS global
        # doc order for this term
        g = g.sort_values(["slice", "block_id"])
        self.firsts_u = g["first_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        self.lasts_u = g["last_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        # avgdl-free stored bounds → block-max score under the CURRENT
        # global avgdl: tfn is increasing in tf, decreasing in dl, so
        # tfn(max_tf, min_dl) dominates every doc in the block
        btf = g["block_max_tf"].to_numpy(dtype=np.float64)
        bdl = g["block_min_dl"].to_numpy(dtype=np.float64)
        self.bms = idf * btf * (K1 + 1.0) / (
            btf + K1 * (1.0 - B + B * bdl / avgdl)
        )
        self._raw = list(zip(g["doc_ids"].tolist(), g["tfs"].tolist(), g["dls"].tolist()))
        self._avgdl = avgdl
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._budget = budget

    def partials(self, j: int) -> tuple[np.ndarray, np.ndarray]:
        """(docs_u, bm25_partial) for block j — vectorized, decoded once."""
        hit = self._cache.get(j)
        if hit is not None:
            return hit
        raw_ids, raw_tfs, raw_dls = self._raw[j]
        docs_u = decode_doc_ids(raw_ids)
        tfs = decode_tfs(raw_tfs).astype(np.float64)
        dls = vbyte_decode(raw_dls).astype(np.float64)
        scores = self.idf * tfs * (K1 + 1.0) / (
            tfs + K1 * (1.0 - B + B * dls / self._avgdl)
        )
        if self._budget is None:
            self._cache[j] = (docs_u, scores)
        else:
            nbytes = docs_u.nbytes + scores.nbytes
            if self._budget["left"] >= nbytes:
                self._budget["left"] -= nbytes
                self._cache[j] = (docs_u, scores)
        return docs_u, scores

    def covering_block(self, lo_u: np.uint64) -> int:
        """Index of the block whose range contains lo_u, or -1."""
        j = int(np.searchsorted(self.firsts_u, lo_u, side="right")) - 1
        if j >= 0 and self.lasts_u[j] >= lo_u:
            return j
        return -1


def _wand_slice(idf_map: dict[int, float], avgdl: float, k: int, dead_bc=None):
    """Per-slice block-max WAND, vectorized block-at-a-time.

    Two-level evaluation (the SURVEY §2.9 design): level 1 works ONLY on
    block metadata — the union of all terms' block boundaries partitions the
    slice's doc range into intervals, and one vectorized sweep (add.at +
    cumsum) yields each interval's upper bound Σ_t blockmax_t. Level 2
    decodes and scores whole surviving blocks vectorized (BM25 over the full
    block in one numpy expression, memoized), gathers the interval's rows
    from each covering block by searchsorted, and aggregates per-doc scores
    with sort+reduceat. Intervals whose upper bound is strictly below the
    running top-k threshold are skipped without decoding — block-max WAND's
    pruning with no per-document Python anywhere.

    Exactness: θ only grows, so a skipped doc has true score ≤ UB < θ ≤ final
    θ and can never displace the kth result even via the doc_id tie-break
    (strict inequality); intervals with UB == θ are processed. Because the
    interval bounds come out of a float sweep+cumsum, every θ-comparison
    uses a conservative error margin (``eps`` below) so rounding can never
    turn that exact-arithmetic argument into a false skip — found the hard
    way by an exact-tie at rank k whose interval bound landed 1 ulp low.

    Bit-reproducibility: every emitted per-doc score is the sum of its
    per-term partials in CANONICAL order — the query's distinct-term
    appearance order (``idf_map`` insertion order, the same order the numpy
    oracle accumulates) as a strict left-to-right fold — NEVER the
    essential/non-essential split order (varies with θ and therefore with
    slice grouping) and never ``np.add.reduceat`` (numpy reduce associates
    pairwise, so even a correctly-ordered array sums to a different last
    ulp than the sequential fold). Float addition is not associative in
    the last ulp, so without a canonical order two near-tied docs could
    swap ranks when ``n_groups`` (or the cluster size driving the adaptive
    default) changes — caught by exactly such a swap at a pinned group
    count. The split still drives candidate generation and pruning; only
    the final summation is order-pinned.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # Term processing order = idf_map insertion order (query appearance
        # order — matches the oracle's accumulation order), NOT Spark's
        # nondeterministic partition read order and NOT term_id order.
        by_tid = {int(t): g for t, g in pdf.groupby("term_id", sort=False)}
        terms: list[_TermBlocks] = [
            _TermBlocks(idf_map[t], by_tid[t], avgdl)
            for t in idf_map
            if t in by_tid
        ]
        dead = dead_bc.value if dead_bc is not None else None
        return _wand_terms_topk(terms, k, dead)

    return run


def _wand_terms_topk(
    terms: list["_TermBlocks"], k: int, dead: "np.ndarray | None" = None
) -> pd.DataFrame:
    """Block-max WAND top-k over prebuilt per-term block structures.

    Split out of ``_wand_slice`` so batch retrieval can build each term's
    ``_TermBlocks`` ONCE per slice group and share it (with its memoized
    decoded blocks) across every query in the batch that references the
    term — queries in a batch overlap heavily in vocabulary, and without
    sharing, each of B queries re-sliced the metadata frame and re-decoded
    the same hot blocks (measured ~6x of the batch stage's wall at 64
    queries). ``terms`` must be in the query's canonical term order.
    """
    if not terms:
        return pd.DataFrame(
            {"doc_id": np.empty(0, dtype=np.int64),
             "score": np.empty(0, dtype=np.float64)}
        )
    # ---- level 1: interval upper bounds from block metadata only ----
    all_firsts = np.concatenate([t.firsts_u for t in terms])
    all_lasts = np.concatenate([t.lasts_u for t in terms])
    all_bms = np.concatenate([t.bms for t in terms])
    open_end = all_lasts == np.uint64(0xFFFFFFFFFFFFFFFF)  # +1 would wrap
    bounds = np.unique(np.concatenate([all_firsts, all_lasts[~open_end] + np.uint64(1)]))
    ub = np.zeros(len(bounds), dtype=np.float64)
    np.add.at(ub, np.searchsorted(bounds, all_firsts), all_bms)
    closes = np.searchsorted(bounds, all_lasts[~open_end] + np.uint64(1))
    np.subtract.at(ub, closes[closes < len(bounds)], all_bms[~open_end][closes < len(bounds)])
    ub = np.cumsum(ub)
    # Float-safety margin for every θ-comparison below. The sweep +
    # cumsum accumulates rounding error ∝ len(bounds)·eps·max|prefix|,
    # which can push an interval's bound a few ulp BELOW the true
    # Σ block-max; a doc whose true score EQUALS θ must still be decoded
    # (it can win the kth slot via the unsigned-doc_id tie-break), so a
    # bound-vs-θ skip that is exact-arithmetic-safe needs headroom for
    # that error. False keeps only cost a few extra block decodes.
    eps = (len(bounds) + len(all_bms)) * np.finfo(np.float64).eps * (
        float(np.max(np.abs(ub))) if len(ub) else 0.0
    )

    # ---- level 2: decode + score surviving intervals, vectorized ----
    top_docs = np.empty(0, dtype=np.uint64)
    top_scores = np.empty(0, dtype=np.float64)
    theta = -math.inf

    # Process intervals in DESCENDING upper-bound order: θ reaches its
    # final value after ~k high-bound intervals, and the first interval
    # with ub < θ ends the loop (argsort is desc, so every later one is
    # smaller too). Exactness is order-independent — a skipped interval
    # has every true score ≤ ub < θ ≤ θ_final, strictly below the kth
    # result even under the doc_id tie-break.
    #
    # Inside a surviving interval, the WAND essential/non-essential
    # split: sort covering blocks by block-max ascending and cut off the
    # largest prefix N with Σ_N bm < θ — a doc containing ONLY N-terms
    # cannot reach θ, so candidates are gathered (and decoded) from the
    # essential terms alone. Non-essential blocks are decoded lazily,
    # only when a candidate's optimistic bound (essential partials +
    # Σ_N bm) still clears θ. A sparse term's block spanning a huge doc
    # range therefore no longer forces decoding every dense block it
    # overlaps — dense-term decode cost is ∝ candidates, not range.
    for i in np.argsort(-ub, kind="stable"):
        if ub[i] < theta - eps:
            break
        lo = bounds[i]
        hi = bounds[i + 1] if i + 1 < len(bounds) else None  # None = +inf
        # cov stays in canonical (terms-list) order; the essential/
        # non-essential split is computed over a bm-sorted VIEW so the
        # summation order below never depends on θ
        cov: list[tuple[_TermBlocks, int, float]] = []
        for t in terms:
            j = t.covering_block(lo)
            if j >= 0:
                cov.append((t, j, float(t.bms[j])))
        if not cov:
            continue
        if theta == -math.inf or len(cov) == 1:
            ness_i: set[int] = set()
            nbm = 0.0
        else:
            by_bm = sorted(range(len(cov)), key=lambda i: cov[i][2])
            acc = 0.0
            ness_i = set()
            for i_c in by_bm:
                bm_c = cov[i_c][2]
                if acc + bm_c < theta - eps:
                    acc += bm_c
                    ness_i.add(i_c)
                else:
                    break
            nbm = acc
        ess = [cov[i_c] for i_c in range(len(cov)) if i_c not in ness_i]
        cand_docs, cand_scores = [], []
        for t, j, _bm in ess:
            docs_u, scores = t.partials(j)
            a = int(np.searchsorted(docs_u, lo))
            b = int(np.searchsorted(docs_u, hi)) if hi is not None else len(docs_u)
            if a < b:
                cand_docs.append(docs_u[a:b])
                cand_scores.append(scores[a:b])
        if not cand_docs:
            continue
        d = np.concatenate(cand_docs)
        s_est = np.concatenate(cand_scores)
        if len(cand_docs) > 1:
            order = np.argsort(d, kind="stable")
            d, s_est = d[order], s_est[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            d = d[starts]
            # reduceat is an ESTIMATE only: numpy reduce uses pairwise
            # association, so its float result depends on how partials
            # happen to group — never emit it as a score
            s_est = np.add.reduceat(s_est, starts)
        # tombstoned docs leave candidacy HERE, before the θ filter and the
        # canonical scoring: θ is then built from live docs only, so a dead
        # doc can neither rank nor displace — exactly the index built
        # without it (block-max bounds still include dead docs, which only
        # makes pruning conservative, never wrong)
        alive = _mask_alive(d, dead)
        if alive is not None:
            d, s_est = d[alive], s_est[alive]
            if not len(d):
                continue
        if ness_i:
            # keep candidates whose optimistic bound clears θ. Margin:
            # eps (metadata-sweep error) + a reorder term — the estimate
            # sums in pairwise order while the final score sums
            # sequentially, and reorder error is ≤ n·ulp·Σ|partials|.
            opt = s_est + nbm
            keep = opt >= theta - eps - len(cov) * np.finfo(np.float64).eps * np.abs(opt)
            if not keep.any():
                continue
            d = d[keep]
        # canonical score: strict left-to-right fold over ALL covering
        # terms in terms-list (query appearance) order — the oracle's
        # accumulation order. Adding 0.0 for a term not containing the
        # doc is exact, so this equals the oracle's skip-absent-terms
        # accumulation; non-essential blocks decode lazily, only here.
        s = np.zeros(len(d), dtype=np.float64)
        for t, j, _bm in cov:
            docs_u, scores = t.partials(j)
            pos = np.minimum(np.searchsorted(docs_u, d), len(docs_u) - 1)
            s = s + np.where(docs_u[pos] == d, scores[pos], 0.0)
        # merge into running top-k: (-score, doc_u) lexicographic
        md = np.concatenate([top_docs, d])
        ms = np.concatenate([top_scores, s])
        sel = np.lexsort((md, -ms))[:k]
        top_docs, top_scores = md[sel], ms[sel]
        if len(top_docs) >= k:
            theta = top_scores[-1]

    order = np.lexsort((top_docs, -top_scores))
    return pd.DataFrame(
        {
            "doc_id": top_docs[order].view(np.int64),
            "score": top_scores[order],
        }
    )

