"""Deduplication operators for web-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a documents
DataFrame. All hash math is deterministic (fixed seeds); the heavy paths are
JVM-side column expressions or Arrow-vectorized numpy — no per-row Python.

Scale shape: candidate generation is always a *bucket equi-join* (band hash /
simhash chunk), never an all-pairs comparison; verification runs only within
buckets. At 10^12 docs the band join is the only shuffle and it is uniform by
construction (hashes), so no salting is needed; oversized buckets (boilerplate
cluster pathology) are capped and reported rather than exploded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

MERSENNE = (1 << 61) - 1
SHINGLE_K = 5  # words per shingle


def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


_P = np.uint64(MERSENNE)
_M32 = np.uint64(0xFFFFFFFF)
_M29 = np.uint64((1 << 29) - 1)


def _fold_mod_p(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for uint64 arrays, branch-free Mersenne fold."""
    r = (x & _P) + (x >> np.uint64(61))
    r = (r & _P) + (r >> np.uint64(61))
    return np.where(r >= _P, r - _P, r)


def _mulmod_p(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a*x) mod (2^61-1), fully vectorized in uint64 (no object math).

    Both operands must already be < 2^61. Splits each into 32-bit halves and
    reduces the 2^64/2^61 carries with the Mersenne identities 2^61 ≡ 1,
    2^64 ≡ 8 (mod p). Every intermediate fits in uint64.
    """
    ah, al = a >> np.uint64(32), a & _M32   # ah < 2^29
    xh, xl = x >> np.uint64(32), x & _M32   # xh < 2^29
    t1 = _fold_mod_p(ah * xh * np.uint64(8))          # ah*xh*2^64 ≡ ah*xh*8
    mid = _fold_mod_p(ah * xl + al * xh)              # < 2^62 before fold
    mh, ml = mid >> np.uint64(29), mid & _M29         # mid*2^32 = mh*2^61+ml*2^32
    t2 = _fold_mod_p(mh + (ml << np.uint64(32)))
    t3 = _fold_mod_p(al * xl)
    return _fold_mod_p(t1 + t2 + t3)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the smallest id per distinct text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingles(text: F.Column, k: int = SHINGLE_K) -> F.Column:
    """Word k-shingles hashed to int64 — pure JVM-side expression:
    tokenize → sliding window via transform(sequence) → xxhash64."""
    toks = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != "")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.when(n < k, F.array(F.xxhash64(F.array_join(toks, " ")))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i, k), " ")))
        )
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    seed: int = 42,
) -> DataFrame:
    """(id, shingles, sig: array<long>[num_hashes]) — numpy-vectorized.

    h_j(x) = (a_j * x + b_j) mod 2^61-1 over the shingle hash set; the
    signature is the per-j minimum.
    """
    a, b = _minhash_params(num_hashes, seed)
    a_u = a.astype(np.uint64)[:, None]  # < p already
    b_u = b.astype(np.uint64)[:, None]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(sh: pd.Series) -> pd.Series:
        # Flat-batch layout: concatenate every doc's shingles, compute all
        # num_hashes permutations over the flat array in uint64 Mersenne
        # arithmetic (semantics identical to exact python-int (a*x+b) mod p —
        # asserted in tests), then segmented min per doc. Chunked so the
        # (H, N) work matrix stays ~128 MB.
        lens = np.array([0 if arr is None else len(arr) for arr in sh], dtype=np.int64)
        out: list[list[int] | None] = [None] * len(sh)
        empty = [0] * num_hashes
        nz = np.flatnonzero(lens)
        if len(nz) == 0:
            return pd.Series([empty] * len(sh))
        max_chunk_vals = max(1, (128 << 20) // (8 * num_hashes))
        start = 0
        while start < len(nz):
            end = start
            tot = 0
            while end < len(nz) and (tot == 0 or tot + lens[nz[end]] <= max_chunk_vals):
                tot += lens[nz[end]]
                end += 1
            idxs = nz[start:end]
            flat = np.concatenate(
                [np.asarray(sh.iloc[i], dtype=np.int64) for i in idxs]
            )
            x_u = flat.view(np.uint64)
            x_m = _fold_mod_p(x_u)
            # signed semantics: x<0 ⇒ x ≡ x_u - 2^64 ⇒ subtract 8 (mod p)
            neg = flat < 0
            if neg.any():
                x_m = np.where(neg, (x_m + _P - np.uint64(8)) % _P, x_m)
            vals = _fold_mod_p(_mulmod_p(a_u, x_m[None, :]) + b_u)  # (H, N)
            seg = np.concatenate([[0], np.cumsum(lens[idxs])[:-1]])
            mins = np.minimum.reduceat(vals, seg, axis=1)  # (H, n_docs)
            for j, i in enumerate(idxs):
                out[i] = [int(v) for v in mins[:, j]]
            start = end
        for i in range(len(sh)):
            if out[i] is None:
                out[i] = empty
        return pd.Series(out)

    with_sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col)).alias("sh")
    )
    return with_sh.withColumn("sig", sig_udf(F.col("sh")))


def minhash_lsh_pairs(
    sigs: DataFrame,
    *,
    bands: int = 16,
    min_jaccard: float = 0.7,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified by exact shingle Jaccard.

    rows_per_band = num_hashes // bands. Bucket join is an equi self-join on
    (band, band_hash); buckets larger than ``max_bucket`` are dropped
    (boilerplate pathology guard — counted, not silently) by a size filter.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = (F.size("sig") / bands).cast("int")
    banded = sigs.select(
        "id",
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), bnd * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bh"),
    )
    # bucket-size guard (boilerplate clusters would otherwise explode the
    # join): count per bucket with map-side partial agg, keep only the
    # oversized buckets (few by construction) and broadcast-anti-join them
    # away — no window, so no single-reducer funnel for a hot bucket.
    oversized = (
        banded.groupBy("band", "bh")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
        .select("band", "bh")
    )
    sized = banded.join(F.broadcast(oversized), ["band", "bh"], "left_anti")

    # KEY-ONLY candidate generation: the band self-join and the pair-dedup
    # shuffle carry nothing but (band, bh, id) — 16 B/row. A doc's shingle
    # set (KBs for a web page) would otherwise be replicated bands× through
    # the join and ride every candidate row until dropDuplicates; at corpus
    # scale that is shuffle-bytes ∝ bands × total shingle volume instead of
    # ∝ candidate count (same ~200× reduction measured for the identical fix
    # in similarity.py embedding_near_dup_pairs). Shingle sets are joined
    # back AFTER dedup, once per surviving pair side, for the exact verify.
    left = sized.select("band", "bh", F.col("id").alias("id_a"))
    right = sized.select("band", "bh", F.col("id").alias("id_b"))
    cand = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sigs.select("id", "sh")
    pairs = cand.join(
        sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    min_jaccard: float = 0.7,
    max_shingle_df: int = 1024,
    return_dropped: bool = False,
):
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index.

    Candidate generation: explode shingles → DROP hot shingles (document
    frequency > ``max_shingle_df``; a boilerplate shingle shared by 10^6
    docs would otherwise turn the self-join into an all-pairs explosion) →
    self-join on the remaining shingles → distinct candidate pairs.
    Verification: join candidates back to the FULL shingle arrays and
    compute Jaccard exactly (array_intersect/union) — the df cap bounds the
    join, never the similarity math, so emitted jaccard values are exact.

    Caveat (inherent to the cap, shared with every production dedup
    pipeline): a pair whose shared shingles are ALL hotter than the cap is
    not emitted — such docs are boilerplate-only near-dups of >cap other
    docs and are the exact-dedup/minhash path's job.

    ``return_dropped=True`` additionally returns the (shingle, df) relation
    that was dropped — no silent truncation.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    )
    ex = sh.select("id", F.explode("sh").alias("s"))
    # df per shingle with map-side partial agg; only the HOT tail (tiny by
    # construction) is materialized and broadcast for an anti-join
    hot = (
        ex.groupBy("s")
        .agg(F.count("*").alias("s_df"))
        .filter(F.col("s_df") > max_shingle_df)
    )
    kept = ex.join(F.broadcast(hot.select("s")), "s", "left_anti")
    cand = (
        kept.alias("a")
        .join(kept.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    with_sets = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    pairs = (
        with_sets.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
    if return_dropped:
        return pairs, hot
    return pairs


def _md5_hash64(tok: str) -> int:
    """Lower 64 bits of md5 as unsigned LE int — equals DuckDB's
    ``md5_number_lower``, making an md5-based simhash SQL-checkable."""
    import hashlib
    import struct

    return struct.unpack("<Q", hashlib.md5(tok.encode("utf-8")).digest()[8:])[0]


def simhash(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxh64",
) -> DataFrame:
    """64-bit SimHash over tf-weighted token hashes — batch-vectorized.

    Per Arrow batch: tokenize, hash each UNIQUE token once (worker-lifetime
    cache — the vocabulary is orders of magnitude smaller than the token
    stream), unpack all unique hashes into a (U, 64) ±1 sign matrix with one
    shift-broadcast, and segment-sum signs per document with a cumsum
    difference (tf weighting falls out of summing per token *instance*).
    No per-token Python in the hot path.

    ``hash_fn``: ``xxh64`` (Spark-parity xxhash64, default) or ``md5``
    (DuckDB ``md5_number_lower`` parity — used by the SQL-oracled contract
    entry).
    """
    if hash_fn == "xxh64":
        from statschat_ke_spark.functions.hashing import xxh64

        hfun = lambda t: xxh64(t.encode())
    elif hash_fn == "md5":
        hfun = _md5_hash64
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    @F.pandas_udf(T.LongType())
    def simhash_udf(text: pd.Series) -> pd.Series:
        import re

        token_re = re.compile(r"[a-z0-9]+")
        cache = simhash_udf_cache  # task-lifetime unique-token hash cache
        shifts = np.arange(64, dtype=np.uint64)

        toks_per_doc = [token_re.findall(s.lower()) for s in text.fillna("")]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        out = np.zeros(len(text), dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series(out)
        flat = [t for toks in toks_per_doc for t in toks]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        missing = [u for u in uniques if u not in cache]
        for u in missing:
            cache[u] = hfun(u)
        h_u = np.array([cache[u] for u in uniques], dtype=np.uint64)
        signs = (
            ((h_u[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
        )  # (U, 64) in {-1, +1}
        inst = signs[codes]  # (N_inst, 64)
        cs = np.concatenate([np.zeros((1, 64), dtype=np.int64), np.cumsum(inst, axis=0)])
        ends = np.cumsum(lens)
        starts = ends - lens
        acc = cs[ends] - cs[starts]  # (n_docs, 64); empty docs → all zeros
        bits = (acc > 0).astype(np.uint64)
        v_u = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        nonempty = lens > 0
        out[nonempty] = v_u.view(np.int64)[nonempty]
        return pd.Series(out)

    simhash_udf_cache: dict[str, int] = {}

    return docs.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    sh: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket: int = 4096,
    return_dropped: bool = False,
):
    """Near-dup pairs with hamming ≤ t via chunk banding with
    ``max(4, t+1)`` chunks (pigeonhole: t differing bits spread over t+1
    chunks leave at least one chunk identical, so candidate recall is
    COMPLETE for the requested threshold — a fixed 4-chunk split would
    silently miss pairs at hamming ≥ 4). t ≤ 3 keeps the classic 4×16-bit
    split; larger t pays proportionally more candidate fan-out, which is
    the correct trade (recall first, the exact hamming filter verifies).

    Buckets (chunk_i, chunk) larger than ``max_bucket`` are dropped before
    the self-join — a degenerate chunk value shared by m near-empty docs
    contributes m²/2 candidate rows before the hamming filter; same
    count→filter→broadcast-anti-join guard as ``minhash_lsh_pairs``.
    ``return_dropped=True`` additionally returns the dropped
    (chunk_i, chunk, bucket_n) relation — no silent truncation. A pair
    whose every matching chunk is hot is missed; such docs are degenerate
    clusters (>cap mutual near-dups) and the exact-dedup path's job.
    """
    n_chunks = min(64, max(4, int(max_hamming) + 1))
    base, rem = divmod(64, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    starts = [sum(widths[:i]) for i in range(n_chunks)]
    chunks = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), s).bitwiseAND(
                        F.lit((1 << w) - 1)
                    )
                    for s, w in zip(starts, widths)
                ]
            )
        ).alias("chunk_i", "chunk"),
    )
    hot = (
        chunks.groupBy("chunk_i", "chunk")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )
    chunks = chunks.join(
        F.broadcast(hot.select("chunk_i", "chunk")), ["chunk_i", "chunk"], "left_anti"
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, ["chunk_i", "chunk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    pairs = (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if return_dropped:
        return pairs, hot
    return pairs
