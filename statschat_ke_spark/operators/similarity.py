"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane LSH
bucketed variant as the scale path: signatures bucket the corpus so the exact
re-rank only touches candidate buckets (multi-probe over all hyperplane-bit
flips at distance ≤1 keeps recall high while scanning ~(nbits+1)/2^nbits of
the corpus). Deterministic hyperplanes (seed-fixed), dot products via
JVM-side higher-order functions — no Python in the scan path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.
    One pass, no shuffle except the final TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        emb.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_signature(vec_col: F.Column, planes: np.ndarray) -> F.Column:
    """LSH signature: sign bits of <v, h_i> packed into a long (JVM-side)."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in h])) > 0, 1 << i).otherwise(0)
        for i, h in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out.bitwiseOR(b)
    return out.cast("long")


def lsh_index(
    emb: DataFrame,
    *,
    nbits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Attach an LSH bucket id to every vector. At scale, write this out
    partitioned by ``bucket`` so probes prune partitions."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    with_sig = emb.withColumn("bucket", hyperplane_signature(F.col(vec_col), planes))
    return with_sig, planes


def lsh_topk(
    indexed: DataFrame,
    planes: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    *,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    ``probe_hamming`` bit flips, exact cosine re-rank inside."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i, h in enumerate(planes):
        if float(qv @ h) > 0:
            qsig |= 1 << i
    buckets = {qsig}
    if probe_hamming >= 1:
        for i in range(len(planes)):
            buckets.add(qsig ^ (1 << i))
    cand = indexed.filter(F.col("bucket").isin([int(b) for b in buckets]))
    return cosine_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)


def cosine_pairs(
    emb: DataFrame,
    min_cosine: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (embedding near-dup baseline).

    Self-join with the smaller side broadcast; O(n²) scoring stays JVM-side
    (zip_with/aggregate). This is the correctness baseline —
    ``embedding_near_dup_pairs`` is the LSH-blocked scale path.
    """
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        (_norm(F.col(vec_col))).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        (_norm(F.col(vec_col))).alias("nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.9,
    *,
    nbits: int = 8,
    seed: int = 42,
    max_bucket: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_dropped: bool = False,
):
    """Embedding-cosine near-dup pairs, LSH-blocked (the 100 TB path):
    bucket by random-hyperplane signature, generate candidates only within a
    bucket (plus 1-bit-flip neighbor buckets via signature expansion), then
    exact-cosine verify. Near-identical vectors agree on all/most sign bits,
    so recall at high thresholds is preserved while the join touches
    ~n²/2^nbits pairs instead of n².

    Candidate generation is KEY-ONLY: the (nbits+1)-way explode, self-join
    and pair-dedup carry just (bkey, id) — 16 bytes/row — and the vectors
    are joined back only for surviving distinct pairs. At 768-dim float
    that cuts the candidate shuffle from ~3 KB × (nbits+1) copies per
    vector (~27 KB) to ~150 B, a ~200× shuffle-bytes drop; the vector join
    is on 8-byte ids against the (much smaller) distinct-pair relation.

    Buckets larger than ``max_bucket`` (degenerate vectors — all-zero /
    boilerplate embeddings landing in one signature) are dropped and
    reported via ``return_dropped=True`` — same guard as
    ``minhash_lsh_pairs``. Verified in pytest against ``cosine_pairs`` on
    planted duplicates."""
    indexed, planes = lsh_index(emb, nbits=nbits, seed=seed, id_col=id_col, vec_col=vec_col)
    # probe expansion: each vector claims its bucket and all 1-bit flips, so
    # any pair within Hamming distance 1 of each other shares a claimed key
    keys = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(nbits)]
    )
    exploded = indexed.select(F.col(id_col).alias("id"), F.explode(keys).alias("bkey"))
    hot = (
        exploded.groupBy("bkey")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )
    sized = exploded.join(F.broadcast(hot.select("bkey")), "bkey", "left_anti")
    cand = (
        sized.select("bkey", F.col("id").alias("id_a"))
        .join(sized.select("bkey", F.col("id").alias("id_b")), "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
    if return_dropped:
        return pairs, hot
    return pairs
