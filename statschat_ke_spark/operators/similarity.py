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
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


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


def _planes(nbits: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic hyperplanes — the single source of truth shared by the
    driver-side (lsh_index/lsh_topk) and UDF-internal (near-dup) paths, so
    buckets computed either way agree for the same (nbits, dim, seed)."""
    return np.random.default_rng(seed).standard_normal((nbits, dim))


# Above this many nbits×dim literal terms the JVM expression tree (one
# F.array of dim literals per plane) becomes a Catalyst plan-size /
# codegen-compile hazard (64 bits × 768 dims ≈ 50k literals); the Arrow UDF
# with a closure numpy plane matrix takes over.
MAX_JVM_SIG_TERMS = 4096


def hyperplane_signature(vec_col: F.Column, planes: np.ndarray) -> F.Column:
    """LSH signature: sign bits of <v, h_i> packed into a long (JVM-side).

    Suited to small nbits×dim (inlines one literal per plane coefficient);
    for high-dim embeddings use ``hyperplane_signature_arrow``."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in h])) > 0, 1 << i).otherwise(0)
        for i, h in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out.bitwiseOR(b)
    return out.cast("long")


def hyperplane_signature_arrow(
    vec_col,
    *,
    planes: np.ndarray | None = None,
    nbits: int | None = None,
    seed: int = 42,
) -> F.Column:
    """LSH signature as one Arrow-batched matmul — the high-dim path.

    The plane matrix rides the UDF closure (numpy, broadcast to workers once
    per task) instead of being inlined as nbits×dim Catalyst literals, so
    plan size is O(1) in dimensionality: (batch, dim) @ (dim, nbits) → sign
    bits → packed int64. Pass ``planes`` explicitly, or just ``nbits`` to
    have the matrix generated lazily from the first batch's vector length
    (deterministic — same ``_planes(nbits, dim, seed)`` the driver path
    uses, so no driver-side job is ever needed to learn ``dim``).

    Bit-packing parity with ``hyperplane_signature``: bit i is the sign of
    <v, planes[i]> computed in float64. Null/empty vectors get signature 0.
    """
    if planes is None and nbits is None:
        raise TypeError("pass planes or nbits")
    state: dict = {"planes": planes}

    @F.pandas_udf(T.LongType())
    def sig(v: pd.Series) -> pd.Series:
        ok = np.array([x is not None and len(x) > 0 for x in v], dtype=bool)
        out = np.zeros(len(v), dtype=np.int64)
        if not ok.any():
            return pd.Series(out)
        mat = np.array([np.asarray(x, dtype=np.float64) for x, o in zip(v, ok) if o])
        if state["planes"] is None:
            state["planes"] = _planes(nbits, mat.shape[1], seed)
        proj = mat @ state["planes"].T  # (n, nbits)
        weights = np.uint64(1) << np.arange(proj.shape[1], dtype=np.uint64)
        packed = ((proj > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        out[ok] = packed.view(np.int64)
        return pd.Series(out)

    return sig(vec_col)


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
    partitioned by ``bucket`` so probes prune partitions.

    ``dim`` is required: the caller gets the plane matrix back (for query
    signatures), and inferring dim from data would mean a hidden Spark job
    inside a library function. Picks the JVM literal expression for small
    nbits×dim and the Arrow-UDF matmul beyond ``MAX_JVM_SIG_TERMS`` — both
    produce identical buckets for the same planes.
    """
    if dim is None:
        raise TypeError(
            "lsh_index requires dim (the embedding array length): inferring it "
            "would trigger a hidden Spark job. Callers that don't need the "
            "plane matrix can use hyperplane_signature_arrow(nbits=...) which "
            "derives dim lazily from the first Arrow batch."
        )
    planes = _planes(nbits, dim, seed)
    if nbits * dim <= MAX_JVM_SIG_TERMS and nbits < 64:
        # nbits == 64 would need the literal 1 << 63, which overflows
        # LongType at plan construction; the Arrow path packs bit 63 via a
        # uint64 view and returns the (identical) signed reinterpretation
        sig = hyperplane_signature(F.col(vec_col), planes)
    else:
        sig = hyperplane_signature_arrow(F.col(vec_col), planes=planes)
    return emb.withColumn("bucket", sig), planes


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
    """ANN top-k: probe the query's bucket plus ALL buckets within
    ``probe_hamming`` bit flips (C(nbits, ≤h) combinations — multi-probe
    LSH), exact cosine re-rank inside. Bucket-id count is Σ_{j≤h} C(nbits,j)
    (e.g. 2,081 at nbits=64/h=2) — driver-side ints pushed down as one IN
    filter; for larger probe radii at high nbits, range-partition the index
    by bucket and probe per-partition instead."""
    import itertools

    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i, h in enumerate(planes):
        if float(qv @ h) > 0:
            qsig |= 1 << i
    mask = (1 << len(planes)) - 1
    buckets = {qsig}
    for flips in range(1, min(probe_hamming, len(planes)) + 1):
        for combo in itertools.combinations(range(len(planes)), flips):
            flip = 0
            for i in combo:
                flip |= 1 << i
            buckets.add((qsig ^ flip) & mask)
    # signatures are stored as signed int64 reinterpretations of the packed
    # bits — reinterpret the probe ids the same way so bit 63 matches
    sig64 = np.array(sorted(buckets), dtype=np.uint64).view(np.int64)
    cand = indexed.filter(F.col("bucket").isin([int(b) for b in sig64]))
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
    # Bucket via the Arrow-UDF signature with lazy dim: no driver-side job to
    # learn the embedding length, and no plan blow-up at high dimensionality
    # (the plane matrix lives in the UDF closure, not as Catalyst literals).
    indexed = emb.withColumn(
        "bucket", hyperplane_signature_arrow(F.col(vec_col), nbits=nbits, seed=seed)
    )
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
