"""Training-pipeline operators: dedup family, ANN similarity, text stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from statschat_ke_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from statschat_ke_spark.operators.similarity import cosine_topk, lsh_index, lsh_topk
from statschat_ke_spark.functions.textstats import text_profile


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "as morning light spreads across the quiet village square slowly"
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=BASE),  # exact dup of 1
        Row(doc_id=3, text=BASE.replace("lazy", "sleepy")),  # near dup of 1
        Row(doc_id=4, text="completely different content about spark query engines "
                           "and distributed inverted index construction at scale "
                           "with posting lists compression and block max wand"),
        Row(doc_id=5, text=BASE.replace("morning", "evening").replace("quiet", "busy")),
        Row(doc_id=6, text="short text"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(dup_docs):
    out = exact_dedup(dup_docs).collect()
    groups = {r.keep_id: r.n_copies for r in out}
    assert groups[1] == 2  # docs 1+2 identical
    assert len(out) == 5


def test_minhash_lsh_finds_near_dups(dup_docs):
    sigs = minhash_signatures(dup_docs, num_hashes=64)
    pairs = minhash_lsh_pairs(sigs, bands=16, min_jaccard=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found  # exact dup certain
    assert (1, 3) in found or (2, 3) in found  # near dup
    # unrelated docs never pair
    assert not any(4 in p for p in found)


def test_minhash_jaccard_close_to_exact(dup_docs):
    sigs = minhash_signatures(dup_docs, num_hashes=64)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_lsh_pairs(sigs, bands=16, min_jaccard=0.0).collect()}
    exact = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(dup_docs, min_jaccard=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    # LSH-verified jaccard is the exact shingle jaccard (we verify exactly)
    for k, v in pairs.items():
        assert abs(v - exact[k]) < 1e-9


def test_ngram_jaccard_pairs(dup_docs):
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(dup_docs, min_jaccard=0.3).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and 0.3 < out[(1, 3)] < 1.0


def test_simhash_near_pairs(dup_docs):
    sh = simhash(dup_docs)
    vals = {r.id: r.simhash for r in sh.collect()}
    assert vals[1] == vals[2]
    pairs = simhash_near_pairs(sh, max_hamming=8).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found[(1, 2)] == 0
    # every reported pair's hamming is correct vs direct computation
    for (a, b), h in found.items():
        assert bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1") == h
    # pigeonhole guarantee: any pair with hamming ≤ 3 MUST be found
    ids = sorted(vals)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    assert (i, j) in found
    assert (1, 4) not in found


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs[7] = vecs[0] * 0.9 + 0.01  # near neighbor of 0
    rows = [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(50)]
    return spark.createDataFrame(rows), vecs


def test_cosine_topk_exact(emb_df):
    df, vecs = emb_df
    q = vecs[0].astype(np.float64)
    got = cosine_topk(df, list(q), k=5).collect()
    sims = (vecs.astype(np.float64) @ q) / (
        np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    want = np.lexsort((np.arange(50), -np.round(sims, 6)))[:5]
    assert [r.vec_id for r in got] == want.tolist()
    assert got[0].vec_id == 0 and got[1].vec_id == 7


def test_lsh_topk_recall(emb_df):
    df, vecs = emb_df
    indexed, planes = lsh_index(df, nbits=6, dim=16)
    got = lsh_topk(indexed, planes, list(vecs[0].astype(np.float64)), k=3)
    ids = [r.vec_id for r in got.collect()]
    assert 0 in ids and 7 in ids  # self + its near neighbor survive probing


def test_text_profile(spark):
    rows = [
        Row(doc_id=1, text="The cat sat on the mat and it was not a hat for example"),
        Row(doc_id=2, text="ya na wa kwa ni za katika la kuwa hii kitabu chake"),
        Row(doc_id=3, text="le chat est sur le tapis et il ne va pas au marche"),
        Row(doc_id=4, text="12345 67890 !!!"),
    ]
    out = {r.doc_id: r for r in text_profile(spark.createDataFrame(rows)).collect()}
    assert out[1].lang_guess == "en"
    assert out[2].lang_guess == "sw"
    assert out[3].lang_guess == "fr"
    assert out[4].lang_guess == "und"
    assert out[1].quality_score > out[4].quality_score
    assert out[1].n_tokens == 14
    assert out[1].quality["stopword_ratio"] > 0.2


def test_embedding_near_dup_lsh_matches_bruteforce(spark):
    """embedding-cosine near-dup: LSH-blocked pairs == exact cosine_pairs on
    planted near-duplicate vectors (high-threshold recall guarantee)."""
    import numpy as np
    from pyspark.sql import Row
    from statschat_ke_spark.operators.similarity import (
        cosine_pairs,
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    # plant 10 near-duplicates: tiny perturbations of the first 10 vectors
    for i in range(10):
        v = base[i] + rng.standard_normal(16) * 0.01
        rows.append(Row(vec_id=100 + i, embedding=[float(x) for x in v]))
    emb = spark.createDataFrame(rows)

    exact = {
        (r.id_a, r.id_b)
        for r in cosine_pairs(emb, 0.98).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, 0.98, nbits=8).collect()
    }
    assert exact == {(i, 100 + i) for i in range(10)}
    assert lsh == exact


def test_winnowing_fingerprint(spark):
    """Rolling-hash winnowing fingerprint: deterministic, order-insensitive
    to trailing edits far from shared windows, catches shared passages."""
    from pyspark.sql import Row
    from statschat_ke_spark.functions.textstats import winnowing_fingerprint

    shared = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=shared + " tail one unique tokens here"),
         Row(doc_id=2, text=shared + " completely different ending words now"),
         Row(doc_id=3, text="nothing in common with the others at all today"),
         Row(doc_id=4, text="")]
    )
    fp = winnowing_fingerprint(window=4)
    got = {r.doc_id: set(r.fp) for r in df.select("doc_id", fp("text").alias("fp")).collect()}
    # deterministic across invocations
    got2 = {r.doc_id: set(r.fp) for r in df.select("doc_id", fp("text").alias("fp")).collect()}
    assert got == got2
    assert got[4] == set()
    # docs sharing a long passage share most fingerprint hashes
    inter_12 = len(got[1] & got[2]) / max(1, len(got[1] | got[2]))
    inter_13 = len(got[1] & got[3]) / max(1, len(got[1] | got[3]))
    assert inter_12 > 0.4
    assert inter_13 < inter_12


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A planted boilerplate cluster (many docs sharing one hot shingle run)
    must not explode the join: the cap drops the hot shingles from candidate
    generation, reports them, and distinctive near-dup pairs are still found
    with EXACT jaccard values."""
    from statschat_ke_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved copyright notice applies here " * 2
    rows = [(i, boiler + f"unique tail {i} nothing shared") for i in range(40)]
    # one genuine near-dup pair with distinctive (non-hot) shingles
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows += [(100, base), (101, base + " extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs, dropped = ngram_jaccard_pairs(
        docs, min_jaccard=0.5, max_shingle_df=8, return_dropped=True
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (100, 101) in got
    # exact jaccard for the planted pair (distinct 5-shingles)
    import itertools

    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}

    a, b = sh(base), sh(base + " extra")
    assert abs(got[(100, 101)] - len(a & b) / len(a | b)) < 1e-6
    # the boilerplate shingles were dropped AND reported
    d = dropped.collect()
    assert len(d) > 0 and all(r.s_df > 8 for r in d)
    # boilerplate-only pairs are not emitted (their shared shingles are all hot)
    boiler_pairs = [k for k in got if k[0] < 40 and k[1] < 40]
    assert boiler_pairs == []


def test_minhash_mersenne_vectorization_parity():
    """The uint64 Mersenne-fold mulmod must equal exact python-int
    (a*x+b) mod p for the full signed-int64 input domain (property test of
    the round-2 vectorization — no object-dtype math in the hot path)."""
    import numpy as np

    from statschat_ke_spark.operators.dedup import (
        MERSENNE,
        _fold_mod_p,
        _minhash_params,
        _mulmod_p,
    )

    rng = np.random.default_rng(123)
    a, b = _minhash_params(32)
    # adversarial + random inputs: extremes, ±1, zero, random full-range
    edge = np.array(
        [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63), MERSENNE, MERSENNE + 1],
        dtype=np.int64,
    )
    x = np.concatenate([edge, rng.integers(-(2**63), 2**63 - 1, 4000, dtype=np.int64)])
    exact = (
        x.astype(object)[None, :] * a[:, None].astype(object)
        + b[:, None].astype(object)
    ) % MERSENNE
    P = np.uint64(MERSENNE)
    xm = _fold_mod_p(x.view(np.uint64))
    xm = np.where(x < 0, (xm + P - np.uint64(8)) % P, xm)
    got = _fold_mod_p(
        _mulmod_p(a.astype(np.uint64)[:, None], xm[None, :])
        + b.astype(np.uint64)[:, None]
    )
    assert (got.astype(object) == exact).all()


def test_simhash_vectorization_parity(spark):
    """Batch-vectorized simhash == the definitional per-token loop."""
    import re
    from collections import Counter

    import numpy as np

    from statschat_ke_spark.functions.hashing import xxh64
    from statschat_ke_spark.operators.dedup import simhash

    def reference_simhash(s: str) -> int:
        c = Counter(re.findall(r"[a-z0-9]+", (s or "").lower()))
        if not c:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for tok, w in c.items():
            h = np.uint64(xxh64(tok.encode()))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), w, -w)
        v = 0
        for j in range(64):
            if acc[j] > 0:
                v |= 1 << j
        return v - (1 << 64) if v >= (1 << 63) else v

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the repeated repeated tokens",
        "",
        "UPPER Case MiXeD 123 numbers 456",
        "unicode naïve café text stripped to ascii tokens",
        "a",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r.id: r.simhash for r in simhash(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == reference_simhash(t), t


def test_simhash_hot_chunk_cap(spark):
    """A planted degenerate cluster (many near-empty docs sharing a simhash
    chunk value) must not explode the chunk self-join: oversized buckets are
    dropped AND reported, while genuine near-dup pairs outside the hot
    buckets are still found."""
    from pyspark.sql import Row

    # 200 docs with identical text → identical simhash → every chunk bucket
    # holds 200 members (> cap). Plus one distinctive near-dup pair.
    rows = [Row(doc_id=i, text="degenerate boilerplate stub page") for i in range(200)]
    rows += [
        Row(doc_id=500, text=BASE),
        Row(doc_id=501, text=BASE.replace("lazy", "sleepy")),
    ]
    sh = simhash(spark.createDataFrame(rows))
    pairs, dropped = simhash_near_pairs(
        sh, max_hamming=10, max_bucket=50, return_dropped=True
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    d = dropped.collect()
    # the degenerate cluster's buckets were dropped and reported (4 chunks)
    assert len(d) >= 1 and all(r.bucket_n > 50 for r in d)
    # no pair from inside the degenerate cluster leaks through
    assert not any(a < 200 and b < 200 for a, b in got)
    # the distinctive near-dup pair still found when banding can see it
    # (≥1 identical 16-bit chunk — guaranteed only for hamming ≤ 3) and it
    # passes the hamming filter
    vals = {r.id: r.simhash for r in sh.collect()}
    x = (vals[500] ^ vals[501]) & ((1 << 64) - 1)
    h = bin(x).count("1")
    shares_chunk = any(((x >> (16 * i)) & 0xFFFF) == 0 for i in range(4))
    if h <= 10 and shares_chunk:
        assert (500, 501) in got
    # default (uncapped at this size) still finds the degenerate pairs
    base_pairs = simhash_near_pairs(sh, max_hamming=10).limit(1).collect()
    assert len(base_pairs) == 1


def test_embedding_near_dup_hot_bucket_cap(spark):
    """Degenerate embeddings (identical vectors → one LSH bucket with m
    members → m²/2 candidates) are capped: the hot bucket is dropped and
    reported, pairs outside it survive, and the key-only rewrite returns
    the same pairs as the round-2 payload-carrying version (cosine values
    exact)."""
    import numpy as np
    from pyspark.sql import Row
    from statschat_ke_spark.operators.similarity import (
        cosine_pairs,
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    deg = rng.standard_normal(16)  # one degenerate direction, 300 copies
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in deg + rng.standard_normal(16) * 1e-4])
        for i in range(300)
    ]
    base = rng.standard_normal((20, 16))
    for i, v in enumerate(base):
        rows.append(Row(vec_id=1000 + i, embedding=[float(x) for x in v]))
    for i in range(5):  # planted distinct near-dups
        v = base[i] + rng.standard_normal(16) * 0.01
        rows.append(Row(vec_id=2000 + i, embedding=[float(x) for x in v]))
    emb = spark.createDataFrame(rows)

    pairs, dropped = embedding_near_dup_pairs(
        emb, 0.98, nbits=8, max_bucket=64, return_dropped=True
    )
    got = {(r.id_a, r.id_b): r.cosine for r in pairs.collect()}
    d = dropped.collect()
    assert len(d) >= 1 and all(r.bucket_n > 64 for r in d)
    # degenerate-cluster pairs suppressed (their buckets are hot)
    assert not any(a < 300 and b < 300 for (a, b) in got)
    # the planted distinct near-dups survive with exact cosine
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs(emb, 0.98).collect()
        if r.id_a >= 1000
    }
    for k, v in exact.items():
        assert k in got and abs(got[k] - v) < 1e-9


def test_hyperplane_signature_arrow_jvm_parity(spark):
    """Arrow-UDF signatures == JVM literal-expression signatures for the
    same (nbits, dim, seed) planes, including lazy-dim plane generation."""
    import numpy as np
    from pyspark.sql import Row, functions as F
    from statschat_ke_spark.operators.similarity import (
        _planes,
        hyperplane_signature,
        hyperplane_signature_arrow,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((64, 16))
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    planes = _planes(6, 16, 42)
    got = emb.select(
        "vec_id",
        hyperplane_signature(F.col("embedding"), planes).alias("jvm"),
        hyperplane_signature_arrow(F.col("embedding"), planes=planes).alias("arrow"),
        hyperplane_signature_arrow(F.col("embedding"), nbits=6, seed=42).alias("lazy"),
    ).toPandas()
    assert (got.jvm == got.arrow).all()
    assert (got.jvm == got.lazy).all()


def test_lsh_highdim_no_plan_blowup(spark):
    """dim=768 / nbits=16 routes through the Arrow path (12k > MAX_JVM_SIG_TERMS
    literal terms would be a Catalyst plan hazard) and completes end-to-end."""
    import numpy as np
    from pyspark.sql import Row
    from statschat_ke_spark.operators.similarity import lsh_index, lsh_topk

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 768))
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    indexed, planes = lsh_index(emb, nbits=16, dim=768)
    assert planes.shape == (16, 768)
    got = lsh_topk(indexed, planes, list(vecs[3]), k=5).toPandas()
    assert len(got) >= 1
    assert got.vec_id.iloc[0] == 3  # the query vector itself is its own top hit


def test_lsh_index_requires_dim_and_runs_no_job(spark):
    """lsh_index must not trigger a hidden Spark action: dim is required,
    and constructing the signature plan runs zero jobs."""
    import numpy as np
    import pytest
    from pyspark.sql import Row, DataFrame
    from statschat_ke_spark.operators.similarity import lsh_index

    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in rng.standard_normal(8)]) for i in range(4)]
    )
    with pytest.raises(TypeError, match="dim"):
        lsh_index(emb)

    # any action during plan construction would show up as a new job
    before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    lsh_index(emb, nbits=8, dim=8)
    after = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    assert after == before
