"""Host parallel-scaling ceiling — context for BENCH_SCALING's north-rule number.

The north rule asks for throughput scaling efficiency >= 0.8 between N and 4N
executors. In this sandbox both levels share ONE machine (a hypervisor-shared
VM with SMT), so the measured Spark efficiency is the product of two factors:

    eff_spark = eff_host x eff_orchestration

where eff_host is what PLAIN multiprocessing — no Spark, no JVM, no shuffle —
achieves on this host for the same kind of per-record work. On a real cluster,
N -> 4N adds MACHINES (each executor keeps its own memory bandwidth and cache),
so eff_host ~ 1 there and eff_orchestration is the number the rule is really
about. This script measures eff_host so BASELINE.md can report both the raw
Spark number and the host-normalized one, with the calibration method in the
open rather than hand-waved.

Two workloads bracket the engine's profile:
- tokenize: the EXACT phase-A per-doc loop (regex findall + Counter) over real
  corpus text — memory-light, Python/C-mixed, the build's hot path.
- alu: vectorized uint64 multiply/xor rounds over an L2-resident numpy array —
  pure compute, no RAM pressure; the upper bound on what this host can scale.
- stream: the same rounds over a RAM-sized array — memory-bandwidth-bound;
  the lower bound (all workers share one memory bus on this single box).

Method: the work is pre-split into a FIXED number of equal chunks (identical
at both levels, like the data-proportional partitions in bench_scaling.py);
a multiprocessing.Pool of size N maps over them; best-of-R wall per level.

Usage: python scripts/host_calibration.py [--levels 2,8,32] [--n-docs 60000]
Writes HOST_CALIBRATION.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CHUNKS = 64  # fixed task granularity at every level, like num_partitions


def _tokenize_chunk(texts: list[str]) -> int:
    from collections import Counter

    from statschat_ke_spark.functions.tokenize import tokenize

    total = 0
    for t in texts:
        total += sum(Counter(tokenize(t)).values())
    return total


def _alu_chunk(spec: tuple[int, int]) -> int:
    """(n_words, n_rounds): uint64 mix rounds, array sized by the caller."""
    import numpy as np

    n_words, n_rounds = spec
    a = np.arange(n_words, dtype=np.uint64)
    m = np.uint64(0x9E3779B97F4A7C15)
    for _ in range(n_rounds):
        a = (a * m) ^ (a >> np.uint64(29))
    return int(a[0])


def _texts(n_docs: int) -> list[str]:
    """Corpus text without Spark: generate deterministically (same generator
    as the bench corpora) — keeps this script free of any Spark session."""
    from statschat_ke_spark.corpus import generate_documents

    return list(generate_documents(n_docs).text)


def _run_level(pool_size: int, chunks: list, fn) -> float:
    ctx = mp.get_context("spawn")
    with ctx.Pool(pool_size) as pool:
        t0 = time.time()
        pool.map(fn, chunks, chunksize=1)
        return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=str, default="2,8,32")
    ap.add_argument("--n-docs", type=int, default=60000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "HOST_CALIBRATION.json"))
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    texts = _texts(args.n_docs)
    step = -(-len(texts) // N_CHUNKS)
    tok_chunks = [texts[i : i + step] for i in range(0, len(texts), step)]
    # alu: 256 KiB per array (L2-resident), many rounds; stream: 64 MiB per
    # array (far past LLC), few rounds — same total byte-rounds
    alu_chunks = [(32_768, 2_000)] * N_CHUNKS
    stream_chunks = [(8_388_608, 8)] * N_CHUNKS

    report: dict = {
        "n_docs": args.n_docs,
        "n_chunks": N_CHUNKS,
        "repeats": args.repeats,
        "workloads": {},
    }
    for name, chunks, fn in (
        ("tokenize", tok_chunks, _tokenize_chunk),
        ("alu", alu_chunks, _alu_chunk),
        ("stream", stream_chunks, _alu_chunk),
    ):
        walls = {}
        for lv in levels:
            runs = [_run_level(lv, chunks, fn) for _ in range(args.repeats)]
            walls[lv] = {"best_s": min(runs), "all_s": [round(r, 3) for r in runs]}
            print(f"{name} local-pool[{lv}]: best {min(runs):.2f}s "
                  f"(all {[round(r, 2) for r in runs]})", flush=True)
        pairs = {}
        for n, n4 in zip(levels, levels[1:]):
            eff = (walls[n]["best_s"] / walls[n4]["best_s"]) / (n4 / n)
            pairs[f"{n}->{n4}"] = round(eff, 4)
            print(f"{name} host efficiency {n}->{n4}: {eff:.3f}", flush=True)
        report["workloads"][name] = {"walls": walls, "efficiency": pairs}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
