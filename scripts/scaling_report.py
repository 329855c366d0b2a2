"""Post-hoc analysis of a BENCH_SCALING_*.json run: per-phase scaling
efficiency and the CPU split by process kind, for the BASELINE.md scaling
section.

The parent bench (`bench_scaling.py`) records, per level, the best run's
`phase_timings_s` (from the index's stats.json) and `cpu_by_kind_s`
(java vs python CPU-seconds over the whole child process tree, measured by
`benchutil.subtree_cpu_by_kind`). This script reads one report and prints:

  - per-phase wall at N and 4N plus per-phase efficiency
    eff_phase = wall_N / (ratio * wall_4N)
  - the java/python CPU split at each level (whether extra threads bought
    cycles or just burned them)
  - the headline build efficiency, repeated from the report's "pairs"

Usage: python scripts/scaling_report.py [BENCH_SCALING_v4.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_SCALING_v4.json")
    rep = json.load(open(path))
    for pair in rep["pairs"]:
        n, n4 = pair["N"], pair["4N"]
        ratio = n4 / n
        lo, hi = rep["levels"][str(n)], rep["levels"][str(n4)]
        print(f"pair local[{n}] -> local[{n4}]  (build eff "
              f"{pair['scaling_efficiency_build']:.3f})")
        pt_lo = lo.get("phase_timings_s", {})
        pt_hi = hi.get("phase_timings_s", {})
        if pt_lo and pt_hi:
            print(f"  {'phase':<12} {'wall@'+str(n):>9} {'wall@'+str(n4):>9} {'eff':>6}")
            for k in pt_lo:
                if k in pt_hi and pt_hi[k] > 0:
                    eff = pt_lo[k] / (ratio * pt_hi[k])
                    print(f"  {k:<12} {pt_lo[k]:>8.1f}s {pt_hi[k]:>8.1f}s {eff:>6.2f}")
            resid_lo = lo["build_wall_s"] - sum(pt_lo.values())
            resid_hi = hi["build_wall_s"] - sum(pt_hi.values())
            print(f"  {'(residual)':<12} {resid_lo:>8.1f}s {resid_hi:>8.1f}s")
        for lvl, r in ((n, lo), (n4, hi)):
            kinds = r.get("cpu_by_kind_s", {})
            if kinds:
                tot = sum(kinds.values())
                split = " ".join(f"{k}={v:.0f}s" for k, v in sorted(kinds.items()))
                print(f"  cpu@local[{lvl}]: total={tot:.0f}s  {split}  "
                      f"(concurrency {r['cpu_concurrency']:.2f}/{lvl})")
        # CPU inflation: identical work should cost identical CPU-seconds;
        # anything above 1.0 at the high level is cycles the extra threads
        # burned without advancing the job (SMT sharing, bandwidth stalls).
        if lo.get("build_cpu_s") and hi.get("build_cpu_s"):
            print(f"  cpu inflation {n4}-way vs {n}-way: "
                  f"{hi['build_cpu_s'] / lo['build_cpu_s']:.2f}x; "
                  f"cycle-normalized eff "
                  f"{pair['scaling_efficiency_build'] * hi['build_cpu_s'] / lo['build_cpu_s']:.3f}")
        print(f"  queries/s: {lo['queries_per_sec']:.3f} @{n} -> "
              f"{hi['queries_per_sec']:.3f} @{n4} "
              f"(eff {hi['queries_per_sec'] / (ratio * lo['queries_per_sec']):.3f})")


if __name__ == "__main__":
    main()
