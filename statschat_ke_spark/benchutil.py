"""Benchmark measurement helpers shared by bench.py and scripts/.

The sandbox VM is wholesale-paused at random by its hypervisor (BASELINE.md:
identical runs vary 5x wall-clock). Two mitigations used everywhere we time:
best-of-N repeats, and process-tree CPU seconds as the pause-immune signal
reported alongside wall numbers.
"""

from __future__ import annotations

import os


def subtree_cpu_seconds() -> float:
    """CPU seconds consumed by this process tree (driver + JVM + Python
    workers), summed from /proc/<pid>/stat utime+stime+cutime+cstime."""
    from collections import defaultdict

    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    tck = os.sysconf("SC_CLK_TCK")
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                s = f.read().decode("latin1")
        except OSError:
            continue
        rp = s.rindex(")")
        fields = s[rp + 2 :].split()
        ppid = int(fields[1])
        jiffies = int(fields[11]) + int(fields[12]) + int(fields[13]) + int(fields[14])
        procs[int(d)] = (ppid, jiffies)
    ch = defaultdict(list)
    for pid, (pp, _) in procs.items():
        ch[pp].append(pid)
    total, stack = 0, [me]
    while stack:
        p = stack.pop()
        total += procs.get(p, (0, 0))[1]
        stack.extend(ch.get(p, []))
    return total / tck
