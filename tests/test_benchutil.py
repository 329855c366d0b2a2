"""Unit tests for the pause-immune CPU measurement helpers.

These back the scaling-efficiency evidence protocol (BASELINE.md): CPU
seconds summed over the process tree, and the java/python split used to
attribute parallelism-dependent CPU inflation to the JVM vs the Python
workers. No Spark session needed.
"""

import multiprocessing
import time

from statschat_ke_spark.benchutil import subtree_cpu_by_kind, subtree_cpu_seconds


def _burn(seconds: float) -> None:
    t0 = time.process_time()
    x = 0
    while time.process_time() - t0 < seconds:
        x += 1  # pure ALU spin


def test_subtree_cpu_counts_child_python_work():
    before_total = subtree_cpu_seconds()
    before_kind = subtree_cpu_by_kind()
    p = multiprocessing.Process(target=_burn, args=(1.0,))
    p.start()
    p.join()
    after_total = subtree_cpu_seconds()
    after_kind = subtree_cpu_by_kind()

    # The child burned ~1 CPU-second; both the total and the python bucket
    # must see it (child is reaped, so it shows via cutime in this process).
    assert after_total - before_total >= 0.8
    assert after_kind.get("python", 0.0) - before_kind.get("python", 0.0) >= 0.8


def test_by_kind_totals_match_subtree_total():
    total = subtree_cpu_seconds()
    by_kind = subtree_cpu_by_kind()
    # Same walk, same jiffies: the split must sum to the total (same instant
    # modulo the time between the two scans — allow a generous margin).
    assert abs(sum(by_kind.values()) - total) < 2.0
    assert all(v >= 0.0 for v in by_kind.values())
