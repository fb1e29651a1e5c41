"""Shared measurement harness for the on-chip probe scripts.

Grouped-fetch pipelining: the axon relay's device->host scalar fetch costs
a ~28-30 ms round trip; dispatching GROUP batches whose digests are summed
on device and fetching once per group amortizes it to RTT/GROUP, and the
2-deep pipeline overlaps the fetch with the next group's compute (same
scheme as bench.py).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

# probe scripts live in scripts/; make the repo importable when run directly
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GROUP = 8


def measure_ms(fn, arg, measure_s: float = 4.0) -> float:
    """ms per fn(arg) call, grouped-fetch pipelined (compile+warm included
    once up front, excluded from the timing)."""
    float(fn(arg))

    def run_group():
        acc = fn(arg)
        for _ in range(GROUP - 1):
            acc = acc + fn(arg)
        return acc

    groups = 0
    t0 = time.perf_counter()
    prev = run_group()
    while True:
        cur = run_group()
        float(prev)
        prev = cur
        groups += 1
        if time.perf_counter() - t0 >= measure_s and groups >= 2:
            break
    float(prev)
    groups += 1
    return (time.perf_counter() - t0) / (groups * GROUP) * 1e3
