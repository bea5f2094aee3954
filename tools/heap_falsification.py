#!/usr/bin/env python
"""Isolate the single-JVM heap artifact in the 32M wide-leg scaling number.

VERDICT r4 accepted the 32M efficiency analysis (0.735 vs a measured 0.825
DRAM ceiling) but asked for one falsification: if the deficit is partly a
single-JVM heap artifact at 2x state (one UnifiedMemoryManager + one GC
serving 8 threads), a larger heap should recover part of the per-core rate;
if the rate is heap-invariant, the deficit is pure memory bandwidth and the
heap claim dies.

Protocol: the identical 32M-event wide leg (taskset 0-7, local[8]) run in
an ABBA heap order (16g, 48g, 48g, 16g) — same input, fresh subprocess per
leg, a pinned spin probe on core 31 annotating host steal per leg. The
relative 16g-vs-48g comparison inside one window is robust to the absolute
noise level. One JSON line per leg.

Usage: python tools/heap_falsification.py [n_events] [heapA heapB ...]
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from scaling_protocol import run_leg  # noqa: E402  (shared leg runner)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    heaps = sys.argv[2:] or ["16g", "48g", "48g", "16g"]
    input_dir = f"/tmp/scaling_input_{n}"
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        print(json.dumps({"error": f"missing input {input_dir}"}), flush=True)
        return
    for i, heap in enumerate(heaps):
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
        rec = run_leg("8", "0-7", input_dir)
        rec.update(n_events=n, leg_index=i, heap=heap)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
