#!/usr/bin/env python
"""Single-box scaling-ceiling probe: per-core DRAM bandwidth at 2 vs 8
pinned cores.

One worker per core repeatedly sums a 256 MiB float64 buffer (DRAM-bound,
no allocation in the loop). The ratio of per-core bandwidth at 8 vs 2
cores is the HARDWARE ceiling on 2->8-core scaling efficiency for any
memory-bound job on this machine — context for the BASELINE.md scaling
numbers (a real N vs 4N executor cluster adds sockets and aggregate
bandwidth instead of dividing one socket's).
"""
import subprocess
import sys

WORKER = r"""
import numpy as np, time
a = np.ones(32 * 1024 * 1024)  # 256 MiB
t_end = time.perf_counter() + 8.0
n = 0
while time.perf_counter() < t_end:
    a.sum()
    n += 1
print(n * a.nbytes / 8.0 / 1e9)
"""


def main() -> None:
    for cores, ncores in (("0-1", 2), ("0-7", 8)):
        procs = [
            subprocess.Popen(
                ["taskset", "-c", cores, sys.executable, "-c", WORKER],
                stdout=subprocess.PIPE, text=True,
            )
            for _ in range(ncores)
        ]
        total = sum(float(p.communicate()[0]) for p in procs)
        print(
            f"{ncores} pinned cores: total {total:.1f} GB/s, "
            f"per-core {total / ncores:.2f} GB/s"
        )


if __name__ == "__main__":
    main()
