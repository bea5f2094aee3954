#!/usr/bin/env python
"""Host-noise probe: a pinned single-core spin loop that logs achieved
iterations per 100 ms window. On a quiet machine the rate is flat; host
steal (co-tenant load on the shared hypervisor) shows up as windows with
depressed counts. Run pinned to a core DISJOINT from the measured job
(e.g. taskset -c 31) so the probe observes interference without adding
any — a register spin has no memory-bandwidth footprint.

Used by tools/scaling_protocol.py to annotate each scaling leg with an
objective contamination marker instead of eyeballing wall-clock outliers.
"""
import sys
import time


def main(out_path: str) -> None:
    with open(out_path, "w") as f:
        while True:
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < 0.1:
                for _ in range(10000):
                    pass
                n += 10000
            f.write(f"{n}\n")
            f.flush()


if __name__ == "__main__":
    main(sys.argv[1])
