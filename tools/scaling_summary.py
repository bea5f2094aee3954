"""Summarize a scaling_protocol JSONL log: per-size per-leg draws, minima,
efficiency by the per-leg-minimum estimator, probe annotations.

Usage: python tools/scaling_summary.py measurements/round5/scaling_r5.jsonl
"""

import json
import sys
from collections import defaultdict

path = sys.argv[1]
by = defaultdict(lambda: defaultdict(list))
for line in open(path):
    line = line.strip()
    if not line:
        continue
    r = json.loads(line)
    if "error" in r:
        print("ERROR LEG:", r["error"][:200])
        continue
    by[r["n_events"]][r["cpus"]].append(r)

for n in sorted(by):
    print(f"== {n:,} events ==")
    for cpus in sorted(by[n]):
        for r in by[n][cpus]:
            probe = (
                f"probe_med {r.get('probe_median', 0)/1e6:.2f}M slow {r.get('probe_slow_share', '?')}"
                if "probe_median" in r
                else "unprobed"
            )
            print(
                f"  {cpus}c: {r['sec']:8.1f}s  {r['events_per_sec']:10,.0f} ev/s  {probe}  ts={r.get('ts')}"
            )
    if 2 in by[n] and 8 in by[n]:
        t2 = min(r["sec"] for r in by[n][2])
        t8 = min(r["sec"] for r in by[n][8])
        print(
            f"  per-leg minima: T2={t2:.1f} T8={t8:.1f}  efficiency=(T2/T8)/4 = {(t2/t8)/4:.3f}"
        )
