#!/usr/bin/env python
"""Scaling-evidence runner (BASELINE.md north rule, sandbox protocol).

Runs the identical merge-apply replay at N=2 and 4N=8 taskset-pinned
cores over the same pre-generated input, as a sequence of INTERLEAVED
single-leg subprocesses (per size: 2,8,8,2,2,8 — an ABBA/AB order so
slow host drift hits both levels symmetrically), and prints one JSON
line per leg. Pairing and efficiency analysis happen offline from the
log; nothing else may run on the box during a set.

Usage: python tools/scaling_protocol.py [n_events ...]
Input parquet must already exist at /tmp/scaling_input_{n} (bench.py
--scaling generates it on first use).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEG_ORDER = [("2", "0-1"), ("8", "0-7"), ("8", "0-7"), ("2", "0-1"), ("2", "0-1"), ("8", "0-7")]


def run_leg(cpus: str, cpuset: str, input_dir: str) -> dict:
    cmd = [
        "taskset", "-c", cpuset,
        sys.executable, os.path.join(REPO, "bench.py"),
        "--scaling-worker", cpus, input_dir,
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    # objective contamination marker: a spin probe pinned to a core the
    # leg never touches; depressed probe windows = host steal during the
    # leg (see tools/noise_probe.py)
    probe_path = f"/tmp/noise_probe_{os.getpid()}.log"
    probe = subprocess.Popen(
        ["taskset", "-c", "31", sys.executable,
         os.path.join(REPO, "tools", "noise_probe.py"), probe_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    finally:
        probe.terminate()
        probe.wait()
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1]) if lines else {"error": p.stderr[-500:]}
    rec.update(
        cpus=int(cpus),
        wall_outer=round(time.time() - t0, 1),
        ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    try:
        with open(probe_path) as f:
            raw = [int(l) for l in f if l.strip()]
        os.unlink(probe_path)
        if len(raw) > 20:
            # drop the first 5 windows in ARRIVAL order (interpreter/JIT
            # warmup), THEN sort for the quantiles — sorting first would
            # discard the 5 slowest windows, i.e. exactly the host-steal
            # signal the probe exists to detect (ADVICE r4)
            wins = sorted(raw[5:])
            med = wins[len(wins) // 2]
            p05 = wins[len(wins) // 20]
            # share of windows at <80% of the leg's own median rate
            slow = sum(1 for w in wins if w < 0.8 * med) / len(wins)
            rec.update(
                probe_median=med, probe_p05=p05,
                probe_slow_share=round(slow, 4),
            )
    except OSError:
        pass
    return rec


def main() -> None:
    if sys.argv[1:2] == ["--legs"]:
        # explicit leg list, e.g. --legs 8:32000000,2:16000000 — used for
        # supplementary samples (the per-leg-minimum estimator under
        # one-sided host noise benefits from extra wide-leg draws)
        legs = []
        for spec in sys.argv[2].split(","):
            cpus, n = spec.split(":")
            legs.append((cpus, "0-1" if cpus == "2" else "0-7", int(n)))
        for i, (cpus, cpuset, n) in enumerate(legs):
            rec = run_leg(cpus, cpuset, f"/tmp/scaling_input_{n}")
            rec.update(n_events=n, leg_index=i, supplementary=True)
            print(json.dumps(rec), flush=True)
        return
    sizes = [int(s) for s in (sys.argv[1:] or ["16000000"])]
    for n in sizes:
        input_dir = f"/tmp/scaling_input_{n}"
        if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
            print(json.dumps({"error": f"missing input {input_dir}"}), flush=True)
            continue
        for i, (cpus, cpuset) in enumerate(LEG_ORDER):
            rec = run_leg(cpus, cpuset, input_dir)
            rec.update(n_events=n, leg_index=i)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
