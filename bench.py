"""Benchmark harness — prints ONE JSON line.

Headline metric: sustained CDC merge-apply throughput (change-events/sec)
of the full vault replay (dedup → hashdiff → hub/sat/link merge → commit)
over the change-event stream derived from $SPARK_GRAFT_SF_DIR's events
table, on local[$SPARK_GRAFT_CPUS].

Scaling-efficiency evidence (BASELINE.md north rule, sandbox protocol):
run ``python bench.py --scaling`` to execute the identical merge-apply job
at local[8] and local[32] on the same input and report throughput at both
plus efficiency = (T_8 / T_32) / 4. Written into the JSON under
``scaling`` (the per-round driver run uses the default single-level mode).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "cdc_latest_per_key",
    "cdc_changed_rows",
    "cdc_current_turns",   # triggers the full replay (memoized)
    "cdc_scd2_history",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "top_orders_per_customer",
    "events_hourly_rollup",
    "events_sessionize",
]


def _fresh_spark(n_cpus: str, app: str):
    from pyelt_spark.session import get_session

    return get_session(
        app,
        master=f"local[{n_cpus}]",
        shuffle_partitions=max(int(n_cpus), 8),
    )


def run_merge_apply(spark, sf_dir: str) -> tuple[float, int]:
    """The headline job: full vault replay. Returns (seconds, n_events)."""
    from pyspark.sql import functions as F

    from pyelt_spark.entry_queries import derived_events
    from pyelt_spark.plans.pipeline import TranscriptVault
    from pyelt_spark.streaming.runner import MicrobatchRunner

    ev = derived_events(spark, sf_dir)
    n = ev.count()
    # microbatch into 8 batches regardless of sf (sustained-throughput shape;
    # the correctness queries keep their fixed oracle batching)
    ev = ev.withColumn(
        "batch_id", F.floor(F.col("seq") / F.lit(max(n // 8, 1))).cast("long")
    ).persist()
    root = tempfile.mkdtemp(prefix="bench_vault_")
    try:
        vault = TranscriptVault(spark, root, num_buckets=max(int(CPUS), 8))
        t0 = time.perf_counter()
        MicrobatchRunner(vault).replay(ev)
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ev.unpersist()
    return dt, n


def run_scaling(sf_dir: str) -> dict:
    """Same job, two parallelism levels (N=8 and 4N=32 cores)."""
    out = {}
    for cpus in ("8", "32"):
        spark = _fresh_spark(cpus, f"bench_scaling_{cpus}")
        dt, n = run_merge_apply(spark, sf_dir)
        out[f"local[{cpus}]"] = {
            "sec": round(dt, 3),
            "events_per_sec": round(n / dt, 1),
            "n_events": n,
        }
        spark.stop()
    t8 = out["local[8]"]["sec"]
    t32 = out["local[32]"]["sec"]
    out["scaling_efficiency"] = round((t8 / t32) / 4, 3)
    return out


def main():
    scaling_mode = "--scaling" in sys.argv

    if scaling_mode:
        result = run_scaling(SF_DIR)
        print(json.dumps({"metric": "scaling", "sf": SF_DIR, **result}))
        return

    import __spark_entry__ as entry

    spark = _fresh_spark(CPUS, "bench")
    queries = entry.queries()

    # headline: merge-apply throughput
    merge_sec, n_events = run_merge_apply(spark, SF_DIR)

    per_query = {}
    total = merge_sec
    for name in BENCH_QUERIES:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "cdc_merge_apply_plus_queries_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {"cdc_merge_apply_replay": round(merge_sec, 3), **per_query},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "merge_apply_events_per_sec": round(n_events / merge_sec, 1),
                "merge_apply_n_events": n_events,
            }
        )
    )


if __name__ == "__main__":
    main()
