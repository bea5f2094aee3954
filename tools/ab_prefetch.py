"""A/B the sat-lane one-ahead prefetch inside ONE warm JVM.

Alternates prefetch-on / prefetch-off replays (fresh /dev/shm vault per
draw) over the same persisted bench event stream, warmup draw first, so
JIT state and host noise hit both arms symmetrically. Dev tool only.

Usage: python tools/ab_prefetch.py [draws_per_arm] (default 3)
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DRAWS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

from pyelt_spark.session import get_session
from pyspark.sql import functions as F

spark = get_session("ab_prefetch", master="local[32]", shuffle_partitions=32)

from pyelt_spark.entry_queries import derived_events
from pyelt_spark.plans.pipeline import TranscriptVault
from pyelt_spark.streaming.runner import MicrobatchRunner

ev = derived_events(spark, SF_DIR)
n = ev.count()
ev = ev.withColumn(
    "batch_id", F.floor(F.col("seq") / F.lit(max(n // 8, 1))).cast("long")
).persist()
ev.count()


def one(prefetch: bool) -> float:
    root = tempfile.mkdtemp(prefix="ab_vault_", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        MicrobatchRunner(
            TranscriptVault(spark, root, num_buckets=32), prefetch=prefetch
        ).replay(ev)
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


print(f"warmup(on)  {one(True):.2f}s  n={n}", flush=True)
res = {True: [], False: []}
for i in range(DRAWS):
    for arm in (False, True) if i % 2 else (True, False):
        t = one(arm)
        res[arm].append(t)
        print(f"draw {i} prefetch={arm}: {t:.2f}s", flush=True)
for arm in (True, False):
    xs = res[arm]
    print(
        f"prefetch={arm}: min {min(xs):.2f}  med {sorted(xs)[len(xs)//2]:.2f}  all {[round(x,2) for x in xs]}"
    )
spark.stop()
