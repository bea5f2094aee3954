"""Profile the vault replay: wall per batch + per-phase timings via
monkeypatched timers around the sat/hub/link apply_batch calls."""
import os, sys, time, tempfile, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"

from pyelt_spark.session import get_session
from pyspark.sql import functions as F
spark = get_session("profile", master=f"local[{CPUS}]", shuffle_partitions=max(int(CPUS), 8))

from pyelt_spark.entry_queries import derived_events
from pyelt_spark.plans.pipeline import TranscriptVault
from pyelt_spark.streaming.runner import MicrobatchRunner
import pyelt_spark.operators.scd2 as scd2
import pyelt_spark.operators.hubs as hubs

# wrap with timers
orig_sat = scd2.Scd2Merge.apply_batch
orig_hub = hubs.HubMerge.apply_batch
def timed(orig, name):
    def f(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        print(f"    {name}: {time.perf_counter()-t0:.2f}s", flush=True)
        return out
    return f
scd2.Scd2Merge.apply_batch = timed(orig_sat, "sat")
hubs.HubMerge.apply_batch = timed(orig_hub, "hub/link")

ev = derived_events(spark, SF)
n = ev.count()
ev = ev.withColumn("batch_id", F.floor(F.col("seq") / F.lit(max(n // 8, 1))).cast("long")).persist()
ev.count()
root = tempfile.mkdtemp(prefix="prof_vault_", dir="/dev/shm")
vault = TranscriptVault(spark, root, num_buckets=max(int(CPUS), 8))
t0 = time.perf_counter()
def ob(b, m):
    print(f"  batch {b}: total {time.perf_counter()-ob.t:.2f}s", flush=True)
    ob.t = time.perf_counter()
ob.t = t0
MicrobatchRunner(vault).replay(ev, on_batch=ob)
print(f"TOTAL {time.perf_counter()-t0:.2f}s for {n} events", flush=True)
shutil.rmtree(root, ignore_errors=True)
