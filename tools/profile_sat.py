"""Phase-level profile of one sat merge batch at bench scale."""
import os, sys, time, tempfile, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
from pyelt_spark.session import get_session
from pyspark.sql import functions as F
spark = get_session("profsat", master="local[32]", shuffle_partitions=32)
from pyelt_spark.entry_queries import derived_events
from pyelt_spark.plans.pipeline import TranscriptVault
import pyelt_spark.operators.scd2 as scd2

# time phases by wrapping the actions apply_batch takes
import pyelt_spark.storage.lake as lake
t = {"collect_affected": 0.0, "verdict_agg": 0.0, "hist_commit": 0.0, "head_commit": 0.0}
orig_commit = lake.LakeTable.commit
def commit_timed(self, *a, **k):
    t0 = time.perf_counter()
    out = orig_commit(self, *a, **k)
    key = "hist_commit" if self.path.endswith("hist") else "head_commit"
    t[key] += time.perf_counter() - t0
    print(f"      commit {os.path.basename(self.path)}: {time.perf_counter()-t0:.2f}s", flush=True)
    return out
lake.LakeTable.commit = commit_timed

ev = derived_events(spark, SF)
n = ev.count()
ev = ev.withColumn("batch_id", F.floor(F.col("seq") / F.lit(max(n // 8, 1))).cast("long")).persist(); ev.count()
root = tempfile.mkdtemp(prefix="profsat_", dir="/dev/shm")
vault = TranscriptVault(spark, root, num_buckets=32)
m = vault.sat_merge
for b in range(8):
    bdf = ev.filter(F.col("batch_id") == b)
    t0 = time.perf_counter()
    # replicate apply_batch phases with timing
    import pyelt_spark.operators.dedup as ded
    # run the real thing but time sections via micro-patches
    out = m.apply_batch(vault.sat, bdf, b)
    print(f"  sat batch {b}: {time.perf_counter()-t0:.2f}s {out.get('inserted')}i {out.get('updated')}u", flush=True)
shutil.rmtree(root, ignore_errors=True)
