"""Profile the bench replay: per-batch wall + per-phase breakdown via
monkeypatched timers around the sat/hub merge internals. Dev tool only."""

import os
import sys
import time
import tempfile
import shutil
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyelt_spark.session import get_session
from pyspark.sql import functions as F

spark = get_session("profile", master="local[32]", shuffle_partitions=32)

from pyelt_spark.entry_queries import derived_events
from pyelt_spark.plans.pipeline import TranscriptVault
from pyelt_spark.streaming.runner import MicrobatchRunner
from pyelt_spark.storage import lake

ev = derived_events(spark, SF_DIR)
n = ev.count()
ev = ev.withColumn("batch_id", F.floor(F.col("seq") / F.lit(max(n // 8, 1))).cast("long")).persist()
ev.count()

# timers on LakeTable.stage / commit
times = defaultdict(float)
counts = defaultdict(int)
orig_stage, orig_commit = lake.LakeTable.stage, lake.LakeTable.commit

def stage(self, *a, **kw):
    t0 = time.perf_counter()
    r = orig_stage(self, *a, **kw)
    tag = "stage:" + os.path.basename(self.path)
    times[tag] += time.perf_counter() - t0
    counts[tag] += 1
    return r

def commit(self, *a, **kw):
    t0 = time.perf_counter()
    r = orig_commit(self, *a, **kw)
    tag = "commit:" + os.path.basename(self.path) + (":staged" if kw.get("staged") is not None else ":write" if (a and a[0] is not None) else ":meta")
    times[tag] += time.perf_counter() - t0
    counts[tag] += 1
    return r

lake.LakeTable.stage, lake.LakeTable.commit = stage, commit

import traceback
from pyspark.sql import DataFrame as _DF
orig_collect = _DF.collect

def coll(self):
    t0 = time.perf_counter()
    r = orig_collect(self)
    fr = [f for f in traceback.extract_stack() if "pyelt_spark" in f.filename or "profile" in f.filename]
    tag = "collect:" + (f"{os.path.basename(fr[-1].filename)}:{fr[-1].lineno}" if fr else "?")
    times[tag] += time.perf_counter() - t0
    counts[tag] += 1
    return r

_DF.collect = coll

# timer on the verdict-count collect inside Scd2Merge: wrap DataFrame.collect is
# too broad; instead patch scd2-level via time around apply_batch pieces is
# invasive — rely on stage/commit splits + batch walls.

root = tempfile.mkdtemp(prefix="prof_vault_", dir="/dev/shm")
vault = TranscriptVault(spark, root, num_buckets=32)
walls = []
t_all = time.perf_counter()

def on_batch(b, m):
    walls.append(time.perf_counter())

t0 = time.perf_counter()
MicrobatchRunner(vault).replay(ev, on_batch=on_batch)
total = time.perf_counter() - t0
prev = t0
print(f"TOTAL replay {total:.2f}s  n={n}")
for i, w in enumerate(walls):
    print(f"  batch {i}: {w - prev:.3f}s")
    prev = w
for k in sorted(times):
    print(f"  {k:35s} {times[k]:7.3f}s  n={counts[k]}")
shutil.rmtree(root, ignore_errors=True)
spark.stop()
