import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyelt_spark.session import get_session
from pyspark.sql import functions as F
spark = get_session("profmh", master="local[32]", shuffle_partitions=32)
SF = "/root/testdata/sf0.1"
d = spark.read.parquet(os.path.join(SF, "documents.parquet"))
print("docs:", d.count(), flush=True)

from pyelt_spark.operators.docdedup import _shingle_rows, minhash_lsh_pairs

t0=time.perf_counter()
sh = _shingle_rows(d, "doc_id", "text", 5).persist()
n = sh.count()
print(f"shingle explode+persist: {time.perf_counter()-t0:.2f}s rows={n}", flush=True)

t0=time.perf_counter()
hx = sh.select("_id", F.concat(F.sha2(F.col("_s"),256), F.sha2(F.concat(F.col("_s"),F.lit("#")),256)).alias("_hx"))
sig = hx.groupBy("_id").agg(*[F.min(F.substring("_hx",1+10*i,10)).alias(f"_m{i}") for i in range(12)])
sig.count()
print(f"signatures: {time.perf_counter()-t0:.2f}s", flush=True)

t0=time.perf_counter()
out = minhash_lsh_pairs(d, num_perm=12, bands=4, n=5, threshold=0.4)
print("pairs:", out.count(), f"full query: {time.perf_counter()-t0:.2f}s", flush=True)
# second run with warm everything
t0=time.perf_counter()
out = minhash_lsh_pairs(d, num_perm=12, bands=4, n=5, threshold=0.4)
print("pairs:", out.count(), f"warm rerun: {time.perf_counter()-t0:.2f}s", flush=True)
