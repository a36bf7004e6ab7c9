"""Receipt probe (r16): per-micro-batch plan-call wall for the e34
drain — times each incremental_lsh_dups call (plan build + validation
jobs) inside the real streaming_ingest_dedup drain, the receipt behind
the round report's per-batch fixed-cost numbers."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pyspark.sql import functions as F
from projet_graphdb_spark.engine import get_spark
from projet_graphdb_spark.functions import dedup
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="probe-e34b")
E.entry(spark).count()
docs = E._docs(spark, sf_dir)
is_new = F.col("source").isin("src0","src1")
new_batch = docs.where(is_new); corpus = docs.where(~is_new)
base = tempfile.mkdtemp(prefix="probe_e34b_")
new_batch.repartition(4).write.mode("overwrite").parquet(base+"/shard")
dedup.lsh_band_index(corpus, hash="md5").write.mode("overwrite").partitionBy("band").parquet(base+"/index")
schema = spark.read.parquet(base+"/shard").schema
index = spark.read.parquet(base+"/index")

calls, writes = [], []
orig = dedup.incremental_lsh_dups
def timed(*a, **k):
    t0 = time.time(); out = orig(*a, **k); calls.append(round(time.time()-t0,3)); return out
dedup.incremental_lsh_dups = timed

from projet_graphdb_spark.streaming import state_partitions, streaming_ingest_dedup
t0 = time.time()
with state_partitions(spark, 8):
    q = streaming_ingest_dedup(spark, base+"/shard", schema, corpus, index,
                               base+"/pairs", base+"/ckpt", threshold=0.2, hash="md5")
    q.awaitTermination(300)
t_drain = time.time()-t0
print("drain:", round(t_drain,2), "plan-calls:", calls, "sum:", round(sum(calls),2))
