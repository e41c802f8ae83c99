"""Pipeline A/B: live TCF forest probe 4M keys / 64 shards at
local[32] — assembled (new) vs grouped (pinned via _collected)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
import libfilter_spark.spark.probe as P
from libfilter_spark.spark.forest import (SHARD_COL, build_filter_forest,
                                          probe_with_forest, with_shard)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g").appName("x").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
n = 4_000_000
keys = spark.range(n).select(
    F.xxhash64(F.col("id").cast("string")).alias("key")).cache()
keys.count()
forest = build_filter_forest(keys, "key", "taffy_cuckoo",
                             ndv=n, fpp=0.01, n_shards=64,
                             freeze=False).cache()
rows = forest.collect()
blobs = {int(r["__shard"]): bytes(r["filter"]) for r in rows}
assert P._live_tcf_uniform(blobs)
grouped_collected = {(s,): ("taffy_cuckoo", b) for s, b in blobs.items()}

def fast():
    return probe_with_forest(keys, forest, "key").where("maybe_seen").count()
def grouped():
    routed = with_shard(keys, "key", 64)
    return P.probe_with_filters(routed, forest, [SHARD_COL], "key",
                                _collected=grouped_collected) \
        .where("maybe_seen").count()
assert fast() == n and grouped() == n   # warm + zero FN both routes
ts = {"assembled": [], "grouped": []}
for _ in range(3):
    t0=time.perf_counter(); c1=fast(); ts["assembled"].append(time.perf_counter()-t0)
    t0=time.perf_counter(); c2=grouped(); ts["grouped"].append(time.perf_counter()-t0)
    assert c1 == c2 == n
for k, v in ts.items():
    print(f"RES pipeline {k}: min {min(v):.2f} s = {n/min(v)/1e6:.2f} Mk/s ({[round(x,2) for x in v]})")
spark.stop()
