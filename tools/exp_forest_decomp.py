"""Task-1 decomposition: WHERE does the streamed cuckoo-forest build
lose its 2->8 scaling? Cumulative stage times, one JVM per config:

  A scan+sha       : keys.count()               (JVM only)
  B +route+shuffle : routed.count()             (+ xxhash64 + exchange)
  C +arrow-ipc     : routed.mapInArrow(consume) (+ stream into Python,
                      keys materialized to numpy, no inserts)
  D +inserts       : full TCF forest build

Usage: python tools/exp_forest_decomp.py [n_keys] [cpus ...]
"""

import json
import os
import subprocess
import sys

JOB = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from libfilter_spark.spark.session import get_spark
from libfilter_spark.spark.keys import with_content_key_bin
from libfilter_spark.spark.forest import build_filter_forest, with_shard, SHARD_COL

cpus, n = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark("decomp", cpus=cpus, shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1 << 22).count()
df = (spark.range(0, n, numPartitions=2 * cpus)
      .withColumn("content", F.col("id").cast("string")))
keys = with_content_key_bin(df, "content").select("key")
keys.count()
import pandas as pd
def _noop(batches):
    for pdf in batches:
        pass
    yield pd.DataFrame({"n": [0]})
keys.mapInPandas(_noop, schema="n long").count()

n_shards = 2 * cpus
routed = with_shard(keys.where(F.col("key").isNotNull()), "key",
                    n_shards).repartition(n_shards, SHARD_COL) \
    .select("key")

def consume(batches):
    import pyarrow as pa
    from libfilter_spark.kernels.keys import keys_from_arrow
    tot = 0
    s = 0
    for batch in batches:
        if batch.num_rows:
            k = keys_from_arrow(batch.column(0))
            s += int(k[0])          # defeat laziness
            tot += len(k)
    yield pa.RecordBatch.from_pydict({"n": pa.array([tot], type=pa.int64())})

def timed(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)

out = {"cpus": cpus, "n": n}
out["A_scan_sha"] = timed(lambda: keys.count())
out["B_shuffle"] = timed(lambda: routed.count())
out["C_ipc"] = timed(lambda: routed.mapInArrow(
    consume, schema="n long").agg(F.sum("n")).collect())
out["D_full"] = timed(lambda: build_filter_forest(
    keys, "key", "taffy_cuckoo", ndv=n, fpp=0.004,
    n_shards=n_shards, freeze=False).collect())
print(json.dumps(out))
spark.stop()
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus_list = [int(c) for c in sys.argv[2:]] or [2, 8, 32]
    results = {}
    for c in cpus_list:
        r = subprocess.run(
            [sys.executable, "-c", JOB.replace("@REPO@", repo),
             str(c), str(n)],
            capture_output=True, text=True, timeout=3000, cwd=repo)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-3000:])
        results[c] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(results[c]))
    if len(cpus_list) >= 2:
        lo, hi = cpus_list[0], cpus_list[1]
        for st in ("A_scan_sha", "B_shuffle", "C_ipc", "D_full"):
            eff = results[lo][st] / (results[hi][st] * (hi / lo))
            print(f"{st}: {lo}->{hi} eff {eff:.3f} "
                  f"({results[lo][st]}s -> {results[hi][st]}s)")


if __name__ == "__main__":
    main()
