"""Task-1 experiment: cuckoo-forest Arrow-IPC ceiling.

In-process A/B (min-of-N per variant, one JVM per parallelism level)
of the streamed forest build engines:

- arrow          : thin-row mapInArrow stream (round-4 shipped path)
- arrow_big      : same + arrow.maxRecordsPerBatch raised 10k -> 500k
- arrow_packed   : same-partition collect_list packing (~64k keys/row)

Usage: python tools/exp_forest_ipc.py [n_keys] [family] [cpus ...]
Prints one JSON line per cpus config.
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
from libfilter_spark.spark.forest import build_filter_forest

cpus, n, family = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark("ipc-exp", cpus=cpus, shuffle_partitions=2 * cpus)
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
keys.mapInPandas(_noop, schema="n long").count()  # warm python workers

out = {"cpus": cpus, "n": n, "family": family}
def timed(tag, engine, conf=None):
    old = None
    if conf:
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", conf)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = build_filter_forest(keys, "key", family, ndv=n, fpp=0.004,
                                   n_shards=2 * cpus, freeze=False,
                                   engine=engine).collect()
        best = min(best, time.perf_counter() - t0)
        assert sum(r["n_keys"] for r in rows) == n
    if old is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    out[tag] = {"s": round(best, 3), "keys_per_s": round(n / best)}

timed("arrow", "arrow")
timed("arrow_big", "arrow", conf="500000")
timed("arrow_packed", "arrow_packed")
timed("arrow_packed_big", "arrow_packed", conf="500000")
print(json.dumps(out))
spark.stop()
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    family = sys.argv[2] if len(sys.argv) > 2 else "taffy_cuckoo"
    cpus_list = [int(c) for c in sys.argv[3:]] or [2, 8]
    results = {}
    for c in cpus_list:
        r = subprocess.run(
            [sys.executable, "-c", JOB.replace("@REPO@", repo),
             str(c), str(n), family],
            capture_output=True, text=True, timeout=3000, cwd=repo)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-3000:])
        results[c] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(results[c]))
    if len(cpus_list) >= 2:
        lo, hi = cpus_list[0], cpus_list[-1]
        for tag in ("arrow", "arrow_big", "arrow_packed",
                    "arrow_packed_big"):
            eff = results[hi][tag]["keys_per_s"] / (
                (hi / lo) * results[lo][tag]["keys_per_s"])
            print(f"{tag}: {lo}->{hi} efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
