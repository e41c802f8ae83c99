"""Task-1 experiment 2: the shuffle leg dominates the forest build
(B_shuffle = 57% of local[2] wall, eff 0.64 — exp_forest_decomp). Can
narrower shuffle rows fix it?

Variants (one JVM per cpus config; min-of-2 per variant in-process):
- bin       : baseline — binary(8) keys end-to-end
- long      : keys derived as int64 (conv hex,-10) — 16 B fixed-width
              UnsafeRow vs 24+ B binary row; plain long Arrow vector
- conv      : binary keys converted to int64 JUST for the build
              (hex+conv inside the plan)
- bin_nc    : baseline in a second JVM with spark.shuffle.compress=false
              (sha keys are incompressible; lz4 is pure overhead)
- long_nc   : long variant in the nocompress JVM

Usage: python tools/exp_forest_shuffle.py [n_keys] [cpus ...]
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
from libfilter_spark.spark.keys import with_content_key, with_content_key_bin
from libfilter_spark.spark.forest import build_filter_forest

cpus, n, nc = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3] == "nc"
extra = {"spark.shuffle.compress": "false",
         "spark.shuffle.spill.compress": "false"} if nc else None
spark = get_spark("shuf-exp", cpus=cpus, shuffle_partitions=2 * cpus,
                  extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1 << 22).count()
df = (spark.range(0, n, numPartitions=2 * cpus)
      .withColumn("content", F.col("id").cast("string")))
kbin = with_content_key_bin(df, "content").select("key")
klong = with_content_key(df, "content", hex_col=None).select("key")
kconv = kbin.select(F.conv(F.hex("key"), 16, -10).cast("long")
                    .alias("key"))
kbin.count()
import pandas as pd
def _noop(batches):
    for pdf in batches:
        pass
    yield pd.DataFrame({"n": [0]})
kbin.mapInPandas(_noop, schema="n long").count()

def timed(keys):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = build_filter_forest(keys, "key", "taffy_cuckoo", ndv=n,
                                   fpp=0.004, n_shards=2 * cpus,
                                   freeze=False).collect()
        best = min(best, time.perf_counter() - t0)
        assert sum(r["n_keys"] for r in rows) == n
    return {"s": round(best, 3), "keys_per_s": round(n / best)}

out = {"cpus": cpus, "n": n, "nc": nc}
if nc:
    out["bin_nc"] = timed(kbin)
    out["long_nc"] = timed(klong)
else:
    out["bin"] = timed(kbin)
    out["long"] = timed(klong)
    out["conv"] = timed(kconv)
print(json.dumps(out))
spark.stop()
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus_list = [int(c) for c in sys.argv[2:]] or [2, 8]
    results = {}
    for c in cpus_list:
        merged = {}
        for mode in ("std", "nc"):
            r = subprocess.run(
                [sys.executable, "-c", JOB.replace("@REPO@", repo),
                 str(c), str(n), mode],
                capture_output=True, text=True, timeout=3000, cwd=repo)
            if r.returncode != 0:
                raise RuntimeError(r.stderr[-3000:])
            merged.update(json.loads(r.stdout.strip().splitlines()[-1]))
        results[c] = merged
        print(json.dumps(merged))
    if len(cpus_list) >= 2:
        lo, hi = cpus_list[0], cpus_list[-1]
        for tag in ("bin", "long", "conv", "bin_nc", "long_nc"):
            if tag in results[lo] and tag in results[hi]:
                eff = results[hi][tag]["keys_per_s"] / (
                    (hi / lo) * results[lo][tag]["keys_per_s"])
                print(f"{tag}: {lo}->{hi} efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
