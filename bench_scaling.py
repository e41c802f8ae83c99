"""Two-cluster-size scaling benchmark (north-rule criterion).

A real N vs 4N executor cluster is unavailable in this sandbox, so —
per the driver instruction — the same job runs at two parallelism
levels (local[8] vs local[32], fresh JVM each) on identical input,
and we report throughput at both plus scaling efficiency
(throughput_4N / (4 x throughput_N)).

The job is the headline filter build: sha256-derive keys JVM-side for
N synthetic rows, map-side partial block-filter build, blob merge.
Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python bench_scaling.py [n_keys]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

JOB = r"""
import json, os, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from libfilter_spark.spark.session import get_spark
from libfilter_spark.spark.keys import with_content_key_bin
from libfilter_spark.spark.build import build_filters
from libfilter_spark.spark.probe import probe_with_filters

cpus = int(sys.argv[1])
n = int(sys.argv[2])
spark = get_spark("scaling-bench", cpus=cpus, shuffle_partitions=2 * cpus)
spark.range(1 << 22).count()  # JVM + codegen warmup

df = (spark.range(0, n, numPartitions=2 * cpus)
      .withColumn("content", F.col("id").cast("string")))
keys = with_content_key_bin(df, "content").select("key")
keys.count()  # warm the scan path

# warm the Python workers (this sandbox shows bursty first-stage
# worker startup); min-of-3 trials below matches the reference's
# min-of-7 methodology (taffy.tex:1787)
import pandas as pd
def _noop(batches):
    for pdf in batches:
        pass
    yield pd.DataFrame({"n": [0]})
keys.mapInPandas(_noop, schema="n long").count()

build_s = float("inf")
row = None
for _ in range(3):
    t0 = time.perf_counter()
    filters = build_filters(keys, None, ndv=n, fpp=0.004)
    row = filters.collect()[0]
    build_s = min(build_s, time.perf_counter() - t0)

filters_df = spark.createDataFrame(
    [(row["family"], row["params"], row["n_keys"], row["n_partials"],
      row["filter"])],
    "family string, params string, n_keys long, n_partials long, filter binary")
probe_s = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    found = probe_with_filters(keys, filters_df, None) \
        .where("maybe_seen").count()
    probe_s = min(probe_s, time.perf_counter() - t0)
    assert found == n, (found, n)
print(json.dumps({"cpus": cpus, "n": n,
                  "build_s": round(build_s, 3),
                  "probe_s": round(probe_s, 3),
                  "build_keys_per_s": round(n / build_s),
                  "probe_keys_per_s": round(n / probe_s),
                  "filter_bytes": len(row["filter"])}))
spark.stop()
"""


def run_at(cpus: int, n: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, "-c", JOB.replace("@REPO@", repo), str(cpus),
         str(n)],
        capture_output=True, text=True, timeout=1200, cwd=repo)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else \
        int(os.environ.get("SPARK_GRAFT_SCALING_KEYS", 20_000_000))
    lo, hi = 8, 32
    r_lo = run_at(lo, n)
    r_hi = run_at(hi, n)
    build_eff = r_hi["build_keys_per_s"] / (
        (hi / lo) * r_lo["build_keys_per_s"])
    probe_eff = r_hi["probe_keys_per_s"] / (
        (hi / lo) * r_lo["probe_keys_per_s"])
    result = {
        "metric": "scaling_efficiency_build",
        "value": round(build_eff, 3),
        "unit": "ratio",
        "n_keys": n,
        f"local[{lo}]": r_lo,
        f"local[{hi}]": r_hi,
        "probe_efficiency": round(probe_eff, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(f"""# BENCH/BASELINE — measured numbers (this repo)

## Scaling: same job at two parallelism levels (north-rule stand-in
## for N vs 4N executors; no real cluster in this sandbox)

Job: {n:,} sha256-derived keys (JVM-side derivation) → map-side
partial block-filter build (fpp=0.004, the reference growth-sweep
config) → blob-only shuffle merge; then broadcast probe of all keys.

| config | build keys/s | probe keys/s | build s | probe s |
|---|---|---|---|---|
| local[{lo}]  | {r_lo['build_keys_per_s']:,} | {r_lo['probe_keys_per_s']:,} | {r_lo['build_s']} | {r_lo['probe_s']} |
| local[{hi}] | {r_hi['build_keys_per_s']:,} | {r_hi['probe_keys_per_s']:,} | {r_hi['build_s']} | {r_hi['probe_s']} |

**Scaling efficiency (build): {build_eff:.3f}** — throughput_{hi} /
({hi // lo} x throughput_{lo}); target >= 0.8 (BASELINE.md §D).
Probe efficiency: {probe_eff:.3f}.

## Reference anchors (BASELINE.md §A)

- SimdBlockFilter insert ≈ 34-35 M keys/s on one i7-7800X core.
- Our per-core build rate: {r_hi['build_keys_per_s'] / hi / 1e6:.2f} M keys/s/core at local[{hi}]
  (numpy batch kernels + Arrow transfer + JVM sha256 derivation,
  i.e. including key hashing that the reference benchmark excludes).
- Filter size at fpp=0.004: {r_hi['filter_bytes']:,} bytes for {n:,} keys
  ({8 * r_hi['filter_bytes'] / n:.2f} bits/key).
""")


if __name__ == "__main__":
    main()
