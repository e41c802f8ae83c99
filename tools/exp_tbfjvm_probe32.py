"""Decompose the TBF-jvm forest probe at local[32] (scaling.json's
one remaining anti-scaling row: 3.66 Mk/s at local[8] vs 1.63 at
local[32], 4M probe keys vs a 110 MB / 50M-key forest).

Hypothesis: the probe is per-worker-assembly-bound, not kernel-bound —
every python worker assembles its own private (S*nb, 4) u64 matrix
(~110 MB) before probing ~125k keys; at 32 workers that is 3.5 GB of
zero+copy against a memory system that saturates at ~8 streams.
Content-keyed worker caches should make LATER trials fast; a larger
probe set should amortize the fixed cost away.

Prints one JSON line with per-trial times.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from libfilter_spark.spark.session import get_spark  # noqa: E402
from libfilter_spark.spark.keys import with_content_key_bin  # noqa: E402
from libfilter_spark.spark.forest import (  # noqa: E402
    build_filter_forest, probe_with_forest)


def main() -> None:
    cpus = int(os.environ.get("EXP_CPUS", "32"))
    n = int(os.environ.get("EXP_N", str(50_000_000)))
    n_probe = int(os.environ.get("EXP_NPROBE", str(4_000_000)))
    spark = get_spark("tbfjvm-probe32", cpus=cpus,
                      shuffle_partitions=2 * cpus)
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

    t0 = time.perf_counter()
    forest = build_filter_forest(keys, "key", "taffy_block", ndv=n,
                                 fpp=0.004, n_shards=4 * cpus,
                                 engine="jvm")
    rows = forest.collect()
    build_s = time.perf_counter() - t0
    forest_df = spark.createDataFrame(rows, forest.schema).cache()
    forest_df.count()
    fbytes = sum(len(bytes(r["filter"])) for r in rows)

    small = (spark.range(0, n_probe, numPartitions=2 * cpus)
             .withColumn("content", F.col("id").cast("string")))
    skeys = with_content_key_bin(small, "content").select("key")
    skeys.count()

    out = {"cpus": cpus, "n": n, "filter_bytes": fbytes,
           "build_s": round(build_s, 3), "trials_small": [],
           "trials_full": []}
    for _ in range(4):
        t0 = time.perf_counter()
        found = probe_with_forest(skeys, forest_df, "key") \
            .where("maybe_seen").count()
        out["trials_small"].append(round(time.perf_counter() - t0, 3))
        assert found == n_probe, (found, n_probe)
    for _ in range(2):
        t0 = time.perf_counter()
        found = probe_with_forest(keys, forest_df, "key") \
            .where("maybe_seen").count()
        out["trials_full"].append(round(time.perf_counter() - t0, 3))
        assert found == n, (found, n)
    out["small_keys_per_s_best"] = round(
        n_probe / min(out["trials_small"]))
    out["full_keys_per_s_best"] = round(n / min(out["trials_full"]))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
