"""In-process A/B of the grouped-probe batch body: pandas groupby vs
numpy argsort segmentation (probe.py _broadcast_probe_udf). No Spark —
the closure bodies run directly on synthetic Arrow batches, so the
delta is pure per-batch dispatch overhead, isolated from shuffle/IPC
and from the sandbox's cross-run throttle.

Shape mirrors the TCF forest probe: S shards, 10k-row Arrow batches
(the default maxRecordsPerBatch), int64 keys routed by shard.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

from libfilter_spark.filters.taffy_cuckoo import TaffyCuckooFilter  # noqa: E402
from libfilter_spark.kernels.keys import shard_of_keys, splitmix64  # noqa: E402


def body_pandas(filters, gcol, keys):
    out = np.zeros(len(keys), dtype=bool)
    gdf = pd.DataFrame({0: gcol.to_pandas()})
    for g, sub in gdf.groupby([0], sort=False):
        g = g if isinstance(g, tuple) else (g,)
        f = filters.get(g)
        if f is not None:
            idx = sub.index.to_numpy()
            out[idx] = f.find_hashes(keys[idx])
    return out


def body_argsort(filters, gcol, keys):
    out = np.zeros(len(keys), dtype=bool)
    g = np.asarray(gcol.to_numpy(zero_copy_only=False))
    order = np.argsort(g, kind="stable")
    gs = g[order]
    bounds = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]).tolist()
    bounds.append(len(gs))
    for b, e in zip(bounds, bounds[1:]):
        f = filters.get((int(gs[b]),))
        if f is not None:
            idx = order[b:e]
            out[idx] = f.find_hashes(keys[idx])
    return out


def main() -> None:
    n_shards = int(os.environ.get("EXP_SHARDS", "64"))
    n_keys = int(os.environ.get("EXP_KEYS", str(2_000_000)))
    batch = int(os.environ.get("EXP_BATCH", "10000"))
    keys = splitmix64(n_keys, seed=11)
    shards = shard_of_keys(keys, n_shards, binary=False)
    filters = {}
    for s in range(n_shards):
        f = TaffyCuckooFilter.create_with_bytes(1 << 14)
        f.add_hashes(keys[shards == s])
        filters[(s,)] = f
    batches = []
    for off in range(0, n_keys, batch):
        k = keys[off:off + batch]
        batches.append((pa.array(shards[off:off + batch]), k))

    res = {"n_shards": n_shards, "n_keys": n_keys, "batch_rows": batch}
    # interleave min-of-3 so one throttle episode can't poison a side
    for name, fn in (("pandas_groupby", body_pandas),
                     ("argsort_segment", body_argsort)):
        fn(filters, *batches[0])  # warm
    for name, fn in (("pandas_groupby", body_pandas),
                     ("argsort_segment", body_argsort)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            hits = 0
            for gcol, k in batches:
                hits += int(fn(filters, gcol, k).sum())
            best = min(best, time.perf_counter() - t0)
        assert hits == n_keys  # zero FN
        res[name] = {"s": round(best, 3),
                     "ns_per_key": round(best / n_keys * 1e9)}
    res["speedup"] = round(res["pandas_groupby"]["s"]
                           / res["argsort_segment"]["s"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
