"""A/B: live-TCF forest probe via the new assembled route vs the
grouped per-shard route — Spark-free kernel and Spark pipeline."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import libfilter_spark.spark.probe as P
from libfilter_spark.filters import TaffyCuckooFilter
from libfilter_spark.kernels.keys import shard_of_keys, splitmix64

n, n_sh = 2_000_000, 64
keys = splitmix64(n, seed=3)
half = np.concatenate([keys[:n//2], splitmix64(n, seed=4)[:n//2]])
shards = shard_of_keys(keys, n_sh, binary=False)
blobs = {}
filters = {}
for s in range(n_sh):
    f = TaffyCuckooFilter.create(n // n_sh)
    f.add_hashes(keys[shards == s])
    filters[s] = f
    blobs[s] = f.serialize()
pv = P._LiveTcfForestProbe.assemble(n_sh, blobs)

h_sh = shard_of_keys(half, n_sh, binary=False)
def grouped():
    out = np.zeros(len(half), bool)
    order = np.argsort(h_sh, kind="stable")
    gs = h_sh[order]
    bounds = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]).tolist()
    bounds.append(len(gs))
    for b, e in zip(bounds, bounds[1:]):
        idx = order[b:e]
        out[idx] = filters[int(gs[b])].find_hashes(half[idx])
    return out

def assembled():
    return pv.find(half, binary=False)

# alternating min-of-3, AND answer equality
ga = grouped(); aa = assembled()
assert np.array_equal(ga, aa), "answers differ!"
ts = {"grouped": [], "assembled": []}
for _ in range(3):
    t0=time.perf_counter(); grouped(); ts["grouped"].append(time.perf_counter()-t0)
    t0=time.perf_counter(); assembled(); ts["assembled"].append(time.perf_counter()-t0)
for k,v in ts.items():
    print(f"RES kernel {k}: min {min(v)*1e9/len(half):.0f} ns/key ({[round(x,2) for x in v]})")
# small-batch regime (the Arrow batch shape: 65k keys / 64 shards)
def run_batched(fn):
    B=65536
    for i in range(0, len(half), B):
        seg = half[i:i+B]
        if fn is grouped:
            sh = h_sh[i:i+B]
            order = np.argsort(sh, kind="stable"); gs = sh[order]
            bounds = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]).tolist(); bounds.append(len(gs))
            out = np.zeros(len(seg), bool)
            for b, e in zip(bounds, bounds[1:]):
                idx = order[b:e]
                out[idx] = filters[int(gs[b])].find_hashes(seg[idx])
        else:
            pv.find(seg, binary=False)
ts2 = {"grouped": [], "assembled": []}
for _ in range(3):
    t0=time.perf_counter(); run_batched(grouped); ts2["grouped"].append(time.perf_counter()-t0)
    t0=time.perf_counter(); run_batched(assembled); ts2["assembled"].append(time.perf_counter()-t0)
for k,v in ts2.items():
    print(f"RES 65k-batched {k}: min {min(v)*1e9/len(half):.0f} ns/key")
