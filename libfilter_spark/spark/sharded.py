"""Sharded block-filter build — the huge-filter scale path.

The mergeable partial-build (build.py) gives every task a FULL-SIZE
filter; at GB filter sizes the merge traffic is tasks × filter_bytes.
This module instead ROUTES each key to the task that owns its bucket
range (one row shuffle of 8-byte keys), so:

- per-task state is filter_bytes / n_shards (cache-resident scatter),
- the merge is a byte concatenation of disjoint slices,
- total shuffle = 8 B x rows + filter_bytes, independent of task count.

Routing must replicate the kernel's bucket index exactly
(``block.h:97-101``: bucket = ((h >> 32) * nb) >> 32, on the upper 32
bits of the key). The shard id is computed JVM-side from the first 4
bytes of the binary sha key, so no Python runs before the shuffle.

The result is byte-identical to the unsharded build (asserted in
tests): OR-scatter order doesn't matter and slices are disjoint.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import block as K
from ..kernels.sizing import BUCKET_BYTES, block_bytes_needed
from .build import _keys_from_series


def _shard_bounds(num_buckets: int, n_shards: int) -> list[tuple[int, int]]:
    """Bucket range owned by each shard, matching the JVM routing
    formula floor(bucket * n_shards / num_buckets) == shard exactly:
    shard s owns [ceil(s*nb/K), ceil((s+1)*nb/K))."""
    def ceil_div(a, b):
        return -(-a // b)
    return [(ceil_div(s * num_buckets, n_shards),
             ceil_div((s + 1) * num_buckets, n_shards))
            for s in range(n_shards)]


def build_block_filter_sharded(df: DataFrame, key_col: str = "key",
                               ndv: int = 1 << 20, fpp: float = 0.01,
                               n_shards: int | None = None) -> bytes:
    """Build ONE global block filter of arbitrary size, sharded.

    ``df[key_col]`` must be the 8-byte binary sha key
    (``with_content_key_bin``). Returns the serialized filter blob,
    byte-identical to a single-process build over the same keys.
    """
    spark = df.sparkSession
    num_buckets = max(1, block_bytes_needed(ndv, fpp) // BUCKET_BYTES)
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_shards = max(1, min(n_shards, num_buckets))
    bounds = _shard_bounds(num_buckets, n_shards)

    # JVM-side routing: h32 = first 4 key bytes as u32;
    # bucket = (h32 * nb) >> 32; shard = which range owns the bucket.
    h32 = F.conv(F.hex(F.substring(F.col(key_col), 1, 4)), 16, 10) \
        .cast("long")
    bucket = F.shiftright(h32 * F.lit(int(num_buckets)), 32)
    # ranges are near-uniform; map bucket -> shard by scaled division
    shard = F.least(F.lit(n_shards - 1),
                    F.floor(bucket * F.lit(n_shards) /
                            F.lit(int(num_buckets)))).cast("int")
    routed = df.select(F.col(key_col), shard.alias("__shard")) \
        .repartition(n_shards, "__shard")

    def build_slice(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        slices: dict[int, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for s, sub in pdf.groupby("__shard", sort=False):
                lo, hi = bounds[int(s)]
                sl = slices.get(int(s))
                if sl is None:
                    sl = slices[int(s)] = np.zeros(
                        (hi - lo) * K.WORDS_PER_BUCKET, dtype=np.uint32)
                keys = _keys_from_series(sub[key_col])
                idx = K.bucket_index(keys, num_buckets).astype(np.int64) - lo
                masks = K.make_masks(keys)
                b2 = sl.reshape(-1, K.WORDS_PER_BUCKET)
                for lane in range(K.WORDS_PER_BUCKET):
                    np.bitwise_or.at(b2[:, lane], idx, masks[:, lane])
        if slices:
            yield pd.DataFrame({
                "shard": list(slices),
                "slice": [v.astype("<u4").tobytes()
                          for v in slices.values()]})

    parts = routed.mapInPandas(build_slice,
                               schema="shard int, slice binary").collect()
    # assemble: disjoint ordered slices; shards with no keys are zeros
    out = bytearray(num_buckets * BUCKET_BYTES)
    seen: dict[int, bytes] = {}
    for r in parts:
        s = int(r["shard"])
        blob = bytes(r["slice"])
        if s in seen:  # same shard split across tasks: OR the copies
            prev = np.frombuffer(seen[s], dtype="<u4")
            cur = np.frombuffer(blob, dtype="<u4")
            blob = np.bitwise_or(prev, cur).astype("<u4").tobytes()
        seen[s] = blob
    for s, blob in seen.items():
        lo, _ = bounds[s]
        off = lo * BUCKET_BYTES
        out[off:off + len(blob)] = blob
    return bytes(out)


def sharded_filter_row(spark, blob: bytes, ndv: int, fpp: float):
    """Wrap a sharded-build blob as a one-row filters DataFrame
    compatible with probe_with_filters."""
    params = json.dumps({"ndv": int(ndv), "fpp": float(fpp)})
    return spark.createDataFrame(
        [("block", params, None, None, bytearray(blob))],
        "family string, params string, n_keys long, n_partials long, "
        "filter binary")
