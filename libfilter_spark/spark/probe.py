"""Distributed membership probe — the Bloom-join pattern.

The merged filters (KBs–MBs per group) are broadcast to every task;
``mapInPandas`` adds a vectorized membership column (the batched
analogue of ``libfilter_block_find_hash``, ``block.h:140-152``). A
probe row only *may* be present (false positives); the semi-join
helper follows the probe with an exact join against the (pre-pruned)
build side, so query answers stay exact while the filter discards the
vast majority of rows before any row shuffle — at scale this is what
turns a 100 TB shuffle into a few-GB shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..filters import FAMILIES
from .build import _keys_from_series

# executor-local cache: broadcast token → {group: filter object}.
# Keyed by an explicit uuid shipped inside the broadcast value (NOT
# id(bc): CPython reuses ids after GC, which poisons the cache).
_FILTER_CACHE: dict[str, dict] = {}
_FILTER_CACHE_MAX = 16

# filter maps at least this big (in total) are materialized once into
# /dev/shm and memory-mapped: N python workers then share ONE
# page-cached copy instead of N private 10s-to-100s-of-MB deserialized
# arrays (measured to thrash cache at 32 workers x 80 MB). Individual
# blobs below the floor stay private copies (file-count hygiene).
_SHM_MIN_BYTES = int(os.environ.get("LIBFILTER_SHM_MIN", 32 << 20))
_SHM_BLOB_FLOOR = int(os.environ.get("LIBFILTER_SHM_BLOB_FLOOR",
                                     256 << 10))


def collect_filters(filters_df: DataFrame, group_cols: list[str]) -> dict:
    """Small filters DataFrame → {group_tuple: (family, blob)}."""
    rows = filters_df.select(*group_cols, "family", "filter").collect()
    return {tuple(r[c] for c in group_cols): (r["family"], bytes(r["filter"]))
            for r in rows}


# broadcast-probe budget: past this many bytes of collected filter
# blobs the driver hop (collect + sc.broadcast) becomes the chokepoint
# (10^5 groups x MB blobs), and the probe switches to a shuffle
# cogroup — filters stay distributed, probe keys shuffle to them.
_BROADCAST_MAX = int(os.environ.get("LIBFILTER_BROADCAST_MAX", 256 << 20))


def _collect_filters_auto(filters_df: DataFrame,
                          group_cols: list[str]) -> dict | None:
    """auto-mode collect policy (None ⇒ over budget, caller falls back
    to the shuffle probe):

    - cached frames, or sessions with ≤64 shuffle partitions: plain
      collect() — one job, plus a post-collect budget check (warn +
      shuffle fallback). The iterator costs ~90 ms of sequential
      mini-job scheduling PER PARTITION (measured 3.0 s on a cached
      32-partition frame vs 0.25 s collect), so the frames a small
      session produces must not pay it per probe. The signal is the
      session conf, which is FREE — asking the frame itself
      (rdd.getNumPartitions) converts the plan to an RDD at ~230 ms
      per call, measured as a 2 s regression across one driver query.
    - bigger-session uncached frames — the shape a 10^5-group build
      on a real cluster has (hundreds of shuffle partitions):
      budgeted toLocalIterator. Recompute dominates there (measured
      1.16 s iterator vs 1.37 s collect on an uncached grouped
      build), upstream shuffle outputs are reused across the
      per-partition jobs, and driver memory stays bounded by the
      budget at ANY group count."""
    sl = filters_df.storageLevel
    session_parts = int(filters_df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    if (sl.useMemory or sl.useDisk) or session_parts <= 64:
        out = collect_filters(filters_df, group_cols)
        if sum(len(b) for _, b in out.values()) > _BROADCAST_MAX:
            import warnings
            warnings.warn(
                "collected filter blobs exceed LIBFILTER_BROADCAST_MAX; "
                "falling back to the shuffle probe — pass via='shuffle' "
                "(or cache less) to skip the driver collect entirely")
            return None
        return out
    out = {}
    total = 0
    it = filters_df.select(*group_cols, "family", "filter") \
        .toLocalIterator(prefetchPartitions=True)
    for r in it:
        blob = bytes(r["filter"])
        total += len(blob)
        if total > _BROADCAST_MAX:
            return None
        out[tuple(r[c] for c in group_cols)] = (r["family"], blob)
    return out


def _collect_shard_rows_auto(filters_df: DataFrame) -> list | None:
    """auto-mode collect policy for SHARD frames (None ⇒ over budget,
    caller falls back to the shuffle probe). Mirrors
    _collect_filters_auto: the budget must be enforced BEFORE the
    blobs land in driver memory — an over-budget forest is the exact
    case the budget exists for. Cached frames pay a cheap length-agg
    pre-check (re-reading a cached frame is free); uncached frames use
    a budgeted toLocalIterator so a rebuild-per-action frame is read
    once with driver memory bounded at any shard count."""
    sel = filters_df.select("__shard", "params", "family", "filter")
    sl = filters_df.storageLevel
    if sl.useMemory or sl.useDisk:
        total = filters_df.agg(
            F.sum(F.length("filter"))).collect()[0][0] or 0
        if total > _BROADCAST_MAX:
            return None
        return sel.collect()
    rows: list = []
    total = 0
    for r in sel.toLocalIterator(prefetchPartitions=True):
        total += len(r["filter"])
        if total > _BROADCAST_MAX:
            return None
        rows.append(r)
    return rows


def _assembled_block_bytes(slice_blobs: list[bytes]) -> bytes:
    """Concatenate disjoint block_slice blobs into the raw LE-u32 byte
    array of the GLOBAL filter (missing shards = zero ranges = no keys),
    byte-identical to assemble_block_shards' export."""
    from ..filters.block import BlockSliceFilter
    slices = [BlockSliceFilter.deserialize(b) for b in slice_blobs]
    nb = slices[0].num_buckets
    out = bytearray(nb * 32)
    for sl in slices:
        off = sl.lo * 32
        blob = sl.state.astype("<u4", copy=False).tobytes()
        out[off:off + len(blob)] = blob
    return bytes(out)


def _shm_blob(token: str, g, blob: bytes) -> "np.memmap":
    """Write the blob once to /dev/shm (atomic rename; first writer
    wins) and return a read-only byte memmap — N python workers then
    share ONE page-cached copy."""
    import hashlib

    import numpy as np

    name = hashlib.sha256(
        (token + repr(g)).encode()).hexdigest()[:24]
    path = f"/dev/shm/libfilter_{name}.u4"
    # best-effort TTL sweep so abandoned filters don't pin shm
    import glob
    import time
    for old in glob.glob("/dev/shm/libfilter_*.u4"):
        try:
            if time.time() - os.path.getmtime(old) > 3600:
                os.unlink(old)
        except OSError:
            pass
    if not os.path.exists(path):
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
    return np.memmap(path, dtype=np.uint8, mode="r")


def _filter_via_shm(token: str, g, fam: str, blob: bytes):
    """shm-backed zero-copy deserialization for the families whose
    probe state is flat arrays (block: the raw u4 array; taffy_block:
    read-only level views via deserialize_view)."""
    import numpy as np

    from ..filters.block import BlockFilter
    from ..filters.taffy_block import TaffyBlockFilter

    arr = _shm_blob(token, g, blob)
    if fam == "block":
        return BlockFilter(arr.view(np.uint32))
    return TaffyBlockFilter.deserialize_view(arr)


def _materialize(bc) -> dict:

    token, filter_map = bc.value
    cached = _FILTER_CACHE.get(token)
    if cached is None:
        cached = {}
        # shm triggers on the TOTAL map size (a forest of 128 x 4 MB
        # shards costs each worker as much private memory as one
        # 512 MB filter would), with a per-blob floor so 10^4 tiny
        # groups don't explode into 10^4 shm files
        total = sum(len(b) if isinstance(b, (bytes, bytearray))
                    else sum(len(x) for x in b)
                    for _, b in filter_map.values())
        use_shm = os.path.isdir("/dev/shm") and total >= _SHM_MIN_BYTES
        for g, (fam, blob) in filter_map.items():
            if fam == "block_slice_set":
                # shard-frame fast path: assemble the disjoint slices
                # into ONE BlockFilter per worker (plain global probe —
                # no shard column, no per-batch groupby)
                fam, blob = "block", _assembled_block_bytes(blob)
            if fam in ("block", "taffy_block") and use_shm \
                    and len(blob) >= _SHM_BLOB_FLOOR:
                try:
                    cached[g] = _filter_via_shm(token, g, fam, blob)
                    continue
                except OSError:
                    pass  # shm full/unwritable → private copy
            cached[g] = FAMILIES[fam].deserialize(blob)
        while len(_FILTER_CACHE) >= _FILTER_CACHE_MAX:
            _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
        _FILTER_CACHE[token] = cached
    return cached


def _with_route_shard(df: DataFrame, key_col: str, p: dict) -> DataFrame:
    """Attach a shard frame's routing column to the probe side using
    the params row's authoritative routing formula."""
    if p.get("routing") == "bucket_range":
        from .sharded import with_block_shard
        return with_block_shard(df, key_col, int(p["num_buckets"]),
                                int(p["n_shards"]))
    from .forest import with_shard
    return with_shard(df, key_col, int(p["n_shards"]))


def probe_with_filters(df: DataFrame, filters_df: DataFrame,
                       group_cols: list[str] | None,
                       key_col: str = "key",
                       result_col: str = "maybe_seen",
                       via: str = "auto",
                       _collected: dict | None = None) -> DataFrame:
    """Add a boolean ``result_col``: does ``key_col`` hit the group's
    filter? Rows whose group has no filter get False. Keys may be
    int64 (two's-complement uint64) or 8-byte binary.

    Implemented as a vectorized Arrow scalar UDF so only the key (and
    group) columns cross the Python boundary — every other column of a
    wide probe table stays JVM-side (at 100 TB the probe input is the
    big table; shipping whole rows through Arrow would dominate).

    A GLOBAL probe (group_cols empty) against a distributed shard
    frame (block shards / filter forest — one row per shard with a
    ``__shard`` column) auto-routes each key to its shard with the
    build's JVM-side formula, so callers don't care whether the build
    chose the single-blob or the sharded scale path. The shard frame
    is collected ONCE here (params + blobs in the same pass) — not
    first()-then-recollected per hop.

    ``via``: ``broadcast`` collects the filters to the driver and
    broadcasts (the fast path while blobs fit); ``shuffle`` keeps the
    filters distributed and cogroups probe keys with them (the 100 TB
    many-groups path — driver memory stays flat); ``auto`` broadcasts
    up to $LIBFILTER_BROADCAST_MAX collected bytes (256 MB default),
    then falls back to shuffle."""
    group_cols = list(group_cols or [])
    if via not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown probe route {via!r}")
    if not group_cols and "__shard" in filters_df.columns \
            and _collected is None:
        import json as _json
        if via == "shuffle":
            row = filters_df.select("params").first()
            if row is None:
                return df.withColumn(result_col, F.lit(False))
            p = _json.loads(row["params"])
            probe = _with_route_shard(df, key_col, p)
            shard_col = "__shard"
            return _probe_via_cogroup(probe, filters_df, [shard_col],
                                      key_col, result_col).drop(shard_col)
        if via == "auto":
            rows = _collect_shard_rows_auto(filters_df)
            if rows is None:  # over budget: blobs never hit the driver
                row = filters_df.select("params").first()
                if row is None:
                    return df.withColumn(result_col, F.lit(False))
                p = _json.loads(row["params"])
                probe = _with_route_shard(df, key_col, p)
                shard_col = "__shard"
                return _probe_via_cogroup(probe, filters_df, [shard_col],
                                          key_col,
                                          result_col).drop(shard_col)
        else:  # via == "broadcast": caller pinned the driver hop
            rows = filters_df.select("__shard", "params", "family",
                                     "filter").collect()
        if not rows:  # empty build side: nothing can match
            return df.withColumn(result_col, F.lit(False))
        p = _json.loads(rows[0]["params"])
        if p.get("routing") == "bucket_range":
            # worker-side slice assembly: the grouped shard probe pays
            # a JVM shard column + per-batch pandas groupby; assembling
            # the disjoint slices into one filter per worker and doing
            # a PLAIN global probe was measured ~1.5x faster (1.07 s vs
            # 1.57 s at 5M keys) — same bytes broadcast either way
            collected = {(): ("block_slice_set",
                              [bytes(r["filter"]) for r in rows])}
            return probe_with_filters(df, filters_df, [], key_col,
                                      result_col, _collected=collected)
        from .forest import SHARD_COL, with_shard
        collected = {(int(r["__shard"]),): (r["family"], bytes(r["filter"]))
                     for r in rows}
        probe = with_shard(df, key_col, int(p["n_shards"]))
        return probe_with_filters(probe, filters_df, [SHARD_COL], key_col,
                                  result_col,
                                  _collected=collected).drop(SHARD_COL)
    if via == "shuffle":
        return _probe_via_cogroup(df, filters_df, group_cols, key_col,
                                  result_col)
    spark = df.sparkSession
    import uuid

    import pyarrow as pa
    from pyspark.sql.functions import ArrowUDFType, arrow_udf

    from ..kernels.keys import keys_and_valid_from_arrow

    if _collected is not None:
        filter_map = _collected
    elif via == "broadcast":
        filter_map = collect_filters(filters_df, group_cols)
    else:
        filter_map = _collect_filters_auto(filters_df, group_cols)
        if filter_map is None:  # over budget → keep filters distributed
            return _probe_via_cogroup(df, filters_df, group_cols,
                                      key_col, result_col)
    bc = spark.sparkContext.broadcast((uuid.uuid4().hex, filter_map))

    if group_cols:
        def probe(*cols):
            filters = _materialize(bc)
            keys, valid = keys_and_valid_from_arrow(cols[-1])
            gdf = pd.DataFrame(
                {i: c.to_pandas() for i, c in enumerate(cols[:-1])})
            out = np.zeros(len(keys), dtype=bool)
            for g, sub in gdf.groupby(list(gdf.columns), sort=False):
                g = g if isinstance(g, tuple) else (g,)
                f = filters.get(g)
                if f is not None:
                    idx = sub.index.to_numpy()
                    out[idx] = f.find_hashes(keys[idx])
            return pa.array(out & valid)  # null keys are never members

        # nondeterministic ONLY to stop Catalyst's constraint propagation
        # from copying the membership filter across the semi-join's
        # equi-condition onto the build side (a wasted full pass there:
        # build keys are members by construction, zero FN). The probe is
        # in fact deterministic; re-evaluation semantics are unaffected
        # for a Filter.
        udf = arrow_udf(probe, "boolean",
                        ArrowUDFType.SCALAR).asNondeterministic()
        args = [F.col(c) for c in group_cols] + [F.col(key_col)]
        return df.withColumn(result_col, udf(*args))

    def probe_global(keys):
        filters = _materialize(bc)
        f = filters.get(())
        if f is None:
            return pa.array(np.zeros(len(keys), dtype=bool))
        k, valid = keys_and_valid_from_arrow(keys)
        return pa.array(f.find_hashes(k) & valid)

    # see the grouped path: nondeterministic to keep the membership
    # filter off the build side of downstream equi-joins
    udf = arrow_udf(probe_global, "boolean",
                    ArrowUDFType.SCALAR).asNondeterministic()
    return df.withColumn(result_col, udf(F.col(key_col)))


def _probe_via_cogroup(df: DataFrame, filters_df: DataFrame,
                       group_cols: list[str], key_col: str,
                       result_col: str) -> DataFrame:
    """Shuffle probe — the many-groups scale path. The filter blobs
    never visit the driver: distinct (group, key) pairs cogroup with
    the filters frame on the group key, each task probes one group's
    keys against that group's blob, and the boolean equi-joins back.
    Driver memory stays flat at any number of groups; the price is a
    shuffle of the distinct probe keys plus the join — the right trade
    exactly when groups × blob bytes outgrow a broadcast."""
    import pyarrow as pa
    from pyspark.sql.types import BooleanType, StructField, StructType

    from ..kernels.keys import keys_and_valid_from_arrow

    gcols = list(group_cols) or ["__g"]
    if group_cols:
        probe_keys = df.select(*group_cols, key_col)
        fdf = filters_df
    else:
        # GLOBAL frame: a single __g=0 group would serialize the whole
        # probe into ONE task. Salt instead: keys bucket by a JVM-side
        # key hash and the blob row replicates to every bucket, so all
        # R tasks probe in parallel (R x blob bytes of shuffle — the
        # price of a driverless probe of one huge blob; frames the
        # build router sharded never reach here).
        R = max(1, int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32")))
        probe_keys = df.select(key_col).withColumn(
            "__g", F.pmod(F.xxhash64(F.col(key_col)),
                          F.lit(R)).cast("long"))
        fdf = filters_df.withColumn(
            "__g", F.explode(F.sequence(F.lit(0).cast("long"),
                                        F.lit(R - 1).cast("long"))))
    probe_keys = probe_keys.where(F.col(key_col).isNotNull()) \
        .dropDuplicates(gcols + [key_col])
    out_schema = StructType(
        [probe_keys.schema[c] for c in gcols + [key_col]]
        + [StructField(result_col, BooleanType())])

    def probe_group(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        if left.num_rows == 0:
            res = np.zeros(0, dtype=bool)
        else:
            keys, valid = keys_and_valid_from_arrow(left.column(key_col))
            res = np.zeros(len(keys), dtype=bool)
            for fam, blob in zip(right.column("family").to_pylist(),
                                 right.column("filter").to_pylist()):
                f = FAMILIES[fam].deserialize(blob)
                res |= f.find_hashes(keys)
            res &= valid
        cols = {c: left.column(c) for c in gcols + [key_col]}
        cols[result_col] = pa.array(res)
        return pa.table(cols)

    probed = (probe_keys.groupBy(*gcols)
              .cogroup(fdf.groupBy(*gcols))
              .applyInArrow(probe_group, schema=out_schema))
    if group_cols:
        joined = df.join(probed, on=group_cols + [key_col], how="left")
    else:
        joined = df.join(probed.drop("__g"), on=key_col, how="left")
    # rows whose group has no filter, or whose key is null, get False
    return joined.withColumn(result_col,
                             F.coalesce(F.col(result_col), F.lit(False)))


def filter_semi_join(probe_df: DataFrame, build_df: DataFrame,
                     filters_df: DataFrame,
                     group_cols: list[str] | None,
                     key_col: str = "key") -> DataFrame:
    """Exact semi-join accelerated by the filter: probe rows that miss
    every filter are dropped *before* the join shuffle (zero false
    negatives guarantees no lost matches); survivors are exact-verified
    with a left-semi join on (group, key)."""
    group_cols = list(group_cols or [])
    candidates = (probe_with_filters(probe_df, filters_df, group_cols, key_col)
                  .where(F.col("maybe_seen")).drop("maybe_seen"))
    on = group_cols + [key_col]
    build_keys = build_df.select(*on).dropDuplicates(on)
    return candidates.join(build_keys, on=on, how="left_semi")
