"""Distributed filter build — Spark's partial+final aggregate shape.

Stage 1 (map-side combine, ``mapInPandas``): every task folds its
input batches into one partial filter per group it sees. No row
shuffle happens — a task emits one (group, blob) row per group, so
the only shuffled payload is KB-sized filter state. This is the
distributed analogue of the reference's single-process insert loop
(``c/include/filter/block.h:127-138``), and the reason the design
scales: at 100 TB the shuffle carries ~(tasks × groups) blobs, not
10^12 rows.

Stage 2 (final merge, ``applyInPandas``): per group, fold partial
blobs with the family's union (OR for block families —
``c/lib/block.c:68``'s TODO implemented; the TCF union algorithm of
``c/lib/taffy-cuckoo.c:260-348`` for cuckoo filters).

Families must be *mergeable* for this path. The static XOR filter
(one-shot bulk build, no union — ``c/lib/static.c:12-82``) uses the
grouped path: a real shuffle of (group, key) pairs, one bulk build
per group via ``applyInPandas``.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

from ..filters import FAMILIES
from ..kernels.keys import to_unsigned


def create_filter(family: str, ndv: int, fpp: float):
    cls = FAMILIES[family]
    if family == "block":
        return cls.create_with_ndv_fpp(ndv, fpp)
    return cls.create(ndv, fpp)


def estimate_filter_bytes(family: str, ndv: int, fpp: float) -> int:
    """Rough final-size estimate used ONLY for strategy routing —
    order-of-magnitude fidelity is enough (the routing threshold is a
    32 MB cliff, not a tight bound)."""
    import math
    from ..kernels.sizing import block_bytes_needed
    if family in ("block", "taffy_block"):
        # TBF's top level dominates; the stack is < 2x the top level
        return block_bytes_needed(max(1, ndv), fpp)
    if family == "bloom":
        return int(-ndv * math.log(max(fpp, 1e-12)) /
                   (math.log(2) ** 2) / 8) + 64
    if family in ("taffy_cuckoo", "minimal_taffy_cuckoo",
                  "frozen_taffy_cuckoo"):
        # 2-byte slots at ~90% target load, two sides
        return int(2 * ndv / 0.9) + 64
    if family == "static_xor":
        return int(2.0 * ndv) + 64  # static.c:13 size factor ceiling
    return 0


def select_build_strategy(family: str, grouped: bool, ndv: int,
                          fpp: float, threshold: int | None = None) -> str:
    """Pick the build path by estimated filter size — the difference
    between 'works at sf0.1' and 'works at 100 TB':

    - ``partials``: map-side combine, shuffle = tasks x filter_bytes of
      blobs. Right while filters are small (KBs-MBs) — zero row
      shuffle.
    - ``sharded``: global block filters past the threshold; keys
      shuffle once (8 B/row), each task owns a disjoint bucket range,
      result stays distributed (spark/sharded.py). Full-size per-task
      partials were measured to anti-scale here: tasks x 80 MB blobs
      of merge traffic GC-thrash the JVM.
    - ``grouped_bulk``: grouped builds past the threshold (and static
      XOR always, which NEEDS all group keys in one task —
      ``c/lib/static.c:12-82``): shuffle (group, key) rows, build each
      group's filter exactly once. Trades an 8 B/row shuffle for
      removing the tasks-x-bytes blob merge entirely; groups
      parallelize across executors.
    """
    if family == "static_xor":
        return "grouped_bulk"
    if threshold is None:
        import os
        # 4 MB default (was 32 MB): the sharded path beat partials at
        # every measured size down to ~1.5 MB filters (5M keys/7.5 MB:
        # 1.8-2.2 s sharded vs 2.78 s partials, local[32] in-process
        # A/B), and the shard-frame probe assembles per-worker so probe
        # speed matches the single blob. Below 4 MB the single
        # mergeable row is kept for its streaming/merge semantics.
        threshold = int(os.environ.get("LIBFILTER_SHARDED_MIN", 4 << 20))
    if estimate_filter_bytes(family, ndv, fpp) >= threshold:
        if grouped:
            return "grouped_bulk"
        if family == "block":
            return "sharded"
    return "partials"


# Scale-adaptive build plumbing (round 7, guide §2.2/§2.4): the
# partial-widening repartition and the two-level content-bucketed
# merge tree exist for HEAVY builds (MB-GB filters × many tasks); for
# small filters they are pure overhead — a 96 KB global build measured
# 1.38 s through the widen + tree vs 0.24 s of actual build work. Both
# route on the PLAN-TIME size estimate (estimate_filter_bytes), so the
# decision is scale-adaptive, not a local-mode constant: a cluster
# with defaultParallelism in the thousands crosses the threshold at
# proportionally smaller per-partial sizes.
_WIDEN_MIN_BYTES = int(os.environ.get("LIBFILTER_WIDEN_MIN", 1 << 20))
_SMALL_MERGE_MAX = int(os.environ.get("LIBFILTER_SMALL_MERGE_MAX",
                                      64 << 20))


def _keys_from_series(s: pd.Series) -> np.ndarray:
    """LongType (int64) or 8-byte binary series → uint64 keys."""
    if s.dtype == object:  # binary
        from ..kernels.keys import keys_from_hash_bytes
        return keys_from_hash_bytes(s.to_numpy())
    return to_unsigned(s.to_numpy())


def _result_schema(df: DataFrame, group_cols: list[str]) -> StructType:
    fields = [f for f in df.schema.fields if f.name in group_cols]
    # preserve group_cols order
    by_name = {f.name: f for f in fields}
    out = [StructField(c, by_name[c].dataType) for c in group_cols]
    out += [
        StructField("family", StringType()),
        StructField("params", StringType()),
        StructField("n_keys", LongType()),
        StructField("n_partials", LongType()),
        StructField("filter", BinaryType()),
    ]
    return StructType(out)


def build_filters(df: DataFrame, group_cols: list[str] | None,
                  key_col: str = "key", family: str = "block",
                  ndv: int = 1 << 20, fpp: float = 0.01,
                  strategy: str | None = None) -> DataFrame:
    """Build one filter per group over ``df[key_col]`` (int64 two's-
    complement uint64 keys or 8-byte binary).

    Returns a small DataFrame: group_cols + (family, params, n_keys,
    n_partials, filter). ``ndv`` is the per-group capacity hint: exact
    size for the fixed-size block family, level-0 seed for the taffy
    families (which grow past it freely). ``strategy`` overrides the
    size-based router (callers that must receive a single mergeable
    row per group — e.g. streaming state folds — pin ``partials``,
    since ``sharded`` returns a multi-row block_slice shard frame).
    """
    group_cols = list(group_cols or [])
    if strategy is None:
        strategy = select_build_strategy(family, bool(group_cols), ndv, fpp)
    elif strategy not in ("partials", "sharded", "grouped_bulk"):
        raise ValueError(f"unknown build strategy {strategy!r}")
    if strategy == "sharded" and (group_cols or family != "block"):
        # build_block_shards is the GLOBAL block scale path only — a
        # pinned sharded override with group columns or another family
        # would silently build one groupless block shard frame
        raise ValueError(
            "strategy='sharded' builds one global block filter: pass no "
            f"group_cols (got {group_cols!r}) and family='block' (got "
            f"{family!r}); grouped/non-block large builds route via "
            "'grouped_bulk'")
    if family == "static_xor":
        strategy = "grouped_bulk"  # construct needs all keys in one task
    if strategy == "grouped_bulk":
        return _build_grouped(df, group_cols, key_col, family, ndv, fpp)
    if strategy == "sharded":
        # large global block filter: stays DISTRIBUTED as a shard frame
        # (one block_slice row per bucket range); probe_with_filters
        # auto-routes shard frames, assemble_block_shards exports a blob
        from .sharded import build_block_shards
        return build_block_shards(df, key_col, ndv, fpp)

    params = json.dumps({"ndv": int(ndv), "fpp": float(fpp)})
    proj = df.select(*group_cols, key_col)
    est_bytes = estimate_filter_bytes(family, ndv, fpp)
    # a small parquet scan (or a coalesced cache) can arrive in fewer
    # partitions than the box has cores, strangling the Python build
    # stage — a 3-split input measured 13 s where 32 splits take ~1 s.
    # At warehouse scale input splits >> cores, so this never fires.
    # Only HEAVY builds (est ≥ _WIDEN_MIN_BYTES, i.e. ≥ ~100k keys)
    # are widened: for a KB-filter build the extra shuffle plus the
    # cores-wide Python stage cost more than the insert they
    # parallelize (measured ~0.3 s per query at sf0.1).
    if est_bytes >= _WIDEN_MIN_BYTES:
        try:
            nparts = proj.rdd.getNumPartitions()
            target = proj.sparkSession.sparkContext.defaultParallelism
            if nparts < target:
                proj = proj.repartition(target)
        except Exception:
            pass  # streaming plans have no static partitioning to widen
    partial_schema = _result_schema(proj, group_cols)

    if not group_cols:
        # GLOBAL partial build goes through mapInArrow: the pandas
        # conversion would materialize one Python bytes object per
        # binary key — measured to dominate the Python stage and cap
        # its multi-worker scaling (see spark/sharded.py build_slice);
        # keys_from_arrow reads the Arrow buffer zero-copy instead.
        def arrow_partials(batches):
            import pyarrow as pa

            from ..kernels.keys import keys_from_arrow
            f = None
            n = 0
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                if f is None:
                    f = create_filter(family, ndv, fpp)
                f.add_hashes(keys_from_arrow(batch.column(0)))
                n += batch.num_rows
            if f is not None:
                yield pa.RecordBatch.from_pydict({
                    "family": pa.array([family]),
                    "params": pa.array([params]),
                    "n_keys": pa.array([n], type=pa.int64()),
                    "n_partials": pa.array([1], type=pa.int64()),
                    "filter": pa.array([f.serialize()],
                                       type=pa.binary())})

        partials = proj.mapInArrow(
            arrow_partials,
            schema="family string, params string, n_keys long, "
                   "n_partials long, filter binary")
        return merge_filter_blobs(partials, group_cols,
                                  est_bytes=est_bytes)

    def partial_builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, object] = {}
        counts: dict[tuple, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_cols:
                # key conversion ONCE per batch, then numpy group
                # segmentation — pandas groupby iteration plus a
                # per-group binary-key conversion measured ~4 ms per
                # (task, group), which dominated many-group builds
                keys = _keys_from_series(pdf[key_col])
                gvals = [pdf[c].to_numpy() for c in group_cols]
                invs, sizes = [], []
                for col in gvals:
                    inv, u = pd.factorize(col, use_na_sentinel=False)
                    invs.append(inv.astype(np.int64))
                    sizes.append(max(len(u), 1))
                prod = 1
                for s in sizes:
                    prod *= s
                if prod < (1 << 62):
                    gkey = np.zeros(len(pdf), dtype=np.int64)
                    for inv, s in zip(invs, sizes):
                        gkey = gkey * np.int64(s) + inv
                    order = np.argsort(gkey, kind="stable")
                    gs = gkey[order]
                    bounds = np.flatnonzero(gs[1:] != gs[:-1]) + 1
                else:  # see _grouped_bitor_assemble: lexsort fallback
                    order = np.lexsort(invs[::-1])
                    diff = np.zeros(len(pdf) - 1, dtype=bool)
                    for inv in invs:
                        s = inv[order]
                        diff |= s[1:] != s[:-1]
                    bounds = np.flatnonzero(diff) + 1
                for seg in np.split(order, bounds):
                    g = tuple(col[seg[0]] for col in gvals)
                    f = acc.get(g)
                    if f is None:
                        f = acc[g] = create_filter(family, ndv, fpp)
                        counts[g] = 0
                    f.add_hashes(keys[seg])
                    counts[g] += len(seg)
            else:
                g = ()
                f = acc.get(g)
                if f is None:
                    f = acc[g] = create_filter(family, ndv, fpp)
                    counts[g] = 0
                f.add_hashes(_keys_from_series(pdf[key_col]))
                counts[g] += len(pdf)
        if acc:
            rows = {}
            for i, c in enumerate(group_cols):
                rows[c] = [g[i] for g in acc]
            rows["family"] = [family] * len(acc)
            rows["params"] = [params] * len(acc)
            rows["n_keys"] = [counts[g] for g in acc]
            rows["n_partials"] = [1] * len(acc)
            rows["filter"] = [f.serialize() for f in acc.values()]
            yield pd.DataFrame(rows)

    partials = proj.mapInPandas(partial_builder, schema=partial_schema)
    return merge_filter_blobs(partials, group_cols, est_bytes=est_bytes)


def merge_filter_blobs(partials: DataFrame, group_cols: list[str],
                       fanin: int = 16,
                       est_bytes: int | None = None) -> DataFrame:
    """Merge of partial filter rows → one row per group, as a TWO-LEVEL
    tree: partials first merge inside ``fanin`` deterministic buckets
    (bucket = xxhash64(blob) mod fanin, so the tree shape is a pure
    function of the data), then buckets merge into the final filter.

    Why a tree: at high parallelism a single-task final merge has to
    pull every partial blob (tasks × filter_bytes) through one Python
    worker — measured as the scaling bottleneck (64 x 32 MB partials
    made local[32] *slower* than local[8]). The tree caps per-task
    merge input at ~max(n/fanin, fanin) blobs.

    Determinism: within every merge the blobs are sorted by bytes, and
    the bucketing is content-derived — so OR-merge families stay
    byte-identical under any scheduling (the associativity contract);
    TCF union remains probe-equivalent.

    ``est_bytes`` (the caller's plan-time per-partial size estimate)
    routes SMALL merges — est × defaultParallelism within
    $LIBFILTER_SMALL_MERGE_MAX (64 MB default) — onto single-level
    plans: one 1-partition exchange + one Python task for a global
    merge, one grouped exchange + per-partition Python loop for
    grouped merges. The tree exists for tasks × MB-GB partial volumes;
    below the threshold its extra exchange and cores-wide Python
    stages dominate the work (a 5-group KB-blob merge measured ~128
    Python tasks through the tree). Results are identical: the same
    sorted-blob ``merge_rows`` runs either way, so OR families stay
    byte-identical and TCF stays probe-equivalent.
    """
    schema = partials.schema
    small = False
    if est_bytes is not None:
        try:
            par = partials.sparkSession.sparkContext.defaultParallelism
        except Exception:
            par = 32
        small = est_bytes * max(par, 1) <= _SMALL_MERGE_MAX

    def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        fam = pdf["family"].iloc[0]
        cls = FAMILIES[fam]
        blobs = sorted(pdf["filter"], key=bytes)
        acc = cls.deserialize(blobs[0])
        if hasattr(acc, "absorb"):
            # in-place vectorized union (TCF) in BALANCED PAIRWISE
            # rounds. Balance is load-bearing, not a nicety: a path
            # stores only log_side_size+HEAD+tail bits, so absorbing
            # into a table more than tail-width levels wider forces the
            # missing-bits enumeration (2^(diff-tail) tail-less entries
            # per item — occupancy and FPP inflate, which grows the
            # accumulator further; a linear fold over 64 partials
            # measured 15k keys/s with a 4x-oversized blob). Merging
            # equals with equals keeps diff within the tail width at
            # every round, so the enumeration never triggers.
            fs = [acc] + [cls.deserialize(b) for b in blobs[1:]]
            while len(fs) > 1:
                fs.sort(key=lambda f: (f.log_side_size, f.occupied))
                nxt = []
                for i in range(0, len(fs) - 1, 2):
                    fs[i + 1].absorb(fs[i])
                    nxt.append(fs[i + 1])
                if len(fs) % 2:
                    nxt.append(fs[-1])
                fs = nxt
            acc = fs[0]
        else:
            for b in blobs[1:]:
                acc = acc.union(cls.deserialize(b))
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["family"] = [fam]
        out["params"] = [pdf["params"].iloc[0]]
        out["n_keys"] = [int(pdf["n_keys"].sum())]
        out["n_partials"] = [int(pdf["n_partials"].sum())]
        out["filter"] = [acc.serialize()]
        return pd.DataFrame(out)

    if small and not group_cols:
        # single-level global merge: every partial row (≤ tasks × est
        # bytes, under the threshold by construction) moves through one
        # 1-partition exchange into ONE merge task — no __mb level, no
        # cores-wide Python stage
        def merge_flat(batches):
            pdfs = [p for p in batches if len(p)]
            if not pdfs:
                return
            yield merge_rows(pd.concat(pdfs, ignore_index=True))
        return partials.repartition(1).mapInPandas(merge_flat,
                                                   schema=schema)

    bucket = F.pmod(F.xxhash64("filter"), F.lit(fanin)).alias("__mb")
    level1_in = partials.select("*", bucket)
    l1_schema = level1_in.schema

    def merge_l1(pdf: pd.DataFrame) -> pd.DataFrame:
        out = merge_rows(pdf.drop(columns="__mb"))
        out["__mb"] = [int(pdf["__mb"].iloc[0])]
        return out

    if group_cols:
        # partition-local merging: groupBy().applyInPandas costs one
        # Python call per (group, bucket) — measured 20.8 s of a 27 s
        # query at 10^3 groups (≈17k calls). Repartitioning on the
        # same keys co-locates each merge group, and ONE mapInPandas
        # call per partition loops the groups in pandas — identical
        # blobs, identical sorted merge order, so the output stays
        # byte-identical; Python calls drop to 2× shuffle partitions.
        #
        # The repartition carries an EXPLICIT partition count: with
        # bare repartition(*cols) AQE coalesces the KB-blob exchange
        # by size (50 MB of partials → 5 partitions measured), which
        # serializes the per-group Python merges that the repartition
        # exists to parallelize — a 1000-group merge took 9.1 s
        # coalesced vs 1.7 s pinned at local[32]. Each partition also
        # accumulates its merged rows and yields ONE frame instead of
        # one 1-row frame (= one Arrow batch) per group.
        l1_keys = [*group_cols, "__mb"]
        spark = partials.sparkSession
        try:
            nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            nparts = spark.sparkContext.defaultParallelism

        def _merge_local(keys, keep_mb):
            def merge_local(batches):
                pdfs = [p for p in batches if len(p)]
                if not pdfs:
                    return
                pdf = pd.concat(pdfs, ignore_index=True)
                outs = []
                for _, g in pdf.groupby(keys, sort=False, dropna=False):
                    out = merge_rows(g.drop(columns="__mb")
                                     if "__mb" in g else g)
                    if keep_mb:
                        out["__mb"] = [int(g["__mb"].iloc[0])]
                    outs.append(out)
                yield pd.concat(outs, ignore_index=True)
            return merge_local

        if small:
            # single-level grouped merge: per-group partial volume is
            # bounded by tasks × est bytes (under the threshold), so
            # one task per group suffices — skip the __mb fan-in level
            # (its exchange + cores-wide Python stage cost more than
            # the merges below the threshold). The partition count is
            # UNPINNED here on purpose: per-task merge cost in this
            # regime scales with bytes (the partition-local pandas
            # loop), not per-group Python calls, so AQE coalescing the
            # KB-blob exchange down to a task or two is the right
            # outcome — the pinned count stays reserved for the heavy
            # tree where coalescing serialized MB-blob merges.
            return partials.repartition(*group_cols) \
                .mapInPandas(_merge_local(list(group_cols), False),
                             schema=schema)
        level1 = level1_in.repartition(nparts, *l1_keys) \
            .mapInPandas(_merge_local(l1_keys, True), schema=l1_schema)
        return level1.drop("__mb").repartition(nparts, *group_cols) \
            .mapInPandas(_merge_local(list(group_cols), False),
                         schema=schema)
    level1 = level1_in.groupBy("__mb").applyInPandas(merge_l1,
                                                     schema=l1_schema)
    return (level1.withColumn("__g", F.lit(0)).groupBy("__g")
            .applyInPandas(
                lambda pdf: merge_rows(pdf.drop(columns=["__g", "__mb"])),
                schema=schema))


def _build_grouped(df: DataFrame, group_cols: list[str], key_col: str,
                   family: str, ndv: int, fpp: float) -> DataFrame:
    """Shuffle-then-bulk-build path: every group's keys land in one
    task and the filter is built exactly once — no per-task partials,
    no blob merge. Required for static XOR (one-shot construct needs
    all keys, ``c/lib/static.c:12-82``); chosen by the strategy router
    for LARGE grouped builds of any family, where per-task full-size
    partials would shuffle tasks x filter_bytes of blobs. Memory
    bound: 8 bytes x group rows + one group's filter per task."""
    from ..filters.static_xor import StaticXorFilter

    params = json.dumps({"ndv": int(ndv), "fpp": float(fpp)})
    proj = df.select(*group_cols, key_col)
    schema = _result_schema(proj, group_cols)

    # huge grouped BLOCK builds take the JVM bit_or engine past the
    # same ~10M-keys/group crossover as the global sharded build: the
    # insert runs as groupBy(group, bucket).agg(bit_or) under
    # whole-stage codegen and ZERO keys cross into Python — the
    # streamed applyInArrow pass below was measured as the scaling
    # ceiling for thin-row Python stages. Shuffle volume: one ~40 B
    # row per distinct (group, bucket) ≈ filter bytes (+ the group key
    # per row), map-side combined.
    if family == "block" and group_cols and ndv >= 10_000_000:
        return _build_grouped_block_jvm(proj, group_cols, key_col,
                                        ndv, fpp, params, schema)
    # huge grouped TAFFY-BLOCK builds take the same engine: a
    # pre-sized TBF never upsizes, so its state is one level-0 block
    # array plus (ndv0, ttl, last_ndv) bookkeeping — the insert IS the
    # block bit_or aggregation (see spark/forest.py
    # _build_tbf_forest_jvm, which proved the equivalence for forest
    # shards). 1.25x level-0 margin absorbs group-size jitter around
    # the per-group ndv hint; a group overflowing it errors at
    # assembly rather than silently mis-building.
    if family == "taffy_block" and group_cols and ndv >= 10_000_000:
        return _build_grouped_tbf_jvm(proj, group_cols, key_col,
                                      ndv, fpp, params, schema)

    def bulk(table):
        # applyInArrow + zero-copy key extraction (see arrow_partials)
        import pyarrow as pa

        from ..kernels.keys import keys_from_arrow
        keys = keys_from_arrow(table.column(key_col))
        if family == "static_xor":
            keys = np.unique(keys)
            f = StaticXorFilter.construct(keys)
        else:
            f = create_filter(family, ndv, fpp)
            f.add_hashes(keys)
        cols = {c: table.column(c).slice(0, 1).combine_chunks()
                for c in group_cols}
        cols["family"] = pa.array([family])
        cols["params"] = pa.array([params])
        cols["n_keys"] = pa.array([len(keys)], type=pa.int64())
        cols["n_partials"] = pa.array([1], type=pa.int64())
        cols["filter"] = pa.array([f.serialize()], type=pa.binary())
        return pa.table(cols)

    if group_cols:
        return proj.groupBy(*group_cols).applyInArrow(bulk, schema=schema)
    return (proj.withColumn("__g", F.lit(0)).groupBy("__g")
            .applyInArrow(
                lambda table: bulk(table.drop_columns("__g")),
                schema=schema))


def _build_grouped_block_jvm(proj: DataFrame, group_cols: list[str],
                             key_col: str, ndv: int, fpp: float,
                             params: str, schema) -> DataFrame:
    """Grouped block build with the insert in Tungsten (see
    spark/sharded.py block_groupby_bitor): per-group filters assemble
    from the reduced nonzero-bucket rows — per-task memory is the
    filters of the groups hashed to it, same bound as the streamed
    bulk path. Byte-identical to the applyInArrow bulk build on
    null-free keys (nulls are dropped here, as in every JVM engine)."""
    from ..kernels.block import serialize as _ser
    from ..kernels.sizing import BUCKET_BYTES, block_bytes_needed

    num_buckets = max(1, block_bytes_needed(ndv, fpp) // BUCKET_BYTES)

    def make_blob(sl: np.ndarray, count: int) -> tuple[str, bytes]:
        return "block", _ser(np.ascontiguousarray(sl.view(np.uint32)))

    return _grouped_bitor_assemble(proj, group_cols, key_col,
                                   num_buckets, params, schema,
                                   make_blob)


def _build_grouped_tbf_jvm(proj: DataFrame, group_cols: list[str],
                           key_col: str, ndv: int, fpp: float,
                           params: str, schema) -> DataFrame:
    """Grouped taffy_block build in Tungsten: pre-sized level-0 with a
    1.25x margin over the per-group ndv hint (the aggregation is
    orderless, so a group cannot upsize mid-build); groups past the
    margin raise at assembly. Byte-identical to a streamed
    create+add_hashes build at the same level-0 sizing (the forest jvm
    engine's equivalence, tests/test_forest_onepass.py)."""
    from ..filters.taffy_block import (TaffyBlockFilter, _level0_ndv,
                                       _level_bytes)
    from ..kernels import block as K

    ndv0 = _level0_ndv(int(ndv * 1.25) + 64, fpp)
    num_buckets = K.num_buckets_for(_level_bytes(ndv0, fpp, 0))

    def make_blob(sl: np.ndarray, count: int) -> tuple[str, bytes]:
        if count > ndv0:
            raise ValueError(
                f"group got {count} keys > level-0 capacity {ndv0}; a "
                "real taffy_block would upsize — raise ndv or use the "
                "streamed build (smaller ndv hint)")
        level0 = np.ascontiguousarray(sl.view(np.uint32))
        f = TaffyBlockFilter(ndv0, fpp, [level0], ttl=ndv0 - count,
                             last_ndv=ndv0)
        return "taffy_block", f.serialize()

    return _grouped_bitor_assemble(proj, group_cols, key_col,
                                   num_buckets, params, schema,
                                   make_blob)


def _grouped_bitor_assemble(proj: DataFrame, group_cols: list[str],
                            key_col: str, num_buckets: int,
                            params: str, schema,
                            make_blob) -> DataFrame:
    """Shared grouped JVM bit_or engine: run the insert as
    ``groupBy(group, bucket).agg(bit_or)`` (whole-stage codegen, zero
    keys into Python), then assemble each group's reduced
    nonzero-bucket rows into a filter blob via ``make_blob``."""
    from .sharded import block_groupby_bitor

    spark = proj.sparkSession
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        nparts = spark.sparkContext.defaultParallelism
    # explicit count: AQE would coalesce a small bucket-row exchange
    # and serialize the per-group assembly (see merge_filter_blobs)
    agg = block_groupby_bitor(proj, key_col, num_buckets,
                              lead_cols=group_cols) \
        .repartition(nparts, *group_cols)
    out_names = [f.name for f in schema.fields]

    def assemble(batches):
        import pyarrow as pa
        slices: dict[tuple, np.ndarray] = {}
        counts: dict[tuple, int] = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            gvals = [batch.column(c).to_pylist() for c in group_cols]
            b = batch.column("b").to_numpy(zero_copy_only=False)
            cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
            ps = [batch.column(f"p{i}").to_numpy(zero_copy_only=False)
                  .view(np.uint64) for i in range(4)]
            import numpy as _np
            # collision-free per-column factorization → combined code.
            # pd.factorize (use_na_sentinel=False) assigns null group
            # values a real code — np.unique would try to SORT an
            # object array containing None and raise TypeError.
            invs, sizes = [], []
            for col in gvals:
                inv, u = pd.factorize(_np.asarray(col, dtype=object),
                                      use_na_sentinel=False)
                invs.append(inv.astype(_np.int64))
                sizes.append(max(len(u), 1))
            prod = 1
            for s in sizes:
                prod *= s
            if prod < (1 << 62):
                gkey = _np.zeros(batch.num_rows, dtype=_np.int64)
                for inv, s in zip(invs, sizes):
                    gkey = gkey * _np.int64(s) + inv
                order = _np.argsort(gkey, kind="stable")
                gs = gkey[order]
                bounds = _np.flatnonzero(gs[1:] != gs[:-1]) + 1
            else:
                # combined code would overflow int64 (product of
                # per-column cardinalities ≥ 2^62): lexsort the code
                # TUPLE instead — same segmentation, no overflow
                order = _np.lexsort(invs[::-1])
                diff = _np.zeros(batch.num_rows - 1, dtype=bool)
                for inv in invs:
                    s = inv[order]
                    diff |= s[1:] != s[:-1]
                bounds = _np.flatnonzero(diff) + 1
            for seg in _np.split(order, bounds):
                g = tuple(col[seg[0]] for col in gvals)
                sl = slices.get(g)
                if sl is None:
                    sl = slices[g] = _np.zeros(num_buckets * 4,
                                               dtype=_np.uint64)
                    counts[g] = 0
                m = sl.reshape(-1, 4)
                idx = b[seg]
                for i in range(4):
                    # buckets are distinct post-agg within a group
                    m[idx, i] = ps[i][seg]
                counts[g] += int(cnt[seg].sum())
        if slices:
            cols: dict[str, list] = {c: [] for c in out_names}
            for g, sl in slices.items():
                fam, blob = make_blob(sl, counts[g])
                for c, v in zip(group_cols, g):
                    cols[c].append(v)
                cols["family"].append(fam)
                cols["params"].append(params)
                cols["n_keys"].append(counts[g])
                cols["n_partials"].append(1)
                cols["filter"].append(blob)
            from pyspark.sql.pandas.types import to_arrow_type
            pa_schema = pa.schema([(f.name, to_arrow_type(f.dataType))
                                   for f in schema.fields])
            yield pa.RecordBatch.from_pydict(cols, schema=pa_schema)

    return agg.mapInArrow(assemble, schema=schema)
