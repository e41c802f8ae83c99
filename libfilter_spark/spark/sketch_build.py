"""Distributed sketch build — same partial+final aggregate shape as
the filter build (map-side partial sketch per (task, group), shuffle
only sketch blobs, merge per group).

HLL/CMS consume uint64 keys (int64 two's-complement columns); KLL and
t-digest consume float64 value columns.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

from .build import _SMALL_MERGE_MAX, _keys_from_series
from ..sketches import SKETCHES

_KEY_SKETCHES = {"hll", "countmin"}


def _create(kind: str, params: dict):
    return SKETCHES[kind].create(**params)


def estimate_sketch_bytes(kind: str, params: dict) -> int:
    """Rough serialized-size upper bound per sketch — routing-grade
    fidelity only (mirrors build.estimate_filter_bytes): HLL is one
    byte per register, CMS depth×width u64 counters, KLL/t-digest a
    few KB of buffers/centroids at default parameters."""
    if kind == "hll":
        return (1 << int(params.get("p", 14))) + 64
    if kind == "countmin":
        return (int(params.get("depth", 5))
                * int(params.get("width", 2048)) * 8 + 64)
    if kind == "kll":
        return int(params.get("k", 200)) * 8 * 16 + 64
    if kind == "tdigest":
        return int(params.get("delta", 100.0)) * 8 * 16 + 64
    return 1 << 20


def _values(kind: str, s: pd.Series):
    if kind in _KEY_SKETCHES:
        return _keys_from_series(s)  # int64 or 8-byte binary keys
    return s.to_numpy(dtype="float64", na_value=float("nan"))


def build_sketches(df: DataFrame, group_cols: list[str] | None,
                   value_col: str, kind: str = "hll",
                   **params) -> DataFrame:
    """One merged sketch per group. Returns group_cols + (kind, params,
    n_rows, n_partials, sketch:binary)."""
    group_cols = list(group_cols or [])
    pjson = json.dumps(params, sort_keys=True)
    proj = df.select(*group_cols, value_col)
    fields = {f.name: f for f in proj.schema.fields}
    schema = StructType(
        [StructField(c, fields[c].dataType) for c in group_cols]
        + [StructField("kind", StringType()),
           StructField("params", StringType()),
           StructField("n_rows", LongType()),
           StructField("n_partials", LongType()),
           StructField("sketch", BinaryType())])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, object] = {}
        counts: dict[tuple, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_cols:
                for g, vals in pdf.groupby(group_cols, sort=False)[value_col]:
                    g = g if isinstance(g, tuple) else (g,)
                    sk = acc.get(g)
                    if sk is None:
                        sk = acc[g] = _create(kind, params)
                        counts[g] = 0
                    sk.update_batch(_values(kind, vals))
                    counts[g] += len(vals)
            else:
                g = ()
                sk = acc.get(g)
                if sk is None:
                    sk = acc[g] = _create(kind, params)
                    counts[g] = 0
                sk.update_batch(_values(kind, pdf[value_col]))
                counts[g] += len(pdf)
        if acc:
            out = {c: [g[i] for g in acc] for i, c in enumerate(group_cols)}
            out["kind"] = [kind] * len(acc)
            out["params"] = [pjson] * len(acc)
            out["n_rows"] = [counts[g] for g in acc]
            out["n_partials"] = [1] * len(acc)
            out["sketch"] = [sk.serialize() for sk in acc.values()]
            yield pd.DataFrame(out)

    partials = proj.mapInPandas(partial, schema=schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        cls = SKETCHES[pdf["kind"].iloc[0]]
        blobs = sorted(pdf["sketch"], key=bytes)
        acc = cls.deserialize(blobs[0])
        for b in blobs[1:]:
            acc = acc.merge(cls.deserialize(b))
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["kind"] = [pdf["kind"].iloc[0]]
        out["params"] = [pdf["params"].iloc[0]]
        out["n_rows"] = [int(pdf["n_rows"].sum())]
        out["n_partials"] = [int(pdf["n_partials"].sum())]
        out["sketch"] = [acc.serialize()]
        return pd.DataFrame(out)

    # small-merge routing (round 7, mirrors build.merge_filter_blobs):
    # sketch partials are KB-sized lattice state, so when the plan-time
    # estimate × defaultParallelism fits the small-merge budget the
    # final merge runs single-level — one 1-partition exchange + one
    # Python task globally, or one grouped exchange + a per-partition
    # Python loop (instead of one applyInPandas call per group).
    # Results are identical: the same sorted-blob merge runs either way
    # and every sketch merge is order-free lattice state (HLL/CMS
    # byte-identical; KLL/t-digest estimate-equivalent, as before).
    try:
        par = partials.sparkSession.sparkContext.defaultParallelism
    except Exception:
        par = 32
    small = (estimate_sketch_bytes(kind, params) * max(par, 1)
             <= _SMALL_MERGE_MAX)
    if small and not group_cols:
        def merge_flat(batches):
            pdfs = [p for p in batches if len(p)]
            if not pdfs:
                return
            yield merge(pd.concat(pdfs, ignore_index=True))
        return partials.repartition(1).mapInPandas(merge_flat,
                                                   schema=schema)
    if small and group_cols:
        # unpinned partition count: per-task merge cost here scales
        # with bytes (partition-local pandas loop), so AQE coalescing
        # the KB-blob exchange to a task or two is the right outcome
        def merge_local(batches):
            pdfs = [p for p in batches if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            outs = [merge(g) for _, g in
                    pdf.groupby(group_cols, sort=False, dropna=False)]
            yield pd.concat(outs, ignore_index=True)
        return partials.repartition(*group_cols) \
            .mapInPandas(merge_local, schema=schema)
    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(merge,
                                                           schema=schema)
    return (partials.withColumn("__g", F.lit(0)).groupBy("__g")
            .applyInPandas(lambda p: merge(p.drop(columns="__g")),
                           schema=schema))
