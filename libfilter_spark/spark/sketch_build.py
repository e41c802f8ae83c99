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

from .build import _keys_from_series
from ..sketches import SKETCHES

_KEY_SKETCHES = {"hll", "countmin"}


def _create(kind: str, params: dict):
    return SKETCHES[kind].create(**params)


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

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(merge,
                                                           schema=schema)
    return (partials.withColumn("__g", F.lit(0)).groupBy("__g")
            .applyInPandas(lambda p: merge(p.drop(columns="__g")),
                           schema=schema))
