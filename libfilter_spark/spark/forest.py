"""Filter forest — the merge-free scale path for growable cuckoo
families (taffy cuckoo, minimal taffy cuckoo).

Why it exists: a TCF path stores only log_side_size + HEAD + tail
bits, so a union into a table more than tail-width (5) levels wider
must enumerate the missing bits (taffy-cuckoo.c:260-313) — merging P
partials burns log2(P) tail bits and degrades FPP toward the tail-less
floor once P > 32. The measured symptom at high parallelism: a 64-way
merged filter at frozen-filter FPP. No merge algorithm can beat that
bound; the information simply is not in the partials.

The forest removes the merge: keys shuffle ONCE by a JVM-side shard
hash (pmod(xxhash64(key), S) — 8 bytes/row, the same traffic as the
sharded block build), each shard bulk-builds its own full-resolution
filter, and probes route to their shard's filter through the existing
grouped broadcast-probe machinery. Zero unions, zero tail loss,
structural FPP, and per-task memory = one shard's filter.

This mirrors how a 1000-executor deployment should run taffy filters
over 100 TB: a bounded-size forest per table, with shard count chosen
so each filter fits an executor's working set.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

from ..filters import FAMILIES

SHARD_COL = "__shard"


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Attach the forest routing column — computed JVM-side so no
    Python runs before the shuffle (build) or the broadcast probe."""
    return df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64(F.col(key_col)),
                          F.lit(n_shards)).cast("long"))


def build_filter_forest(df: DataFrame, key_col: str = "key",
                        family: str = "taffy_cuckoo",
                        ndv: int = 1 << 20, fpp: float = 0.01,
                        n_shards: int | None = None) -> DataFrame:
    """→ one filter row per shard: (__shard, family, params, n_keys,
    n_partials=1, filter). ``ndv`` is the TOTAL population hint; each
    shard pre-sizes to its share."""
    spark = df.sparkSession
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions",
                                      "32"))
    n_shards = max(1, n_shards)
    params = json.dumps({"ndv": int(ndv), "fpp": float(fpp),
                         "n_shards": int(n_shards),
                         "routing": "xxhash64"})
    cls = FAMILIES[family]
    per_shard = max(64, ndv // n_shards)
    proj = with_shard(df.select(key_col), key_col, n_shards)
    schema = StructType([
        StructField(SHARD_COL, LongType()),
        StructField("family", StringType()),
        StructField("params", StringType()),
        StructField("n_keys", LongType()),
        StructField("n_partials", LongType()),
        StructField("filter", BinaryType()),
    ])

    def build(table):
        # applyInArrow + zero-copy key extraction: a pandas grouped map
        # would materialize one Python bytes object per key
        import pyarrow as pa

        from ..kernels.keys import keys_from_arrow
        keys = keys_from_arrow(table.column(key_col))
        f = cls.create(per_shard, fpp)
        f.add_hashes(keys)
        return pa.table({
            SHARD_COL: pa.array(
                [table.column(SHARD_COL)[0].as_py()], type=pa.int64()),
            "family": pa.array([family]),
            "params": pa.array([params]),
            "n_keys": pa.array([len(keys)], type=pa.int64()),
            "n_partials": pa.array([1], type=pa.int64()),
            "filter": pa.array([f.serialize()], type=pa.binary())})

    return proj.groupBy(SHARD_COL).applyInArrow(build, schema=schema)


def probe_with_forest(df: DataFrame, forest_df: DataFrame,
                      key_col: str = "key",
                      result_col: str = "maybe_seen") -> DataFrame:
    """Membership probe against a forest: derive the shard column
    JVM-side, then reuse the grouped broadcast-probe (only key + shard
    cross the Arrow boundary)."""
    from .probe import probe_with_filters
    # delegates to the auto-route, which collects the forest exactly
    # once (params + blobs in one job) and derives n_shards from the
    # authoritative params row
    return probe_with_filters(df, forest_df, None, key_col, result_col)


def forest_semi_join(probe_df: DataFrame, build_df: DataFrame,
                     forest_df: DataFrame,
                     key_col: str = "key") -> DataFrame:
    """Exact semi-join accelerated by the forest: forest probe prunes
    the probe side before the shuffle, exact left-semi verifies."""
    candidates = (probe_with_forest(probe_df, forest_df, key_col)
                  .where(F.col("maybe_seen")).drop("maybe_seen"))
    build_keys = build_df.select(key_col).dropDuplicates([key_col])
    return candidates.join(build_keys, on=key_col, how="left_semi")
