"""Sharded block-filter build: byte-identical to the single-process
kernel build, at several shard counts."""

import numpy as np
import pyspark.sql.functions as F

from libfilter_spark.filters import BlockFilter
from libfilter_spark.kernels.keys import sha256_keys
from libfilter_spark.spark.keys import with_content_key_bin
from libfilter_spark.spark.probe import probe_with_filters
from libfilter_spark.spark.sharded import (build_block_filter_sharded,
                                           sharded_filter_row)


def test_sharded_build_byte_identical(spark):
    n = 20_000
    df = spark.range(n).withColumn("content", F.col("id").cast("string"))
    keys = with_content_key_bin(df, "content").select("key")
    local = BlockFilter.create_with_ndv_fpp(n, 0.01)
    local.add_hashes(sha256_keys([str(i) for i in range(n)]))
    expect = local.serialize()
    for shards in (1, 3, 8):
        blob = build_block_filter_sharded(keys, ndv=n, fpp=0.01,
                                          n_shards=shards)
        assert blob == expect, f"shards={shards} differs"


def test_sharded_probe_round_trip(spark):
    n = 30_000
    df = spark.range(n).withColumn("content", F.col("id").cast("string"))
    keys = with_content_key_bin(df, "content").select("key")
    blob = build_block_filter_sharded(keys, ndv=n, fpp=0.01, n_shards=8)
    filters = sharded_filter_row(spark, blob, n, 0.01)
    found = probe_with_filters(keys, filters, None) \
        .where("maybe_seen").count()
    assert found == n
