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


def test_tcf_forest_build_probe_semijoin(spark):
    """Filter forest (merge-free TCF scale path): shard-routed build +
    grouped probe, zero FN, structural FPP (no tail loss — contrast
    with a many-way union, which burns log2(P) tail bits)."""
    from pyspark.sql import functions as F

    from libfilter_spark.spark.forest import (build_filter_forest,
                                              forest_semi_join,
                                              probe_with_forest)
    from libfilter_spark.spark.keys import with_content_key_bin

    n = 60_000
    df = (spark.range(n).withColumn("c", F.col("id").cast("string")))
    keys = with_content_key_bin(df, "c").select("key")
    forest = build_filter_forest(keys, "key", "taffy_cuckoo",
                                 ndv=n, fpp=0.01, n_shards=16).cache()
    assert forest.count() == 16
    # zero FN over members
    probed = probe_with_forest(keys, forest, "key")
    assert probed.where("maybe_seen").count() == n
    # FPP structural on absent keys (tail intact: ~2^-10 * slots)
    absent = (spark.range(n, 2 * n)
              .withColumn("c", F.col("id").cast("string")))
    akeys = with_content_key_bin(absent, "c").select("key")
    n_fp = probe_with_forest(akeys, forest, "key") \
        .where("maybe_seen").count()
    assert n_fp / n < 0.01, n_fp / n
    # semi-join end-to-end (exact verify)
    build_half = keys.limit(0)  # exercise empty-build edge separately
    hits = forest_semi_join(akeys, keys, forest, "key")
    assert hits.count() == 0  # absent keys never survive exact verify
    hits2 = forest_semi_join(keys, keys, forest, "key")
    assert hits2.count() == n


def test_mtcf_forest_build_probe(spark):
    """The forest is family-generic: minimal taffy cuckoo shards build
    and probe through the same machinery."""
    from pyspark.sql import functions as F

    from libfilter_spark.spark.forest import (build_filter_forest,
                                              probe_with_forest)
    from libfilter_spark.spark.keys import with_content_key_bin

    n = 20_000
    df = spark.range(n).withColumn("c", F.col("id").cast("string"))
    keys = with_content_key_bin(df, "c").select("key")
    forest = build_filter_forest(keys, "key", "minimal_taffy_cuckoo",
                                 ndv=n, fpp=0.01, n_shards=8).cache()
    assert probe_with_forest(keys, forest, "key") \
        .where("maybe_seen").count() == n
    absent = spark.range(n, 2 * n).withColumn("c",
                                              F.col("id").cast("string"))
    akeys = with_content_key_bin(absent, "c").select("key")
    n_fp = probe_with_forest(akeys, forest, "key") \
        .where("maybe_seen").count()
    assert n_fp / n < 0.03
