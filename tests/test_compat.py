"""Reference-python-binding compatibility surface + cross-checks of
our sketches against Spark's built-in approximate aggregates."""

import numpy as np
import pyspark.sql.functions as F

from libfilter_spark.compat import (Block, FrozenTaffyCuckoo, TaffyBlock,
                                    TaffyCuckoo, Union)
from libfilter_spark.kernels.keys import splitmix64


def test_block_reference_usage_shape():
    # mirrors python/block.py usage: Block(ndv, fpp), +=, in
    f = Block(10_000, 0.01)
    f += 0xDEADBEEF
    assert 0xDEADBEEF in f
    ks = splitmix64(10_000, seed=80)
    f.add_hashes(ks)
    assert all(int(k) in f for k in ks[:20])


def test_taffy_cuckoo_reference_usage_shape():
    f = TaffyCuckoo(64)
    ks = splitmix64(5_000, seed=81)
    for k in ks[:100]:
        f += int(k)
    f.add_hashes(ks[100:])
    assert f.find_hashes(ks).all()
    fr = f.freeze()
    assert isinstance(fr, FrozenTaffyCuckoo)
    assert fr.find_hashes(ks).all()
    g = TaffyCuckoo(64)
    g.add_hashes(splitmix64(500, seed=82))
    u = Union(f, g)
    assert u.find_hashes(ks).all()


def test_taffy_block_compat():
    f = TaffyBlock(64, 0.01)
    ks = splitmix64(3_000, seed=83)
    f.add_hashes(ks)
    assert f.find_hashes(ks).all()


def test_hll_vs_spark_builtin(spark):
    """Our HLL and Spark's approx_count_distinct must agree with the
    exact count within each's error bound."""
    from libfilter_spark.spark.keys import with_content_key
    from libfilter_spark.spark.sketch_build import build_sketches
    from libfilter_spark.sketches import HyperLogLog

    df = with_content_key(
        spark.range(50_000).withColumn("content",
                                       F.col("id").cast("string")),
        "content")
    sk = build_sketches(df, None, "key", kind="hll", p=14)
    ours = HyperLogLog.deserialize(bytes(sk.collect()[0]["sketch"]))
    spark_est = df.select(
        F.approx_count_distinct("key", 0.01).alias("e")).collect()[0]["e"]
    assert abs(ours.estimate() - 50_000) / 50_000 < 0.03
    assert abs(spark_est - 50_000) / 50_000 < 0.05
    assert abs(ours.estimate() - spark_est) / 50_000 < 0.08


def test_quantiles_vs_spark_builtin(spark, sf_dir):
    from libfilter_spark.spark.sketch_build import build_sketches
    from libfilter_spark.sketches import KLLSketch, TDigest

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .selectExpr("l_extendedprice as v")
    spark_q = li.select(F.percentile_approx("v", [0.25, 0.5, 0.75], 10000)
                        .alias("q")).collect()[0]["q"]
    kll = KLLSketch.deserialize(bytes(
        build_sketches(li, None, "v", kind="kll", k=200)
        .collect()[0]["sketch"]))
    td = TDigest.deserialize(bytes(
        build_sketches(li, None, "v", kind="tdigest", delta=100.0)
        .collect()[0]["sketch"]))
    total = li.count()
    for i, q in enumerate([0.25, 0.5, 0.75]):
        for est in (kll.quantile(q), td.quantile(q), spark_q[i]):
            rank = li.where(F.col("v") <= float(est)).count() / total
            assert abs(rank - q) < 0.05, (q, est, rank)
