"""Classic Bloom filter tests (north-star family; textbook
construction with the library's batch-kernel + OR-merge contract)."""

import numpy as np
import pytest

from libfilter_spark.filters import BloomFilter
from libfilter_spark.kernels.keys import splitmix64


def test_no_false_negatives_and_fpp():
    ks = splitmix64(100_000, seed=90)
    f = BloomFilter.create_with_ndv_fpp(100_000, 0.01)
    f.add_hashes(ks)
    assert f.find_hashes(ks).all()
    absent = splitmix64(1_100_000, seed=90)[100_000:]
    fpp = f.find_hashes(absent).mean()
    model = BloomFilter.fpp_model(100_000, f.m_bits, f.k)
    assert fpp <= model + 5 * (model / len(absent)) ** 0.5 + 1e-4


def test_start_empty():
    f = BloomFilter.create_with_ndv_fpp(1_000, 0.01)
    assert not f.find_hashes(splitmix64(10_000, seed=91)).any()


def test_merge_byte_identical_any_order():
    keys = splitmix64(60_000, seed=92)
    parts = np.array_split(keys, 8)
    filters = []
    for p in parts:
        f = BloomFilter.create_with_ndv_fpp(60_000, 0.01)
        f.add_hashes(p)
        filters.append(f)
    rng = np.random.default_rng(93)
    blobs = set()
    for _ in range(4):
        order = rng.permutation(8)
        acc = filters[order[0]].clone()
        for i in order[1:]:
            acc.union_inplace(filters[i])
        blobs.add(acc.serialize())
    assert len(blobs) == 1
    direct = BloomFilter.create_with_ndv_fpp(60_000, 0.01)
    direct.add_hashes(keys)
    assert BloomFilter.deserialize(next(iter(blobs))) == direct


def test_serde_and_mismatch():
    f = BloomFilter.create_with_ndv_fpp(1_000, 0.05)
    f.add_hashes(splitmix64(1_000, seed=94))
    g = BloomFilter.deserialize(f.serialize())
    assert g == f
    with pytest.raises(ValueError):
        f.union(BloomFilter.create_with_ndv_fpp(5_000, 0.05))
    with pytest.raises(ValueError):
        BloomFilter.deserialize(b"bogus!!!")


def test_distributed_build(spark, sf_dir):
    from libfilter_spark.spark.build import build_filters
    from libfilter_spark.spark.keys import with_content_key
    from libfilter_spark.spark.probe import probe_with_filters
    import pyspark.sql.functions as F
    docs = with_content_key(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "text")
    flt = build_filters(docs, ["lang"], family="bloom", ndv=4096, fpp=0.01)
    probed = probe_with_filters(docs, flt, ["lang"])
    assert probed.where(~F.col("maybe_seen")).count() == 0
