"""Distributed sketch builds: Spark path == local single-process
sketch (byte-identical for HLL/CMS), parallelism invariance."""

import numpy as np
import pytest

from libfilter_spark.kernels.keys import to_unsigned
from libfilter_spark.sketches import CountMinSketch, HyperLogLog, KLLSketch, TDigest
from libfilter_spark.spark.keys import with_content_key
from libfilter_spark.spark.sketch_build import build_sketches


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_content_key(df, "text").cache()


def test_hll_distributed_equals_local(docs):
    sk = build_sketches(docs, ["lang"], "key", kind="hll", p=12)
    got = {r["lang"]: bytes(r["sketch"]) for r in sk.collect()}
    local = {}
    for r in docs.select("lang", "key").collect():
        local.setdefault(r.lang, []).append(r.key)
    for lang, ks in local.items():
        h = HyperLogLog(p=12)
        h.update_batch(to_unsigned(np.array(ks, dtype=np.int64)))
        assert h.serialize() == got[lang], lang


def test_hll_parallelism_invariant(docs):
    a = build_sketches(docs.repartition(1), ["lang"], "key", kind="hll", p=12)
    b = build_sketches(docs.repartition(9), ["lang"], "key", kind="hll", p=12)
    assert {r["lang"]: bytes(r["sketch"]) for r in a.collect()} == \
        {r["lang"]: bytes(r["sketch"]) for r in b.collect()}


def test_cms_distributed_equals_local(docs):
    sk = build_sketches(docs, None, "key", kind="countmin",
                        depth=4, width=256)
    blob = bytes(sk.collect()[0]["sketch"])
    keys = to_unsigned(np.array([r.key for r in docs.select("key").collect()],
                                dtype=np.int64))
    local = CountMinSketch(depth=4, width=256)
    local.update_batch(keys)
    assert CountMinSketch.deserialize(blob) == local


def test_kll_distributed_quantiles(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .selectExpr("l_quantity as v")
    sk = build_sketches(li, None, "v", kind="kll", k=200)
    kll = KLLSketch.deserialize(bytes(sk.collect()[0]["sketch"]))
    vals = np.array([r.v for r in li.collect()])
    assert kll.n == len(vals)
    for q in (0.1, 0.5, 0.9):
        est = kll.quantile(q)
        assert abs((vals <= est).mean() - q) < 0.05


def test_tdigest_distributed_quantiles(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .selectExpr("l_extendedprice as v")
    sk = build_sketches(li, None, "v", kind="tdigest", delta=100.0)
    td = TDigest.deserialize(bytes(sk.collect()[0]["sketch"]))
    vals = np.array([r.v for r in li.collect()])
    assert td.n == len(vals)
    for q in (0.05, 0.5, 0.95):
        est = td.quantile(q)
        assert abs((vals <= est).mean() - q) < 0.05
