"""Checkpointed/resumable salted builds + streaming incremental build."""

import os
import shutil
import time

import numpy as np
import pyspark.sql.functions as F
import pytest

from libfilter_spark.spark.build import build_filters
from libfilter_spark.spark.checkpoint import (build_partials_salted,
                                              checkpoint_metrics,
                                              checkpointed_build, with_salt)
from libfilter_spark.spark.keys import with_content_key
from libfilter_spark.spark.probe import probe_with_filters


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_content_key(df, "text").cache()


def test_salted_build_equals_unsalted(docs, spark):
    partials = build_partials_salted(docs, ["lang"], "key", "block",
                                     4096, 0.01, n_salts=4)
    rows = partials.collect()
    # multiple salts per group actually materialized (skew splitting)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert all(len(v) > 1 for v in by_lang.values())
    assert all(r["lineage_id"] and r["build_ms"] >= 0 for r in rows)
    from libfilter_spark.spark.build import merge_filter_blobs
    merged = merge_filter_blobs(
        partials.select("lang", "family", "params", "n_keys", "n_partials",
                        "filter"), ["lang"])
    got = {r["lang"]: bytes(r["filter"]) for r in merged.collect()}
    direct = build_filters(docs, ["lang"], ndv=4096, fpp=0.01)
    expect = {r["lang"]: bytes(r["filter"]) for r in direct.collect()}
    assert got == expect  # salting is semantically free (OR-merge)


def test_checkpoint_resume(docs, spark, tmp_path):
    ckpt = str(tmp_path / "ckpt1")
    merged1 = checkpointed_build(spark, docs, ["lang"], ckpt,
                                 ndv=4096, fpp=0.01, n_salts=4)
    blobs1 = {r["lang"]: bytes(r["filter"]) for r in merged1.collect()}
    n_partials_1 = checkpoint_metrics(spark, ckpt).count()

    # resume over the same input: nothing new should be built
    merged2 = checkpointed_build(spark, docs, ["lang"], ckpt,
                                 ndv=4096, fpp=0.01, n_salts=4)
    blobs2 = {r["lang"]: bytes(r["filter"]) for r in merged2.collect()}
    n_partials_2 = checkpoint_metrics(spark, ckpt).count()
    assert blobs1 == blobs2
    assert n_partials_1 == n_partials_2  # no duplicate work appended

    # partial-loss resume: drop one lang's units, rebuild only those
    partial_path = f"{ckpt}/partials"
    surviving = spark.read.parquet(partial_path).where("lang <> 'en'")
    rows = surviving.collect()
    shutil.rmtree(partial_path)
    spark.createDataFrame(rows, surviving.schema) \
        .write.parquet(partial_path)
    merged3 = checkpointed_build(spark, docs, ["lang"], ckpt,
                                 ndv=4096, fpp=0.01, n_salts=4)
    blobs3 = {r["lang"]: bytes(r["filter"]) for r in merged3.collect()}
    assert blobs3 == blobs1  # rebuilt missing units to identical state


def test_checkpointed_filters_probe_clean(docs, spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    merged = checkpointed_build(spark, docs, ["lang"], ckpt,
                                family="taffy_block", ndv=64, fpp=0.01,
                                n_salts=4)
    probed = probe_with_filters(docs, merged, ["lang"])
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_streaming_incremental_build(spark, tmp_path):
    from libfilter_spark.streaming import stream_build_filters
    from libfilter_spark.streaming.build import read_state
    from libfilter_spark.filters import TaffyBlockFilter
    from libfilter_spark.kernels.keys import to_unsigned

    state_dir = str(tmp_path / "state")
    ckpt_dir = str(tmp_path / "stream_ckpt")
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "2000").load()
              .withColumn("content", F.col("value").cast("string")))
    from libfilter_spark.spark.keys import with_content_key as wck
    keyed = wck(stream, "content", hex_col=None).select("value", "key")
    q = stream_build_filters(keyed, None, state_dir, ckpt_dir,
                             family="taffy_block", ndv=64, fpp=0.01)
    try:
        deadline = time.time() + 60
        seen = 0
        while time.time() < deadline:
            state = read_state(spark, state_dir)
            if state is not None:
                seen = state.collect()[0]["n_keys"]
                if seen >= 2000:
                    break
            time.sleep(2)
    finally:
        q.stop()
    assert seen >= 2000, f"stream folded only {seen} keys"
    state = read_state(spark, state_dir)
    row = state.collect()[0]
    f = TaffyBlockFilter.deserialize(bytes(row["filter"]))
    # every streamed key (0..seen-1 rate values) must be present
    from libfilter_spark.kernels.keys import sha256_keys
    check = sha256_keys([str(i) for i in range(0, int(row["n_keys"]), 7)])
    assert f.find_hashes(check).all()
