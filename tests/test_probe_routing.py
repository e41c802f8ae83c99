"""Probe routing: broadcast vs shuffle-cogroup equivalence, the
auto-budget fallback, and engine null-key parity (round-4 items)."""

import pyspark.sql.functions as F
import pytest

from libfilter_spark.spark.build import build_filters
from libfilter_spark.spark.keys import with_content_key_bin
from libfilter_spark.spark.probe import probe_with_filters


@pytest.fixture(scope="module")
def grouped_setup(spark):
    build = spark.range(2_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    build_keys = with_content_key_bin(build, "content") \
        .select("g", "key")
    filters = build_filters(build_keys, ["g"], ndv=1_000, fpp=0.01)
    filters.cache().count()
    probe = spark.range(3_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("g", "key", "content")
    # add a null-key row (must be a non-member, not a crash)
    null_row = spark.createDataFrame(
        [("0", None, "nullkey")], probe_keys.schema)
    return filters, probe_keys.unionByName(null_row)


def _result_map(df):
    return {(r["g"], r["content"]): r["maybe_seen"] for r in df.collect()}


def test_probe_shuffle_equals_broadcast(spark, grouped_setup):
    filters, probe = grouped_setup
    via_b = _result_map(probe_with_filters(probe, filters, ["g"],
                                           via="broadcast"))
    via_s = _result_map(probe_with_filters(probe, filters, ["g"],
                                           via="shuffle"))
    assert via_b == via_s
    assert len(via_b) == 3_001
    # zero FN: every build key in a surviving group must be seen
    assert all(v for (g, c), v in via_b.items()
               if g in "0123" and c.isdigit()
               and int(c) < 2_000 and int(c) % 4 == int(g))
    assert via_b[("0", "nullkey")] is False


def test_probe_auto_budget_falls_back_to_shuffle(spark, grouped_setup,
                                                 monkeypatch):
    import libfilter_spark.spark.probe as P
    filters, probe = grouped_setup
    expect = _result_map(probe_with_filters(probe, filters, ["g"],
                                            via="broadcast"))
    monkeypatch.setattr(P, "_BROADCAST_MAX", 8)  # force overflow
    got = _result_map(probe_with_filters(probe, filters, ["g"],
                                         via="auto"))
    assert got == expect


def test_probe_global_shuffle_route(spark):
    build = spark.range(1_000).select(
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(build, "content").select("key")
    filters = build_filters(keys, None, ndv=1_000, fpp=0.01)
    filters.cache().count()
    probe = spark.range(2_000).select(
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("key", "content")
    b = {r["content"]: r["maybe_seen"]
         for r in probe_with_filters(probe_keys, filters, None,
                                     via="broadcast").collect()}
    s = {r["content"]: r["maybe_seen"]
         for r in probe_with_filters(probe_keys, filters, None,
                                     via="shuffle").collect()}
    assert b == s and len(b) == 2_000
    assert all(b[str(i)] for i in range(1_000))


def test_sharded_engines_agree_on_null_keys(spark):
    """Round-3 ADVICE low: the arrow engine must drop null keys like
    the jvm engine (no spurious key-0 membership bit)."""
    from libfilter_spark.spark.sharded import build_block_shards
    base = spark.range(5_000).select(
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("key")
    nulls = spark.createDataFrame([(None,), (None,)], keys.schema)
    with_nulls = keys.unionByName(nulls)
    frames = {}
    for engine in ("jvm", "arrow"):
        sh = build_block_shards(with_nulls, ndv=5_000, fpp=0.01,
                                n_shards=4, engine=engine)
        frames[engine] = {r["__shard"]: (bytes(r["filter"]), r["n_keys"])
                          for r in sh.collect()}
    assert frames["jvm"] == frames["arrow"]
    assert sum(n for _, n in frames["jvm"].values()) == 5_000


def test_build_strategy_override_pins_partials(spark, monkeypatch):
    """Round-3 ADVICE low (streaming): strategy='partials' must yield a
    single mergeable row even when the size router would go sharded."""
    monkeypatch.setenv("LIBFILTER_SHARDED_MIN", "1024")
    base = spark.range(2_000).select(
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("key")
    routed = build_filters(keys, None, ndv=2_000_000, fpp=0.004)
    assert "__shard" in routed.columns  # router picks sharded
    pinned = build_filters(keys, None, ndv=2_000_000, fpp=0.004,
                           strategy="partials")
    assert "__shard" not in pinned.columns
    rows = pinned.collect()
    assert len(rows) == 1 and rows[0]["family"] == "block"


def test_grouped_block_jvm_engine_byte_identical(spark):
    """Huge grouped block builds route through the JVM bit_or engine
    (round-4): per-group blobs must be byte-identical to the streamed
    applyInArrow bulk build, and the public router must pick it past
    the 10M-ndv crossover."""
    from libfilter_spark.spark.build import (_build_grouped,
                                             _build_grouped_block_jvm,
                                             _result_schema)
    import json as _json
    n = 40_000
    base = spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("g", "key")
    proj = keys.select("g", "key")
    params = _json.dumps({"ndv": 20_000, "fpp": 0.01})
    jvm = _build_grouped_block_jvm(proj, ["g"], "key", 20_000, 0.01,
                                   params, _result_schema(proj, ["g"]))
    arrow = _build_grouped(keys, ["g"], "key", "block", 20_000, 0.01)
    f_jvm = {r["g"]: (bytes(r["filter"]), r["n_keys"])
             for r in jvm.collect()}
    f_arr = {r["g"]: (bytes(r["filter"]), r["n_keys"])
             for r in arrow.collect()}
    assert f_jvm == f_arr and len(f_jvm) == 3
    # public router: grouped block past both thresholds -> jvm path,
    # zero FN through the grouped probe
    filters = build_filters(keys, ["g"], ndv=12_000_000, fpp=0.01)
    filters.cache().count()
    found = probe_with_filters(keys, filters, ["g"]) \
        .where("maybe_seen").count()
    assert found == n
    filters.unpersist()


def test_grouped_tbf_jvm_engine_byte_identical(spark):
    """Round-5 (verdict task 7): huge grouped taffy_block builds run
    the insert as the JVM bit_or aggregation. Blobs must be
    byte-identical to the streamed create+add_hashes build at the same
    level-0 sizing, and the public router must pick the engine past
    the 10M-ndv crossover."""
    import json as _json

    from libfilter_spark.filters.taffy_block import (_level0_ndv)
    from libfilter_spark.spark.build import (_build_grouped,
                                             _build_grouped_tbf_jvm,
                                             _result_schema)
    n, ndv = 30_000, 9_000
    base = spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("g", "key")
    params = _json.dumps({"ndv": ndv, "fpp": 0.01})
    jvm = _build_grouped_tbf_jvm(keys, ["g"], "key", ndv, 0.01, params,
                                 _result_schema(keys, ["g"]))
    # streamed side gets the jvm engine's inflated level-0 hint so the
    # sizing (and therefore the bytes) match exactly; a 10k-key group
    # stays within level 0 either way
    ndv0 = _level0_ndv(int(ndv * 1.25) + 64, 0.01)
    arrow = _build_grouped(keys, ["g"], "key", "taffy_block",
                           ndv0, 0.01)
    f_jvm = {r["g"]: (bytes(r["filter"]), r["n_keys"], r["family"])
             for r in jvm.collect()}
    f_arr = {r["g"]: (bytes(r["filter"]), r["n_keys"], r["family"])
             for r in arrow.collect()}
    assert f_jvm == f_arr and len(f_jvm) == 3
    assert all(fam == "taffy_block" for _, _, fam in f_jvm.values())
    # public router: grouped taffy_block past the crossover -> jvm
    # engine, zero FN through the grouped probe
    filters = build_filters(keys, ["g"], family="taffy_block",
                            ndv=12_000_000, fpp=0.01)
    filters.cache().count()
    found = probe_with_filters(keys, filters, ["g"]) \
        .where("maybe_seen").count()
    assert found == n
    filters.unpersist()
    # a group overflowing the pre-sized level 0 raises, never
    # silently mis-builds
    tiny_params = _json.dumps({"ndv": 64, "fpp": 0.01})
    bad = _build_grouped_tbf_jvm(keys, ["g"], "key", 64, 0.01,
                                 tiny_params,
                                 _result_schema(keys, ["g"]))
    with pytest.raises(Exception, match="level-0 capacity"):
        bad.collect()


def test_sharded_override_validation(spark):
    """Round-4 ADVICE low: a pinned strategy='sharded' with group
    columns or a non-block family must error, not silently build one
    groupless block shard frame."""
    base = spark.range(100).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("g", "key")
    with pytest.raises(ValueError, match="sharded"):
        build_filters(keys, ["g"], strategy="sharded")
    with pytest.raises(ValueError, match="sharded"):
        build_filters(keys.select("key"), None, family="taffy_block",
                      strategy="sharded")


def test_grouped_block_jvm_null_group(spark):
    """Round-4 ADVICE medium: a null group value must not crash the
    JVM engine's assemble (np.unique cannot sort None); blobs must
    stay byte-identical to the streamed bulk build, null group
    included."""
    import json as _json

    from libfilter_spark.spark.build import (_build_grouped,
                                             _build_grouped_block_jvm,
                                             _result_schema)
    base = spark.range(9_000).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 3).cast("string")).alias("g"),
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("g", "key")
    params = _json.dumps({"ndv": 4_000, "fpp": 0.01})
    jvm = _build_grouped_block_jvm(keys, ["g"], "key", 4_000, 0.01,
                                   params,
                                   _result_schema(keys, ["g"]))
    arrow = _build_grouped(keys, ["g"], "key", "block", 4_000, 0.01)
    f_jvm = {r["g"]: (bytes(r["filter"]), r["n_keys"])
             for r in jvm.collect()}
    f_arr = {r["g"]: (bytes(r["filter"]), r["n_keys"])
             for r in arrow.collect()}
    assert f_jvm == f_arr
    assert None in f_jvm and len(f_jvm) == 3


def test_shard_frame_auto_overbudget_stays_off_driver(spark,
                                                      monkeypatch):
    """Round-4 ADVICE medium: an over-budget shard frame must fall
    back to the shuffle probe WITHOUT first collecting every blob to
    the driver. Both the cached (length-agg precheck) and uncached
    (budgeted toLocalIterator) arms must agree with broadcast."""
    import libfilter_spark.spark.probe as P
    from libfilter_spark.spark.sharded import build_block_shards
    base = spark.range(4_000).select(
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("key")
    shards = build_block_shards(keys, ndv=4_000, fpp=0.01, n_shards=4)
    probe = spark.range(8_000).select(
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("key", "content")
    expect = {r["content"]: r["maybe_seen"]
              for r in probe_with_filters(probe_keys, shards, None,
                                          via="broadcast").collect()}
    assert all(expect[str(i)] for i in range(4_000))
    monkeypatch.setattr(P, "_BROADCAST_MAX", 8)
    # uncached arm: budgeted toLocalIterator stops within budget.
    # The iterator arm only engages on big sessions (>64 shuffle
    # partitions — small sessions plain-collect, see
    # _collect_shard_rows_auto), so pin a big-session shape for it.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        got_uncached = {r["content"]: r["maybe_seen"]
                        for r in probe_with_filters(probe_keys, shards,
                                                    None).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    shards.cache().count()
    got_cached = {r["content"]: r["maybe_seen"]
                  for r in probe_with_filters(probe_keys, shards,
                                              None).collect()}
    shards.unpersist()
    assert got_uncached == expect
    assert got_cached == expect


def test_filter_via_shm_zero_copy_equivalent():
    """The shm memmap path (what a worker runs past _SHM_MIN_BYTES)
    must probe identically to the private-copy deserialize for both
    covered families — block (raw u4 view) and taffy_block (grown
    multi-level stack via deserialize_view). No Spark: _materialize's
    worker-side branch is exercised directly."""
    import os
    import uuid

    import numpy as np
    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    from libfilter_spark.filters import BlockFilter, TaffyBlockFilter
    from libfilter_spark.kernels.keys import splitmix64
    from libfilter_spark.spark.probe import _filter_via_shm
    keys = splitmix64(30_000, seed=3)
    absent = splitmix64(60_000, seed=3)[30_000:]
    token = uuid.uuid4().hex
    bf = BlockFilter.create_with_ndv_fpp(30_000, 0.01)
    bf.add_hashes(keys)
    tbf = TaffyBlockFilter.create(64, 0.01)
    tbf.add_hashes(keys)  # grown: multi-level
    for fam, f in (("block", bf), ("taffy_block", tbf)):
        g = _filter_via_shm(token, (fam,), fam, f.serialize())
        assert g.find_hashes(keys).all()
        assert np.array_equal(g.find_hashes(absent),
                              f.find_hashes(absent))
        # second call (another worker) reuses the same shm file
        h = _filter_via_shm(token, (fam,), fam, f.serialize())
        assert h.find_hashes(keys).all()


def test_shared_assembled_state_equivalent():
    """The /dev/shm shared-assembly path (what workers run past
    _SHM_ASM_MIN on a global shard probe) must agree with private
    assembly for both assembled kinds — the single-level TBF forest
    matrix and the block-slice global filter — across all three
    worker roles: publisher (lock holder), attacher (file already
    present, no broadcast unpickle), and private fallback (publisher
    too slow). No Spark: _materialize's worker branch is exercised
    directly."""
    import os
    import uuid

    import numpy as np
    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    import libfilter_spark.spark.probe as P
    from libfilter_spark.filters.block import BlockSliceFilter
    from libfilter_spark.filters.taffy_block import TaffyBlockFilter
    from libfilter_spark.kernels import block as K
    from libfilter_spark.kernels.keys import shard_of_keys, splitmix64

    keys = splitmix64(40_000, seed=7)
    absent = splitmix64(80_000, seed=7)[40_000:]
    n_sh = 4

    class FakeBC:
        def __init__(self, token, fmap):
            self.value = (token, fmap)

    made = []
    try:
        # --- single-level TBF forest kind ---
        shards = shard_of_keys(keys, n_sh, binary=False)
        blobs = {}
        for s in range(n_sh):
            f = TaffyBlockFilter.create(12_000, 0.004)
            f.add_hashes(keys[shards == s])
            assert len(f.levels) == 1
            blobs[s] = f.serialize()
        token = uuid.uuid4().hex
        meta = {"token": token, "kind": "tbf_level0_set",
                "n_shards": n_sh}
        made.append(P._asm_path(token, "tbf_level0_set"))
        fmap = {(): ("tbf_level0_set", (n_sh, blobs))}
        priv = P._TbfForestProbe.assemble(n_sh, blobs)

        # role 1: publisher — no file yet, takes the lock, publishes
        P._FILTER_CACHE.clear()
        pub = P._materialize(FakeBC(token, fmap), meta)[()]
        assert os.path.exists(made[-1])
        # role 2: attacher — fresh worker, file present; broadcast
        # value must NOT be touched
        P._FILTER_CACHE.clear()

        class Poisoned:
            @property
            def value(self):
                raise AssertionError("attacher touched bc.value")
        att = P._materialize(Poisoned(), meta)[()]
        for obj in (pub, att):
            assert obj.find(keys, binary=False).all()
            assert np.array_equal(obj.find(absent, binary=False),
                                  priv.find(absent, binary=False))

        # role 3: private fallback — lock held by a live "worker",
        # deadline elapsed
        lock = made[-1] + ".lock"
        os.unlink(made[-1])
        with open(lock, "w"):
            pass
        made.append(lock)
        old_wait = P._ASM_WAIT_S
        P._ASM_WAIT_S = 0.0
        try:
            P._FILTER_CACHE.clear()
            fb = P._materialize(FakeBC(token, fmap), meta)[()]
        finally:
            P._ASM_WAIT_S = old_wait
        assert not os.path.exists(made[-2])  # nobody published
        assert fb.find(keys, binary=False).all()

        # --- block-slice kind ---
        from libfilter_spark.filters import BlockFilter
        full = BlockFilter.create_with_ndv_fpp(40_000, 0.004)
        full.add_hashes(keys)
        st = full.state
        w = K.WORDS_PER_BUCKET
        nb = st.size // w
        bounds = [0, nb // 3, 2 * nb // 3, nb]
        slices = [BlockSliceFilter(nb, lo,
                                   st[lo * w:hi * w]).serialize()
                  for lo, hi in zip(bounds, bounds[1:])]
        token2 = uuid.uuid4().hex
        meta2 = {"token": token2, "kind": "block_slice_set",
                 "n_shards": len(slices)}
        made.append(P._asm_path(token2, "block_slice_set"))
        fmap2 = {(): ("block_slice_set", slices)}
        P._FILTER_CACHE.clear()
        pub2 = P._materialize(FakeBC(token2, fmap2), meta2)[()]
        assert os.path.exists(made[-1])
        P._FILTER_CACHE.clear()
        att2 = P._materialize(Poisoned(), meta2)[()]
        for obj in (pub2, att2):
            assert obj.find_hashes(keys).all()
            assert np.array_equal(obj.find_hashes(absent),
                                  full.find_hashes(absent))
    finally:
        P._FILTER_CACHE.clear()
        for pth in made:
            try:
                os.unlink(pth)
            except OSError:
                pass


def test_shared_assembly_spark_end_to_end(spark, monkeypatch):
    """With the share threshold lowered, a global shard-frame probe
    must publish the assembled state to /dev/shm and answer exactly
    as before — for both the sharded block build and the jvm TBF
    forest. Exercises the real worker path (publisher + attachers
    racing) under Spark."""
    import glob
    import os

    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    import libfilter_spark.spark.probe as P
    from libfilter_spark.spark.forest import build_filter_forest
    from libfilter_spark.spark.sharded import build_block_shards

    monkeypatch.setattr(P, "_SHM_ASM_MIN", 1)
    n = 6_000
    base = spark.range(n).select(
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("key")
    probe = spark.range(2 * n).select(
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("key", "content")

    before = set(glob.glob("/dev/shm/libfilter_asm_*.u4"))
    try:
        for frame in (
                build_block_shards(keys, ndv=n, fpp=0.01, n_shards=4),
                build_filter_forest(keys, "key", "taffy_block", ndv=n,
                                    fpp=0.01, n_shards=4,
                                    engine="jvm")):
            got = {r["content"]: r["maybe_seen"]
                   for r in probe_with_filters(probe_keys, frame,
                                               None).collect()}
            assert all(got[str(i)] for i in range(n))  # zero FN
            # repeat probe (warm caches + existing shm file)
            again = {r["content"]: r["maybe_seen"]
                     for r in probe_with_filters(probe_keys, frame,
                                                 None).collect()}
            assert again == got
        created = set(glob.glob("/dev/shm/libfilter_asm_*.u4")) - before
        assert len(created) == 2  # one per assembled kind
    finally:
        for pth in set(glob.glob("/dev/shm/libfilter_asm_*")) - before:
            try:
                os.unlink(pth)
            except OSError:
                pass


def test_shared_assembly_stale_lock_takeover():
    """A lock whose holder died mid-assembly must not wedge the
    shared-assembly path: a worker that finds a stale lock (mtime
    older than _ASM_LOCK_STALE_S) steals it and publishes."""
    import os
    import time
    import uuid

    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    import numpy as np

    import libfilter_spark.spark.probe as P

    token = uuid.uuid4().hex
    meta = {"token": token, "kind": "block_slice_set", "n_shards": 1}
    path = P._asm_path(token, "block_slice_set")
    lock = path + ".lock"
    try:
        with open(lock, "w"):
            pass
        stale = time.time() - P._ASM_LOCK_STALE_S - 5
        os.utime(lock, (stale, stale))
        calls = []

        def build():
            calls.append(1)
            from libfilter_spark.filters.block import BlockFilter
            raw = np.zeros(1024, dtype=np.uint8)
            return BlockFilter(raw.view(np.uint32)), raw

        got = P._publish_assembled(meta, build)
        assert got is not None and calls == [1]
        assert os.path.exists(path) and not os.path.exists(lock)
    finally:
        for pth in (path, lock):
            try:
                os.unlink(pth)
            except OSError:
                pass


def test_grouped_probe_int_group_with_nulls(spark):
    """The argsort fast path only takes non-null integer group
    columns; a null group value must route through the pandas
    fallback and report its rows as non-members (not crash, not
    match). Pins the null_count guard in _broadcast_probe_udf."""
    build = spark.range(1_000).select(
        (F.col("id") % 4).alias("g"),
        F.col("id").cast("string").alias("content"))
    build_keys = with_content_key_bin(build, "content") \
        .select("g", "key")
    filters = build_filters(build_keys, ["g"], ndv=300, fpp=0.01)
    filters.cache().count()
    probe = spark.range(2_000).select(
        F.when(F.col("id") % 5 == 4, F.lit(None))
         .otherwise(F.col("id") % 4).alias("g"),
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("g", "key", "content")
    got = {r["content"]: (r["g"], r["maybe_seen"])
           for r in probe_with_filters(probe_keys, filters, ["g"],
                                       via="broadcast").collect()}
    assert len(got) == 2_000
    for i in range(2_000):
        g, seen = got[str(i)]
        if i % 5 == 4:
            assert g is None and seen is False  # null group: no match
        elif i < 1_000 and i % 4 == g:
            assert seen  # zero FN for build keys in their group
    filters.unpersist()


def test_small_session_precheck_keeps_blobs_off_driver(spark,
                                                       monkeypatch):
    """Round-5 verdict task 5(b): on a SMALL session (≤64 shuffle
    partitions) an over-budget uncached shard frame must route to the
    shuffle probe from the n_shards × first-blob-length ESTIMATE —
    i.e. before the full blob collect — not from a post-collect check
    that already materialized everything in driver memory."""
    import warnings

    import libfilter_spark.spark.probe as P
    from libfilter_spark.spark.sharded import build_block_shards

    base = spark.range(3_000).select(
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("key")
    shards = build_block_shards(keys, ndv=3_000, fpp=0.01, n_shards=4)
    probe = spark.range(6_000).select(
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("key", "content")
    expect = {r["content"]: r["maybe_seen"]
              for r in probe_with_filters(probe_keys, shards, None,
                                          via="broadcast").collect()}
    monkeypatch.setattr(P, "_BROADCAST_MAX", 8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {r["content"]: r["maybe_seen"]
               for r in probe_with_filters(probe_keys, shards,
                                           None).collect()}
    # the ESTIMATE warning proves the fallback fired pre-collect
    assert any("estimated shard blobs" in str(x.message) for x in w)
    assert got == expect
    assert all(got[str(i)] for i in range(3_000))


def test_truncated_published_state_falls_back():
    """A truncated/garbage file at the published asm path (e.g. a
    crashed publisher plus an unlucky rename) must be REJECTED by the
    attacher for both assembled kinds; the worker then republishes
    correct state over it and answers exactly."""
    import os
    import uuid

    import numpy as np
    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    import libfilter_spark.spark.probe as P
    from libfilter_spark.filters import BlockFilter
    from libfilter_spark.filters.block import BlockSliceFilter
    from libfilter_spark.filters.taffy_block import TaffyBlockFilter
    from libfilter_spark.kernels import block as K
    from libfilter_spark.kernels.keys import shard_of_keys, splitmix64

    keys = splitmix64(20_000, seed=11)
    absent = splitmix64(40_000, seed=11)[20_000:]

    class FakeBC:
        def __init__(self, token, fmap):
            self.value = (token, fmap)

    made = []
    try:
        # --- block_slice_set kind (exact-bytes meta guard) ---
        full = BlockFilter.create_with_ndv_fpp(20_000, 0.004)
        full.add_hashes(keys)
        st = full.state
        w = K.WORDS_PER_BUCKET
        nb = st.size // w
        bounds = [0, nb // 2, nb]
        slices = [BlockSliceFilter(nb, lo,
                                   st[lo * w:hi * w]).serialize()
                  for lo, hi in zip(bounds, bounds[1:])]
        token = uuid.uuid4().hex
        meta = {"token": token, "kind": "block_slice_set",
                "n_shards": 2, "bytes": nb * 32}
        path = P._asm_path(token, "block_slice_set")
        made.append(path)
        np.zeros(7, dtype=np.uint8).tofile(path)  # truncated garbage
        assert P._attach_assembled(meta) is None
        P._FILTER_CACHE.clear()
        got = P._materialize(
            FakeBC(token, {(): ("block_slice_set", slices)}), meta)[()]
        assert got.find_hashes(keys).all()
        assert np.array_equal(got.find_hashes(absent),
                              full.find_hashes(absent))
        assert os.path.getsize(path) == nb * 32  # republished correct

        # --- tbf_level0_set kind (size-divisibility guard) ---
        n_sh = 4
        shards = shard_of_keys(keys, n_sh, binary=False)
        blobs = {}
        for s in range(n_sh):
            f = TaffyBlockFilter.create(8_000, 0.004)
            f.add_hashes(keys[shards == s])
            blobs[s] = f.serialize()
        token2 = uuid.uuid4().hex
        meta2 = {"token": token2, "kind": "tbf_level0_set",
                 "n_shards": n_sh}
        path2 = P._asm_path(token2, "tbf_level0_set")
        made.append(path2)
        np.zeros(13, dtype=np.uint8).tofile(path2)  # non-divisible
        assert P._attach_assembled(meta2) is None
        P._FILTER_CACHE.clear()
        got2 = P._materialize(
            FakeBC(token2, {(): ("tbf_level0_set", (n_sh, blobs))}),
            meta2)[()]
        assert got2.find(keys, binary=False).all()
    finally:
        P._FILTER_CACHE.clear()
        for pth in made:
            try:
                os.unlink(pth)
            except OSError:
                pass


def test_stale_lock_takeover_is_compare_and_swap():
    """Round-5 verdict: two waiters can both observe a stale lock; the
    slower one must NOT unlink the faster taker's FRESH lock. The
    takeover confirms by inode before unlinking (rename-aside CAS) and
    restores a fresh lock it grabbed by accident."""
    import os

    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    import libfilter_spark.spark.probe as P

    lock = f"/dev/shm/libfilter_asm_testcas_{os.getpid()}.lock"
    try:
        with open(lock, "w") as fh:
            fh.write("stale-holder")
        st = os.stat(lock)
        # another waiter already took over: stale unlinked, FRESH lock
        # created at the same path (new inode)
        os.unlink(lock)
        with open(lock, "w") as fh:
            fh.write("fresh-holder")
        assert P._takeover_stale_lock(lock, st) is False
        assert os.path.exists(lock)  # fresh lock survived
        with open(lock) as fh:
            assert fh.read() == "fresh-holder"
        # the genuine stale case (inode unchanged) removes the lock
        st2 = os.stat(lock)
        assert P._takeover_stale_lock(lock, st2) is True
        assert not os.path.exists(lock)
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def test_grouped_jvm_many_group_cols_no_overflow(spark):
    """ADVICE r5: the assemble stage's combined group code used to be
    gkey = gkey*|u| + inv, which overflows int64 when the product of
    per-column cardinalities tops 2^63 — silently merging distinct
    groups into one filter slice. Ten ~hundred-unique columns force
    the lexsort fallback; every build key must still probe true in
    its own group (a merged slice would also create cross-group false
    positives at far above the configured fpp)."""
    import json as _json

    from libfilter_spark.spark.build import (_build_grouped_block_jvm,
                                             _result_schema)

    n = 600
    gcols = [f"g{i}" for i in range(10)]
    base = spark.range(n).select(
        F.col("id"),
        F.col("id").cast("string").alias("content"),
        *[((F.col("id") * (i + 3)) % 101).cast("string").alias(c)
          for i, c in enumerate(gcols)])
    keys = with_content_key_bin(base, "content") \
        .select(*gcols, "key").coalesce(1)  # one batch: max uniques
    params = _json.dumps({"ndv": 64, "fpp": 0.01})
    filters = _build_grouped_block_jvm(
        keys, gcols, "key", 64, 0.01, params,
        _result_schema(keys, gcols))
    filters.cache()
    # none merged: one filter per DISTINCT group tuple (all columns
    # derive from id mod 101, so 101 groups)
    n_groups = keys.select(*gcols).distinct().count()
    assert filters.count() == n_groups == 101
    found = probe_with_filters(keys, filters, gcols) \
        .where("maybe_seen").count()
    assert found == n
    filters.unpersist()


def test_grouped_probe_content_cache_skips_recollect(spark,
                                                     monkeypatch):
    """Round-6 (verdict task 4): a repeat grouped probe of an
    UNCHANGED cached filters frame must reuse the recorded broadcast —
    no second blob collect (pinned by poisoning the collect helpers) —
    while a frame with different content must miss the memo and
    produce its own answers."""
    import libfilter_spark.spark.probe as P

    P._GROUPED_PROBE_CACHE.clear()
    build = spark.range(2_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    build_keys = with_content_key_bin(build, "content") \
        .select("g", "key")
    filters = build_filters(build_keys, ["g"], ndv=1_000, fpp=0.01)
    filters.cache().count()
    probe = spark.range(3_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    probe_keys = with_content_key_bin(probe, "content") \
        .select("g", "key", "content")
    first = {(r["g"], r["content"]): r["maybe_seen"]
             for r in probe_with_filters(probe_keys, filters,
                                         ["g"]).collect()}

    def poisoned(*a, **kw):
        raise AssertionError("repeat probe re-collected the blobs")
    monkeypatch.setattr(P, "collect_filters", poisoned)
    monkeypatch.setattr(P, "_collect_filters_auto", poisoned)
    second = {(r["g"], r["content"]): r["maybe_seen"]
              for r in probe_with_filters(probe_keys, filters,
                                          ["g"]).collect()}
    assert second == first
    monkeypatch.undo()

    # different content must MISS the memo (no stale answers): filters
    # built from a shifted key set — its build keys hit, the old ones
    # need not all hit
    build2 = spark.range(10_000, 12_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    bk2 = with_content_key_bin(build2, "content").select("g", "key")
    filters2 = build_filters(bk2, ["g"], ndv=1_000, fpp=0.01)
    filters2.cache().count()
    probe2 = spark.range(10_000, 13_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("content"))
    pk2 = with_content_key_bin(probe2, "content") \
        .select("g", "key", "content")
    got2 = {(r["g"], r["content"]): r["maybe_seen"]
            for r in probe_with_filters(pk2, filters2, ["g"]).collect()}
    for i in range(10_000, 12_000):
        assert got2[(str(i % 4), str(i))]  # zero FN on the NEW build
    filters.unpersist()
    filters2.unpersist()


def test_grouped_partials_build_keeps_null_group(spark):
    """Round 6: the vectorized partial-builder segmentation
    (pd.factorize) keeps null group values as a real group — the old
    pandas-groupby loop silently DROPPED them (dropna default), which
    disagreed with both Spark groupBy semantics and the JVM engine.
    Partial merging must survive null group columns; the PROBE keeps
    the repo's SQL semantics — null never equals null, so null-group
    rows stay non-members (test_grouped_probe_int_group_with_nulls)."""
    base = spark.range(6_000).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 3).cast("string")).alias("g"),
        F.col("id").cast("string").alias("content"))
    keys = with_content_key_bin(base, "content").select("g", "key")
    filters = build_filters(keys, ["g"], ndv=4_000, fpp=0.01,
                            strategy="partials")
    rows = {r["g"]: r["n_keys"] for r in filters.collect()}
    assert None in rows and len(rows) == 3
    assert rows[None] == 2_000
    probed = probe_with_filters(keys, filters, ["g"])
    n_true = probed.where("maybe_seen").count()
    assert n_true == 4_000  # zero FN on non-null groups; null rows False


def test_truncated_live_tcf_published_state_falls_back():
    """The tcf_set assembled kind: a truncated/garbage published file
    must be rejected by the attacher (from_raw exact-size check), the
    worker republishes correct state, and a clean published image
    attaches with answers identical to private assembly."""
    import os
    import uuid

    import numpy as np
    import pytest as _pytest

    if not os.path.isdir("/dev/shm"):
        _pytest.skip("no /dev/shm")
    import libfilter_spark.spark.probe as P
    from libfilter_spark.filters import TaffyCuckooFilter
    from libfilter_spark.kernels.keys import shard_of_keys, splitmix64

    keys = splitmix64(20_000, seed=13)
    absent = splitmix64(40_000, seed=13)[20_000:]

    class FakeBC:
        def __init__(self, token, fmap):
            self.value = (token, fmap)

    n_sh = 4
    shards = shard_of_keys(keys, n_sh, binary=False)
    blobs = {}
    for s in range(n_sh):
        f = TaffyCuckooFilter.create(8_000)
        f.add_hashes(keys[shards == s])
        blobs[s] = f.serialize()
    ref = P._LiveTcfForestProbe.assemble(n_sh, blobs)
    token = uuid.uuid4().hex
    meta = {"token": token, "kind": "tcf_set", "n_shards": n_sh}
    path = P._asm_path(token, "tcf_set")
    try:
        np.zeros(9, dtype=np.uint8).tofile(path)  # truncated garbage
        assert P._attach_assembled(meta) is None
        P._FILTER_CACHE.clear()
        got = P._materialize(
            FakeBC(token, {(): ("tcf_set", (n_sh, blobs))}), meta)[()]
        assert got.find(keys, binary=False).all()
        assert np.array_equal(got.find(absent, binary=False),
                              ref.find(absent, binary=False))
        # republished correct image now attaches (fresh worker path)
        P._FILTER_CACHE.clear()
        att = P._attach_assembled(meta)
        assert att is not None
        assert np.array_equal(att.find(absent, binary=False),
                              ref.find(absent, binary=False))
    finally:
        P._FILTER_CACHE.clear()
        for pth in (path, path + ".lock"):
            try:
                os.unlink(pth)
            except OSError:
                pass
