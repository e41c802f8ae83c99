"""TaffyCuckoo property tests mirroring the reference suite
(cpp/extras/test/block.cpp UnionDoes/UnionFpp/InsertPersists), plus
recorded bit-exact parity anchors from the compiled C reference."""

import numpy as np
import pytest

from libfilter_spark.filters.taffy_cuckoo import (FrozenTaffyCuckooFilter,
                                                  TaffyCuckooFilter)
from libfilter_spark.kernels.keys import splitmix64


def _state_fnv(f):
    h = 1469598103934665603
    for s in range(2):
        data = f.sides[s].data
        for b in range(data.shape[0]):
            for j in range(4):
                v = int(data[b, j])
                h = ((h ^ v) * 1099511628211) % (1 << 64)
                h = ((h ^ (b & 0xFF)) * 1099511628211) % (1 << 64)
    return h


def test_c_reference_parity_20k_build():
    """Bit-exact vs the compiled C reference (taffy-cuckoo.c built with
    gcc -O2): 20k splitmix64(seed=0) keys into create_with_bytes(64).
    Recorded C outputs: log=12, occupied=22283, state fnv below, 1292
    false positives over 1e6 absent probes."""
    ks = splitmix64(20_000, seed=0)
    f = TaffyCuckooFilter.create_with_bytes(64)
    f.add_hashes_exact(ks)  # per-key C insert order for bit parity
    assert f.log_side_size == 12
    assert f.occupied == 22283
    assert _state_fnv(f) == 649494347863591457
    assert f.find_hashes(ks).all()
    absent = splitmix64(1_020_000, seed=0)[20_000:]
    assert int(f.find_hashes(absent).sum()) == 1292


def test_c_reference_parity_union():
    """Union of unequal-size filters: C recorded log=9, occupied=3813,
    state fnv below, all 3700 keys found."""
    a = TaffyCuckooFilter.create_with_bytes(64)
    b = TaffyCuckooFilter.create_with_bytes(1024)
    ks = splitmix64(3_700, seed=0)
    a.add_hashes_exact(ks[:3000])
    b.add_hashes_exact(ks[3000:])
    u = a.union(b)
    assert u.log_side_size == 9
    assert u.occupied == 3813
    assert _state_fnv(u) == 12193269239247936210
    assert u.find_hashes(ks).all()


def test_insert_persists_across_upsizes():
    ks = splitmix64(16_000, seed=30)
    f = TaffyCuckooFilter.create_with_bytes(1)
    start_log = f.log_side_size
    for stop in (10, 100, 1_000, 4_000, 16_000):
        f.add_hashes(ks[:stop][-(stop - (stop // 2)):])
        f.add_hashes(ks[:stop])
        assert f.find_hashes(ks[:stop]).all()
    assert f.log_side_size > start_log


def test_start_empty():
    f = TaffyCuckooFilter.create_with_bytes(1 << 14)
    assert not f.find_hashes(splitmix64(100_000, seed=31)).any()


def test_union_does_and_fpp_exact():
    """UnionDoes + UnionFpp (block.cpp:48-106): union finds every key
    of both sides AND introduces no new false positives —
    z.find == x.find | y.find exactly."""
    missing = splitmix64(1 << 16, seed=32)
    rng_keys = splitmix64(4_096, seed=33)
    for xndv in (1, 30, 200, 1000):
        for yndv in (1, 77, 512):
            x = TaffyCuckooFilter.create_with_bytes(0)
            y = TaffyCuckooFilter.create_with_bytes(0)
            xk, yk = rng_keys[:xndv], rng_keys[xndv:xndv + yndv]
            x.add_hashes(xk)
            y.add_hashes(yk)
            z = x.union(y)
            assert z.find_hashes(xk).all()
            assert z.find_hashes(yk).all()
            expect = x.find_hashes(missing) | y.find_hashes(missing)
            assert np.array_equal(z.find_hashes(missing), expect), \
                (xndv, yndv)


def test_merge_orders_probe_equivalent():
    """North-rule associativity for TCF: any merge order answers probes
    identically on present keys; fpp stays in family bounds."""
    keys = splitmix64(30_000, seed=34)
    parts = np.array_split(keys, 8)
    filters = []
    for p in parts:
        f = TaffyCuckooFilter.create_with_bytes(0)
        f.add_hashes(p)
        filters.append(f)
    rng = np.random.default_rng(35)
    absent = splitmix64(200_000, seed=36)[30_000:]
    for _ in range(3):
        order = rng.permutation(8)
        acc = filters[order[0]]
        for i in order[1:]:
            acc = acc.union(filters[i])
        assert acc.find_hashes(keys).all()
        assert acc.find_hashes(absent).mean() < 0.02


def test_scalar_vector_find_agree():
    """'Buddy' analogue (block.cpp:199-215): the vectorized probe must
    equal the scalar reference probe."""
    ks = splitmix64(5_000, seed=37)
    f = TaffyCuckooFilter.create_with_bytes(64)
    f.add_hashes(ks)
    probes = np.concatenate([ks[:500], splitmix64(2_000, seed=38)])
    vec = f.find_hashes(probes)
    for i, k in enumerate(probes):
        assert vec[i] == f.find_hash(int(k)), i


def test_freeze_preserves_membership():
    """block.cpp:237-249 analogue."""
    ks = splitmix64(50_000, seed=39)
    f = TaffyCuckooFilter.create_with_bytes(64)
    f.add_hashes(ks)
    fr = f.freeze()
    assert fr.find_hashes(ks).all()
    assert fr.size_in_bytes() < f.size_in_bytes()
    absent = splitmix64(300_000, seed=40)[50_000:]
    # frozen drops tails → higher fpp, still bounded (~2^-10 * 4 slots
    # * 2 sides plus fp==0 quirk)
    assert fr.find_hashes(absent).mean() < 0.03


def test_serde_roundtrip():
    ks = splitmix64(10_000, seed=41)
    f = TaffyCuckooFilter.create_with_bytes(64)
    f.add_hashes(ks)
    # force a stash entry scenario too: serialize whatever state exists
    g = TaffyCuckooFilter.deserialize(f.serialize())
    assert g == f
    assert g.serialize() == f.serialize()
    assert g.find_hashes(ks).all()
    fr = f.freeze()
    fr2 = FrozenTaffyCuckooFilter.deserialize(fr.serialize())
    assert all(np.array_equal(a, b) for a, b in zip(fr.data, fr2.data))
    probes = splitmix64(20_000, seed=42)
    assert np.array_equal(fr.find_hashes(probes), fr2.find_hashes(probes))


def test_fpp_within_published_bound():
    """BASELINE.md §A: TCF measured fpp ≈ 0.00226 at 100M scale; the
    structural bound is ~2^-F+O(1) (taffy.tex:837-844). Assert the
    measured fpp at 50k keys stays under 1%."""
    ks = splitmix64(50_000, seed=43)
    f = TaffyCuckooFilter.create_with_bytes(1)
    f.add_hashes(ks)
    absent = splitmix64(1_050_000, seed=43)[50_000:]
    assert f.find_hashes(absent).mean() < 0.01


def test_deserialize_garbage_raises():
    with pytest.raises(ValueError):
        TaffyCuckooFilter.deserialize(b"nope")
    with pytest.raises(ValueError):
        FrozenTaffyCuckooFilter.deserialize(b"XXXXgarbage")


def test_absorb_merges_unequal_sizes_zero_fn():
    """absorb (the distributed-merge union): grows the accumulator and
    ingests donors through the batch path. Unequal sizes exercise all
    three union_help tail cases (same-width, tail-covers-gap, missing-
    bit enumeration). Zero FN over the union of key sets; stash stays
    within the growth trigger; FPP stays structural."""
    from libfilter_spark.kernels.keys import splitmix64

    a_keys = splitmix64(200_000, seed=21)
    b_keys = splitmix64(5_000, seed=22)
    c_keys = splitmix64(60_000, seed=23)
    a = TaffyCuckooFilter.create(200_000); a.add_hashes(a_keys)
    b = TaffyCuckooFilter.create(5_000); b.add_hashes(b_keys)
    c = TaffyCuckooFilter.create(60_000); c.add_hashes(c_keys)
    a.absorb(b)
    a.absorb(c)
    every = np.concatenate([a_keys, b_keys, c_keys])
    assert a.find_hashes(every).all()
    absent = splitmix64(500_000, seed=24)
    assert a.find_hashes(absent).mean() < 0.01
    assert len(a.sides[0].stash) + len(a.sides[1].stash) <= 8
    # serde round-trip of the absorbed filter
    g = TaffyCuckooFilter.deserialize(a.serialize())
    assert g.find_hashes(every).all()
