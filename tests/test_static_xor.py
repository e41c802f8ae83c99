"""Static XOR filter tests: all-keys-found across sizes
(c/extras/test/static.c:21-40 analogue), byte parity with the compiled
C reference, serde, fpp ≈ 2^-8."""

import numpy as np
import pytest

from libfilter_spark.filters import StaticXorFilter
from libfilter_spark.kernels.keys import splitmix64


def _fnv(data: bytes) -> int:
    h = 1469598103934665603
    for b in data:
        h = ((h ^ b) * 1099511628211) % (1 << 64)
    return h


def test_c_reference_parity():
    """Byte-identical to the compiled C reference (static.c + peel.h,
    gcc -O2). Recorded: (n, length, state fnv, fp count / 200k)."""
    anchors = {
        10: (24, 3605442506729909490, 808),
        1234: (1704, 2800991412673596915, 788),
        20000: (24704, 859143737641673909, 819),
    }
    for ncase, n in enumerate([10, 100, 1234, 20000, 100000]):
        if n not in anchors:
            continue
        hs = splitmix64(n, seed=ncase)
        f = StaticXorFilter.construct_exact(hs)
        exp_len, exp_fnv, exp_fp = anchors[n]
        assert f.size_in_bytes() == exp_len
        assert _fnv(f.serialize()[12:]) == exp_fnv
        assert f.find_hashes(hs).all()
        absent = splitmix64(n + 200_000, seed=ncase)[n:]
        assert int(f.find_hashes(absent).sum()) == exp_fp


def test_vectorized_matches_exact_semantics():
    """The round-vectorized construct picks a different (valid) peel
    order than the C stack, so bytes may differ — but size, retry
    schedule, zero-FN, and the edge-constraint system are identical."""
    for seed, n in [(0, 10), (2, 1234), (3, 20000)]:
        hs = splitmix64(n, seed=seed)
        fast = StaticXorFilter.construct(hs)
        exact = StaticXorFilter.construct_exact(hs)
        assert fast.size_in_bytes() == exact.size_in_bytes()
        assert fast.find_hashes(hs).all()
        # every edge constraint satisfied == every key found; absent-key
        # behavior stays a fingerprint check at the same size, so fpp
        # stays ~2^-8 (asserted at scale in test_fpp_close_to_2_pow_minus_8)


def test_all_found_growing_sizes():
    # static.c:25-39: sizes s = 1 + 2s
    s = 10
    while s <= 100_000:
        hs = splitmix64(s, seed=s)
        f = StaticXorFilter.construct(hs)
        assert f.find_hashes(hs).all(), s
        # space ratio sanity (paper: ~1.23 bytes/key at large n)
        assert f.size_in_bytes() <= max(24, 2.1 * s)
        s = 1 + 2 * s


def test_fpp_close_to_2_pow_minus_8():
    hs = splitmix64(50_000, seed=77)
    f = StaticXorFilter.construct(hs)
    absent = splitmix64(550_000, seed=77)[50_000:]
    fpp = f.find_hashes(absent).mean()
    assert abs(fpp - 1 / 256) < 5 * (1 / 256 / len(absent)) ** 0.5 + 1e-3


def test_duplicate_keys_rejected_by_peeling_or_deduped():
    # duplicate hashes create unpeelable 2-cores; construct expects
    # distinct keys — callers dedup (np.unique) as the grouped build does
    hs = np.unique(splitmix64(1_000, seed=78))
    f = StaticXorFilter.construct(hs)
    assert f.find_hashes(hs).all()


def test_serde_roundtrip():
    hs = splitmix64(5_000, seed=79)
    f = StaticXorFilter.construct(hs)
    g = StaticXorFilter.deserialize(f.serialize())
    assert g == f
    assert g.find_hashes(hs).all()


def test_union_undefined():
    a = StaticXorFilter.construct(splitmix64(10, seed=1))
    with pytest.raises(NotImplementedError):
        a.union(a)


def test_empty_build():
    f = StaticXorFilter.construct(np.array([], dtype=np.uint64))
    assert f.size_in_bytes() == 8
