"""Java-interop entry points: 32-bit AddHash32/FindHash32 rehash
contracts (java/.../BlockFilter.java:236-260,
TaffyCuckooFilter.java:241-253, TaffyBlockFilter.java:121-134) and the
int32[] payload constructor (c/lib/block.c:47-53; cross-language
JavaSerDe test at cpp/extras/test/block.cpp:263-306).

The expected values are computed here by an independent pure-Python
emulation of Java's operator semantics (sign-extending int→long
promotion, wrapping long multiply, >>> logical shift), so kernel and
test cannot share a bug.
"""

import numpy as np
import pytest

from libfilter_spark.filters import (BlockFilter, TaffyBlockFilter,
                                     TaffyCuckooFilter)
from libfilter_spark.kernels import block as K

M64 = (1 << 64) - 1
EDGE = [0, 1, -1, 2, -2, 0x7FFFFFFF, -0x80000000, 0x12345678,
        -0x12345678, 0x0CA11AB1E, -559038737]  # incl. out-of-int32 wrap


def java_int(x: int) -> int:
    """Wrap to int32 two's complement, returned as signed Python int."""
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


def java_block_rehash(h: int) -> int:
    """hash64 = (((REHASH_32 * (long) h) >>> 32) << 32) | (long) h."""
    h = java_int(h)
    sext = h & M64                      # Java long two's complement
    prod = (0xD1012A3A7A1F4A8A * sext) & M64
    return (((prod >> 32) << 32) | (h & M64)) & M64


def java_tcf_rehash(k: int) -> int:
    """l = ((long) k) << 32; l |= (k * 0x05c2c3e0ffb449c7L) >>> 32."""
    k = java_int(k)
    l = ((k & M64) << 32) & M64
    prod = ((k & M64) * 0x05C2C3E0FFB449C7) & M64
    return l | (prod >> 32)


def test_block_rehash_matches_java_semantics():
    got = K.rehash_32(np.array([java_int(x) for x in EDGE],
                               dtype=np.int32))
    for x, g in zip(EDGE, got):
        assert int(g) == java_block_rehash(x), x
    # the documented Java quirk: negative inputs sign-extend through
    # the final OR, forcing the upper 32 bits to all-ones
    assert java_block_rehash(-1) >> 32 == 0xFFFFFFFF


def test_tcf_rehash_matches_java_semantics():
    for x in EDGE:
        assert TaffyCuckooFilter._rehash_32(java_int(x)) == \
            java_tcf_rehash(x), x


@pytest.mark.parametrize("family", ["block", "taffy_block"])
def test_32bit_add_find_roundtrip(family):
    f = BlockFilter.create_with_ndv_fpp(5000, 0.01) \
        if family == "block" else TaffyBlockFilter.create(500, 0.01)
    keys = np.arange(-2500, 2500, dtype=np.int32)
    f.add_hashes_32(keys)
    assert f.find_hashes_32(keys).all()
    for k in EDGE:
        f.add_hash_32(java_int(k))
        assert f.find_hash_32(java_int(k))
    # contract: FindHash64 of the rehashed value sees 32-bit adds
    assert f.find_hashes(K.rehash_32(keys)).all()


def test_tcf_32bit_add_find_roundtrip():
    f = TaffyCuckooFilter.create_with_bytes(1 << 12)
    keys = np.arange(-1500, 1500, dtype=np.int32)
    f.add_hashes_32(keys)
    assert f.find_hashes_32(keys).all()
    for k in EDGE:
        f.add_hash_32(java_int(k))
        assert f.find_hash_32(java_int(k))
    # scalar and batch rehash agree
    got = [TaffyCuckooFilter._rehash_32(int(k)) for k in keys[:64]]
    sext = keys[:64].astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        low = (np.uint64(0x05C2C3E0FFB449C7) * sext) >> np.uint64(32)
    batch = (keys[:64].view(np.uint32).astype(np.uint64)
             << np.uint64(32)) | low
    assert got == [int(v) for v in batch]


def test_deserialize_from_ints_equals_bytes():
    from libfilter_spark.kernels.keys import splitmix64
    f = BlockFilter.create_with_ndv_fpp(2000, 0.01)
    f.add_hashes(splitmix64(2000, seed=9))
    ints = f.to_ints()
    assert ints.dtype == np.int32
    g = BlockFilter.deserialize_from_ints(ints)
    assert g == f
    # the same image through the bytes path (JavaSerDe equivalence)
    h = BlockFilter.deserialize(f.serialize())
    assert h == g
    # int payload round-trips losslessly, including negative ints
    assert np.array_equal(g.to_ints(), ints)
    assert (ints < 0).any()  # two's-complement words exercised


def test_deserialize_from_ints_validates():
    with pytest.raises(ValueError):
        K.deserialize_from_ints(np.zeros(7, dtype=np.int32))
    with pytest.raises(ValueError):
        K.deserialize_from_ints(np.zeros(0, dtype=np.int32))
