"""Path/permutation algebra invariants, mirroring the reference's
dedicated kernel tests (c/extras/test/paths.c:13-214) plus
hypothesis-driven property tests for feistel and tail encoding —
the places where off-by-one bugs raise fpp silently (SURVEY.md §7.3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from libfilter_spark.filters.minimal_taffy import (HEAD, LOG_LEVELS,
                                                   from_path_no_tail, to_path)
from libfilter_spark.kernels.feistel import (feistel_backward,
                                             feistel_backward_batch,
                                             feistel_forward,
                                             feistel_forward_batch,
                                             is_prefix_of, is_prefix_of_batch)

ENT = ((1, 0), (1, 0))  # paths.c:15 entropy {1,0,1,0}
LOW = 16
XBASE = 0x123456789ABCDEF0


def test_from_to_roundtrip():
    """paths.c from_to (13-39): to_path then from_path recovers the
    consumed high bits of the key."""
    many = 0
    for i in range(64):
        x = (XBASE << i) & ((1 << 64) - 1)
        for cursor in range(32):
            for is_short in (False, True):
                p = to_path(x, ENT, cursor, LOW, is_short)
                if p[4] == 0:
                    continue
                many += 1
                level, bucket, long_fp, fp, tail = p
                big = 1 if level < cursor else 0
                y = from_path_no_tail(p, ENT, LOW + big,
                                      HEAD - (1 - long_fp))
                shift = 64 - (LOG_LEVELS + LOW + big + HEAD - (1 - long_fp))
                assert x >> shift == y >> shift, (i, cursor, is_short)
    assert many >= 64 * 32


def test_to_from_to_identity():
    """paths.c to_from_to (41-69): re-deriving the path from the
    recovered key reproduces the path."""
    for i in range(64):
        x = (XBASE << i) & ((1 << 64) - 1)
        for cursor in range(0, 32, 3):
            for is_short in (False, True):
                p = to_path(x, ENT, cursor, LOW, is_short)
                if p[4] == 0:
                    continue
                level, bucket, long_fp, fp, tail = p
                big = 1 if level < cursor else 0
                y = from_path_no_tail(p, ENT, LOW + big,
                                      HEAD - (1 - long_fp))
                q = to_path(y, ENT, cursor, LOW, is_short)
                assert (q[0], q[1], q[2], q[3]) == (level, bucket,
                                                    long_fp, fp)


@given(st.integers(0, 2**64 - 1), st.integers(8, 40))
@settings(max_examples=300, deadline=None)
def test_feistel_invertible(x, w):
    keys = ((0xDEADBEEF12345678, 0xCAFEBABE87654321),
            (0x0123456789ABCDEF, 0xFEDCBA9876543210))
    v = x & ((1 << w) - 1)
    assert feistel_backward(keys, w, feistel_forward(keys, w, v)) == v
    assert feistel_forward(keys, w, feistel_backward(keys, w, v)) == v


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=64),
       st.integers(8, 40))
@settings(max_examples=100, deadline=None)
def test_feistel_batch_equals_scalar(xs, w):
    keys = ((0xA5A5A5A5A5A5A5A5, 0x5A5A5A5A5A5A5A5A),
            (0x1111111111111111, 0x2222222222222222))
    vs = np.array([x & ((1 << w) - 1) for x in xs], dtype=np.uint64)
    fwd = feistel_forward_batch(keys, w, vs)
    bwd = feistel_backward_batch(keys, w, fwd)
    for i, v in enumerate(vs):
        assert int(fwd[i]) == feistel_forward(keys, w, int(v))
        assert int(bwd[i]) == int(v)


def test_is_prefix_of_reference_table():
    """The static-assert table from util.h:184-203."""
    assert is_prefix_of(2, 1)
    assert is_prefix_of(2, 3)
    assert is_prefix_of(4, 1)
    assert not is_prefix_of(1, 3)
    assert not is_prefix_of(1, 2)
    assert not is_prefix_of(3, 1)
    assert not is_prefix_of(3, 2)
    assert not is_prefix_of(5, 2)
    assert not is_prefix_of(6, 2)
    assert not is_prefix_of(7, 2)
    assert not is_prefix_of(2, 5)
    assert not is_prefix_of(2, 6)
    assert not is_prefix_of(2, 7)
    assert is_prefix_of(16384, 1)


@given(st.integers(1, 63), st.integers(1, 63))
@settings(max_examples=500, deadline=None)
def test_is_prefix_batch_equals_scalar(x, y):
    got = is_prefix_of_batch(np.array([x]), np.array([y]))[0]
    assert bool(got) == is_prefix_of(x, y)


@given(st.integers(0, 31), st.integers(0, 5))
@settings(max_examples=200, deadline=None)
def test_prefix_semantics_vs_sequences(raw, cut):
    """Semantic check against the documented encoding (util.h:155-167):
    encode a 5-bit sequence and a truncation of it; the truncation's
    encoding must be a prefix of the full encoding."""
    full = raw * 2 + 1  # 5 data bits + marker
    # truncate to (5-cut) leading bits: shift out low bits, re-mark
    trunc_bits = raw >> cut
    trunc = (trunc_bits * 2 + 1) << cut
    assert is_prefix_of(trunc, full)
    if cut > 0 and (raw & ((1 << cut) - 1)) != 0:
        # the full sequence is NOT a prefix of its strict truncation
        assert not is_prefix_of(full, trunc)
