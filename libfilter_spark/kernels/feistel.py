"""Feistel permutation, PCG32, and tail-encoding kernels for the
taffy cuckoo families.

Behavior-equivalent to the reference's hashing machinery
(``/root/reference/c/include/filter/util.h:15-180``): a 3-round
asymmetric Feistel network whose round function is strong
multiply-shift — an *invertible* hash, which is what lets the filter
store no keys and still re-derive them losslessly on growth.

Both scalar (python-int) and batch (numpy uint64) variants are
provided: inserts walk a sequential kick loop (scalar), probes and
path precomputation are vectorized.
"""

from __future__ import annotations

import numpy as np

M64 = (1 << 64) - 1


# --- scalar (python int) ---------------------------------------------------

def _subhash_s(s: int, t: int, w: int, x: int, k0: int, k1: int) -> int:
    """Strong multiply-shift on the w low bits of x → high s+t-w bits
    (util.h:23-28)."""
    mw = (1 << w) - 1
    mst = (1 << (s + t)) - 1
    v = ((x & mw) * (k0 & mst) + (k1 & mst)) & M64
    out_w = s + t - w
    return (v >> (s + t - out_w)) & ((1 << out_w) - 1)


def feistel_forward(keys: tuple, w: int, x: int) -> int:
    """util.h:47-71. keys = ((k00,k01),(k10,k11))."""
    s = w >> 1
    t = w - s
    l0 = x & ((1 << s) - 1)
    r0 = (x >> s) & ((1 << t) - 1)
    l1 = r0
    r1 = l0 ^ _subhash_s(s, t, t, r0, *keys[0])
    l2 = r1
    r2 = l1 ^ _subhash_s(s, t, s, r1, *keys[1])
    return ((r2 << s) | l2) & M64


def feistel_backward(keys: tuple, w: int, x: int) -> int:
    """util.h:73-89."""
    s = w >> 1
    t = w - s
    l2 = x & ((1 << s) - 1)
    r2 = (x >> s) & ((1 << t) - 1)
    r1 = l2
    l1 = r2 ^ _subhash_s(s, t, s, r1, *keys[1])
    r0 = l1
    l0 = r1 ^ _subhash_s(s, t, t, r0, *keys[0])
    return ((r0 << s) | l0) & M64


# --- batch (numpy uint64) --------------------------------------------------

def _subhash_v(s: int, t: int, w: int, x: np.ndarray,
               k0: int, k1: int) -> np.ndarray:
    mw = np.uint64((1 << w) - 1)
    mst = (1 << (s + t)) - 1
    v = (x & mw) * np.uint64(k0 & mst) + np.uint64(k1 & mst)
    out_w = s + t - w
    return (v >> np.uint64(s + t - out_w)) & np.uint64((1 << out_w) - 1)


def feistel_forward_batch(keys: tuple, w: int, x: np.ndarray) -> np.ndarray:
    s = w >> 1
    t = w - s
    l0 = x & np.uint64((1 << s) - 1)
    r0 = (x >> np.uint64(s)) & np.uint64((1 << t) - 1)
    l1 = r0
    r1 = l0 ^ _subhash_v(s, t, t, r0, *keys[0])
    l2 = r1
    r2 = l1 ^ _subhash_v(s, t, s, r1, *keys[1])
    return (r2 << np.uint64(s)) | l2


def feistel_forward_batch_lean(keys: tuple, w: int,
                               x: np.ndarray) -> np.ndarray:
    """:func:`feistel_forward_batch` for callers that GUARANTEE ``x``
    has exactly ``w`` significant bits (e.g. ``h >> (64 - w)``): the
    half-word input masks become no-ops by width and are dropped, and
    every round op runs in place — about half the memory traffic of
    the generic kernel.  Identical output to the generic kernel on
    in-contract input (pinned by tests)."""
    u = np.uint64
    s = w >> 1
    t = w - s
    mst = (1 << (s + t)) - 1
    l0 = x & u((1 << s) - 1)
    r0 = x >> u(s)                       # t bits — mask-free by width
    r1 = r0 * u(keys[0][0] & mst)
    r1 += u(keys[0][1] & mst)
    r1 >>= u(t)
    r1 &= u((1 << s) - 1)
    r1 ^= l0                             # s bits
    out = r1 * u(keys[1][0] & mst)
    out += u(keys[1][1] & mst)
    out >>= u(s)
    out &= u((1 << t) - 1)
    out ^= r0                            # r2 = l1 ^ sub, l1 = r0
    out <<= u(s)
    out |= r1                            # (r2 << s) | l2, l2 = r1
    return out


def feistel_backward_batch(keys: tuple, w: int, x: np.ndarray) -> np.ndarray:
    s = w >> 1
    t = w - s
    l2 = x & np.uint64((1 << s) - 1)
    r2 = (x >> np.uint64(s)) & np.uint64((1 << t) - 1)
    r1 = l2
    l1 = r2 ^ _subhash_v(s, t, s, r1, *keys[1])
    r0 = l1
    l0 = r1 ^ _subhash_v(s, t, t, r0, *keys[0])
    return (r0 << np.uint64(s)) | l0


def feistel_backward_batch_lean(keys: tuple, w: int,
                                x: np.ndarray) -> np.ndarray:
    """:func:`feistel_backward_batch` under the same exactly-``w``-bits
    input contract as the lean forward kernel: defensive masks dropped,
    round ops in place. Identical output on in-contract input."""
    u = np.uint64
    s = w >> 1
    t = w - s
    mst = (1 << (s + t)) - 1
    l2 = x & u((1 << s) - 1)
    r2 = x >> u(s)                       # t bits — mask-free by width
    l1 = l2 * u(keys[1][0] & mst)        # _subhash(s,t,s, r1=l2)
    l1 += u(keys[1][1] & mst)
    l1 >>= u(s)
    l1 &= u((1 << t) - 1)
    l1 ^= r2                             # r0
    l0 = l1 * u(keys[0][0] & mst)        # _subhash(s,t,t, r0=l1)
    l0 += u(keys[0][1] & mst)
    l0 >>= u(t)
    l0 &= u((1 << s) - 1)
    l0 ^= l2                             # l0 = r1 ^ sub, r1 = l2
    return (l1 << u(s)) | l0


# --- PCG32 (util.h:108-153) — deterministic kick-victim selection ----------

class PcgRandom:
    """Exact port of the reference's bit-slicing PCG32 wrapper with its
    fixed seed — keeps cuckoo builds reproducible given insert order
    (util.h:122-130)."""

    __slots__ = ("bit_width", "state", "inc", "current", "remaining_bits")

    def __init__(self, bit_width: int):
        self.bit_width = bit_width
        self.state = 0x13D26DF6F74044B3
        self.inc = 0x0D09B2D3025545A0
        self.current = 0
        self.remaining_bits = 0

    def get(self) -> int:
        bw = self.bit_width
        if self.remaining_bits >= bw:
            result = self.current & ((1 << bw) - 1)
            self.current >>= bw
            self.remaining_bits -= bw
            return result
        oldstate = self.state
        self.state = (oldstate * 6364136223846793005 + (self.inc | 1)) & M64
        xorshifted = (((oldstate >> 18) ^ oldstate) >> 27) & 0xFFFFFFFF
        rot = oldstate >> 59
        self.current = ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) \
            & 0xFFFFFFFF
        self.remaining_bits = 32 - bw
        result = self.current & ((1 << bw) - 1)
        self.current >>= bw
        return result


# --- tail-sequence encoding (util.h:155-180) -------------------------------

def ctz(x: int) -> int:
    return (x & -x).bit_length() - 1


def is_prefix_of(x: int, y: int) -> bool:
    """Is the bit-sequence encoded by x a prefix of that encoded by y?
    Encoding: data bits in the high positions, then a 1 marker, then
    zeros (util.h:155-180)."""
    a = x ^ y
    c = ctz(x)
    h = ctz(y)
    i = 32 if a == 0 else 32 - a.bit_length()
    return (c >= h) and (i >= 31 - c)


# vectorized variant over small tail values (< 256)
_CTZ_TAB = np.array([0] + [ctz(v) for v in range(1, 256)], dtype=np.int32)
_BITLEN_TAB = np.array([v.bit_length() for v in range(256)], dtype=np.int32)


def is_prefix_of_batch(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """x, y: integer arrays (values < 256, x>0, y>0 where evaluated)."""
    xi = x.astype(np.int64)
    yi = y.astype(np.int64)
    a = xi ^ yi
    c = _CTZ_TAB[xi]
    h = _CTZ_TAB[yi]
    i = np.where(a == 0, 32, 32 - _BITLEN_TAB[a])
    return (c >= h) & (i >= 31 - c)
