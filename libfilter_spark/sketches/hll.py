"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
standard small/large-range corrections).

State = 2^p uint8 registers; update is a scatter-max, merge is an
element-wise max — an order-free lattice, so merged states (and hence
estimates) are byte-identical under any merge order. Cross-checked in
tests against exact counts and Spark's approx_count_distinct.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"HLL1"


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _nlz64(x: np.ndarray) -> np.ndarray:
    """Vectorized leading-zero count via bit-smear + popcount."""
    for s in (1, 2, 4, 8, 16, 32):
        x = x | (x >> np.uint64(s))
    return np.uint64(64) - _popcount64(x)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog:
    __slots__ = ("p", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.registers = registers if registers is not None \
            else np.zeros(1 << p, dtype=np.uint8)

    @classmethod
    def create(cls, p: int = 14) -> "HyperLogLog":
        return cls(p)

    def update_batch(self, keys: np.ndarray) -> None:
        """keys: pseudorandom uint64 (same contract as the filters)."""
        if len(keys) == 0:
            return
        k = keys.astype(np.uint64, copy=False)
        idx = (k >> np.uint64(64 - self.p)).astype(np.int64)
        w = k << np.uint64(self.p)  # remaining 64-p bits, high-aligned
        rho = np.where(w == 0, 64 - self.p + 1,
                       _nlz64(w).astype(np.int64) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("HLL merge requires equal precision")
        return HyperLogLog(self.p, np.maximum(self.registers,
                                              other.registers))

    def merge_inplace(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = 1 << self.p
        regs = self.registers.astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * math.log(m / zeros)  # linear counting
        if e > (1 / 30) * 2**64:
            return -(2**64) * math.log(1 - e / 2**64)
        return float(e)

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(1 << self.p)

    def serialize(self) -> bytes:
        return _MAGIC + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLog":
        if blob[:4] != _MAGIC:
            raise ValueError("not an HLL blob")
        (p,) = struct.unpack_from("<B", blob, 4)
        regs = np.frombuffer(blob, dtype=np.uint8, count=1 << p,
                             offset=5).copy()
        return cls(p, regs)

    def __eq__(self, other) -> bool:
        return isinstance(other, HyperLogLog) and self.p == other.p and \
            np.array_equal(self.registers, other.registers)

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())
