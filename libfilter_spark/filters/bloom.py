"""Classic Bloom filter — k independent bit positions over one m-bit
array (north-star family; the reference implements only the blocked
variant, so this follows the textbook construction with the same
batch-kernel + OR-merge contract as the block family).

Position derivation uses double hashing (Kirsch-Mitzenmacher):
position_i = (h1 + i*h2) mod m with h1 = high 32 bits, h2 = low 32
bits | 1 — the standard public technique, preserving the reference's
'caller supplies one pseudorandom u64' contract.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"BLM1"


def bloom_bits_needed(ndv: float, fpp: float) -> int:
    """m = -n ln p / (ln 2)^2, rounded up to a multiple of 64."""
    if ndv <= 0:
        return 64
    m = int(math.ceil(-ndv * math.log(fpp) / (math.log(2) ** 2)))
    return (m + 63) // 64 * 64


def bloom_optimal_k(ndv: float, m_bits: int) -> int:
    if ndv <= 0:
        return 1
    return max(1, round(m_bits / ndv * math.log(2)))


class BloomFilter:
    __slots__ = ("k", "bits")

    FAMILY = "bloom"

    def __init__(self, k: int, bits: np.ndarray):
        self.k = k
        self.bits = bits  # uint64 words

    @classmethod
    def create_with_ndv_fpp(cls, ndv: float, fpp: float) -> "BloomFilter":
        m = bloom_bits_needed(ndv, fpp)
        return cls(bloom_optimal_k(ndv, m),
                   np.zeros(m // 64, dtype=np.uint64))

    create = create_with_ndv_fpp

    @classmethod
    def create_with_bytes(cls, bytes_: int, k: int = 6) -> "BloomFilter":
        words = max(1, int(bytes_) // 8)
        return cls(k, np.zeros(words, dtype=np.uint64))

    @property
    def m_bits(self) -> int:
        return self.bits.size * 64

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        h1 = h >> np.uint64(32)
        h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) \
            % np.uint64(self.m_bits)                    # (n, k)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        words = (pos >> np.uint64(6)).astype(np.int64)
        masks = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, words, masks)

    def add_hash(self, hash_: int) -> None:
        self.add_hashes(np.array([hash_], dtype=np.uint64))

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        words = (pos >> np.uint64(6)).astype(np.int64)
        masks = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[words] & masks) != 0).all(axis=1)

    def find_hash(self, hash_: int) -> bool:
        return bool(self.find_hashes(np.array([hash_], dtype=np.uint64))[0])

    def union(self, other: "BloomFilter") -> "BloomFilter":
        if self.k != other.k or self.bits.shape != other.bits.shape:
            raise ValueError("bloom union requires equal (k, m)")
        return BloomFilter(self.k, np.bitwise_or(self.bits, other.bits))

    def union_inplace(self, other: "BloomFilter") -> None:
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def intersection(self, other: "BloomFilter") -> "BloomFilter":
        if self.k != other.k or self.bits.shape != other.bits.shape:
            raise ValueError("bloom intersection requires equal (k, m)")
        return BloomFilter(self.k, np.bitwise_and(self.bits, other.bits))

    @staticmethod
    def fpp_model(ndv: float, m_bits: int, k: int) -> float:
        return (1 - math.exp(-k * ndv / m_bits)) ** k

    def serialize(self) -> bytes:
        return _MAGIC + struct.pack("<I", self.k) \
            + self.bits.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "BloomFilter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a bloom filter blob")
        (k,) = struct.unpack_from("<I", blob, 4)
        bits = np.frombuffer(blob, dtype="<u8", offset=8) \
            .astype(np.uint64).copy()
        return cls(k, bits)

    def size_in_bytes(self) -> int:
        return self.bits.size * 8

    def clone(self) -> "BloomFilter":
        return BloomFilter(self.k, self.bits.copy())

    def __eq__(self, other) -> bool:
        return isinstance(other, BloomFilter) and self.k == other.k \
            and np.array_equal(self.bits, other.bits)

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())

    def __iadd__(self, hash_: int) -> "BloomFilter":
        self.add_hash(hash_)
        return self

    def __contains__(self, hash_: int) -> bool:
        return self.find_hash(hash_)
