"""Count-Min frequency sketch (Cormode & Muthukrishnan 2005).

State = d×w int64 counter matrix; update is a scatter-add, merge is an
element-wise add — exact integer arithmetic, so merged states are
byte-identical under any merge order. Guarantees: estimate ≥ true
count; estimate ≤ true + ε·N with probability 1-δ, ε = e/w, δ = e^-d.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"CMS1"

# fixed row-hash seeds (splitmix64 stream of a fixed constant)
_ROW_SEEDS = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
              0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F,
              0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    z = x ^ np.uint64(seed)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class CountMinSketch:
    __slots__ = ("depth", "width", "table", "total")

    def __init__(self, depth: int = 5, width: int = 2048,
                 table: np.ndarray | None = None, total: int = 0):
        if depth > len(_ROW_SEEDS):
            raise ValueError(f"depth > {len(_ROW_SEEDS)} not supported")
        self.depth = depth
        self.width = width
        self.table = table if table is not None \
            else np.zeros((depth, width), dtype=np.int64)
        self.total = total

    @classmethod
    def create(cls, depth: int = 5, width: int = 2048) -> "CountMinSketch":
        return cls(depth, width)

    @classmethod
    def create_for_error(cls, epsilon: float = 0.001,
                         delta: float = 0.01) -> "CountMinSketch":
        width = int(math.ceil(math.e / epsilon))
        depth = int(math.ceil(math.log(1 / delta)))
        return cls(max(1, depth), max(16, width))

    def _rows(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64, copy=False)
        return np.stack([(_mix(k, _ROW_SEEDS[j]) % np.uint64(self.width))
                         .astype(np.int64) for j in range(self.depth)])

    def update_batch(self, keys: np.ndarray,
                     counts: np.ndarray | None = None) -> None:
        if len(keys) == 0:
            return
        idx = self._rows(keys)
        if counts is None:
            counts = np.ones(len(keys), dtype=np.int64)
        else:
            counts = counts.astype(np.int64, copy=False)
        for j in range(self.depth):
            np.add.at(self.table[j], idx[j], counts)
        self.total += int(counts.sum())

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Point-query batch → int64 estimates (min over rows)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._rows(keys)
        ests = np.stack([self.table[j][idx[j]] for j in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("CMS merge requires equal dimensions")
        return CountMinSketch(self.depth, self.width,
                              self.table + other.table,
                              self.total + other.total)

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    def serialize(self) -> bytes:
        head = _MAGIC + struct.pack("<IIq", self.depth, self.width,
                                    self.total)
        return head + self.table.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "CountMinSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a CMS blob")
        d, w, total = struct.unpack_from("<IIq", blob, 4)
        off = 4 + struct.calcsize("<IIq")
        table = np.frombuffer(blob, dtype="<i8", count=d * w, offset=off) \
            .astype(np.int64).reshape(d, w)
        return cls(d, w, table, total)

    def __eq__(self, other) -> bool:
        return (isinstance(other, CountMinSketch)
                and self.depth == other.depth and self.width == other.width
                and self.total == other.total
                and np.array_equal(self.table, other.table))

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())
