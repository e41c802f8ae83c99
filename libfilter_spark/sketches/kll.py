"""KLL quantile sketch (Karnin, Lang, Liberty 2016) with deterministic
compaction.

State = levels of sorted float64 arrays; items at level i carry weight
2^i. Compaction keeps every other item, with the starting offset driven
by a per-level compaction counter instead of a coin flip — fully
deterministic, so the same merge tree always yields byte-identical
state. Rank error is O(1/k)·n (tests assert ≤ 3·(1.7/k) normalized
rank error at k=200, the sketch's published constant regime).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"
_C = 2.0 / 3.0  # level-capacity decay


class KLLSketch:
    __slots__ = ("k", "levels", "n", "compactions")

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None,
                 n: int = 0, compactions: list[int] | None = None):
        self.k = k
        self.levels = levels if levels is not None \
            else [np.empty(0, dtype=np.float64)]
        self.n = n
        self.compactions = compactions if compactions is not None \
            else [0] * len(self.levels)

    @classmethod
    def create(cls, k: int = 200) -> "KLLSketch":
        return cls(k)

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - level - 1
        return max(2, int(self.k * (_C ** depth)))

    def update_batch(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def _compress(self) -> None:
        while True:
            total = sum(len(lv) for lv in self.levels)
            budget = sum(self._capacity(i) for i in range(len(self.levels)))
            if total <= budget:
                return
            for i in range(len(self.levels)):
                if len(self.levels[i]) > self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                return

    def _compact_level(self, i: int) -> None:
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compactions.append(0)
        lv = np.sort(self.levels[i])
        # an odd leftover item keeps its level so total weight is exact
        if len(lv) % 2 == 1:
            leftover, lv = lv[-1:], lv[:-1]
        else:
            leftover = lv[:0]
        offset = self.compactions[i] & 1  # deterministic alternating offset
        self.compactions[i] += 1
        keep_up = lv[offset::2]  # survivors carry doubled weight upward
        self.levels[i] = leftover.astype(np.float64)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep_up])

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("KLL merge requires equal k")
        depth = max(len(self.levels), len(other.levels))
        levels = []
        comps = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else \
                np.empty(0, dtype=np.float64)
            b = other.levels[i] if i < len(other.levels) else \
                np.empty(0, dtype=np.float64)
            levels.append(np.concatenate([a, b]))
            ca = self.compactions[i] if i < len(self.compactions) else 0
            cb = other.compactions[i] if i < len(other.compactions) else 0
            comps.append(ca + cb)
        out = KLLSketch(self.k, levels, self.n + other.n, comps)
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 1 << i, dtype=np.float64))
        if not vals:
            return (np.empty(0), np.empty(0))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, len(v) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        """Approximate normalized rank of value."""
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        mask = v <= value
        return float(w[mask].sum() / w.sum())

    def serialize(self) -> bytes:
        parts = [_MAGIC, struct.pack("<IqI", self.k, self.n,
                                     len(self.levels))]
        for lv, c in zip(self.levels, self.compactions):
            parts.append(struct.pack("<IQ", c, len(lv)))
            parts.append(np.sort(lv).astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, blob: bytes) -> "KLLSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a KLL blob")
        k, n, nlev = struct.unpack_from("<IqI", blob, 4)
        off = 4 + struct.calcsize("<IqI")
        levels, comps = [], []
        for _ in range(nlev):
            c, ln = struct.unpack_from("<IQ", blob, off)
            off += struct.calcsize("<IQ")
            levels.append(np.frombuffer(blob, dtype="<f8", count=ln,
                                        offset=off).astype(np.float64))
            off += ln * 8
            comps.append(c)
        return cls(k, levels, n, comps)

    def __eq__(self, other) -> bool:
        return (isinstance(other, KLLSketch) and self.k == other.k
                and self.n == other.n
                and len(self.levels) == len(other.levels)
                and all(np.array_equal(np.sort(a), np.sort(b))
                        for a, b in zip(self.levels, other.levels)))

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())
