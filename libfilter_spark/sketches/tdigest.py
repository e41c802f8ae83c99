"""t-digest quantile sketch (Dunning & Ertl 2019, merging variant with
the k1 scale function).

State = centroids sorted by mean. Updates buffer raw points; merge and
compression sort-then-greedily-recluster under the k1 size bound —
fully deterministic (no randomness), so the same merge tree yields
byte-identical state, and any merge order yields estimates within the
digest's accuracy envelope (tails are exact-ish: cluster sizes shrink
toward q=0 and q=1).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"TDG1"


def _k1(q: float, delta: float) -> float:
    return delta / (2 * math.pi) * math.asin(2 * q - 1)


class TDigest:
    __slots__ = ("delta", "means", "weights", "n", "_buf")

    def __init__(self, delta: float = 100.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None, n: float = 0.0):
        self.delta = delta
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)
        self.n = n
        self._buf: list[np.ndarray] = []

    @classmethod
    def create(cls, delta: float = 100.0) -> "TDigest":
        return cls(delta)

    def update_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self._buf.append(v)
        self.n += len(v)
        if sum(len(b) for b in self._buf) > 32 * self.delta:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        vals = np.concatenate(self._buf)
        self._buf = []
        means = np.concatenate([self.means, vals])
        weights = np.concatenate([self.weights,
                                  np.ones(len(vals), dtype=np.float64)])
        self.means, self.weights = _compress(means, weights, self.delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("t-digest merge requires equal delta")
        self._flush()
        other._flush()
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        m, w = _compress(means, weights, self.delta)
        return TDigest(self.delta, m, w, self.n + other.n)

    def quantile(self, q: float) -> float:
        self._flush()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        cum = np.cumsum(w) - w / 2  # centroid centers
        target = q * w.sum()
        idx = int(np.searchsorted(cum, target))
        if idx == 0:
            return float(self.means[0])
        if idx >= len(self.means):
            return float(self.means[-1])
        # linear interpolation between adjacent centroid centers
        c0, c1 = cum[idx - 1], cum[idx]
        m0, m1 = self.means[idx - 1], self.means[idx]
        t = (target - c0) / (c1 - c0) if c1 > c0 else 0.0
        return float(m0 + t * (m1 - m0))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def serialize(self) -> bytes:
        self._flush()
        head = _MAGIC + struct.pack("<ddQ", self.delta, self.n,
                                    len(self.means))
        return head + self.means.astype("<f8").tobytes() \
            + self.weights.astype("<f8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        if blob[:4] != _MAGIC:
            raise ValueError("not a t-digest blob")
        delta, n, cnt = struct.unpack_from("<ddQ", blob, 4)
        off = 4 + struct.calcsize("<ddQ")
        means = np.frombuffer(blob, dtype="<f8", count=int(cnt),
                              offset=off).astype(np.float64)
        off += int(cnt) * 8
        weights = np.frombuffer(blob, dtype="<f8", count=int(cnt),
                                offset=off).astype(np.float64)
        return cls(delta, means, weights, n)

    def __eq__(self, other) -> bool:
        if not isinstance(other, TDigest):
            return False
        self._flush()
        other._flush()
        return (self.delta == other.delta and self.n == other.n
                and np.array_equal(self.means, other.means)
                and np.array_equal(self.weights, other.weights))

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())


def _compress(means: np.ndarray, weights: np.ndarray,
              delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic greedy reclustering under the k1 scale bound."""
    if len(means) == 0:
        return means, weights
    order = np.lexsort((weights, means))  # stable, deterministic
    means = means[order]
    weights = weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m = means[0]
    cur_w = weights[0]
    q0 = 0.0
    k_lo = _k1(q0, delta)
    for i in range(1, len(means)):
        q1 = (q0 * total + cur_w + weights[i]) / total
        if _k1(min(q1, 1.0), delta) - k_lo <= 1.0:
            # absorb into current centroid (weighted mean)
            cur_m = (cur_m * cur_w + means[i] * weights[i]) \
                / (cur_w + weights[i])
            cur_w += weights[i]
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            k_lo = _k1(min(q0, 1.0), delta)
            cur_m, cur_w = means[i], weights[i]
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)
