"""StaticXorFilter — immutable XOR filter built by 3-ary hypergraph
peeling.

Behavior-equivalent to the reference
(``/root/reference/c/lib/static.c:12-82``, ``c/include/filter/
static.h:38-75``, ``c/lib/peel.h``): size = max(2.0, 0.75 +
1/log log n)·n bytes rounded to 8; each key hashes to a 3-vertex
hyperedge confined to a ~m^(2/3) window (cache locality) plus an 8-bit
fingerprint; build peels degree-1 vertices to a stack, then assigns
fingerprint bytes in reverse order so each key's 3 bytes XOR to its
fingerprint; on a 2-core (peeling failure) the size grows 1% and the
build retries.

Spark split: edge generation and probes are vectorized numpy (the
probe is a 3-gather + XOR); the peeling loop is inherently sequential
and runs once per group inside the grouped ``applyInPandas`` build
(SURVEY.md §2.3). No union exists for XOR filters (static.c has no
add/merge): the distributed build path shuffles (group, key) pairs and
bulk-builds per group.
"""

from __future__ import annotations

import math
import struct

import numpy as np

ARITY = 3
_MAGIC = b"SXF1"

_U64 = np.uint64
_LOW32 = np.uint64(0xFFFFFFFF)


def _mulhi64(a: np.ndarray, b: int) -> np.ndarray:
    """High 64 bits of a (u64 array) × b (u64 scalar) — the reference
    uses __int128 (static.h:41,45); numpy emulates via 32-bit halves."""
    b = int(b)
    a_lo = a & _LOW32
    a_hi = a >> np.uint64(32)
    b_lo = np.uint64(b & 0xFFFFFFFF)
    b_hi = np.uint64(b >> 32)
    mid1 = a_lo * b_hi
    mid2 = a_hi * b_lo
    lo = a_lo * b_lo
    carry = ((lo >> np.uint64(32)) + (mid1 & _LOW32) + (mid2 & _LOW32)) \
        >> np.uint64(32)
    return a_hi * b_hi + (mid1 >> np.uint64(32)) + (mid2 >> np.uint64(32)) \
        + carry


def _window_for(m: int) -> int:
    w = int(ARITY + math.pow(m, 2.0 / 3.0))
    return min(w, m)


def make_edges(hashes: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch edge construction (static.h:38-59): → (vertices (n,3) int64,
    fingerprints (n,) uint8)."""
    h = hashes.astype(np.uint64, copy=False)
    window = _window_for(m)
    mw = m - window
    start = _mulhi64(h, mw).astype(np.int64)
    h = h * np.uint64(mw % (1 << 64))
    verts = np.empty((len(h), ARITY), dtype=np.int64)
    for j in range(ARITY):
        verts[:, j] = _mulhi64(h, window).astype(np.int64)
        h = h * np.uint64(window)
    fp = (h >> np.uint64(56)).astype(np.uint8)

    # de-collide within each edge (the C while-loop, static.h:47-50);
    # collisions are rare for large windows — fix only affected rows
    collide = (verts[:, 1] == verts[:, 0]) | (verts[:, 2] == verts[:, 0]) \
        | (verts[:, 2] == verts[:, 1])
    for i in np.flatnonzero(collide):
        row = verts[i]
        for j in range(1, ARITY):
            while row[j] in row[:j]:
                row[j] += 1
                if row[j] == window:
                    row[j] = 0
    verts += start[:, None]
    return verts, fp


class StaticXorFilter:
    __slots__ = ("xors",)

    FAMILY = "static_xor"

    def __init__(self, xors: np.ndarray):
        self.xors = xors  # uint8 array of length m

    @classmethod
    def construct(cls, hashes: np.ndarray) -> "StaticXorFilter":
        """Bulk build with 1%-growth retry loop (static.c:12-82),
        round-vectorized peeling. ``hashes`` should be distinct uint64
        keys.

        The peel order differs from the C reference's one-at-a-time
        stack (peel.h:75-106) — XOR-solve correctness is order-free
        (every edge constraint is satisfied regardless of which valid
        topological order assigns the bytes), and peel success/failure
        is structural (a 2-core exists or it doesn't), so the retry
        schedule and filter SIZE match C exactly while the byte
        CONTENT may differ. ``construct_exact`` keeps the C
        byte-parity path for the recorded anchors."""
        h = np.asarray(hashes, dtype=np.uint64)
        n = len(h)
        if n == 0:
            return cls(np.zeros(8, dtype=np.uint8))
        factor = 2.0 if n < 10 else (0.75 + 1.0 / math.log(math.log(n)))
        size = int(factor * n)
        size = (size + 7) // 8 * 8
        while True:
            verts, fps = make_edges(h, size)
            rounds = _peel_rounds(n, size, verts)
            if rounds is not None:
                break
            size = int(size * 1.01) + 1
            size = (size + 7) // 8 * 8
        xors = np.zeros(size, dtype=np.uint8)
        # unpeel: reverse-round fingerprint assignment (peel.h:108-119
        # semantics). Within a round every assigned vertex has degree
        # exactly 1, so no edge has two same-round assignees and the
        # gather-then-scatter below is race-free.
        for e_r, v_r in reversed(rounds):
            xors[v_r] = fps[e_r] ^ xors[verts[e_r, 0]] \
                ^ xors[verts[e_r, 1]] ^ xors[verts[e_r, 2]]
        return cls(xors)

    @classmethod
    def construct_exact(cls, hashes: np.ndarray) -> "StaticXorFilter":
        """Sequential build byte-identical to the C reference
        (static.c:12-82 + peel.h) including the degree-0 garbage-slot
        assignments; kept for the recorded C parity anchors. Use
        ``construct`` (round-vectorized) in pipelines."""
        h = np.asarray(hashes, dtype=np.uint64)
        n = len(h)
        if n == 0:
            return cls(np.zeros(8, dtype=np.uint8))
        factor = 2.0 if n < 10 else (0.75 + 1.0 / math.log(math.log(n)))
        size = int(factor * n)
        size = (size + 7) // 8 * 8
        while True:
            verts, fps = make_edges(h, size)
            order = _peel(n, size, verts)
            if order is not None:
                break
            size = int(size * 1.01) + 1
            size = (size + 7) // 8 * 8
        xors = np.zeros(size, dtype=np.uint8)
        # unpeel: reverse-order fingerprint assignment (peel.h:108-119)
        edge_ids, peeled_at = order
        for i in range(size - 1, -1, -1):
            e = edge_ids[i]
            v = peeled_at[i]
            xors[v] = fps[e] ^ xors[verts[e, 0]] ^ xors[verts[e, 1]] \
                ^ xors[verts[e, 2]]
        return cls(xors)

    def find_hash(self, hash_: int) -> bool:
        return bool(self.find_hashes(np.array([hash_], dtype=np.uint64))[0])

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized probe: recompute the edge, XOR the 3 bytes with
        the fingerprint, zero ⇒ present (static.h:62-75)."""
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        # blocked evaluation: edge recompute + 3 table gathers stream
        # several full-batch temporaries; 128k lanes keeps them
        # cache-resident (measured 218 → 81 ns/key at 5M keys)
        if n > 131072:
            out = np.empty(n, dtype=bool)
            for i in range(0, n, 131072):
                out[i:i + 131072] = self.find_hashes(hashes[i:i + 131072])
            return out
        verts, fps = make_edges(hashes, len(self.xors))
        x = self.xors[verts[:, 0]] ^ self.xors[verts[:, 1]] \
            ^ self.xors[verts[:, 2]]
        return x == fps

    def size_in_bytes(self) -> int:
        return len(self.xors)

    def serialize(self) -> bytes:
        return _MAGIC + struct.pack("<Q", len(self.xors)) + self.xors.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "StaticXorFilter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a static xor filter blob")
        (m,) = struct.unpack_from("<Q", blob, 4)
        xors = np.frombuffer(blob, dtype=np.uint8, count=m, offset=12).copy()
        return cls(xors)

    def clone(self) -> "StaticXorFilter":
        return StaticXorFilter(self.xors.copy())

    def union(self, other):  # pragma: no cover
        raise NotImplementedError(
            "XOR filters are build-once; union is undefined (static.c has "
            "no add/merge) — rebuild from the merged key set instead")

    def __contains__(self, hash_: int) -> bool:
        return self.find_hash(hash_)

    def __eq__(self, other) -> bool:
        return isinstance(other, StaticXorFilter) and \
            np.array_equal(self.xors, other.xors)

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())


def _peel_rounds(n_edges: int, m: int, verts: np.ndarray):
    """Round-vectorized peeling: finds ALL degree-1 vertices per round
    and peels their edges together (the loop runs over rounds —
    O(log n) typical for random 3-ary hypergraphs — not over slots as
    the C stack does, peel.h:75-106). Returns a list of per-round
    (edge_ids, vertex_ids) arrays on success, None on a 2-core.

    Per round: every candidate vertex has degree exactly 1, so
    ``acc[v]`` IS its one remaining edge id. Several degree-1 vertices
    may share an edge (an edge with 2-3 degree-1 endpoints); dedup
    keeps one representative per edge — the losers drop to degree 0
    and simply keep fingerprint byte 0, which stays consistent because
    the representative's unpeel assignment is what satisfies that
    edge's constraint."""
    count = np.bincount(verts.ravel(), minlength=m)
    acc = np.zeros(m, dtype=np.int64)  # xor of incident edge ids
    eids = np.arange(n_edges, dtype=np.int64)
    for j in range(ARITY):
        np.bitwise_xor.at(acc, verts[:, j], eids)
    rounds = []
    peeled = 0
    cand = np.flatnonzero(count == 1)
    while len(cand):
        e_r, first = np.unique(acc[cand], return_index=True)
        v_r = cand[first]
        rounds.append((e_r, v_r))
        peeled += len(e_r)
        touched = verts[e_r].ravel()
        np.subtract.at(count, touched, 1)
        np.bitwise_xor.at(acc, touched, np.repeat(e_r, ARITY))
        tu = np.unique(touched)
        cand = tu[count[tu] == 1]
    if peeled != n_edges:
        return None
    return rounds


def _peel(n_edges: int, m: int, verts: np.ndarray):
    """Sequential peeling (peel.h:34-106): returns (edge_ids, peeled_at)
    arrays of length m on success, None on a 2-core."""
    count = np.zeros(m, dtype=np.int64)
    acc = np.zeros(m, dtype=np.int64)  # xor of incident edge ids
    for j in range(ARITY):
        np.add.at(count, verts[:, j], 1)
        np.bitwise_xor.at(acc, verts[:, j], np.arange(n_edges))
    edge_ids = np.empty(m, dtype=np.int64)
    peeled_at = np.empty(m, dtype=np.int64)
    # initial scan: every vertex with degree <= 1 (peel.h:77-87)
    init = np.flatnonzero(count <= 1)
    end = len(init)
    edge_ids[:end] = acc[init]
    peeled_at[:end] = init
    begin = 0
    while begin < end:
        v = peeled_at[begin]
        if count[v] == 0:
            begin += 1
            continue
        e = acc[v]
        edge_ids[begin] = e  # re-read: acc may have changed since push
        for k in range(ARITY):
            u = verts[e, k]
            acc[u] ^= e
            count[u] -= 1
            if count[u] == 1 and u != v:
                edge_ids[end] = acc[u]
                peeled_at[end] = u
                end += 1
        begin += 1
    if begin != m:
        return None
    return edge_ids, peeled_at
