"""TaffyCuckooFilter — growable quotienting cuckoo filter, plus its
immutable probe-optimized FrozenTaffyCuckooFilter.

Behavior-equivalent to the reference
(``/root/reference/c/include/filter/taffy-cuckoo.h`` and
``c/lib/taffy-cuckoo.c``): two sides, each an invertible-Feistel-hashed
bucket array (4 slots × {fingerprint:10, tail:6}) plus an overflow
stash; random-walk kick insertion (ttl=32, deterministic PCG victim
selection); doubling growth that steals one tail bit per upsize
(forking both extensions when the tail is exhausted,
taffy-cuckoo.c:205-237); set-preserving union (taffy-cuckoo.c:260-348)
— the UDAF merge for this family.

Spark-native split: inserts/union are the reference's sequential
algorithms (exact semantics, validated against the compiled C);
``find_hashes`` and the frozen probe are fully vectorized numpy — the
hot path in the broadcast Bloom-join.

Serialization is our own little-endian layout (upstream acknowledges
serialize as a TODO, taffy-cuckoo.h:11). One deliberate divergence:
the C frozen filter stores stash entries as un-permuted high bits but
compares them against permuted values (taffy-cuckoo.c:131-142 vs
taffy-cuckoo.h:260-261), so stashed keys can never match; we store the
permuted index|fp (the Java port's semantics,
FrozenTaffyCuckooFilter.java:89-98) so stashed keys stay findable.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..kernels.feistel import (PcgRandom, feistel_backward,
                               feistel_backward_batch_lean,
                               feistel_forward,
                               feistel_forward_batch_lean, is_prefix_of,
                               is_prefix_of_batch)

HEAD = 10            # fingerprint bits (taffy-cuckoo.h:42)
TAIL = 5             # tail payload bits (taffy-cuckoo.h:48)
LOG_SLOTS = 2
SLOTS = 1 << LOG_SLOTS
FP_MASK = (1 << HEAD) - 1
TAIL_MASK = (1 << (TAIL + 1)) - 1
# probe block size: 128k lanes × 8 B ≈ 1 MiB per temporary — L2-resident
_PROBE_BLOCK = 131072

# default entropy table (taffy-cuckoo.c:100-102)
ENTROPY = (0x2BA7538EE1234073, 0xFCC3777539B147D6,
           0x6086C563576347E7, 0x52EFF34EE1764465,
           0x8639CBF57F264867, 0x5A31EE34F0224CCB,
           0x07A1CB8140744EE6, 0xF2296CF6A6524E9F)

_MAGIC = b"TCF1"
_FROZEN_MAGIC = b"FTC1"


class _Side:
    __slots__ = ("keys", "data", "stash")

    def __init__(self, log_side_size: int, entropy4: tuple):
        self.keys = ((entropy4[0], entropy4[1]), (entropy4[2], entropy4[3]))
        self.data = np.zeros((1 << log_side_size, SLOTS), dtype=np.uint16)
        self.stash: list[tuple[int, int, int]] = []  # (bucket, fp, tail)


def _to_path(raw: int, keys: tuple, log_side_size: int) -> tuple:
    """hash → (bucket, fingerprint, encoded tail) — taffy-cuckoo.h:106-127."""
    pre = (raw >> (64 - log_side_size - HEAD))
    hashed = feistel_forward(keys, log_side_size + HEAD, pre)
    bucket = hashed >> HEAD
    fp = hashed & FP_MASK
    raw_tail = (raw >> (64 - log_side_size - HEAD - TAIL)) & ((1 << TAIL) - 1)
    return (bucket, fp, raw_tail * 2 + 1)


def _from_path_no_tail(bucket: int, fp: int, keys: tuple,
                       log_side_size: int) -> int:
    """(bucket, fp) → original high bits — taffy-cuckoo.h:132-142."""
    hashed = (bucket << HEAD) | fp
    pre = feistel_backward(keys, log_side_size + HEAD, hashed)
    return (pre << (64 - log_side_size - HEAD)) & ((1 << 64) - 1)


class TaffyCuckooFilter:
    __slots__ = ("log_side_size", "sides", "rng", "entropy", "occupied")

    FAMILY = "taffy_cuckoo"

    def __init__(self, log_side_size: int, entropy: tuple = ENTROPY):
        self.log_side_size = log_side_size
        self.entropy = entropy
        self.sides = [_Side(log_side_size, entropy[0:4]),
                      _Side(log_side_size, entropy[4:8])]
        self.rng = PcgRandom(LOG_SLOTS)
        self.occupied = 0

    # --- constructors -------------------------------------------------
    @classmethod
    def create_with_bytes(cls, bytes_: int) -> "TaffyCuckooFilter":
        # taffy-cuckoo.c:103-107: log2(bytes / 2 sides / slots / 2B-slot)
        f = math.log(bytes_ / 2 / SLOTS / 2, 2) if bytes_ > 0 else 1.0
        f = max(f, 1.0)
        return cls(int(f))

    @classmethod
    def create(cls, ndv: int, fpp: float = 0.01) -> "TaffyCuckooFilter":
        """Capacity-seeded constructor for the UDAF contract: sized so
        ~ndv keys fit below the 90% growth trigger. fpp is accepted for
        interface parity; the TCF fpp is structural (~2^-F,
        taffy.tex:837-844), not configurable."""
        del fpp
        slots_needed = max(8, int(ndv / 0.85))
        log = max(1, (slots_needed // (2 * SLOTS)).bit_length())
        return cls(log)

    @property
    def capacity(self) -> int:
        return 2 * SLOTS * (1 << self.log_side_size)

    # --- insert ---------------------------------------------------------
    def _side_insert(self, side: _Side, p: tuple) -> tuple:
        """taffy-cuckoo.h:169-202. Returns (bucket,fp,0) if placed in an
        empty slot, p itself if deduped, else the displaced victim."""
        bucket, fp, tail = p
        row = side.data[bucket]
        for i in range(SLOTS):
            s = int(row[i])
            s_tail = s >> HEAD
            if s_tail == 0:
                row[i] = fp | (tail << HEAD)
                return (bucket, fp, 0)
            if (s & FP_MASK) == fp and is_prefix_of(s_tail, tail):
                return p
        i = self.rng.get()
        victim = int(row[i])
        row[i] = fp | (tail << HEAD)
        return (bucket, victim & FP_MASK, victim >> HEAD)

    def _insert_side_path(self, s: int, p: tuple, ttl: int = 32) -> bool:
        """taffy-cuckoo.h:320-375: random-walk between sides; stash on
        ttl exhaustion (returns False → caller should consider upsize)."""
        both = (self.sides[s], self.sides[1 - s])
        while True:
            for i in range(2):
                q = p
                p = self._side_insert(both[i], p)
                if p[2] == 0:
                    self.occupied += 1
                    return True
                if p == q:
                    return True
                tail = p[2]
                if ttl <= 0:
                    both[i].stash.append(p)
                    self.occupied += 1
                    return False
                ttl -= 1
                raw = _from_path_no_tail(p[0], p[1], both[i].keys,
                                         self.log_side_size)
                p = _to_path(raw, both[1 - i].keys, self.log_side_size)
                p = (p[0], p[1], tail)

    def add_hash(self, k: int) -> bool:
        """taffy-cuckoo.h:390-400 (upsize triggers + side-0 insert)."""
        while (self.occupied > 0.90 * self.capacity
               or self.occupied + 4 >= self.capacity
               or len(self.sides[0].stash) + len(self.sides[1].stash) > 8):
            self._upsize()
        self._insert_side_path(
            0, _to_path(int(k), self.sides[0].keys, self.log_side_size))
        return True

    def add_hashes_exact(self, hashes: np.ndarray) -> None:
        """Sequential inserts with the reference's exact per-key order —
        bit-identical state to the C library (used by parity tests)."""
        for k in hashes:
            self.add_hash(int(k))

    # --- Java-interop 32-bit entries (TaffyCuckooFilter.java:241-253):
    # l = (bits(k) << 32) | mulhi64(k_sext * 0x05C2C3E0FFB449C7) — the
    # left shift comes first, so (unlike BlockFilter.AddHash32) no
    # sign-extension reaches the upper half.
    _REHASH_32 = 0x05C2C3E0FFB449C7

    @classmethod
    def _rehash_32(cls, k: int) -> int:
        sext = (int(k) + (1 << 64)) % (1 << 64)       # two's complement
        low = ((cls._REHASH_32 * sext) & ((1 << 64) - 1)) >> 32
        return ((int(k) & 0xFFFFFFFF) << 32) | low

    def add_hash_32(self, k: int) -> bool:
        return self.add_hash(self._rehash_32(k))

    def find_hash_32(self, k: int) -> bool:
        return self.find_hash(self._rehash_32(k))

    def add_hashes_32(self, hashes32: np.ndarray) -> None:
        h = np.asarray(hashes32, dtype=np.int32)
        sext = h.astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            low = (np.uint64(self._REHASH_32) * sext) >> np.uint64(32)
        bits = h.view(np.uint32).astype(np.uint64)
        self.add_hashes((bits << np.uint64(32)) | low)

    def find_hashes_32(self, hashes32: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes32, dtype=np.int32)
        sext = h.astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            low = (np.uint64(self._REHASH_32) * sext) >> np.uint64(32)
        bits = h.view(np.uint32).astype(np.uint64)
        return self.find_hashes((bits << np.uint64(32)) | low)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized batch insert (the Spark hot path).

        Set-preserving and deterministic for a given batch sequence,
        but the kick order differs from per-key C insertion, so the
        byte layout is probe-equivalent rather than bit-identical
        (same contract as union, SURVEY.md §7.3). Fast path: batch
        to_path → drop already-present keys → vectorized placement
        into empty side-0 slots → scalar kick loop only for leftovers.
        """
        h = np.asarray(hashes, dtype=np.uint64)
        # the batch size is known upfront: grow to the final size first
        # (each _upsize_vec is one whole-table batch re-path, so growing
        # early is strictly cheaper than growing through kick-heavy
        # chunks at the 0.90 trigger — measured 6.6 us/key grown vs
        # 0.7 us/key pre-sized at 1M keys before this)
        need = self.occupied + len(h)
        while 0.85 * self.capacity < need:
            self._upsize_vec()
        pos = 0
        while pos < len(h):
            # upsize until the chunk fits under the growth triggers
            while (self.occupied + 4 >= self.capacity
                   or self.occupied > 0.90 * self.capacity
                   or len(self.sides[0].stash)
                   + len(self.sides[1].stash) > 8):
                self._upsize_vec()
            room = int(0.90 * self.capacity) - self.occupied
            take = max(1, min(room, len(h) - pos))
            self._add_chunk(h[pos:pos + take])
            pos += take

    def _add_chunk(self, h: np.ndarray) -> None:
        log = self.log_side_size
        pre_shift = np.uint64(64 - log - HEAD)
        tail_shift = np.uint64(64 - log - HEAD - TAIL)
        ptail = ((h >> tail_shift) & np.uint64((1 << TAIL) - 1)) * \
            np.uint64(2) + np.uint64(1)
        side0 = self.sides[0]
        hashed = feistel_forward_batch_lean(side0.keys, log + HEAD,
                                       h >> pre_shift)
        bucket = (hashed >> np.uint64(HEAD)).astype(np.int64)
        fp = (hashed & np.uint64(FP_MASK)).astype(np.int64)
        tail = ptail.astype(np.int64)

        # skip keys already present (probe says yes ⇒ inserting would
        # change nothing observable; zero-FN contract preserved)
        present = self.find_hashes(h)
        todo = np.flatnonzero(~present)
        if len(todo) == 0:
            return
        bucket, fp, tail = bucket[todo], fp[todo], tail[todo]

        # drop duplicate (bucket, fp) within the chunk (keep first) —
        # mirrors the dedup branch of side_insert for identical paths
        trip = (bucket << np.int64(16)) | (fp << np.int64(6)) | tail
        _, first_idx = np.unique(trip, return_index=True)
        first_idx.sort()
        bucket, fp, tail = bucket[first_idx], fp[first_idx], \
            tail[first_idx]

        # vectorized placement: empty side-0 slots first, then translate
        # the spill to side 1 (backward/forward feistel, tail carried —
        # the same move a kick makes, taffy-cuckoo.h:366-372) and place
        # there; only the residue walks the scalar kick loop
        placed = self._place_vec(0, bucket, fp, tail)
        left = np.flatnonzero(~placed)
        if len(left):
            w = log + HEAD
            hashed0 = (bucket[left].astype(np.uint64) << np.uint64(HEAD)) \
                | fp[left].astype(np.uint64)
            pre = feistel_backward_batch_lean(self.sides[0].keys, w, hashed0)
            hashed1 = feistel_forward_batch_lean(self.sides[1].keys, w, pre)
            b1 = (hashed1 >> np.uint64(HEAD)).astype(np.int64)
            f1 = (hashed1 & np.uint64(FP_MASK)).astype(np.int64)
            t1 = tail[left]
            placed1 = self._place_vec(1, b1, f1, t1)
            for i in np.flatnonzero(~placed1):
                self._insert_side_path(
                    1, (int(b1[i]), int(f1[i]), int(t1[i])))

    def _insert_raws(self, raws: np.ndarray, tails: np.ndarray) -> None:
        """Insert raw-key-prefixes with explicit encoded tails:
        vectorized side-0 placement → side-1 spill → scalar residue.
        (The upsize/union re-path primitives carry tails that differ
        from what to_path would derive, hence the override.)"""
        log = self.log_side_size
        hashed = feistel_forward_batch_lean(self.sides[0].keys, log + HEAD,
                                       raws >> np.uint64(64 - log - HEAD))
        bucket = (hashed >> np.uint64(HEAD)).astype(np.int64)
        fp = (hashed & np.uint64(FP_MASK)).astype(np.int64)
        tail = tails.astype(np.int64)
        placed = self._place_vec(0, bucket, fp, tail)
        left = np.flatnonzero(~placed)
        if len(left):
            w = log + HEAD
            hashed0 = (bucket[left].astype(np.uint64) << np.uint64(HEAD)) \
                | fp[left].astype(np.uint64)
            pre = feistel_backward_batch_lean(self.sides[0].keys, w, hashed0)
            hashed1 = feistel_forward_batch_lean(self.sides[1].keys, w, pre)
            b1 = (hashed1 >> np.uint64(HEAD)).astype(np.int64)
            f1 = (hashed1 & np.uint64(FP_MASK)).astype(np.int64)
            t1 = tail[left]
            placed1 = self._place_vec(1, b1, f1, t1)
            for i in np.flatnonzero(~placed1):
                self._insert_side_path(
                    1, (int(b1[i]), int(f1[i]), int(t1[i])))

    def _upsize_vec(self) -> None:
        """Vectorized doubling: batch-re-path every stored slot/stash
        (same tail-bit-stealing algebra as _upsize_one, vector form).
        Set-preserving; layout probe-equivalent to the scalar upsize."""
        log = self.log_side_size
        t = TaffyCuckooFilter(log + 1, self.entropy)
        shift = np.uint64(64 - log - HEAD - 1)
        for s in range(2):
            side = self.sides[s]
            stail_m = side.data >> np.uint16(10)
            rows, cols = np.nonzero(stail_m != 0)
            bks = rows.astype(np.uint64)
            fps = (side.data[rows, cols] & np.uint16(FP_MASK)) \
                .astype(np.uint64)
            tls = stail_m[rows, cols].astype(np.int64)
            if side.stash:
                bks = np.concatenate([bks, np.array(
                    [p[0] for p in side.stash], dtype=np.uint64)])
                fps = np.concatenate([fps, np.array(
                    [p[1] for p in side.stash], dtype=np.uint64)])
                tls = np.concatenate([tls, np.array(
                    [p[2] for p in side.stash], dtype=np.int64)])
            if len(bks) == 0:
                continue
            hashed = (bks << np.uint64(HEAD)) | fps
            pre = feistel_backward_batch_lean(side.keys, log + HEAD, hashed)
            raw = pre << np.uint64(64 - log - HEAD)
            fork = tls == (1 << TAIL)
            nf = ~fork
            raw_nf = raw[nf] | ((tls[nf].astype(np.uint64)
                                 >> np.uint64(TAIL)) << shift)
            tail_nf = (tls[nf] << 1) & TAIL_MASK
            raw_f = raw[fork]
            raws = np.concatenate(
                [raw_nf, raw_f, raw_f | (np.uint64(1) << shift)])
            tails = np.concatenate(
                [tail_nf, np.full(2 * int(fork.sum()), 1 << TAIL,
                                  dtype=np.int64)])
            t._insert_raws(raws, tails)
        self.log_side_size = t.log_side_size
        self.sides = t.sides
        self.occupied = t.occupied
        self.rng = t.rng

    def _place_vec(self, side_idx: int, bucket: np.ndarray, fp: np.ndarray,
                   tail: np.ndarray) -> np.ndarray:
        """Place candidates into empty slots of one side; returns a
        boolean mask of which candidates were placed."""
        data = self.sides[side_idx].data
        n = len(bucket)
        order = np.argsort(bucket, kind="stable")
        b_sorted = bucket[order]
        uniq, start, counts = np.unique(b_sorted, return_index=True,
                                        return_counts=True)
        empty_mask = (data[uniq] >> 10) == 0          # (u, SLOTS)
        n_empty = empty_mask.sum(axis=1)
        rank = np.arange(n) - np.repeat(start, counts)
        k_per = np.repeat(np.minimum(n_empty, counts), counts)
        sel = rank < k_per
        if sel.any():
            slot_order = np.argsort(~empty_mask, axis=1, kind="stable")
            u_idx = np.repeat(np.arange(len(uniq)), counts)
            rows = uniq[u_idx[sel]]
            slots = slot_order[u_idx[sel], rank[sel]]
            vals = (fp[order][sel] | (tail[order][sel] << 10)) \
                .astype(np.uint16)
            data[rows, slots] = vals
            self.occupied += int(sel.sum())
        placed = np.zeros(n, dtype=bool)
        placed[order[sel]] = True
        return placed

    # --- growth -----------------------------------------------------------
    def _upsize(self) -> None:
        """taffy-cuckoo.c:239-258 — double, re-path every slot/stash via
        the tail-bit-stealing helper."""
        # the upsized filter starts a FRESH PCG (create() semantics,
        # taffy-cuckoo.c:240-241,70) — the kick stream resets each upsize
        t = TaffyCuckooFilter(self.log_side_size + 1, self.entropy)
        for s in range(2):
            side = self.sides[s]
            for (bucket, fp, tail) in side.stash:
                self._upsize_one(bucket, fp, tail, s, t)
            data = side.data
            for bucket in range(data.shape[0]):
                for j in range(SLOTS):
                    v = int(data[bucket, j])
                    self._upsize_one(bucket, v & FP_MASK, v >> HEAD, s, t)
        self.log_side_size = t.log_side_size
        self.sides = t.sides
        self.occupied = t.occupied
        self.rng = t.rng

    def _upsize_one(self, bucket: int, fp: int, tail: int, s: int,
                    t: "TaffyCuckooFilter") -> None:
        """UpsizeHelper (taffy-cuckoo.c:208-237)."""
        if tail == 0:
            return
        q = _from_path_no_tail(bucket, fp, self.sides[s].keys,
                               self.log_side_size)
        if tail == 1 << TAIL:
            # no tail bits left: insert both one-bit extensions
            p = _to_path(q, t.sides[0].keys, t.log_side_size)
            t._insert_side_path(0, (p[0], p[1], tail))
            q |= 1 << (64 - self.log_side_size - HEAD - 1)
            p = _to_path(q, t.sides[0].keys, t.log_side_size)
            t._insert_side_path(0, (p[0], p[1], tail))
        else:
            q |= (tail >> TAIL) << (64 - self.log_side_size - HEAD - 1)
            r = _to_path(q, t.sides[0].keys, t.log_side_size)
            t._insert_side_path(0, (r[0], r[1], (tail << 1) & TAIL_MASK))

    # --- probe ------------------------------------------------------------
    def find_hash(self, k: int) -> bool:
        k = int(k)
        for s in range(2):
            side = self.sides[s]
            bucket, fp, tail = _to_path(k, side.keys, self.log_side_size)
            hit = False
            for (sb, sf, st) in side.stash:
                if st != 0 and sb == bucket and sf == fp \
                        and is_prefix_of(st, tail):
                    hit = True
            row = side.data[bucket]
            for i in range(SLOTS):
                v = int(row[i])
                if (v >> HEAD) != 0 and (v & FP_MASK) == fp \
                        and is_prefix_of(v >> HEAD, tail):
                    hit = True
            if hit:
                return True
        return False

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized two-side probe (semantics of taffy-cuckoo.h:204-223
        and 297-311 over a whole batch). Blocked at 128k lanes so the
        ~10 full-array temporaries stay L2-resident; keys found on
        side 0 are compressed out of side 1's input (a stored path
        lives in one side's bucket, the C find short-circuits per key
        — present keys pay ~1.5 side probes instead of 2)."""
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64, copy=False)
        if n > _PROBE_BLOCK:
            out = np.empty(n, dtype=bool)
            for i in range(0, n, _PROBE_BLOCK):
                out[i:i + _PROBE_BLOCK] = \
                    self._find_hashes_block(h[i:i + _PROBE_BLOCK])
            return out
        return self._find_hashes_block(h)

    def _find_hashes_block(self, h: np.ndarray) -> np.ndarray:
        n = len(h)
        out = np.zeros(n, dtype=bool)
        found = self._probe_side(self.sides[0], h)
        idx = None
        if found.any():
            out[found] = True
            idx = np.flatnonzero(~found)
            if not len(idx):
                return out
            h = h[idx]
        found = self._probe_side(self.sides[1], h)
        out[found if idx is None else idx[found]] = True
        return out

    def _probe_side(self, side: "_Side", h: np.ndarray) -> np.ndarray:
        log = self.log_side_size
        hashed = feistel_forward_batch_lean(
            side.keys, log + HEAD, h >> np.uint64(64 - log - HEAD))
        bucket = hashed >> np.uint64(HEAD)
        fp16 = (hashed & np.uint64(FP_MASK)).astype(np.uint16)
        slots = side.data[bucket]                       # (n, SLOTS) u16
        # occupied ⇔ the slot's u16 image exceeds its HEAD low bits
        cand = (slots & np.uint16(FP_MASK)) == fp16[:, None]
        cand &= slots > np.uint16(FP_MASK)
        found = np.zeros(len(h), dtype=bool)
        tail_shift = np.uint64(64 - log - HEAD - TAIL)
        tmask = np.uint64((1 << TAIL) - 1)

        def ptail_at(ri):             # lazy tail, matched lanes only
            return (((h[ri] >> tail_shift) & tmask)
                    .astype(np.int64) << 1) | 1

        # fingerprint matches are ~n*SLOTS/2^HEAD — evaluate the
        # tail-prefix test sparsely instead of on the full matrix
        rows, cols = np.nonzero(cand)
        if len(rows):
            pref = is_prefix_of_batch(slots[rows, cols] >> np.uint16(HEAD),
                                      ptail_at(rows))
            found[rows[pref]] = True
        for (sb, sf, st) in side.stash:
            if st == 0:
                continue
            hit = (bucket == np.uint64(sb)) & (fp16 == np.uint16(sf))
            idx = np.flatnonzero(hit)
            if len(idx):
                pref = is_prefix_of_batch(
                    np.full(len(idx), st, dtype=np.int64), ptail_at(idx))
                found[idx[pref]] = True
        return found

    # --- union (the UDAF merge; taffy-cuckoo.c:260-348) --------------------
    def union(self, other: "TaffyCuckooFilter") -> "TaffyCuckooFilter":
        if self.occupied > other.occupied:
            result, donor = self.clone(), other
        else:
            result, donor = other.clone(), self
        result._union_one(donor)
        return result

    def absorb(self, donor: "TaffyCuckooFilter") -> None:
        """In-place vectorized union for the distributed merge path
        (probe-equivalent, like add_hashes; the scalar `union` keeps C
        bit-parity for the upstream contract tests).

        Fixes the upstream union's scaling hole: the C union never
        upsizes (its own TODO, taffy-cuckoo.h:377-378), so merging
        near-full partials stashes most donor keys — measured 8k keys/s
        distributed builds with megabyte stashes. absorb grows the
        result to fit both populations first (each _upsize_vec is one
        whole-table batch re-path), then ingests the donor through the
        vectorized raw-insert path (union_help's three tail cases,
        taffy-cuckoo.c:260-313, in batch form)."""
        while (self.log_side_size < donor.log_side_size
               or 0.85 * self.capacity < self.occupied + donor.occupied):
            self._upsize_vec()
        diff = self.log_side_size - donor.log_side_size
        tlog = donor.log_side_size
        for side in range(2):
            sd = donor.sides[side]
            tails_m = sd.data >> np.uint16(HEAD)
            rows, cols = np.nonzero(tails_m != 0)
            bks = rows.astype(np.uint64)
            fps = (sd.data[rows, cols] & np.uint16(FP_MASK)) \
                .astype(np.uint64)
            tls = tails_m[rows, cols].astype(np.int64)
            if sd.stash:
                bks = np.concatenate([bks, np.array(
                    [p[0] for p in sd.stash], dtype=np.uint64)])
                fps = np.concatenate([fps, np.array(
                    [p[1] for p in sd.stash], dtype=np.uint64)])
                tls = np.concatenate([tls, np.array(
                    [p[2] for p in sd.stash], dtype=np.int64)])
            if len(bks) == 0:
                continue
            hashed = (bks << np.uint64(HEAD)) | fps
            pre = feistel_backward_batch_lean(sd.keys, tlog + HEAD, hashed)
            raw = pre << np.uint64(64 - tlog - HEAD)
            if diff == 0:
                self._insert_raws(raw, tls)
                continue
            # tail_size = TAIL - ctz(tail); orin re-attaches the tail's
            # data bits below the donor-width prefix
            low = (tls & -tls).astype(np.uint64)
            ctz = np.zeros(len(tls), dtype=np.int64)
            for b in range(1, TAIL + 1):
                ctz[(low >> np.uint64(b)) & np.uint64(1) == 1] = b
            tail_size = TAIL - ctz
            orin = ((tls & (tls - 1)).astype(np.uint64)
                    << np.uint64(64 - tlog - HEAD - TAIL - 1))
            raw = raw | orin
            fits = tail_size >= diff
            if fits.any():
                self._insert_raws(
                    raw[fits], (tls[fits] << diff) & TAIL_MASK)
            rest = ~fits
            if rest.any():
                missing = (diff - tail_size)[rest]
                rraw = raw[rest]
                shift = np.uint64(64 - self.log_side_size - HEAD)
                for m in np.unique(missing):
                    sel = rraw[missing == m]
                    reps = np.repeat(sel, 1 << m)
                    pat = np.tile(np.arange(1 << m, dtype=np.uint64)
                                  << shift, len(sel))
                    self._insert_raws(
                        reps | pat,
                        np.full(len(reps), 1 << TAIL, dtype=np.int64))

    def _union_one(self, that: "TaffyCuckooFilter") -> None:
        assert that.log_side_size <= self.log_side_size
        for side in range(2):
            sd = that.sides[side]
            for (bucket, fp, tail) in sd.stash:
                self._union_help(that, side, bucket, fp, tail)
            data = sd.data
            for bucket in range(data.shape[0]):
                for slot in range(SLOTS):
                    v = int(data[bucket, slot])
                    if (v >> HEAD) == 0:
                        continue
                    self._union_help(that, side, bucket, v & FP_MASK,
                                     v >> HEAD)

    def _union_help(self, that: "TaffyCuckooFilter", side: int,
                    bucket: int, fp: int, tail: int) -> None:
        """taffy-cuckoo.c:260-313: un-permute the donor path, then
        re-path into self, consuming tail bits (or enumerating missing
        extensions) when self is larger."""
        hashed = _from_path_no_tail(bucket, fp, that.sides[side].keys,
                                    that.log_side_size)
        tail_size = TAIL - ((tail & -tail).bit_length() - 1)
        if that.log_side_size == self.log_side_size:
            q = _to_path(hashed, self.sides[0].keys, self.log_side_size)
            self._insert_side_path(0, (q[0], q[1], tail))
        elif that.log_side_size + tail_size >= self.log_side_size:
            orin = (tail & (tail - 1)) << \
                (64 - that.log_side_size - HEAD - TAIL - 1)
            hashed |= orin
            q = _to_path(hashed, self.sides[0].keys, self.log_side_size)
            newtail = (tail << (self.log_side_size - that.log_side_size)) \
                & TAIL_MASK
            self._insert_side_path(0, (q[0], q[1], newtail))
        else:
            orin = (tail & (tail - 1)) << \
                (64 - that.log_side_size - HEAD - TAIL - 1)
            hashed |= orin
            missing = self.log_side_size - that.log_side_size - tail_size
            for i in range(1 << missing):
                tmp = hashed | (i << (64 - self.log_side_size - HEAD))
                q = _to_path(tmp, self.sides[0].keys, self.log_side_size)
                self._insert_side_path(0, (q[0], q[1], 1 << TAIL))

    # --- freeze -------------------------------------------------------------
    def freeze(self) -> "FrozenTaffyCuckooFilter":
        """taffy-cuckoo.c:127-153: drop tails, keep 4×10-bit fingerprints
        per bucket (packed in a u64 for SWAR probing)."""
        data = []
        stashes = []
        for s in range(2):
            side = self.sides[s]
            d = side.data.astype(np.uint64)
            packed = (d[:, 0] & np.uint64(FP_MASK)) \
                | ((d[:, 1] & np.uint64(FP_MASK)) << np.uint64(10)) \
                | ((d[:, 2] & np.uint64(FP_MASK)) << np.uint64(20)) \
                | ((d[:, 3] & np.uint64(FP_MASK)) << np.uint64(30))
            data.append(packed)
            # store permuted (bucket<<HEAD | fp) — findable, unlike the
            # C version's raw-high stash (see module docstring)
            stashes.append(np.array(
                [(b << HEAD) | f for (b, f, t) in side.stash if t != 0],
                dtype=np.uint64))
        return FrozenTaffyCuckooFilter(self.log_side_size, self.entropy,
                                       data, stashes)

    # --- lifecycle / serde ---------------------------------------------------
    def clone(self) -> "TaffyCuckooFilter":
        c = TaffyCuckooFilter(self.log_side_size, self.entropy)
        for i in range(2):
            c.sides[i].data = self.sides[i].data.copy()
            c.sides[i].stash = list(self.sides[i].stash)
        # clone keeps rng state (taffy-cuckoo.c:82 copies rng)
        c.rng.state = self.rng.state
        c.rng.inc = self.rng.inc
        c.rng.current = self.rng.current
        c.rng.remaining_bits = self.rng.remaining_bits
        c.occupied = self.occupied
        return c

    def size_in_bytes(self) -> int:
        # parity with taffy-cuckoo.c:162-167 (16B paths × stash capacity
        # + 2B slots); stash capacity emulates the C doubling-from-4
        cap = 0
        for s in range(2):
            c = 4
            while c < len(self.sides[s].stash):
                c *= 2
            cap += c
        return 16 * cap + 2 * 2 * (1 << self.log_side_size) * SLOTS

    def serialize(self) -> bytes:
        parts = [_MAGIC,
                 struct.pack("<BQ", self.log_side_size, self.occupied),
                 struct.pack("<QQIi", self.rng.state, self.rng.inc,
                             self.rng.current, self.rng.remaining_bits),
                 struct.pack("<8Q", *self.entropy)]
        for s in range(2):
            side = self.sides[s]
            parts.append(side.data.astype("<u2").tobytes())
            parts.append(struct.pack("<I", len(side.stash)))
            for (b, f, t) in side.stash:
                parts.append(struct.pack("<QHH", b, f, t))
        return b"".join(parts)

    @classmethod
    def deserialize(cls, blob: bytes) -> "TaffyCuckooFilter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a taffy cuckoo filter blob")
        off = 4
        log, occupied = struct.unpack_from("<BQ", blob, off)
        off += struct.calcsize("<BQ")
        st, inc, cur, rem = struct.unpack_from("<QQIi", blob, off)
        off += struct.calcsize("<QQIi")
        entropy = struct.unpack_from("<8Q", blob, off)
        off += 64
        f = cls(log, entropy)
        f.occupied = occupied
        f.rng.state, f.rng.inc = st, inc
        f.rng.current, f.rng.remaining_bits = cur, rem
        n16 = (1 << log) * SLOTS
        for s in range(2):
            f.sides[s].data = np.frombuffer(
                blob, dtype="<u2", count=n16, offset=off) \
                .astype(np.uint16).reshape(-1, SLOTS).copy()
            off += n16 * 2
            (cnt,) = struct.unpack_from("<I", blob, off)
            off += 4
            stash = []
            for _ in range(cnt):
                b, fp, t = struct.unpack_from("<QHH", blob, off)
                off += struct.calcsize("<QHH")
                stash.append((b, fp, t))
            f.sides[s].stash = stash
        return f

    def __eq__(self, other) -> bool:
        return (isinstance(other, TaffyCuckooFilter)
                and self.log_side_size == other.log_side_size
                and self.occupied == other.occupied
                and all(np.array_equal(a.data, b.data)
                        and a.stash == b.stash
                        for a, b in zip(self.sides, other.sides)))

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())

    def __iadd__(self, k: int) -> "TaffyCuckooFilter":
        self.add_hash(k)
        return self

    def __contains__(self, k: int) -> bool:
        return self.find_hash(k)


def _has_value_10(x: np.ndarray, n: np.ndarray) -> np.ndarray:
    """SWAR '4×10-bit lane equals n' trick (taffy-cuckoo.h:247-252)."""
    y = x ^ (np.uint64(0x40100401) * n)
    return ((y - np.uint64(0x40100401)) & ~y & np.uint64(0x8020080200)) != 0


class FrozenTaffyCuckooFilter:
    """Immutable tail-less probe structure (taffy-cuckoo.h:236-273).
    fingerprint 0 ⇒ always-true (quirk preserved, taffy-cuckoo.h:266)."""

    __slots__ = ("log_side_size", "entropy", "data", "stashes")

    FAMILY = "frozen_taffy_cuckoo"

    def __init__(self, log_side_size: int, entropy: tuple,
                 data: list[np.ndarray], stashes: list[np.ndarray]):
        self.log_side_size = log_side_size
        self.entropy = entropy
        self.data = data          # two u64 arrays (packed 4×10-bit fps)
        self.stashes = stashes    # two u64 arrays of (bucket<<10|fp)

    def find_hash(self, k: int) -> bool:
        return bool(self.find_hashes(np.array([k], dtype=np.uint64))[0])

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        n = len(h)
        out = np.zeros(n, dtype=bool)
        log = self.log_side_size
        keys = [((self.entropy[0], self.entropy[1]),
                 (self.entropy[2], self.entropy[3])),
                ((self.entropy[4], self.entropy[5]),
                 (self.entropy[6], self.entropy[7]))]
        y = h >> np.uint64(64 - log - HEAD)
        for i in range(2):
            permuted = feistel_forward_batch_lean(keys[i], log + HEAD, y)
            bucket = (permuted >> np.uint64(HEAD)).astype(np.int64)
            fp = permuted & np.uint64(FP_MASK)
            z = self.data[i][bucket]
            out |= (fp == 0) | _has_value_10(z, fp)
            if len(self.stashes[i]):
                out |= np.isin(permuted, self.stashes[i])
        return out

    def size_in_bytes(self) -> int:
        return sum(a.nbytes for a in self.data) \
            + sum(s.nbytes for s in self.stashes)

    def serialize(self) -> bytes:
        parts = [_FROZEN_MAGIC, struct.pack("<B", self.log_side_size),
                 struct.pack("<8Q", *self.entropy)]
        for i in range(2):
            # 5 bytes per bucket (40 significant bits), like the Java
            # packing (FrozenTaffyCuckooFilter.java:14-36)
            raw = self.data[i].astype("<u8").view(np.uint8).reshape(-1, 8)
            parts.append(raw[:, :5].tobytes())
        for i in range(2):
            parts.append(struct.pack("<I", len(self.stashes[i])))
            parts.append(self.stashes[i].astype("<u8").tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, blob: bytes) -> "FrozenTaffyCuckooFilter":
        if blob[:4] != _FROZEN_MAGIC:
            raise ValueError("not a frozen taffy cuckoo blob")
        off = 4
        (log,) = struct.unpack_from("<B", blob, off)
        off += 1
        entropy = struct.unpack_from("<8Q", blob, off)
        off += 64
        data = []
        nb = 1 << log
        for _ in range(2):
            raw = np.frombuffer(blob, dtype=np.uint8, count=nb * 5,
                                offset=off).reshape(-1, 5)
            off += nb * 5
            full = np.zeros((nb, 8), dtype=np.uint8)
            full[:, :5] = raw
            data.append(full.view("<u8").reshape(-1).astype(np.uint64))
        stashes = []
        for _ in range(2):
            (cnt,) = struct.unpack_from("<I", blob, off)
            off += 4
            stashes.append(np.frombuffer(blob, dtype="<u8", count=cnt,
                                         offset=off).astype(np.uint64))
            off += cnt * 8
        return cls(log, entropy, data, stashes)

    def __contains__(self, k: int) -> bool:
        return self.find_hash(k)
