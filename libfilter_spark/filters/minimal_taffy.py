"""MinimalTaffyCuckooFilter — DySECT-style 32-level growable cuckoo
filter with smoother space growth.

Behavior-equivalent to the reference
(``/root/reference/c/include/filter/paths.h``,
``minimal-taffy-cuckoo.h``, ``c/lib/minimal-taffy-cuckoo.c``): 2 sides
× 32 levels × 4-slot buckets; slot = {long_fp:1, fingerprint:8/9,
tail:6}; each side carries TWO Feistel permutations (hi for full-width
keys, lo for one-bit-shorter keys — entropy offsets 0 and 6, the
reference's layout, minimal-taffy-cuckoo.c:31-32); a global cursor
marks which levels have doubled this round; upsize doubles only
``levels[cursor]`` and re-paths its contents (re_path may fork one
path into two when fingerprint bits run out, paths.h:165-211); when
the cursor wraps past 32 levels, log_side_size grows and hi/lo swap.

Union/freeze/serialize are absent upstream; we define serialization
(needed for UDAF state) but keep this family build+probe only — the
distributed merge path rebuilds (SURVEY.md §2.6).

Inserts are the reference's sequential algorithm (validated against
the compiled C); probes are vectorized over the four candidate paths.
"""

from __future__ import annotations

import struct

import numpy as np

from ..kernels.feistel import (PcgRandom, feistel_backward, feistel_forward,
                               feistel_forward_batch, is_prefix_of,
                               is_prefix_of_batch)

LOG_LEVELS = 5
LEVELS = 1 << LOG_LEVELS
HEAD = 9
TAIL = 5
SLOTS = 4
TAIL_MASK = (1 << (TAIL + 1)) - 1

ENTROPY24 = (
    0x2BA7538EE1234073, 0xFCC3777539B147D6, 0x6086C563576347E7,
    0x52EFF34EE1764465, 0x8639CBF57F264867, 0x5A31EE34F0224CCB,
    0x07A1CB8140744EE6, 0xF2296CF6A6524E9F, 0x28A31CEC9F6D4484,
    0x688F3FE9DE7245F6, 0x1DC17831966B41A2, 0xF227166E425E4B0C,
    0x4A2A62BAFC694440, 0x2E6BBEA775E3429D, 0x5687DD060BA64169,
    0xC5D95E8A38A44789, 0xD30480AB74084EDC, 0xD72483670EC14DF3,
    0x0414954940374787, 0x8CD86ADFDA93493F, 0x50D61C3272A24CCB,
    0x40CB1E4F0DA34CC3, 0xB88F09C3AF35472E, 0x8DE6D01BB8A849A5)

_MAGIC = b"MTC1"

# Path = (level, bucket, long_fp, fingerprint, tail) — plain tuples.
EMPTY = (0, 0, 0, 0, 0)


def _mask(w: int, x: int) -> int:
    return x & ((1 << w) - 1)


def to_path(raw: int, keys: tuple, cursor: int, low_level_size: int,
            full_is_short: bool) -> tuple:
    """paths.h:106-146. Returns a path tuple; tail==0 ⇒ invalid."""
    fis = 1 if full_is_short else 0
    pre_all = raw >> (64 - LOG_LEVELS - low_level_size - HEAD + fis - TAIL)
    raw_tail = _mask(TAIL, pre_all)
    pre = pre_all >> TAIL
    w = LOG_LEVELS + low_level_size + HEAD - fis
    hashed = feistel_forward(keys, w, pre)
    level = hashed >> (low_level_size + HEAD - fis)
    big_index = level < cursor
    if big_index and full_is_short:
        return (level, 0, 0, 0, 0)
    bi = 1 if big_index else 0
    bucket = _mask(low_level_size + bi, hashed >> (HEAD - fis - bi))
    long_fp = 0 if (big_index or full_is_short) else 1
    fp = _mask(HEAD - fis - bi, hashed)
    return (level, bucket, long_fp, fp, raw_tail * 2 + 1)


def from_path_no_tail(p: tuple, keys: tuple, level_size: int,
                      fp_size: int) -> int:
    """paths.h:151-163."""
    level, bucket, _, fp, _ = p
    hashed = (((level << level_size) | bucket) << fp_size) | fp
    pre = feistel_backward(keys, LOG_LEVELS + level_size + fp_size, hashed)
    return (pre << (64 - LOG_LEVELS - level_size - fp_size)) & ((1 << 64) - 1)


def re_path(p: tuple, from_short: tuple, from_long: tuple, to_short: tuple,
            to_long: tuple, log_from: int, log_to: int, from_cursor: int,
            to_cursor: int) -> tuple[tuple, tuple]:
    """paths.h:280-343 — translate a stored path to another coordinate
    system; may emit a second path. Returns (main, extra)."""
    level, bucket, long_fp, fp, tail = p
    upsize = bool(log_to - log_from)
    if level < from_cursor:
        key = from_path_no_tail(p, from_long, log_from + 1, HEAD - 1)
        q = to_path(key, to_long, to_cursor, log_to, False)
        return ((q[0], q[1], q[2], q[3], tail), EMPTY)
    if long_fp:
        key = from_path_no_tail(p, from_long, log_from, HEAD)
        q = to_path(key, to_short if upsize else to_long, to_cursor, log_to,
                    upsize)
        return ((q[0], q[1], q[2], q[3], tail), EMPTY)
    key = from_path_no_tail(p, from_short, log_from, HEAD - 1)
    q = to_path(key, to_short, to_cursor, log_to, True)
    if not upsize and q[0] >= to_cursor:
        return ((q[0], q[1], q[2], q[3], tail), EMPTY)
    if tail != 1 << TAIL:
        k = key | ((tail >> TAIL) << (64 - LOG_LEVELS - log_from - HEAD))
        q2 = to_path(k, to_long, to_cursor, log_to, False)
        return ((q2[0], q2[1], q2[2], q2[3], (tail << 1) & TAIL_MASK), EMPTY)
    out = to_path(key, to_long, to_cursor, log_to, False)
    out = (out[0], out[1], out[2], out[3], tail)
    k = key | (1 << (64 - LOG_LEVELS - log_from - HEAD))
    q2 = to_path(k, to_long, to_cursor, log_to, False)
    return ((q2[0], q2[1], q2[2], q2[3], tail), out)


def re_path_upsize(p: tuple, flo: tuple, fhi: tuple, log_size: int,
                   from_cursor: int) -> tuple[tuple, tuple]:
    """paths.h:213-272 — cursor-advance variant."""
    level, bucket, long_fp, fp, tail = p
    to_cursor = from_cursor + 1
    if level < from_cursor:
        key = from_path_no_tail(p, fhi, log_size + 1, HEAD - 1)
        q = to_path(key, fhi, to_cursor, log_size, False)
        return ((q[0], q[1], q[2], q[3], tail), EMPTY)
    if long_fp:
        key = from_path_no_tail(p, fhi, log_size, HEAD)
        q = to_path(key, fhi, to_cursor, log_size, False)
        return ((q[0], q[1], q[2], q[3], tail), EMPTY)
    key = from_path_no_tail(p, flo, log_size, HEAD - 1)
    q = to_path(key, flo, to_cursor, log_size, True)
    if q[0] >= to_cursor:
        return ((q[0], q[1], q[2], q[3], tail), EMPTY)
    if tail != 1 << TAIL:
        k = key | ((tail >> TAIL) << (64 - LOG_LEVELS - log_size - HEAD))
        q2 = to_path(k, fhi, to_cursor, log_size, False)
        return ((q2[0], q2[1], q2[2], q2[3], (tail << 1) & TAIL_MASK), EMPTY)
    out = to_path(key, fhi, to_cursor, log_size, False)
    out = (out[0], out[1], out[2], out[3], tail)
    k = key | (1 << (64 - LOG_LEVELS - log_size - HEAD))
    q2 = to_path(k, fhi, to_cursor, log_size, False)
    return ((q2[0], q2[1], q2[2], q2[3], tail), out)


class _Side:
    __slots__ = ("hi", "lo", "levels", "stash")

    def __init__(self, log_level_size: int, keys12: tuple):
        self.hi = ((keys12[0], keys12[1]), (keys12[2], keys12[3]))
        self.lo = ((keys12[6], keys12[7]), (keys12[8], keys12[9]))
        # level slot = long_fp | fp<<1 | tail<<10 packed in uint16
        self.levels = [np.zeros((1 << log_level_size, SLOTS), dtype=np.uint16)
                       for _ in range(LEVELS)]
        self.stash: list[tuple] = []


def _pack(long_fp: int, fp: int, tail: int) -> int:
    return long_fp | (fp << 1) | (tail << 10)


def _unpack(v: int) -> tuple[int, int, int]:
    return (v & 1, (v >> 1) & 0x1FF, v >> 10)


class MinimalTaffyCuckooFilter:
    __slots__ = ("log_side_size", "cursor", "sides", "rng", "entropy",
                 "occupied")

    FAMILY = "minimal_taffy_cuckoo"

    def __init__(self, log_side_size: int = 0, entropy: tuple = ENTROPY24):
        self.log_side_size = log_side_size
        self.cursor = 0
        self.entropy = entropy
        self.sides = [_Side(log_side_size, entropy[0:12]),
                      _Side(log_side_size, entropy[12:24])]
        self.rng = PcgRandom(2)
        self.occupied = 0

    @classmethod
    def create_with_bytes(cls, bytes_: int) -> "MinimalTaffyCuckooFilter":
        # the reference ignores bytes and starts at log_side_size=0
        # (minimal-taffy-cuckoo.c:83-102)
        del bytes_
        return cls(0)

    @classmethod
    def create(cls, ndv: int, fpp: float = 0.01) -> "MinimalTaffyCuckooFilter":
        del ndv, fpp
        return cls(0)

    @property
    def capacity(self) -> int:
        return 2 + 2 * SLOTS * ((1 << self.log_side_size) * LEVELS
                                + (1 << self.log_side_size) * self.cursor)

    # --- insert ---------------------------------------------------------
    def _level_insert(self, side: _Side, p: tuple) -> tuple:
        level, bucket, long_fp, fp, tail = p
        lv = side.levels[level]
        row = lv[bucket]
        want = _pack(long_fp, fp, tail)
        for i in range(SLOTS):
            v = int(row[i])
            if (v >> 10) == 0:
                row[i] = want
                return (level, bucket, long_fp, fp, 0)
            slf, sfp, st = _unpack(v)
            if slf == long_fp and sfp == fp and is_prefix_of(st, tail):
                return p
        i = self.rng.get()
        victim = int(row[i])
        row[i] = want
        vlf, vfp, vt = _unpack(victim)
        return (level, bucket, vlf, vfp, vt)

    def _insert_detail(self, side: int, p: tuple, ttl: int) -> None:
        """minimal-taffy-cuckoo.h:183-230."""
        while True:
            for j in range(2):
                i = side if j == 0 else 1 - side
                ttl -= 1
                if ttl < 0:
                    self.sides[i].stash.append(p)
                    self.occupied += 1
                    return
                q = p
                r = self._level_insert(self.sides[i], p)
                if r[4] == 0:
                    self.occupied += 1
                    return
                if r == q:
                    return
                nxt, extra = re_path(
                    r, self.sides[i].lo, self.sides[i].hi,
                    self.sides[1 - i].lo, self.sides[1 - i].hi,
                    self.log_side_size, self.log_side_size,
                    self.cursor, self.cursor)
                if extra[4] != 0:
                    self._insert_detail(1 - i, extra, ttl)
                p = nxt

    def add_hash(self, k: int) -> bool:
        while (self.occupied > 0.9 * self.capacity
               or self.occupied + 4 >= self.capacity
               or len(self.sides[0].stash) + len(self.sides[1].stash) > 8):
            self._upsize()
        p = to_path(int(k), self.sides[0].hi, self.cursor,
                    self.log_side_size, False)
        self._insert_detail(0, p, 128)
        return True

    def add_hashes_exact(self, hashes: np.ndarray) -> None:
        """Per-key inserts in the reference's exact order — bit-identical
        state to the C library."""
        for k in hashes:
            self.add_hash(int(k))

    # batch insert stays per-key for this family: the cursor-driven
    # per-level doubling grows capacity in 1/32 steps, which makes
    # chunked vectorized placement degenerate (measured 1.1 ms/key vs
    # 10 us/key scalar); a vectorized upsize+re_path is the round-2
    # item (SURVEY.md §8)
    add_hashes = add_hashes_exact

    # --- growth -----------------------------------------------------------
    def _upsize(self) -> None:
        """minimal-taffy-cuckoo.c:105-194: double only levels[cursor]."""
        old_level = [self.sides[0].levels[self.cursor],
                     self.sides[1].levels[self.cursor]]
        for i in range(2):
            self.sides[i].levels[self.cursor] = np.zeros(
                (2 << self.log_side_size, SLOTS), dtype=np.uint16)
        self.cursor += 1
        old_stash = [self.sides[0].stash, self.sides[1].stash]
        self.sides[0].stash = []
        self.sides[1].stash = []
        self.occupied -= len(old_stash[0]) + len(old_stash[1])
        for s in range(2):
            for p in old_stash[s]:
                r, q = re_path_upsize(p, self.sides[s].lo, self.sides[s].hi,
                                      self.log_side_size, self.cursor - 1)
                if q[4] != 0:
                    self._insert_detail(s, q, 128)
                self._insert_detail(s, r, 128)
        for s in range(2):
            data = old_level[s]
            for b in range(data.shape[0]):
                for j in range(SLOTS):
                    v = int(data[b, j])
                    if (v >> 10) == 0:
                        continue
                    self.occupied -= 1
                    lf, fp, tail = _unpack(v)
                    p = (self.cursor - 1, b, lf, fp, tail)
                    r, q = re_path_upsize(p, self.sides[s].lo,
                                          self.sides[s].hi,
                                          self.log_side_size,
                                          self.cursor - 1)
                    if q[4] != 0:
                        self._insert_detail(s, q, 128)
                    self._insert_detail(s, r, 128)
        if self.cursor == LEVELS:
            self.cursor = 0
            self.log_side_size += 1
            for i in range(2):
                self.sides[i].lo, self.sides[i].hi = \
                    self.sides[i].hi, self.sides[i].lo
            # levels were doubled one-by-one; all now have the new size

    # --- probe ------------------------------------------------------------
    def _side_find(self, side: _Side, p: tuple) -> bool:
        level, bucket, long_fp, fp, tail = p
        for (sl, sb, slf, sfp, st) in side.stash:
            if st != 0 and slf == long_fp and sfp == fp \
                    and sl == level and sb == bucket \
                    and is_prefix_of(st, tail):
                return True
        row = side.levels[level][bucket]
        for i in range(SLOTS):
            v = int(row[i])
            if (v >> 10) == 0:
                continue
            vlf, vfp, vt = _unpack(v)
            if vlf == long_fp and vfp == fp and is_prefix_of(vt, tail):
                return True
        return False

    def find_hash(self, k: int) -> bool:
        k = int(k)
        for i in range(2):
            p = to_path(k, self.sides[i].lo, self.cursor,
                        self.log_side_size, True)
            if p[4] != 0 and self._side_find(self.sides[i], p):
                return True
            p = to_path(k, self.sides[i].hi, self.cursor,
                        self.log_side_size, False)
            if p[4] != 0 and self._side_find(self.sides[i], p):
                return True
        return False

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized 4-way probe (2 sides × {lo, hi} permutations)."""
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64, copy=False)
        out = np.zeros(n, dtype=bool)
        for i in range(2):
            side = self.sides[i]
            for keys, fis in ((side.lo, True), (side.hi, False)):
                out |= self._find_batch_one(side, h, keys, fis)
        return out

    def _find_batch_one(self, side: _Side, h: np.ndarray, keys: tuple,
                        full_is_short: bool) -> np.ndarray:
        low = self.log_side_size
        fis = 1 if full_is_short else 0
        pre_all = h >> np.uint64(64 - LOG_LEVELS - low - HEAD + fis - TAIL)
        raw_tail = (pre_all & np.uint64((1 << TAIL) - 1)).astype(np.int64)
        pre = pre_all >> np.uint64(TAIL)
        w = LOG_LEVELS + low + HEAD - fis
        hashed = feistel_forward_batch(keys, w, pre)
        level = (hashed >> np.uint64(low + HEAD - fis)).astype(np.int64)
        big = level < self.cursor
        valid = ~(big & full_is_short)
        bi = big.astype(np.int64)
        bucket = (hashed >> (np.uint64(HEAD - fis) - bi.astype(np.uint64))) \
            .astype(np.int64) & ((np.int64(1) << (low + bi)) - 1)
        long_fp = ((~big) & (not full_is_short)).astype(np.int64)
        fp = hashed.astype(np.int64) & ((np.int64(1) << (HEAD - fis - bi)) - 1)
        ptail = raw_tail * 2 + 1
        out = np.zeros(len(h), dtype=bool)
        # gather per level (≤32 distinct levels)
        for lvl in np.unique(level[valid]):
            mask = valid & (level == lvl)
            rows = side.levels[lvl][bucket[mask]].astype(np.int64)  # (m,4)
            slf = rows & 1
            sfp = (rows >> 1) & 0x1FF
            st = rows >> 10
            ok = (st != 0) & (slf == long_fp[mask][:, None]) \
                & (sfp == fp[mask][:, None]) \
                & is_prefix_of_batch(np.maximum(st, 1),
                                     ptail[mask][:, None])
            sub = ok.any(axis=1)
            idx = np.flatnonzero(mask)
            out[idx[sub]] = True
        for (sl, sb, slf, sfp, st) in side.stash:
            if st == 0:
                continue
            cand = valid & (level == sl) & (bucket == sb) \
                & (long_fp == slf) & (fp == sfp)
            if cand.any():
                cand &= is_prefix_of_batch(
                    np.full(len(h), st, dtype=np.int64), ptail)
                out |= cand
        return out

    # --- serde / lifecycle -------------------------------------------------
    def size_in_bytes(self) -> int:
        return 2 * self.capacity + 2 * (24 - 2)

    def serialize(self) -> bytes:
        parts = [_MAGIC,
                 struct.pack("<BBQ", self.log_side_size, self.cursor,
                             self.occupied),
                 struct.pack("<QQIi", self.rng.state, self.rng.inc,
                             self.rng.current, self.rng.remaining_bits),
                 struct.pack("<24Q", *self.entropy)]
        for s in range(2):
            # hi/lo swap on cursor wrap must survive serde — store the
            # effective keys, not just the entropy table
            side = self.sides[s]
            parts.append(struct.pack(
                "<8Q", side.hi[0][0], side.hi[0][1], side.hi[1][0],
                side.hi[1][1], side.lo[0][0], side.lo[0][1],
                side.lo[1][0], side.lo[1][1]))
        for s in range(2):
            side = self.sides[s]
            for lvl_i, lv in enumerate(side.levels):
                parts.append(struct.pack("<I", lv.shape[0]))
                parts.append(lv.astype("<u2").tobytes())
            parts.append(struct.pack("<I", len(side.stash)))
            for (l, b, lf, fp, t) in side.stash:
                parts.append(struct.pack("<BQBHH", l, b, lf, fp, t))
        return b"".join(parts)

    @classmethod
    def deserialize(cls, blob: bytes) -> "MinimalTaffyCuckooFilter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a minimal taffy cuckoo blob")
        off = 4
        log, cursor, occupied = struct.unpack_from("<BBQ", blob, off)
        off += struct.calcsize("<BBQ")
        st, inc, cur, rem = struct.unpack_from("<QQIi", blob, off)
        off += struct.calcsize("<QQIi")
        entropy = struct.unpack_from("<24Q", blob, off)
        off += 24 * 8
        f = cls(log, entropy)
        f.cursor = cursor
        f.occupied = occupied
        f.rng.state, f.rng.inc = st, inc
        f.rng.current, f.rng.remaining_bits = cur, rem
        for s in range(2):
            k = struct.unpack_from("<8Q", blob, off)
            off += 64
            f.sides[s].hi = ((k[0], k[1]), (k[2], k[3]))
            f.sides[s].lo = ((k[4], k[5]), (k[6], k[7]))
        for s in range(2):
            side = f.sides[s]
            for i in range(LEVELS):
                (nb,) = struct.unpack_from("<I", blob, off)
                off += 4
                side.levels[i] = np.frombuffer(
                    blob, dtype="<u2", count=nb * SLOTS, offset=off) \
                    .astype(np.uint16).reshape(nb, SLOTS).copy()
                off += nb * SLOTS * 2
            (cnt,) = struct.unpack_from("<I", blob, off)
            off += 4
            stash = []
            for _ in range(cnt):
                l, b, lf, fp, t = struct.unpack_from("<BQBHH", blob, off)
                off += struct.calcsize("<BQBHH")
                stash.append((l, b, lf, fp, t))
            side.stash = stash
        return f

    def __eq__(self, other) -> bool:
        return (isinstance(other, MinimalTaffyCuckooFilter)
                and self.log_side_size == other.log_side_size
                and self.cursor == other.cursor
                and self.occupied == other.occupied
                and all(a.stash == b.stash
                        and a.hi == b.hi and a.lo == b.lo
                        and all(np.array_equal(x, y)
                                for x, y in zip(a.levels, b.levels))
                        for a, b in zip(self.sides, other.sides)))

    def __hash__(self):  # pragma: no cover
        return hash(self.serialize())

    def __contains__(self, k: int) -> bool:
        return self.find_hash(k)

    def union(self, other):  # pragma: no cover
        raise NotImplementedError(
            "upstream has no MTCF union (SURVEY.md §2.6); the distributed "
            "path rebuilds from merged keys instead")
