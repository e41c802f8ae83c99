"""Filter sizing model — the "planner" math of the block Bloom family.

Re-derivation of the Putze et al. equation-3 FPP model and its
exponential+binary-search inverses, matching the behavior of the
reference implementation (see ``/root/reference/c/lib/util.c:5-81``,
wrappers ``c/lib/block.c:8-18``) with the block-filter constants
word_bits=32, bucket_words=8, hash_bits=32.

The model: a split-block Bloom filter with b-word buckets has per-key
load distributed Poisson(lambda) where lambda = bucket_bits / bits_per_key.
FPP = E_i~Poisson(lam) [ (1 - (1-1/word_bits)^i)^bucket_words ]
      + collision term i * 2^-hash_bits  (two keys sharing all hash bits).
"""

from __future__ import annotations

import functools
import math

WORD_BITS = 32
BUCKET_WORDS = 8
HASH_BITS = 32
BUCKET_BYTES = WORD_BITS * BUCKET_WORDS // 8  # 32 bytes per bucket

_MAX_J = 10000


def block_fpp(ndv: float, bytes_: float, word_bits: float = WORD_BITS,
              bucket_words: float = BUCKET_WORDS,
              hash_bits: float = HASH_BITS) -> float:
    """Model false-positive probability of a split-block Bloom filter
    holding ``ndv`` distinct keys in ``bytes_`` bytes.

    Behavior-equivalent to ``libfilter_block_fpp`` (reference
    ``c/lib/util.c:5-34``): Poisson mixture over per-bucket load, summed
    low-index-last for float stability, plus a hash-collision term.
    """
    if ndv == 0:
        return 0.0
    if bytes_ <= 0:
        return 1.0
    if ndv / (bytes_ * 8) > 3:
        return 1.0

    lam = bucket_words * word_bits / ((bytes_ * 8) / ndv)
    loglam = math.log(lam)
    log1collide = -hash_bits * math.log(2.0)

    # Only Poisson terms whose exp() does not underflow to exactly 0.0
    # can contribute; both addends carry a non-positive offset on top of
    # logp (logfinner <= 0; logcollide <= log(MAX_J) + log1collide < 0
    # for hash_bits >= 14), so any i with logp < -746 contributes two
    # exact float zeros — skipping them leaves the float sum unchanged.
    # logp(i) = i*loglam - lam - lgamma(i+1) is unimodal with mode ~lam.
    cutoff = -746.0 - max(0.0, math.log(_MAX_J) + log1collide)

    def logp(i: int) -> float:
        return i * loglam - lam - math.lgamma(i + 1)

    spread = math.sqrt(2 * (-cutoff) * max(lam, 1.0)) + 64.0
    while True:
        i_lo = max(0, int(lam - spread))
        i_hi = min(_MAX_J - 1, int(lam + spread))
        ok_lo = i_lo == 0 or logp(i_lo) < cutoff
        ok_hi = i_hi == _MAX_J - 1 or logp(i_hi) < cutoff
        if ok_lo and ok_hi:
            break
        spread *= 2.0

    result = 0.0
    # iterate descending (smallest high-tail terms first), matching the
    # reference's accumulation order for bit-identical float sums
    for i in range(i_hi, max(i_lo, 1) - 1, -1):
        lp = i * loglam - lam - math.lgamma(i + 1)
        # log(1 - pow(...)) spelled exactly as the C model (not log1p)
        # so float results stay bit-identical to the reference libm path
        logfinner = bucket_words * math.log(1.0 - (1.0 - 1.0 / word_bits) ** i)
        logcollide = math.log(i) + log1collide
        result += math.exp(lp + logfinner) + math.exp(lp + logcollide)
    # the i == 0 term is exactly 0 (log(0) = -inf twice in the C model)
    return min(result, 1.0)


@functools.lru_cache(maxsize=4096)
def block_bytes_needed(ndv: float, fpp: float, word_bits: float = WORD_BITS,
                       bucket_words: float = BUCKET_WORDS,
                       hash_bits: float = HASH_BITS) -> int:
    """Minimum bytes for a block filter to hold ``ndv`` keys at ``fpp``.

    Exponential search up, then binary search down, rounded up to whole
    buckets — behavior of ``libfilter_block_bytes_needed``
    (reference ``c/lib/util.c:36-58``).

    Memoized: the pure search costs ~9 ms (dozens of ``block_fpp``
    series evaluations) and grouped builds call it once per
    (task, group) with identical arguments — 32 tasks × 10³ groups
    measured ~20 s of wall in sizing alone before the cache.
    """
    bucket_bytes = int(word_bits * bucket_words) // 8
    result = 1
    while block_fpp(ndv, result, word_bits, bucket_words, hash_bits) > fpp:
        if result * 2 < result:  # pragma: no cover - overflow guard parity
            return result
        result *= 2
    if result <= bucket_bytes:
        return bucket_bytes
    lo = 0
    while lo + 1 < result:
        mid = lo + (result - lo) // 2
        test = block_fpp(ndv, mid, word_bits, bucket_words, hash_bits)
        if test < fpp:
            result = mid
        elif test == fpp:
            return ((mid + bucket_bytes - 1) // bucket_bytes) * bucket_bytes
        else:
            lo = mid
    return ((result + bucket_bytes - 1) // bucket_bytes) * bucket_bytes


def block_capacity(bytes_: int, fpp: float, word_bits: float = WORD_BITS,
                   bucket_words: float = BUCKET_WORDS,
                   hash_bits: float = HASH_BITS) -> int:
    """Max ndv a ``bytes_``-sized block filter holds at ``fpp`` —
    behavior of ``libfilter_block_capacity`` (reference
    ``c/lib/util.c:60-81``)."""
    result = 1
    while block_fpp(result, bytes_, word_bits, bucket_words, hash_bits) < fpp:
        result *= 2
    if result == 1:
        return 0
    lo = 0
    while lo + 1 < result:
        mid = lo + (result - lo) // 2
        test = block_fpp(mid, bytes_, word_bits, bucket_words, hash_bits)
        if test < fpp:
            lo = mid
        elif test == fpp:
            return mid
        else:
            result = mid
    return lo
