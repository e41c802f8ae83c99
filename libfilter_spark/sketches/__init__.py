"""Companion mergeable sketches (north-rule additions; not in the
reference libfilter): HyperLogLog distinct-count, CountMin frequency,
KLL quantiles, t-digest quantiles. All share the filter families'
merge contract: ``create / update_batch / merge / serialize /
deserialize``, with commutative+associative merges. HLL (max-lattice)
and CountMin (counter-sum) are byte-identical under any merge order;
KLL/t-digest are deterministic functions of their merge tree and
estimate-equivalent within their published error bounds (asserted in
tests)."""

from .hll import HyperLogLog
from .countmin import CountMinSketch
from .kll import KLLSketch
from .tdigest import TDigest

SKETCHES = {
    "hll": HyperLogLog,
    "countmin": CountMinSketch,
    "kll": KLLSketch,
    "tdigest": TDigest,
}

__all__ = ["HyperLogLog", "CountMinSketch", "KLLSketch", "TDigest",
           "SKETCHES"]
