"""Drop-in compatibility surface for users of the reference's Python
binding (``/root/reference/python/block.py`` and
``python/taffy_cuckoo.py``): same class names, same constructor
shapes, same ``+=`` / ``in`` operators — so a libfilter user can
switch imports and keep their code.

Reference usage it mirrors::

    import block
    f = block.Block(ndv, fpp)   # our: from libfilter_spark.compat import Block
    f += hash_value
    hash_value in f

Each class is a thin alias over the batch-kernel filters; everything
here also accepts numpy arrays through add_hashes/find_hashes.
"""

from __future__ import annotations

from .filters.block import BlockFilter
from .filters.taffy_block import TaffyBlockFilter
from .filters.taffy_cuckoo import FrozenTaffyCuckooFilter, TaffyCuckooFilter
from .filters.minimal_taffy import MinimalTaffyCuckooFilter
from .filters.static_xor import StaticXorFilter


class Block(BlockFilter):
    """python/block.py:5-16 shape: Block(ndv, fpp)."""

    def __init__(self, ndv: float, fpp: float):
        super().__init__(
            BlockFilter.create_with_ndv_fpp(ndv, fpp).state)


class TaffyBlock(TaffyBlockFilter):
    """go/java naming; growable, Taffy schedule."""

    def __init__(self, ndv: int = 1, fpp: float = 0.01):
        t = TaffyBlockFilter.create(ndv, fpp)
        super().__init__(t.ndv0, t.fpp_goal, t.levels, t.ttl, t.last_ndv)


class TaffyCuckoo(TaffyCuckooFilter):
    """python/taffy_cuckoo.py:5-16 shape: TaffyCuckoo(bytes)."""

    def __init__(self, bytes_: int = 64):
        t = TaffyCuckooFilter.create_with_bytes(bytes_)
        super().__init__(t.log_side_size, t.entropy)

    def freeze(self) -> "FrozenTaffyCuckoo":
        fr = super().freeze()
        out = FrozenTaffyCuckoo.__new__(FrozenTaffyCuckoo)
        FrozenTaffyCuckooFilter.__init__(out, fr.log_side_size, fr.entropy,
                                         fr.data, fr.stashes)
        return out


class FrozenTaffyCuckoo(FrozenTaffyCuckooFilter):
    """python/taffy_cuckoo.py:29-38: probe-only frozen filter."""


class MinimalTaffyCuckoo(MinimalTaffyCuckooFilter):
    def __init__(self, bytes_: int = 1):
        t = MinimalTaffyCuckooFilter.create_with_bytes(bytes_)
        super().__init__(t.log_side_size, t.entropy)


def Union(x, y):
    """cpp Union(x, y) free function (taffy-cuckoo.hpp:114-116)."""
    return x.union(y)


__all__ = ["Block", "TaffyBlock", "TaffyCuckoo", "FrozenTaffyCuckoo",
           "MinimalTaffyCuckoo", "StaticXorFilter", "Union"]
