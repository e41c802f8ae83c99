"""Filter families with the libfilter API surface
(``create_with_bytes`` / ``create_with_ndv_fpp`` / ``add_hash`` /
``add_hashes`` / ``find_hash`` / ``find_hashes`` / ``union`` /
``serialize`` / ``deserialize`` / ``size_in_bytes``), each backed by
numpy batch kernels."""

from .block import BlockFilter, BlockSliceFilter
from .bloom import BloomFilter
from .minimal_taffy import MinimalTaffyCuckooFilter
from .static_xor import StaticXorFilter
from .taffy_block import TaffyBlockFilter
from .taffy_cuckoo import FrozenTaffyCuckooFilter, TaffyCuckooFilter

FAMILIES = {
    "block": BlockFilter,
    "block_slice": BlockSliceFilter,
    "bloom": BloomFilter,
    "taffy_block": TaffyBlockFilter,
    "taffy_cuckoo": TaffyCuckooFilter,
    "frozen_taffy_cuckoo": FrozenTaffyCuckooFilter,
    "static_xor": StaticXorFilter,
    "minimal_taffy_cuckoo": MinimalTaffyCuckooFilter,
}

__all__ = ["BlockFilter", "BlockSliceFilter", "BloomFilter",
           "TaffyBlockFilter", "TaffyCuckooFilter",
           "FrozenTaffyCuckooFilter", "StaticXorFilter",
           "MinimalTaffyCuckooFilter", "FAMILIES"]
