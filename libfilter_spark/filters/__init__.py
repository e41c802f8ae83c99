"""Filter families with the libfilter API surface
(``create_with_bytes`` / ``create_with_ndv_fpp`` / ``add_hash`` /
``add_hashes`` / ``find_hash`` / ``find_hashes`` / ``union`` /
``serialize`` / ``deserialize`` / ``size_in_bytes``), each backed by
numpy batch kernels."""

from .block import BlockFilter
from .taffy_block import TaffyBlockFilter

FAMILIES = {
    "block": BlockFilter,
    "taffy_block": TaffyBlockFilter,
}

__all__ = ["BlockFilter", "TaffyBlockFilter", "FAMILIES"]
