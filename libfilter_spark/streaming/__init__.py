"""Structured Streaming incremental filter builds."""

from .build import stream_build_filters

__all__ = ["stream_build_filters"]
