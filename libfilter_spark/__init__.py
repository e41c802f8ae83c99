"""libfilter_spark — a from-scratch PySpark-native approximate-membership
and sketch library with the capabilities of jbapple/libfilter.

Architecture (NOT a port): DataFrame + Arrow-vectorized numpy batch
kernels + mergeable filter/sketch state carried as binary blobs through
Spark's partial/final aggregate shape (``mapInPandas`` partial build →
``applyInPandas`` merge → broadcast probe semi-join).

Layers:
- ``kernels``   — pure numpy batch kernels, zero Spark imports.
- ``filters``   — filter families (Block, TaffyBlock, TaffyCuckoo,
                  StaticXor, MinimalTaffyCuckoo) with the libfilter
                  API surface (create/add/find/union/freeze/serialize).
- ``sketches``  — companion mergeable sketches (HLL, CountMin, KLL,
                  TDigest) sharing the same merge contract.
- ``spark``     — distributed build / merge / probe / checkpoint
                  plumbing over DataFrames.
- ``sources``   — deterministic synthetic source-code table + testdata
                  loaders.
- ``functions`` — training-data pipeline ops (dedup, similarity
                  search, text analysis, multimodal plumbing).
- ``streaming`` — Structured Streaming incremental filter build.
"""

__version__ = "0.1.0"
