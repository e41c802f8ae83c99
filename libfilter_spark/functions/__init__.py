"""Training-data pipeline operations over document tables: text
analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, and multimodal column
plumbing. Hot paths are JVM expressions or Arrow-vectorized kernels —
no per-row Python."""
