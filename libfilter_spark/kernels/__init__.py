"""Pure numpy batch kernels. No Spark imports anywhere in this package —
these are unit-testable alone and are the vectorized analogue of the
reference's scalar/SIMD C kernels (SURVEY.md §2)."""
