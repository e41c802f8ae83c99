"""Input sources: deterministic synthetic source-code repository table
(the BASELINE.json ``input_hint`` shape) and testdata parquet loaders."""

from .codegen import source_code_table
from .tables import load_table, TABLES

__all__ = ["source_code_table", "load_table", "TABLES"]
