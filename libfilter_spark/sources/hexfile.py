"""HIBP-style hex-digest file ingest.

The reference's only real-data pipeline reads a text file of hex
hashes, one per line, and keys the filter on 64 bits of each digest
(``cpp/extras/benchmarks/hibp.cpp:66-129``; the paper's 847M-password
case study, BASELINE.md §B). This source reproduces that ingest on
Spark: ``spark.read.text`` scales to any number of splits, key
derivation is JVM-side.

The reference uses the LOW 64 bits of SHA-1 (hibp.cpp:85-90,
taffy.tex:1783); we take the same: the last 16 hex chars of the
digest line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spark.keys import KEY_COL


def read_hex_hashes(spark: SparkSession, path: str,
                    key_col: str = KEY_COL) -> DataFrame:
    """Text file of hex digests (one per line, optional ``HASH:count``
    suffix like real HIBP dumps) → DataFrame[key: binary(8)]."""
    lines = spark.read.text(path)
    digest = F.upper(F.split(F.col("value"), ":").getItem(0))
    low64 = F.substring(digest, -16, 16)
    return lines.select(F.unhex(low64).alias(key_col)) \
        .where(F.col(key_col).isNotNull() & (F.length(key_col) == 8))


def with_hibp_key(df: DataFrame, content_col: str,
                  key_col: str = KEY_COL) -> DataFrame:
    """Probe-side key derivation matching the hexfile ingest: LOW 64
    bits of sha256(content) — the reference keys HIBP filters on the
    low 64 digest bits (hibp.cpp:85-90), so a probe against a filter
    built from ``read_hex_hashes`` must take the same window (the
    standard ``with_content_key_bin`` takes the HIGH 64)."""
    digest = F.upper(F.sha2(F.col(content_col), 256))
    return df.withColumn(key_col,
                         F.unhex(F.substring(digest, -16, 16)))


def write_hex_hashes(df: DataFrame, content_col: str, path: str) -> None:
    """Sink: write sha256 digests of a column as an HIBP-style text
    file (round-trips through read_hex_hashes)."""
    df.select(F.upper(F.sha2(F.col(content_col), 256)).alias("value")) \
        .write.mode("overwrite").text(path)
