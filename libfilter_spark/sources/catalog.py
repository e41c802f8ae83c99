"""Catalog-registered, partition-pruned table layer.

The north star's input is an Iceberg table of source-code repositories
partitioned for pruning. This sandbox ships no Iceberg runtime jar
(and no network to fetch one), so the layer is built on Spark's
SESSION CATALOG over a partitioned parquet warehouse — the identical
DataFrame/SQL call surface and the same Catalyst machinery an Iceberg
scan engages: partition pruning (PartitionFilters), predicate pushdown
(PushedFilters) and column pruning (ReadSchema) at the scan node,
asserted in tests/test_sources.py.

On a real cluster with iceberg-spark-runtime on the classpath, pass
``iceberg_catalog_conf()`` into SparkSession and the registration
switches to the Iceberg catalog — call sites are unchanged. The conf
keys below are the standard public Iceberg-on-Spark configuration.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table


def iceberg_catalog_conf(warehouse_dir: str,
                         catalog: str = "local") -> dict:
    """SparkSession config for a real Iceberg hadoop catalog — usable
    only where iceberg-spark-runtime is on the JVM classpath (NOT this
    sandbox; documented here so a cluster deployment is one conf swap)."""
    return {
        f"spark.sql.catalog.{catalog}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse_dir,
    }


def _source_fingerprint(sf_dir: str, source: str = "documents") -> str:
    """Content-identity tag for the source parquet: abspath + per-file
    (size, mtime_ns). Embedded in both the warehouse path and the
    catalog table name so a different sf_dir — or a REGENERATED source
    under the same path — can never be served a stale warehouse copy
    or a stale same-session table registration (the round-3 ADVICE
    medium finding)."""
    src = os.path.join(os.path.abspath(sf_dir), f"{source}.parquet")
    parts = [src]
    if os.path.isdir(src):
        for root, _, files in os.walk(src):
            for fn in sorted(files):
                try:
                    st = os.stat(os.path.join(root, fn))
                    parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
                except OSError:
                    pass
    elif os.path.exists(src):
        st = os.stat(src)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def _warehouse_path(tag: str, table: str) -> str:
    return os.path.join(tempfile.gettempdir(),
                        f"libfilter_warehouse_{tag}", table)


def register_partitioned_documents(spark: SparkSession, sf_dir: str,
                                   table: str = "documents_by_lang",
                                   partition_col: str = "lang") -> str:
    """Register the documents table in the session catalog as an
    external table partitioned by ``partition_col`` (hive-style
    directory layout) and return the REGISTERED NAME — which embeds a
    source fingerprint, so each (sf_dir, source content) pair gets its
    own table and warehouse copy. Idempotent per fingerprint: the
    partitioned copy is written once, the registration once per
    session (the in-memory session catalog does not persist).

    At 100 TB this is the layout decision that makes per-language
    pipelines cheap: a `WHERE lang = 'python'` scan lists ONE
    partition directory instead of reading row groups of every file —
    the same behavior an Iceberg partition spec provides, minus the
    snapshot/manifest metadata layer.
    """
    tag = _source_fingerprint(sf_dir)
    table = f"{table}_{tag}"
    if spark.catalog.tableExists(table):
        return table
    path = _warehouse_path(tag, table)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        docs = load_table(spark, sf_dir, "documents")
        (docs.write.partitionBy(partition_col)
         .mode("overwrite").parquet(path))
    # external table over the partitioned layout; RECOVER PARTITIONS
    # imports the hive-style directories into the catalog
    docs = load_table(spark, sf_dir, "documents")
    data_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in docs.schema.fields if f.name != partition_col)
    part_type = dict(
        (f.name, f.dataType.simpleString())
        for f in docs.schema.fields)[partition_col]
    spark.sql(
        f"CREATE TABLE `{table}` ({data_cols}) USING parquet "
        f"PARTITIONED BY (`{partition_col}` {part_type}) "
        f"LOCATION '{path}'")
    spark.sql(f"ALTER TABLE `{table}` RECOVER PARTITIONS")
    return table


def scan_documents_lang(spark: SparkSession, sf_dir: str, lang: str,
                        columns: list[str] | None = None) -> DataFrame:
    """Partition-pruned scan: reads only the ``lang=<x>`` directory
    (assert via .explain(): PartitionFilters carries the lang
    predicate, ReadSchema only the selected columns)."""
    table = register_partitioned_documents(spark, sf_dir)
    df = spark.table(table).where(F.col("lang") == lang)
    return df.select(*columns) if columns else df
