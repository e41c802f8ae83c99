"""Incremental filter build over a stream.

Maps the reference's growable-filter insert loop
(``taffy-block.h:35-40``, ``taffy-cuckoo.h:390-400``) onto Structured
Streaming: each micro-batch builds partial filters (map-side, same
kernels as batch) and merges them into a persistent state table via
``foreachBatch`` — growth across batches is exactly the taffy
"incremental doubling" in distributed form, and the mergeable-UDAF
contract is what makes read-modify-write state correct.

State layout: ``state_dir/current`` holds one parquet row per group
(family, params, n_keys, n_partials, filter). Each batch rewrites it
atomically (write to ``state_dir/next-<epoch>``, then repoint a
manifest), so a crashed batch never corrupts state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spark.build import build_filters, merge_filter_blobs


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "MANIFEST.json")


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    mp = _manifest_path(state_dir)
    if not os.path.exists(mp):
        return None
    with open(mp) as fh:
        current = json.load(fh)["current"]
    return spark.read.parquet(os.path.join(state_dir, current))


def _write_state(df: DataFrame, state_dir: str, epoch: int) -> None:
    name = f"state-{epoch:010d}"
    df.write.mode("overwrite").parquet(os.path.join(state_dir, name))
    tmp = _manifest_path(state_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"current": name, "epoch": epoch}, fh)
    os.replace(tmp, _manifest_path(state_dir))


def stream_build_filters(stream_df: DataFrame, group_cols: list[str] | None,
                         state_dir: str, checkpoint_dir: str,
                         key_col: str = "key", family: str = "taffy_block",
                         ndv: int = 4096, fpp: float = 0.01,
                         trigger_seconds: float | None = None):
    """Start a streaming query that folds every micro-batch into the
    persistent per-group filter state. Returns the StreamingQuery."""
    group_cols = list(group_cols or [])
    os.makedirs(state_dir, exist_ok=True)

    def fold_batch(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # pin the partials strategy: the size router may pick `sharded`
        # for big global block builds, which returns a MULTI-ROW
        # block_slice shard frame — not unionByName/merge-compatible
        # with the single-row-per-group state this fold maintains
        batch_filters = build_filters(batch_df, group_cols, key_col,
                                      family=family, ndv=ndv, fpp=fpp,
                                      strategy="partials")
        prev = read_state(spark, state_dir)
        if prev is not None:
            from ..spark.build import estimate_filter_bytes
            merged = merge_filter_blobs(
                prev.unionByName(batch_filters), group_cols,
                est_bytes=estimate_filter_bytes(family, ndv, fpp))
        else:
            merged = batch_filters
        # materialize before overwrite (state read+write in one plan)
        rows = merged.collect()
        _write_state(spark.createDataFrame(rows, merged.schema),
                     state_dir, epoch)

    writer = (stream_df.writeStream
              .foreachBatch(fold_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
