"""Benchmark harness — prints ONE JSON line.

Runs the registered driver-contract queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus
synthetic filter build/probe throughput sweeps (the reference's own
headline metric: keys/sec — BASELINE.md §A).

Extra fields beyond the required contract: per-second key throughputs
for build and probe, so rounds are comparable against the reference's
28.6 ns/key (block insert) and 86.5 ns/key (block lookup) anchors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BUILD_KEYS = int(os.environ.get("SPARK_GRAFT_BENCH_KEYS", 5_000_000))


def synth_keys(spark, n: int):
    """n deterministic sha256-derived keys, JVM-side derivation
    (binary fast path — no per-row Python, no decimal math)."""
    from pyspark.sql import functions as F
    from libfilter_spark.spark.keys import with_content_key_bin
    df = spark.range(0, n).withColumn("content",
                                      F.col("id").cast("string"))
    return with_content_key_bin(df, "content").select("key")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from libfilter_spark.spark.session import get_spark
    from libfilter_spark.spark.build import build_filters
    from libfilter_spark.spark.probe import probe_with_filters
    import __spark_entry__ as entrymod

    spark = get_spark("libfilter-bench", cpus=cpus)
    spark.range(1 << 20).count()  # JVM warmup
    import pandas as _pd

    def _warm(batches):
        for _ in batches:
            pass
        yield _pd.DataFrame({"n": [0]})
    # warm the Python workers BEFORE the query loop so the first query
    # doesn't absorb 32 worker startups into its recorded time
    spark.range(1 << 16).mapInPandas(_warm, schema="n long").count()

    # min-of-2 back-to-back trials per query (the reference's min-of-N
    # methodology, taffy.tex:1787): this sandbox's CPU throttle swings
    # identical single-shot work up to ~7x, so the minimum is the
    # stable signal
    queries: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        queries[name] = round(best, 3)

    extras: dict[str, float] = {}
    # --- filter build throughput (global block filter, fpp=0.004 like
    # the reference growth sweep); min-of-2 after a worker warmup pass
    # (matches the reference's min-of-N methodology, taffy.tex:1787) ---
    keys = synth_keys(spark, BUILD_KEYS)
    keys.count()  # materialize the parquet-free input path once (warm)
    import pandas as pd

    def _noop(batches):
        for _ in batches:
            pass
        yield pd.DataFrame({"n": [0]})
    keys.mapInPandas(_noop, schema="n long").count()  # warm py workers

    build_s = float("inf")
    blob_rows = None
    filters = None
    for _ in range(2):
        t0 = time.perf_counter()
        filters = build_filters(keys, group_cols=None, ndv=BUILD_KEYS,
                                fpp=0.004)
        blob_rows = filters.collect()
        build_s = min(build_s, time.perf_counter() - t0)
    extras["build_block_keys_per_sec"] = round(BUILD_KEYS / build_s)
    extras["build_block_sec"] = round(build_s, 3)
    extras["build_block_filter_bytes"] = sum(
        len(r["filter"]) for r in blob_rows)
    extras["build_block_strategy"] = (
        "sharded" if "__shard" in filters.columns else "partials")
    queries["build_block_5m"] = round(build_s, 3)

    # --- probe throughput (broadcast + vectorized membership) ----------
    # a sharded build returns a MULTI-ROW block_slice frame — probe it
    # as-is (probe_with_filters auto-routes shard frames); a partials
    # build returns one mergeable row
    if "__shard" in filters.columns:
        filters_df = spark.createDataFrame(blob_rows, filters.schema)
    else:
        blob_row = blob_rows[0]
        filters_df = spark.createDataFrame(
            [(blob_row["family"], blob_row["params"], blob_row["n_keys"],
              blob_row["n_partials"], blob_row["filter"])],
            "family string, params string, n_keys long, n_partials long, "
            "filter binary")
    probe_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        found = (probe_with_filters(keys, filters_df, group_cols=None)
                 .where("maybe_seen").count())
        probe_s = min(probe_s, time.perf_counter() - t0)
        assert found == BUILD_KEYS, f"false negatives: {found}"
    extras["probe_block_keys_per_sec"] = round(BUILD_KEYS / probe_s)
    queries["probe_block_5m"] = round(probe_s, 3)

    # --- per-family build/probe rates (reference BASELINE.md §A/§B
    # reports per-family numbers; 1M keys keeps the round fast) -------
    import numpy as np

    from libfilter_spark.filters import (StaticXorFilter, TaffyBlockFilter,
                                         TaffyCuckooFilter)
    from libfilter_spark.kernels.keys import splitmix64

    fam_keys = splitmix64(1_000_000, seed=99)
    absent = splitmix64(2_000_000, seed=99)[1_000_000:]

    def time_family(name, build_fn, probe_target=None, trials=3):
        # min-of-N in-process: this sandbox's CPU throttle swings
        # single-shot timings up to ~7x (a single-trial MTCF record
        # once read 5931 ns/key against a reproducible 1.3-2.1 µs) —
        # the minimum over back-to-back trials is the stable signal
        b = p = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            f = build_fn()
            b = min(b, time.perf_counter() - t0)
            target = probe_target(f) if probe_target else f
            t0 = time.perf_counter()
            assert target.find_hashes(fam_keys).all()
            target.find_hashes(absent)
            p = min(p, time.perf_counter() - t0)
        extras[f"{name}_build_ns_per_key"] = round(b * 1000)  # 1M keys
        extras[f"{name}_probe_ns_per_key"] = round(p * 500)   # 2M probes

    def build_tcf():
        f = TaffyCuckooFilter.create(1_000_000)
        f.add_hashes(fam_keys)
        return f

    def build_tbf():
        f = TaffyBlockFilter.create(1_000_000, 0.01)
        f.add_hashes(fam_keys)
        return f

    def build_tcf_grown():
        f = TaffyCuckooFilter.create_with_bytes(64)
        f.add_hashes(fam_keys)
        return f

    def build_mtcf():
        from libfilter_spark.filters import MinimalTaffyCuckooFilter
        f = MinimalTaffyCuckooFilter.create_with_bytes(1)
        f.add_hashes(fam_keys)
        return f

    time_family("taffy_cuckoo", build_tcf)
    time_family("taffy_cuckoo_grown", build_tcf_grown)
    time_family("frozen_tcf", build_tcf, probe_target=lambda f: f.freeze())
    time_family("taffy_block", build_tbf)
    time_family("minimal_taffy", build_mtcf)
    time_family("static_xor", lambda: StaticXorFilter.construct(fam_keys),
                trials=2)  # the slowest build; 2 trials bound the round

    # --- frozen-TCF forest serving (r5): the reference freezes TCFs
    # for read-only probing (taffy-cuckoo.c:127-160, the HIBP shape) —
    # measure the distributed probe against frozen vs live shards at
    # equal answers (zero FN asserted both ways) -----------------------
    from libfilter_spark.spark.forest import (build_filter_forest,
                                              probe_with_forest)
    n_forest = 2_000_000
    try:
        cpus_i = int(cpus)
    except ValueError:
        cpus_i = 16
    fkeys = synth_keys(spark, n_forest)
    fkeys.count()
    for tag, frz in (("live", False), ("frozen", True)):
        forest = build_filter_forest(fkeys, "key", "taffy_cuckoo",
                                     ndv=n_forest, fpp=0.004,
                                     n_shards=2 * cpus_i,
                                     freeze=frz)
        rows = forest.collect()
        fdf = spark.createDataFrame(rows, forest.schema).cache()
        fdf.count()
        p = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            found = probe_with_forest(fkeys, fdf, "key") \
                .where("maybe_seen").count()
            p = min(p, time.perf_counter() - t0)
            assert found == n_forest, (tag, found)
        extras[f"tcf_forest_{tag}_probe_keys_per_sec"] = round(
            n_forest / p)
        extras[f"tcf_forest_{tag}_bytes"] = sum(
            len(bytes(r["filter"])) for r in rows)
        fdf.unpersist()

    # surface the latest north-rule scaling matrix (bench_scaling.py
    # writes BENCH/scaling.json) so the per-round BENCH record carries
    # the two-parallelism-level evidence
    import os as _os
    scaling_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                 "BENCH", "scaling.json")
    if _os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            sc = json.load(fh)
        extras["scaling_build_eff_2_to_8"] = sc.get("value")
        extras["scaling_probe_eff_2_to_8"] = sc.get(
            "probe_efficiency_2_to_8")
        extras["scaling_tcf_forest_eff_2_to_8"] = sc.get(
            "taffy_cuckoo_build_efficiency_2_to_8")
        extras["scaling_tbf_jvm_forest_eff_2_to_8"] = sc.get(
            "taffy_block_jvm_build_efficiency_2_to_8")
        extras["scaling_build_keys_per_s_local8"] = sc.get(
            "local[8]", {}).get("build_keys_per_s")
        extras["scaling_tbf_jvm_probe_keys_per_s_2_8_32"] = [
            sc.get(f"local[{c}]", {}).get("families", {})
              .get("taffy_block_jvm", {}).get("probe_keys_per_s")
            for c in (2, 8, 32)]

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "query_trials": 2,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
