"""Is the tree-merge slowness AQE coalescing the repartition(cols)
exchanges down to ~1 task? Count the actual post-shuffle partitions
and time a single-thread merge loop for reference."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession, functions as F

    from __spark_entry__ import _keyed, load_table
    import libfilter_spark.spark.build as B

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "16g")
             .appName("exp_merge_parts").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    print("AQE:", spark.conf.get("spark.sql.adaptive.enabled"),
          "coalesce:", spark.conf.get(
              "spark.sql.adaptive.coalescePartitions.enabled"))

    lineitem = load_table(spark, SF, "lineitem")
    build = _keyed(lineitem.where("l_returnflag = 'R'"), "l_partkey") \
        .select("l_suppkey", "key").cache()
    build.count()

    orig = B.merge_filter_blobs
    try:
        B.merge_filter_blobs = lambda p, gc, fanin=16: p
        partials = B.build_filters(build, ["l_suppkey"], ndv=1 << 10,
                                   fpp=0.01).cache()
        npart = partials.count()
    finally:
        B.merge_filter_blobs = orig
    print("partial rows:", npart)

    l1 = partials.select(
        "*", F.pmod(F.xxhash64("filter"), F.lit(16)).alias("__mb"))
    reparted = l1.repartition("l_suppkey", "__mb")
    # count rows per post-shuffle partition
    sizes = reparted.rdd.glom().map(len).collect()
    nonzero = [s for s in sizes if s]
    print(f"post-shuffle partitions: {len(sizes)} total, "
          f"{len(nonzero)} non-empty, max {max(nonzero)}")

    # single-thread merge cost over all partial rows (to bound the
    # per-call overhead): replicate merge_l1_local's inner loop
    import pandas as pd
    pdf = partials.toPandas()
    pdf["__mb"] = 0
    t0 = time.perf_counter()
    outs = []
    for _, g in pdf.groupby(["l_suppkey", "__mb"], sort=False,
                            dropna=False):
        outs.append(g)  # groupby iteration cost only
    t_gb = time.perf_counter() - t0
    print(f"groupby iteration alone: {t_gb:.2f}s over {len(outs)} groups")

    t0 = time.perf_counter()
    n = 0
    for _, g in pdf.groupby(["l_suppkey", "__mb"], sort=False,
                            dropna=False):
        out = B.merge_filter_blobs.__wrapped__ if False else None
        n += 1
    # real merge_rows timing via the module's internals: emulate
    from libfilter_spark.filters import FAMILIES
    t0 = time.perf_counter()
    rows = 0
    for _, g in pdf.groupby(["l_suppkey", "__mb"], sort=False,
                            dropna=False):
        fam = g["family"].iloc[0]
        cls = FAMILIES[fam]
        blobs = sorted(g["filter"], key=bytes)
        acc = cls.deserialize(blobs[0])
        for b in blobs[1:]:
            acc = acc.union(cls.deserialize(b))
        blob = acc.serialize()
        rows += 1
    t_merge = time.perf_counter() - t0
    print(f"single-thread full merge of {rows} groups: {t_merge:.2f}s "
          f"({t_merge/rows*1e3:.2f} ms/group)")

    spark.stop()


if __name__ == "__main__":
    main()
