"""Decompose the many-group partials build: partial stage vs tree
merge vs alternatives (single-level merge, grouped_bulk)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession, functions as F

    from __spark_entry__ import _keyed, load_table

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "16g")
             .appName("exp_manygroup_build").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = load_table(spark, SF, "lineitem")
    build = _keyed(lineitem.where("l_returnflag = 'R'"), "l_partkey") \
        .select("l_suppkey", "key").cache()
    build.count()

    import libfilter_spark.spark.build as B

    # warm the python workers once
    B.build_filters(build, ["l_suppkey"], ndv=1 << 10, fpp=0.01).count()

    for trial in range(2):
        # 1) partial stage alone (patch merge to passthrough count)
        orig_merge = B.merge_filter_blobs
        try:
            B.merge_filter_blobs = lambda partials, gc, fanin=16: partials
            t0 = time.perf_counter()
            nparts = B.build_filters(build, ["l_suppkey"], ndv=1 << 10,
                                     fpp=0.01).count()
            t_part = time.perf_counter() - t0
        finally:
            B.merge_filter_blobs = orig_merge
        print(f"[t{trial}] partial stage only: {t_part:.2f}s "
              f"({nparts} partial rows)")

        # 2) full partials+tree-merge
        t0 = time.perf_counter()
        n = B.build_filters(build, ["l_suppkey"], ndv=1 << 10,
                            fpp=0.01).count()
        t_full = time.perf_counter() - t0
        print(f"[t{trial}] partials+tree merge: {t_full:.2f}s ({n})")

        # 3) grouped_bulk strategy
        t0 = time.perf_counter()
        n = B.build_filters(build, ["l_suppkey"], ndv=1 << 10, fpp=0.01,
                            strategy="grouped_bulk").count()
        t_gb = time.perf_counter() - t0
        print(f"[t{trial}] grouped_bulk: {t_gb:.2f}s ({n})")

    spark.stop()


if __name__ == "__main__":
    main()
