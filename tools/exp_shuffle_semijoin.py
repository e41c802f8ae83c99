"""Stage-timed decomposition of shuffle_grouped_semijoin_returned_parts
(the slowest bench row at 12.1 s, sf0.1 local[32]) — where does the
time go: grouped partial build, cogroup probe shuffle, the boolean
join-back, or the exact-verify semijoin?"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession, functions as F

    from __spark_entry__ import _keyed, load_table
    from libfilter_spark.spark.build import build_filters
    from libfilter_spark.spark.probe import probe_with_filters

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "16g")
             .appName("exp_shuffle_semijoin").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = load_table(spark, SF, "lineitem")
    t0 = time.perf_counter()
    n_li = lineitem.count()
    print(f"lineitem rows: {n_li}  warm-read {time.perf_counter()-t0:.2f}s")

    build = _keyed(lineitem.where("l_returnflag = 'R'"), "l_partkey") \
        .select("l_suppkey", "key")
    probe = _keyed(lineitem, "l_partkey")

    t0 = time.perf_counter()
    nb = build.count()
    ng = build.select("l_suppkey").distinct().count()
    print(f"build rows {nb}, groups {ng}  {time.perf_counter()-t0:.2f}s")

    for trial in range(2):
        t0 = time.perf_counter()
        filters = build_filters(build, ["l_suppkey"], ndv=1 << 10,
                                fpp=0.01)
        filters = filters.cache()
        nf = filters.count()
        t_build = time.perf_counter() - t0
        print(f"[t{trial}] build_filters: {t_build:.2f}s  ({nf} filters)")

        t0 = time.perf_counter()
        cand = (probe_with_filters(probe, filters, ["l_suppkey"],
                                   via="shuffle")
                .where(F.col("maybe_seen")).drop("maybe_seen"))
        ncand = cand.count()
        t_probe = time.perf_counter() - t0
        print(f"[t{trial}] probe+joinback+filter: {t_probe:.2f}s  "
              f"({ncand} candidates)")

        on = ["l_suppkey", "key"]
        t0 = time.perf_counter()
        hits = cand.join(build.dropDuplicates(on), on=on,
                         how="left_semi")
        res = (hits.groupBy("l_linestatus")
               .agg(F.count(F.lit(1)).alias("n_rows")))
        rows = res.collect()
        t_verify = time.perf_counter() - t0
        print(f"[t{trial}] exact-verify+agg: {t_verify:.2f}s  {rows}")
        filters.unpersist()

    # isolate: cogroup probe WITHOUT the join-back (distinct keys only)
    filters = build_filters(build, ["l_suppkey"], ndv=1 << 10, fpp=0.01)
    filters.cache().count()
    from libfilter_spark.spark.probe import _probe_via_cogroup
    t0 = time.perf_counter()
    probed = _probe_via_cogroup(probe, filters, ["l_suppkey"], "key",
                                "maybe_seen")
    npd = probed.count()
    print(f"cogroup+joinback total: {time.perf_counter()-t0:.2f}s "
          f"({npd} rows)")

    spark.stop()


if __name__ == "__main__":
    main()
