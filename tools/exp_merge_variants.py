"""A/B of tree-merge variants for the many-small-groups regime:
V0 current, V1 explicit partition counts, V2 V1+batched output,
V3 single-level merge (no L1) + batched output."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pandas as pd
    from pyspark.sql import SparkSession, functions as F

    from __spark_entry__ import _keyed, load_table
    import libfilter_spark.spark.build as B
    from libfilter_spark.filters import FAMILIES

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "16g")
             .appName("exp_merge_variants").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = load_table(spark, SF, "lineitem")
    build = _keyed(lineitem.where("l_returnflag = 'R'"), "l_partkey") \
        .select("l_suppkey", "key").cache()
    build.count()

    group_cols = ["l_suppkey"]

    orig = B.merge_filter_blobs
    B.merge_filter_blobs = lambda p, gc, fanin=16: p
    try:
        partials_df = B.build_filters(build, group_cols, ndv=1 << 10,
                                      fpp=0.01)
    finally:
        B.merge_filter_blobs = orig
    schema = partials_df.schema
    N = spark.sparkContext.defaultParallelism

    def merge_group(pdf):
        fam = pdf["family"].iloc[0]
        cls = FAMILIES[fam]
        blobs = sorted(pdf["filter"], key=bytes)
        acc = cls.deserialize(blobs[0])
        if hasattr(acc, "absorb"):
            fs = [acc] + [cls.deserialize(b) for b in blobs[1:]]
            while len(fs) > 1:
                fs.sort(key=lambda f: (f.log_side_size, f.occupied))
                nxt = []
                for i in range(0, len(fs) - 1, 2):
                    fs[i + 1].absorb(fs[i])
                    nxt.append(fs[i + 1])
                if len(fs) % 2:
                    nxt.append(fs[-1])
                fs = nxt
            acc = fs[0]
        else:
            for b in blobs[1:]:
                acc = acc.union(cls.deserialize(b))
        return acc.serialize()

    def single_level_batched(partials):
        def merge_local(batches):
            pdfs = [p for p in batches if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            rows = {c: [] for c in pdf.columns}
            for _, g in pdf.groupby(group_cols, sort=False,
                                    dropna=False):
                for c in group_cols:
                    rows[c].append(g[c].iloc[0])
                rows["family"].append(g["family"].iloc[0])
                rows["params"].append(g["params"].iloc[0])
                rows["n_keys"].append(int(g["n_keys"].sum()))
                rows["n_partials"].append(int(g["n_partials"].sum()))
                rows["filter"].append(merge_group(g))
            yield pd.DataFrame(rows)

        return partials.repartition(N, *group_cols) \
            .mapInPandas(merge_local, schema=schema)

    def two_level_explicit(partials, batched):
        l1_keys = [*group_cols, "__mb"]
        bucket = F.pmod(F.xxhash64("filter"), F.lit(16)).alias("__mb")
        level1_in = partials.select("*", bucket)
        l1_schema = level1_in.schema

        def mk(keys, drop_mb, out_schema_cols):
            def merge_local(batches):
                pdfs = [p for p in batches if len(p)]
                if not pdfs:
                    return
                pdf = pd.concat(pdfs, ignore_index=True)
                if batched:
                    rows = {c: [] for c in out_schema_cols}
                    for _, g in pdf.groupby(keys, sort=False,
                                            dropna=False):
                        for c in group_cols:
                            rows[c].append(g[c].iloc[0])
                        rows["family"].append(g["family"].iloc[0])
                        rows["params"].append(g["params"].iloc[0])
                        rows["n_keys"].append(int(g["n_keys"].sum()))
                        rows["n_partials"].append(
                            int(g["n_partials"].sum()))
                        rows["filter"].append(
                            merge_group(g))
                        if "__mb" in rows:
                            rows["__mb"].append(int(g["__mb"].iloc[0]))
                    yield pd.DataFrame(rows)
                else:
                    for _, g in pdf.groupby(keys, sort=False,
                                            dropna=False):
                        out = {c: [g[c].iloc[0]] for c in group_cols}
                        out["family"] = [g["family"].iloc[0]]
                        out["params"] = [g["params"].iloc[0]]
                        out["n_keys"] = [int(g["n_keys"].sum())]
                        out["n_partials"] = [int(g["n_partials"].sum())]
                        out["filter"] = [merge_group(g)]
                        if "__mb" in out_schema_cols:
                            out["__mb"] = [int(g["__mb"].iloc[0])]
                        yield pd.DataFrame(out)
            return merge_local

        l1_cols = [f.name for f in l1_schema.fields]
        out_cols = [f.name for f in schema.fields]
        level1 = level1_in.repartition(N, *l1_keys) \
            .mapInPandas(mk(l1_keys, False, l1_cols), schema=l1_schema)
        return level1.drop("__mb").repartition(N, *group_cols) \
            .mapInPandas(mk(group_cols, True, out_cols), schema=schema)

    # warm
    orig(partials_df, group_cols).count()

    for trial in range(2):
        t0 = time.perf_counter()
        n = orig(partials_df, group_cols).count()
        print(f"RES [t{trial}] V0 current tree: "
              f"{time.perf_counter()-t0:.2f}s ({n})")

        t0 = time.perf_counter()
        n = two_level_explicit(partials_df, batched=False).count()
        print(f"RES [t{trial}] V1 explicit-N tree: "
              f"{time.perf_counter()-t0:.2f}s ({n})")

        t0 = time.perf_counter()
        n = two_level_explicit(partials_df, batched=True).count()
        print(f"RES [t{trial}] V2 explicit-N + batched-out: "
              f"{time.perf_counter()-t0:.2f}s ({n})")

        t0 = time.perf_counter()
        n = single_level_batched(partials_df).count()
        print(f"RES [t{trial}] V3 single-level batched: "
              f"{time.perf_counter()-t0:.2f}s ({n})")

    spark.stop()


if __name__ == "__main__":
    main()
