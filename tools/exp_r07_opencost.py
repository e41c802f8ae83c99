"""A/B: spark.sql.files.openCostInBytes 4MB (default) vs 128KB on
representative declared queries. Interleaved A/B/A/B min-of-N so a
sandbox throttle episode hits both variants equally (guide §1)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libfilter_spark.spark.session import get_spark
import __spark_entry__ as entrymod

QUERIES = ["bloom_semijoin_orders_customers", "bloom_semijoin_lineitem_parts",
           "text_stats_by_lang", "sessionize_events",
           "xor_semijoin_lineitem_suppliers"]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("r07-opencost-ab", cpus=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    spark.range(1 << 20).count()
    import pandas as pd

    def _warm(batches):
        for _ in batches:
            pass
        yield pd.DataFrame({"n": [0]})
    spark.range(1 << 16).mapInPandas(_warm, schema="n long").count()

    allq = entrymod.queries()
    best = {("A", q): float("inf") for q in QUERIES}
    best.update({("B", q): float("inf") for q in QUERIES})
    for rnd in range(3):
        for variant, cost in (("A", 4 * 1024 * 1024), ("B", 128 * 1024)):
            spark.conf.set("spark.sql.files.openCostInBytes", str(cost))
            for q in QUERIES:
                t0 = time.perf_counter()
                allq[q](spark, SF).collect()
                dt = time.perf_counter() - t0
                k = (variant, q)
                best[k] = min(best[k], dt)
    for q in QUERIES:
        a, b = best[("A", q)], best[("B", q)]
        print(f"{q}: A(4MB)={a:.3f}s B(128KB)={b:.3f}s ratio={b/a:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
