"""Round-7 measurement harness (bench.py stays frozen; guide §1).

Times declared queries with the SAME methodology as bench.py
(min-of-2 back-to-back ``collect()``), labels jobs, and writes
``plans/r07/<query>_<tag>.txt`` with the ``explain("formatted")``
output of each timed query.

Usage: python tools/r07_profile.py <tag> [query ...]
       (no query args = all declared queries)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r07")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from libfilter_spark.spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("libfilter-r07-profile", cpus=cpus)
    spark.range(1 << 20).count()
    import pandas as _pd

    def _warm(batches):
        for _ in batches:
            pass
        yield _pd.DataFrame({"n": [0]})
    spark.range(1 << 16).mapInPandas(_warm, schema="n long").count()

    os.makedirs(PLANS, exist_ok=True)
    all_q = entrymod.queries()
    if not names:
        names = list(all_q)
    timings: dict[str, float] = {}
    for name in names:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"r07:{name}")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "cpus": cpus,
                      "timings": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
