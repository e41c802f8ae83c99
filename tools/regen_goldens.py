"""Regenerate goldens_sf001.json — the recorded sf0.01 outputs used as
VALUES-table oracles for deterministic, non-SQL-expressible queries
(see __spark_entry__.GOLDEN_QUERIES). Run after an intentional kernel
change (hash function, LSH seeds, codegen) shifts the expected output:

    python tools/regen_goldens.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _type_of(dtype) -> str:
    if np.issubdtype(dtype, np.bool_):
        return "boolean"
    if np.issubdtype(dtype, np.integer):
        return "long"
    if np.issubdtype(dtype, np.floating):
        return "double"
    return "string"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from libfilter_spark.spark.session import get_spark

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    goldens = {}
    for name in E.GOLDEN_QUERIES:
        pdf = qs[name](spark, sf_dir).toPandas()
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        types = [_type_of(pdf[c].dtype) for c in pdf.columns]
        rows = []
        for _, r in pdf.iterrows():
            row = []
            for c, t in zip(pdf.columns, types):
                v = r[c]
                row.append(bool(v) if t == "boolean"
                           else int(v) if t == "long"
                           else float(v) if t == "double" else str(v))
            rows.append(row)
        goldens[name] = {"columns": list(pdf.columns), "types": types,
                         "rows": rows}
        print(f"{name}: {len(rows)} rows recorded")
    with open(E.GOLDENS_PATH, "w") as fh:
        json.dump(goldens, fh, indent=1)
    print(f"wrote {E.GOLDENS_PATH}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
