"""Local replica of the driver's Spark-vs-DuckDB oracle compare.

Runs each `__spark_entry__.queries()` entry and its `oracle_sql()` SQL
side-by-side on the same parquet tables, sorts columns by name + rows by
value (the driver's hashing contract), and reports row/schema/value
matches. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

Defaults: sf_dir=/root/testdata/sf0.01, all oracle-backed queries.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    rows = len(spark_pdf) == len(oracle_pdf)
    schema = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    if not (rows and schema):
        return rows, schema, False
    a, b = _norm(spark_pdf), _norm(oracle_pdf)
    ok = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or \
                np.issubdtype(bv.dtype, np.floating):
            ok &= bool(np.allclose(av.astype(float), bv.astype(float),
                                   rtol=0, atol=0, equal_nan=True))
        else:
            ok &= bool((av == bv).all())
        if not ok:
            print(f"    column {c} diverges:")
            mism = np.where(av != bv)[0][:5] if av.dtype == bv.dtype \
                else range(min(5, len(av)))
            for i in mism:
                print(f"      row {i}: spark={av[i]!r} oracle={bv[i]!r}")
            break
    return rows, schema, ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in oracles]
    failures = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: (no oracle, skipped)")
            continue
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            oracle_pdf = con.execute(oracles[name]).fetchdf()
            rows, schema, vals = compare(spark_pdf, oracle_pdf)
            status = "OK" if (rows and schema and vals) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"{name}: {status} rows_match={rows} "
                  f"schema_match={schema} hash_match={vals} "
                  f"({len(spark_pdf)} rows)")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {exc}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
