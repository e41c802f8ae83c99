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


def _canon_cell(v) -> str:
    """Dtype-canonical string for one cell, mirroring the driver's hash.

    The driver hashes string-canonicalized values, so REPRESENTATION
    matters: an int64 620898400000 and a float64 6.208984e+11 are
    different even though numerically equal (this is exactly the
    text_stats_by_lang r1/r2 failure mode).  Floats keep a float-shaped
    repr; ints stay bare digits; no cross-type coercion anywhere.
    """
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    rows = len(spark_pdf) == len(oracle_pdf)
    schema = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    if not (rows and schema):
        return rows, schema, False
    a, b = _canon_rows(spark_pdf), _canon_rows(oracle_pdf)
    ok = a == b
    if not ok:
        cols = sorted(spark_pdf.columns)
        shown = 0
        for ra, rb in zip(a, b):
            if ra != rb and shown < 5:
                for c, va, vb in zip(cols, ra, rb):
                    if va != vb:
                        print(f"    col {c}: spark={va!r} oracle={vb!r}")
                shown += 1
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
    # the 8 recorded-golden queries additionally verify against an
    # INDEPENDENT second implementation (tools/independent_oracles.py)
    # so the oracle is not the code under test
    from independent_oracles import COMPUTERS as INDEP
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
            indep = ""
            if name in INDEP and sf_dir.rstrip("/").endswith("sf0.01"):
                cols, irows = INDEP[name](sf_dir)
                indep_pdf = pd.DataFrame(irows, columns=cols)
                ir, isch, iv = compare(spark_pdf, indep_pdf)
                indep = f" independent={'OK' if (ir and isch and iv) else 'FAIL'}"
                if not (ir and isch and iv):
                    failures += 1
            print(f"{name}: {status} rows_match={rows} "
                  f"schema_match={schema} hash_match={vals} "
                  f"({len(spark_pdf)} rows){indep}")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {exc}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
