"""Cluster-submit artifact smoke test (round-5, verdict task 8): the
north star's deployment shape is ``spark-submit --py-files
libfilter_spark.zip job.py``. This builds the zip with make_pyfiles,
runs a REAL spark-submit from a scratch cwd (the repo itself absent
from sys.path — imports must resolve from the zip), and drives one
filter semi-join end-to-end at sf0.001."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

JOB = r"""
import sys
assert not any(p.rstrip("/").endswith("repo") for p in sys.path if p), \
    "job must import from the zip, not the repo checkout"
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
import libfilter_spark
from libfilter_spark.spark.keys import with_content_key_bin
from libfilter_spark.spark.build import build_filters
from libfilter_spark.spark.probe import filter_semi_join

sf = sys.argv[1]
cust = (spark.read.parquet(sf + "/customer.parquet")
        .where("c_acctbal > 5000")
        .withColumn("__k", F.col("c_custkey").cast("string")))
orders = (spark.read.parquet(sf + "/orders.parquet")
          .withColumn("__k", F.col("o_custkey").cast("string")))
build = with_content_key_bin(cust, "__k")
probe = with_content_key_bin(orders, "__k")
filters = build_filters(build.select("key"), None, ndv=1 << 14, fpp=0.01)
hits = filter_semi_join(probe, build, filters, None).count()
exact = orders.join(cust.select("c_custkey"),
                    orders.o_custkey == cust.c_custkey,
                    "left_semi").count()
assert hits == exact, (hits, exact)
print(f"SMOKE_OK {hits}")
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
@pytest.mark.skipif(not os.path.isdir(SF),
                    reason=f"test dataset {SF} not present")
def test_spark_submit_pyfiles_semijoin(tmp_path):
    zip_path = tmp_path / "libfilter_spark.zip"
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "make_pyfiles.py"),
                        str(zip_path)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert zip_path.exists() and zip_path.stat().st_size > 10_000
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path), str(job), SF],
        capture_output=True, text=True, timeout=600, cwd=tmp_path,
        env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SMOKE_OK" in r.stdout, (r.stdout[-500:], r.stderr[-1000:])
