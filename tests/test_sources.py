"""Hex-digest file source (HIBP-style ingest) + --py-files packaging."""

import subprocess
import sys

import pyspark.sql.functions as F

from libfilter_spark.sources.hexfile import read_hex_hashes, write_hex_hashes
from libfilter_spark.spark.build import build_filters
from libfilter_spark.spark.probe import probe_with_filters


def test_hexfile_round_trip(spark, tmp_path):
    path = str(tmp_path / "hashes")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_hex_hashes(docs, "text", path)
    keys = read_hex_hashes(spark, path)
    assert keys.count() == docs.count()
    # keys equal the standard content keys (low-64 of sha256 here;
    # independent derivation path from with_content_key)
    from libfilter_spark.spark.keys import key_hex_col
    expect = docs.select(
        F.unhex(F.substring(F.upper(F.sha2(F.col("text"), 256)), -16, 16))
        .alias("key"))
    assert keys.exceptAll(expect).count() == 0


def test_hexfile_hibp_suffix_and_garbage(spark, tmp_path):
    p = tmp_path / "dump.txt"
    p.write_text(
        "00112233445566778899AABBCCDDEEFF0011223344556677:42\n"
        "FFEEDDCCBBAA99887766554433221100FFEEDDCCBBAA9988:7\n"
        "not-a-hash\n"
        "\n")
    keys = read_hex_hashes(spark, str(p))
    rows = keys.collect()
    assert len(rows) == 2  # suffix parsed, garbage skipped
    assert all(len(bytes(r["key"])) == 8 for r in rows)


def test_hexfile_to_filter_pipeline(spark, tmp_path):
    path = str(tmp_path / "hashes2")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_hex_hashes(docs, "text", path)
    keys = read_hex_hashes(spark, path)
    flt = build_filters(keys, None, ndv=1024, fpp=0.01)
    found = probe_with_filters(keys, flt, None).where("maybe_seen").count()
    assert found == keys.count()


def test_make_pyfiles(tmp_path):
    out = str(tmp_path / "pkg.zip")
    r = subprocess.run([sys.executable, "/root/repo/make_pyfiles.py", out],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    import zipfile
    names = zipfile.ZipFile(out).namelist()
    assert "libfilter_spark/__init__.py" in names
    assert any("kernels/block.py" in n for n in names)
    assert not any("__pycache__" in n for n in names)
