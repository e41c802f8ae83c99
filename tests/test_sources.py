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


def test_catalog_partition_pruning(spark):
    """The catalog layer (sources/catalog.py): documents registered as
    a lang-partitioned external table. A lang-filtered scan must show
    the predicate in PartitionFilters (directory pruning — the
    Iceberg-shaped behavior), push residual predicates to the reader,
    and prune columns to the selection."""
    from libfilter_spark.sources.catalog import (
        register_partitioned_documents, scan_documents_lang)
    sf = "/root/testdata/sf0.001"
    table = register_partitioned_documents(spark, sf)
    assert spark.catalog.tableExists(table)
    df = (scan_documents_lang(spark, sf, "en", ["source", "n_chars"])
          .where("n_chars > 100"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in \
        plan[plan.index("PartitionFilters"):], plan
    pf = plan[plan.index("PartitionFilters"):]
    assert "lang" in pf.split("]")[0], pf[:200]
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"):].split("]")[0]
    assert "n_chars" in pushed, pushed
    assert "ReadSchema" in plan
    rs = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" not in rs, rs  # column pruning: text not read
    # correctness: counts match an unpartitioned filtered read
    import pyspark.sql.functions as F
    expect = (spark.read.parquet(f"{sf}/documents.parquet")
              .where((F.col("lang") == "en") & (F.col("n_chars") > 100))
              .count())
    assert df.count() == expect
    # registration is idempotent within the session
    assert register_partitioned_documents(spark, sf) == table


def test_catalog_sf_dir_and_regeneration_not_stale(spark, tmp_path):
    """Round-3 ADVICE medium: the registered table name embeds a
    source fingerprint, so (a) two sf_dirs in one session get distinct
    tables and (b) regenerating documents.parquet under the SAME path
    yields a fresh table + warehouse copy, never stale data."""
    from libfilter_spark.sources.catalog import \
        register_partitioned_documents
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    schema = "doc_id long, lang string, text string"
    for d, lang in ((d1, "en"), (d2, "fr")):
        spark.createDataFrame([(i, lang, "t" * 5) for i in range(10)],
                              schema) \
            .write.parquet(f"{d}/documents.parquet")
    t1 = register_partitioned_documents(spark, d1)
    t2 = register_partitioned_documents(spark, d2)
    assert t1 != t2
    assert spark.table(t1).select("lang").distinct().head()[0] == "en"
    assert spark.table(t2).select("lang").distinct().head()[0] == "fr"
    # regenerate d1's source in place -> new fingerprint, fresh data
    spark.createDataFrame([(i, "de", "x") for i in range(7)], schema) \
        .write.mode("overwrite").parquet(f"{d1}/documents.parquet")
    t3 = register_partitioned_documents(spark, d1)
    assert t3 != t1
    assert spark.table(t3).count() == 7
    assert spark.table(t3).select("lang").distinct().head()[0] == "de"
